"""Edge cases the random-timestamp driver corpus never hits: exact
timestamp ties in the as-of join and band/window boundaries in the
conversion range join — each pinned against DuckDB running the SAME
oracle SQL the driver uses."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from ocr_service_spark.operators.temporal import (
    CONVERSION_WINDOW_US,
    ORACLES,
    q22_asof_attribution,
    q23_conversion_pairs,
)

T0 = dt.datetime(2026, 3, 1, 12, 0, 0)


def _us(delta_us: int) -> dt.datetime:
    return T0 + dt.timedelta(microseconds=delta_us)


def _corpus(spark, tmp_path, rows):
    """rows: (event_id, delta_us, user_id, event_type) -> sf_dir with
    an events.parquet the operators and the oracle both read."""
    sf_dir = str(tmp_path / "sf")
    df = spark.createDataFrame(
        [
            (eid, _us(d), uid, etype, 0.0, "{}")
            for eid, d, uid, etype in rows
        ],
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")
    return sf_dir


def _oracle(sf_dir: str, name: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
    )
    return sorted(map(tuple, con.execute(ORACLES[name]).fetchall()))


def _spark_rows(df):
    return sorted(tuple(r) for r in df.collect())


W = CONVERSION_WINDOW_US


def test_asof_tie_cases_match_duckdb(spark, tmp_path):
    sf_dir = _corpus(
        spark,
        tmp_path,
        [
            # user 1: click at the EXACT purchase timestamp -> visible
            # (inclusive >=), and it wins over the earlier click
            (10, 0, 1, "click"),
            (11, 500, 1, "click"),
            (12, 500, 1, "purchase"),
            # user 2: two clicks at the SAME timestamp -> max event_id wins
            (20, 0, 2, "click"),
            (21, 0, 2, "click"),
            (22, 100, 2, "purchase"),
            # user 3: purchase BEFORE any click -> excluded (inner as-of)
            (30, 0, 3, "purchase"),
            (31, 50, 3, "click"),
            # user 4: two purchases share one prior click
            (40, 0, 4, "click"),
            (41, 10, 4, "purchase"),
            (42, 20, 4, "purchase"),
        ],
    )
    got = _spark_rows(q22_asof_attribution(spark, sf_dir))
    assert got == _oracle(sf_dir, "q22_asof_attribution")
    by_purchase = {r[0]: r for r in got}
    assert by_purchase[12][3] == 11  # same-us click visible, not click 10
    assert by_purchase[22][3] == 21  # max event_id among same-us clicks
    assert 30 not in by_purchase  # no prior click -> no row
    assert by_purchase[41][3] == 40 and by_purchase[42][3] == 40


def test_conversion_window_boundaries_match_duckdb(spark, tmp_path):
    sf_dir = _corpus(
        spark,
        tmp_path,
        [
            # gap == 0: excluded (strictly after)
            (10, 0, 1, "view"),
            (11, 0, 1, "purchase"),
            # gap == window exactly: included (<=)
            (20, 0, 2, "view"),
            (21, W, 2, "purchase"),
            # gap == window + 1: excluded
            (30, 0, 3, "view"),
            (31, W + 1, 3, "purchase"),
            # cross-band pair: view just under a band edge, purchase just
            # over it (the exploded band+1 copy must catch it)
            (40, W - 1, 4, "view"),
            (41, W + 1, 4, "purchase"),
            # same band, same pair appears exactly once (no dup from the
            # two exploded copies)
            (50, 0, 5, "view"),
            (51, 1, 5, "purchase"),
        ],
    )
    got = _spark_rows(q23_conversion_pairs(spark, sf_dir))
    assert got == _oracle(sf_dir, "q23_conversion_pairs")
    pairs = {(r[1], r[2]): r[3] for r in got}
    assert (10, 11) not in pairs
    assert pairs[(20, 21)] == W
    assert (30, 31) not in pairs
    assert pairs[(40, 41)] == 2
    assert list(pairs).count((50, 51)) == 1


@pytest.mark.parametrize("n_users,n_events", [(7, 200)])
def test_temporal_randomized_against_duckdb(spark, tmp_path, n_users, n_events):
    """Deterministic pseudo-random corpus with COARSE timestamps (whole
    seconds -> plenty of ties) — both operators must match DuckDB."""
    rows = []
    state = 12345
    for eid in range(n_events):
        state = (state * 1103515245 + 12345) % (1 << 31)
        uid = state % n_users
        state = (state * 1103515245 + 12345) % (1 << 31)
        delta = (state % 50) * 1_000_000  # 0-49 s, 1 s grid
        state = (state * 1103515245 + 12345) % (1 << 31)
        etype = ("view", "click", "purchase")[state % 3]
        rows.append((eid, delta, uid, etype))
    sf_dir = _corpus(spark, tmp_path, rows)
    for name, fn in (
        ("q22_asof_attribution", q22_asof_attribution),
        ("q23_conversion_pairs", q23_conversion_pairs),
    ):
        assert _spark_rows(fn(spark, sf_dir)) == _oracle(sf_dir, name), name
