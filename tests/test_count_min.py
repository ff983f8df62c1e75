"""q139 Count-Min sketch semantic pins.

The oracle (test_entry_oracle / tools/check_oracles.py) proves the
Spark and DuckDB grids are bit-identical; here the SKETCH GUARANTEES
are pinned — the one-sided error bound (never undercounts), cell-grid
geometry, and counter mergeability (the property that makes the
sketch the 100-TB shape: per-shard sketches combine by addition
without touching raw tokens).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.text_stats import (
    CM_DEPTH,
    CM_WIDTH,
    _cm_cells,
    q139_count_min_tokens,
)

SF = "/root/testdata/sf0.001"


def test_never_undercounts_and_exact_on_clean_rows(spark):
    rows = q139_count_min_tokens(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cm_est >= r.exact_n, r
        assert r.overcount == r.cm_est - r.exact_n
    # with a vocabulary far below CM_WIDTH, collisions need all
    # CM_DEPTH rows to collide for an overcount — at least one token
    # must come back exact
    assert any(r.overcount == 0 for r in rows)


def test_cell_grid_geometry(spark):
    df = spark.createDataFrame([("alpha",), ("beta",)], "tok string").select(
        F.explode(_cm_cells(F.col("tok"))).alias("cell")
    )
    cells = df.select("cell.r", "cell.c").collect()
    # CM_DEPTH cells per token, rows 0..CM_DEPTH-1 each exactly once
    assert len(cells) == 2 * CM_DEPTH
    for tok_cells in (cells[:CM_DEPTH], cells[CM_DEPTH:]):
        assert sorted(c.r for c in tok_cells) == list(range(CM_DEPTH))
        assert all(0 <= c.c < CM_WIDTH for c in tok_cells)


def test_sketch_counters_merge_by_addition(spark):
    """sketch(A union B) == per-cell sum of sketch(A) and sketch(B) —
    the mergeability contract a per-day/per-shard rollup relies on."""

    def sketch(toks):
        df = spark.createDataFrame([(t,) for t in toks], "tok string")
        return {
            (r.r, r.c): r.n
            for r in df.select(F.explode(_cm_cells(F.col("tok"))).alias("cell"))
            .groupBy(F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    a = ["x", "y", "x"]
    b = ["y", "z"]
    merged = sketch(a + b)
    sa, sb = sketch(a), sketch(b)
    summed = {k: sa.get(k, 0) + sb.get(k, 0) for k in set(sa) | set(sb)}
    assert merged == summed
