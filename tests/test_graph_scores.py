"""q140 (frontier BFS depth) and q141 (HITS) semantic pins on
handwritten graphs.

The oracles prove cross-engine value equality; here the GRAPH
semantics are pinned on graphs small enough to verify by hand —
min-depth over multiple paths, the horizon cap, seed multiplicity,
and the hub/authority split HITS exists to measure.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.weburl import (
    BFS_MAX_DEPTH,
    HITS_SCALE,
    bfs_depths,
    hits_scores,
    q140_crawl_depth,
    q141_hits_scores,
)

SF = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _seeds(spark, hosts):
    return spark.createDataFrame([(h,) for h in hosts], "host string")


def test_bfs_min_depth_over_multiple_paths(spark):
    # a -> b -> c and a -> c: c must be depth 1, not 2
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    got = {r.host: r.depth for r in bfs_depths(e, _seeds(spark, ["a"])).collect()}
    assert got == {"a": 0, "b": 1, "c": 1}


def test_bfs_horizon_cap_and_multi_seed(spark):
    # chain a0 -> a1 -> ... -> a9: beyond the cap stays undiscovered
    chain = [(f"a{i}", f"a{i+1}") for i in range(9)]
    got = {r.host: r.depth for r in bfs_depths(_edges(spark, chain), _seeds(spark, ["a0"])).collect()}
    assert got["a8"] == 8 and "a9" not in got  # depth 9 > BFS_MAX_DEPTH=8
    assert BFS_MAX_DEPTH == 8
    # a second seed rescues the tail
    got2 = {
        r.host: r.depth
        for r in bfs_depths(_edges(spark, chain), _seeds(spark, ["a0", "a7"])).collect()
    }
    assert got2["a9"] == 2 and got2["a7"] == 0


def test_q140_fixture_depth_profile(spark):
    rows = {r.host: r.depth for r in q140_crawl_depth(spark, SF).collect()}
    assert len(rows) == 64 and rows["g0.test"] == 0
    # the planted graph reaches depths 0..8 and leaves 37 hosts beyond
    # the horizon (simulated in the q140 docstring)
    reached = sorted(d for d in rows.values() if d >= 0)
    assert set(reached) == set(range(9))
    assert sum(1 for d in rows.values() if d == -1) == 37


def test_hits_hub_authority_split(spark):
    # two hubs pointing at one authority; the authority links nowhere
    e = _edges(spark, [("hub1", "star"), ("hub2", "star")])
    got = {r.host: r for r in hits_scores(e).collect()}
    assert got["star"].auth_scaled == HITS_SCALE  # all authority mass
    assert got["star"].hub_scaled == 0
    assert got["hub1"].auth_scaled == 0
    assert got["hub1"].hub_scaled == got["hub2"].hub_scaled == HITS_SCALE // 2


def test_q141_scores_normalized_and_split(spark):
    rows = q141_hits_scores(spark, SF).collect()
    assert rows
    tot_hub = sum(r.hub_scaled for r in rows)
    tot_auth = sum(r.auth_scaled for r in rows)
    # sum-normalized to HITS_SCALE up to truncation loss (< n nodes)
    assert HITS_SCALE - len(rows) <= tot_hub <= HITS_SCALE
    assert HITS_SCALE - len(rows) <= tot_auth <= HITS_SCALE
    # news hosts are pure authorities (no outlinks -> hub 0)
    for r in rows:
        if r.host.startswith("news"):
            assert r.hub_scaled == 0 and r.auth_scaled > 0
