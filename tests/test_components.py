"""Connected-components label propagation (dedup.q37 machinery): the
k-hop bound is exact for diameter <= k and documented-partial beyond."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.dedup import K_HOPS, propagate_min_labels


def _labels(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.col("id").alias("label")
    )


def _edges(spark, pairs):
    fwd = spark.createDataFrame(pairs, "src long, dst long")
    return fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_components_within_k_hops_collapse(spark):
    # two components: a 5-chain (diameter 4) and a triangle, plus singletons
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (7, 8), (8, 9), (9, 7)])
    out = {r.doc_id: r.label for r in propagate_min_labels(_labels(spark, 11), edges, K_HOPS).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 6, 7: 7, 8: 7, 9: 7, 10: 10}


def test_components_beyond_k_hops_partial_by_design():
    # label after k rounds == min within distance k: node at distance
    # K_HOPS+1 from the minimum keeps a larger label — the documented
    # bound, so a diameter-(K_HOPS+1) chain must NOT fully collapse
    assert K_HOPS == 8  # test below is written against this bound


def test_chain_longer_than_k_hops(spark):
    n = K_HOPS + 3  # chain 0-1-...-10: node 10 is 10 hops from 0
    edges = _edges(spark, [(i, i + 1) for i in range(n - 1)])
    out = {r.doc_id: r.label for r in propagate_min_labels(_labels(spark, n), edges, K_HOPS).collect()}
    assert out[K_HOPS] == 0          # exactly k hops away -> reached
    assert out[n - 1] != 0           # k+2 hops away -> not yet (bounded form)


def test_minhash_lsh_recall_vs_exact_pairs(spark):
    """q34 (shingle MinHash-LSH + verify) must recover nearly all of
    q14's exact inverted-index pairs at the same Jaccard floor — the
    measurable guarantee the banded index trades candidates for."""
    from ocr_service_spark.operators.dedup import (
        MINHASH_VERIFY_MIN,
        q14_jaccard_pairs,
        q34_minhash_neardup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r.doc_a, r.doc_b)
        for r in q14_jaccard_pairs(spark, sf)
        .filter(F.col("jaccard") >= MINHASH_VERIFY_MIN)
        .collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in q34_minhash_neardup_pairs(spark, sf).collect()}
    assert exact, "corpus must contain near-dup pairs for this test to bind"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, (len(exact), len(lsh), recall)


def test_incremental_neardup_classifies_batch(spark):
    """q90: near-dup batch docs (doc_id%4==0, first word dropped) must
    come back 'dup' matched to their own source; reversed-word docs
    (%4==1) must come back 'new' — no candidate survives the verify."""
    from ocr_service_spark.operators.dedup import (
        INC_BATCH_OFFSET,
        q90_incremental_neardup,
    )

    rows = q90_incremental_neardup(spark, "/root/testdata/sf0.001").collect()
    assert rows, "batch must be non-empty"
    by_src = {r.batch_id - INC_BATCH_OFFSET: r for r in rows}
    assert set(by_src) == {r.batch_id - INC_BATCH_OFFSET for r in rows}
    for src, r in by_src.items():
        if src % 4 == 0:
            assert r.status == "dup", (src, r)
            assert r.match_doc_id == src, (src, r)
            assert r.jaccard >= 0.5
        else:
            assert r.status == "new", (src, r)
            assert r.match_doc_id is None and r.jaccard is None
