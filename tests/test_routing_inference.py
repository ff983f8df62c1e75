"""q146 (code routing), q147 (hashed classifier inference), q148
(rendezvous reshard stability) semantic pins.

Oracles prove cross-engine equality; these pin what the oracles can't:
that prose with stray symbols does NOT route to code, that the
classifier's verdict flips with the bias, and the rendezvous
guarantee itself (movement only INTO new shards, bounded volume).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.corpus import (
    RDV_NEW_SHARDS,
    RDV_OLD_SHARDS,
    q147_clf_inference,
    q148_reshard_stability,
    rendezvous_shard,
)
from ocr_service_spark.operators.quality import q146_code_routing

SF = "/root/testdata/sf0.001"


def test_q146_routes_planted_code_and_only_it(spark):
    rows = q146_code_routing(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == docs
    for r in rows:
        # planting: every 6th doc serves the code snippet
        want = "code" if r.doc_id % 6 == 0 else "prose"
        assert r.route == want, r
    # the prose side still sees SOME symbols (real text has '=' etc.
    # occasionally) without flipping — the corroboration gate works
    prose = [r for r in rows if r.route == "prose"]
    assert prose and all(r.n_code_keywords < 3 or r.n_code_symbols == 0 for r in prose)


def test_q147_score_accounting(spark):
    rows = q147_clf_inference(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.keep == (r.score - 40 > 0)  # CLF_BIAS = -40
        # per-gram weights live in [-100, 100]
        assert -100 * r.n_grams <= r.score <= 100 * r.n_grams
    # the planted weight table is balanced enough that both verdicts occur
    assert {r.keep for r in rows} == {True, False}


def test_q148_rendezvous_guarantee(spark):
    rows = q148_reshard_stability(spark, SF).collect()
    assert len(rows) == RDV_OLD_SHARDS
    total = sum(r.n_docs for r in rows)
    moved = sum(r.n_moved for r in rows)
    for r in rows:
        # THE property: every move lands in a brand-new shard
        assert r.n_moved == r.n_into_new, r
    # expected movement is NEW-OLD/NEW of the corpus; allow wide noise
    frac = moved / total
    expect = (RDV_NEW_SHARDS - RDV_OLD_SHARDS) / RDV_NEW_SHARDS
    assert 0.5 * expect < frac < 1.5 * expect, frac


def test_rendezvous_stability_under_growth(spark):
    """Documents that do NOT move keep their exact old shard — growing
    the ring never relabels survivors (modulo hashing fails this)."""
    df = spark.range(200).select(
        rendezvous_shard(F.col("id"), RDV_OLD_SHARDS).alias("old"),
        rendezvous_shard(F.col("id"), RDV_NEW_SHARDS).alias("new"),
    )
    for r in df.collect():
        assert r.new == r.old or r.new >= RDV_OLD_SHARDS
