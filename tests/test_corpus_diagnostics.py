"""q142 (serving-state classification) and q143 (vocabulary growth)
semantic pins.

Oracles prove cross-engine equality; these pin the MEANING — the
precedence order when a page matches several junk classes, marker
case-insensitivity, and the Heaps-curve invariants (monotone
cumulative counts, types <= tokens, full accounting).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.quality import (
    LOGIN_MARKERS,
    PARKED_MARKERS,
    SOFT404_MARKERS,
    _any_marker,
    q142_serving_state,
)
from ocr_service_spark.operators.text_stats import (
    TOKEN_RE,
    VOCAB_SHARDS,
    q143_vocab_growth,
)

SF = "/root/testdata/sf0.001"


def test_q142_all_verdicts_and_counts(spark):
    rows = q142_serving_state(spark, SF).collect()
    by_verdict = {}
    for r in rows:
        by_verdict.setdefault(r.verdict, []).append(r)
    assert set(by_verdict) == {"ok", "soft404", "parked", "login_wall"}
    # flags agree with the verdict under the pinned precedence
    for r in rows:
        if r.is_soft404:
            assert r.verdict == "soft404"
        elif r.is_parked:
            assert r.verdict == "parked"
        elif r.is_login_wall:
            assert r.verdict == "login_wall"
        else:
            assert r.verdict == "ok"


def test_q142_precedence_and_case_folding(spark):
    # a page matching ALL three classes must classify soft404; markers
    # match case-insensitively (the page is lowered first)
    df = spark.createDataFrame(
        [("PAGE NOT FOUND. This DOMAIN IS FOR SALE. Sign In To View it.",)],
        "page string",
    ).select(F.lower("page").alias("page"))
    row = df.select(
        _any_marker(F.col("page"), SOFT404_MARKERS).alias("s"),
        _any_marker(F.col("page"), PARKED_MARKERS).alias("p"),
        _any_marker(F.col("page"), LOGIN_MARKERS).alias("l"),
    ).collect()[0]
    assert row.s and row.p and row.l


def test_q143_heaps_invariants(spark):
    rows = sorted(q143_vocab_growth(spark, SF).collect(), key=lambda r: r.shard)
    assert [r.shard for r in rows] == list(range(VOCAB_SHARDS))
    # cumulative columns are running sums of the per-shard columns
    ct = cy = 0
    for r in rows:
        ct += r.n_tokens
        cy += r.n_new_types
        assert r.cum_tokens == ct and r.cum_types == cy
        assert r.n_new_types <= r.n_tokens
    # full accounting: totals match direct counts over the same stream
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.trim("text"), TOKEN_RE)).alias("tok"))
    assert rows[-1].cum_tokens == toks.count()
    assert rows[-1].cum_types == toks.distinct().count()
    # a growth curve: every shard contributes tokens, shard 0 the most
    # new types (first-seen bias)
    assert all(r.n_tokens > 0 for r in rows)
    assert rows[0].n_new_types == max(r.n_new_types for r in rows)
