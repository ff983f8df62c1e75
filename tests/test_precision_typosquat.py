"""q156 (LSH precision audit) and q157 (typosquat pairs) semantic
pins.

q156: the decile table must be a valid distribution, confirmation must
align exactly with the verify threshold, and the planted twins must
put candidates on BOTH sides of it. q157: the drop-one-character
signature bound must catch deletions AND substitutions, never
distance-2 pairs, and orientation must follow doc counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.dedup import (
    MINHASH_VERIFY_MIN,
    q156_lsh_precision,
)
from ocr_service_spark.operators.weburl import _host_sigs, q157_typosquat_pairs

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_q156_distribution_contract(spark):
    # sf0.01: the larger corpus is what puts chance-band collisions
    # BELOW the verify cut (sf0.001's candidates all sit above it)
    rows = sorted(q156_lsh_precision(spark, SF01).collect(), key=lambda r: r.decile)
    assert rows
    total = sum(r.n_pairs for r in rows)
    cut = int(MINHASH_VERIFY_MIN * 10)
    for r in rows:
        want_conf = r.n_pairs if r.decile >= cut else 0
        assert r.n_confirmed == want_conf, r
        assert r.share_bp == r.n_pairs * 10000 // total
    # the twins spread candidates across the cut: some survive, some don't
    assert any(r.decile >= cut for r in rows)
    assert any(r.decile < cut for r in rows)
    precision = {r.stage_precision_bp for r in rows}
    assert len(precision) == 1
    confirmed = sum(r.n_confirmed for r in rows)
    assert precision.pop() == confirmed * 10000 // total


def _sigs(spark, host):
    df = spark.createDataFrame([(host,)], "host string").select(
        F.explode(_host_sigs(F.col("host"))).alias("sig")
    )
    return {r.sig for r in df.collect()}


def test_host_signature_neighborhood(spark):
    base = _sigs(spark, "brand.com")
    # deletion neighbor: the squat IS one of the brand's signatures
    assert "band.com" in base
    # substitution neighbor shares the drop-at-difference signature
    assert base & _sigs(spark, "brend.com")
    # distance-2 neighbor shares nothing
    assert not (base & _sigs(spark, "brxnd.cxm"))


def test_q157_pairs_verified_and_oriented(spark):
    rows = q157_typosquat_pairs(spark, SF).collect()
    assert rows
    import re

    for r in rows:
        assert r.distance == 1
        assert r.victim_docs >= r.squat_docs
        # whenever a true brand host is in the pair, it is the victim
        # (brands hold ~22x the docs of any squat); squat-vs-squat
        # pairs (e.g. brad3.com vs brad13.com) orient by count too
        if re.fullmatch(r"brand\d+\.com", r.squat_host):
            assert re.fullmatch(r"brand\d+\.com", r.victim_host), r
    # every planted squat host appears in at least one pair
    squats = {r.squat_host for r in rows} | {r.victim_host for r in rows}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()
    planted = {
        ("brand%d.com" % (d.doc_id % 20))[: d.doc_id % 5]
        + ("brand%d.com" % (d.doc_id % 20))[d.doc_id % 5 + 1 :]
        for d in docs
        if d.doc_id % 23 == 0
    }
    assert planted <= squats
