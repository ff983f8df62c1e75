"""Containment dedup (q124) and the measured LSH recall S-curve (q125).

q124 pins the Broder-containment contract: a short article wrapped in
shared site chrome is caught by the containment rule even when its
resemblance (Jaccard) falls below q34's 0.5 threshold, and the shared
chrome shingles (df > JACCARD_MAX_DF) generate zero candidate fan-out.
q125 pins the recall MEASUREMENT: the capped LSH candidate stage must
catch essentially all planted near-identical twins (top decile) and
nearly none of the far pairs (bottom deciles) — the S-curve, measured
under the real hash and the live bucket cap rather than assumed.

Reference shape: ocr_service has no dedup tier; these guard the
100-TB dedup contracts of operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.dedup import (
    CONTAINMENT_MIN,
    JACCARD_MAX_DF,
    WRAP_MOD,
    WRAP_OFFSET,
    RECALL_OFFSET,
    q124_containment_pairs,
    q125_lsh_recall,
)

SF_DIR = "/root/testdata/sf0.001"


def test_q124_every_wrapper_is_caught_at_containment_one(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_wrapped = docs.filter(F.col("doc_id") % WRAP_MOD == 0).count()
    out = q124_containment_pairs(spark, SF_DIR)
    planted = out.filter(
        F.col("doc_outer") - F.col("doc_inner") == WRAP_OFFSET
    ).collect()
    # every planted (original, wrapper) pair surfaces, oriented with the
    # original as the inner (smaller shingle set) side
    assert len(planted) == n_wrapped
    assert all(r.containment >= 0.99 for r in planted)
    assert all(r.jaccard < 1.0 for r in planted)


def test_q124_containment_floor_and_orientation(spark):
    rows = q124_containment_pairs(spark, SF_DIR).collect()
    assert rows, "containment query returned nothing"
    for r in rows:
        assert r.containment >= CONTAINMENT_MIN
        assert r.jaccard <= r.containment  # |I|/|U| <= |I|/min(|A|,|B|)
        assert r.doc_inner != r.doc_outer


def test_q124_shared_chrome_generates_no_fanout(spark, tmp_path):
    # WRAP_MOD*(cap+1) docs that are pairwise UNRELATED except for the
    # planted chrome: the chrome shingles' doc frequency exceeds
    # JACCARD_MAX_DF, so the only pairs the index may emit are the
    # planted (original, wrapper) ones — chrome alone must never pair
    # two different articles.
    n = WRAP_MOD * (JACCARD_MAX_DF + 1)
    rows = [
        (i, " ".join(f"art{i}w{j}" for j in range(30))) for i in range(0, n)
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = q124_containment_pairs(spark, sf).collect()
    assert all(r.doc_outer - r.doc_inner == WRAP_OFFSET for r in out)
    assert len(out) == n // WRAP_MOD


def test_q125_s_curve_shape(spark):
    rows = {
        r.jaccard_decile: r for r in q125_lsh_recall(spark, SF_DIR).collect()
    }
    assert rows, "recall query returned nothing"
    top = max(rows)
    bottom = min(rows)
    assert top >= 8, "no near-identical planted twins measured"
    assert bottom <= 3, "no far planted twins measured"
    # near-identical pairs must essentially all be caught...
    assert rows[top].recall >= 0.9
    # ...and far pairs essentially never (LSH working as a filter)
    assert rows[bottom].recall <= 0.1
    for r in rows.values():
        assert 0.0 <= r.recall <= 1.0
        assert r.n_caught <= r.n_pairs


def test_q125_truth_pairs_cover_every_doc_with_shingles(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_shingled = docs.filter(
        F.size(F.split(F.trim("text"), r"\s+")) >= 3
    ).count()
    total_pairs = (
        q125_lsh_recall(spark, SF_DIR)
        .agg(F.sum("n_pairs").alias("n"))
        .collect()[0]
        .n
    )
    # every original with a non-empty shingle set contributes exactly
    # one planted pair (1:1 twin construction, RECALL_OFFSET apart)
    assert total_pairs == n_shingled
    assert RECALL_OFFSET > 1_000_000  # twin ids never collide with docs
