"""q127 (rel=canonical clusters) and q128 (Unicode hygiene) semantics.

q127's extractor dialect is pinned in test_links.py; here the CLUSTER
semantics are pinned: every group of three same-host pages collapses to
one canonical key, the base member is the only self-canonical, and
relative/absolute declarations land on the identical key. q128 pins the
security-cleaning contract per planted class: zero-width counts equal
the blanks they shadow, bidi wrapping flips exactly one flag, the spoof
token is counted once, and the scrub is a provable no-op on clean text
(control docs hash to their original text).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.functions.hashing import h32
from ocr_service_spark.operators.text_stats import q128_unicode_hygiene
from ocr_service_spark.operators.weburl import q127_canonical_clusters

SF_DIR = "/root/testdata/sf0.001"


def test_q127_cluster_semantics(spark):
    rows = q127_canonical_clusters(spark, SF_DIR).collect()
    by_id = {r.doc_id: r for r in rows}
    n_docs = len(rows)
    for r in rows:
        base = r.doc_id - r.doc_id % 3
        assert r.canonical_key.endswith(f"/p/{base}")
        assert r.is_self == (r.doc_id % 3 == 0)
        # full clusters have 3 members; only the trailing cluster at the
        # corpus edge may be partial
        expected = min(3, n_docs - base)
        assert r.cluster_size == expected
    # relative (%3==2) and absolute (%3==1) declarations resolve to the
    # SAME key as the base member's self-canonical
    keys = {d: r.canonical_key for d, r in by_id.items()}
    for d in by_id:
        assert keys[d] == keys[d - d % 3]


def test_q128_per_class_contracts(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = {
        r.doc_id: (r.n_spaces, r.h, r.ln)
        for r in docs.select(
            "doc_id",
            (
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
            ).alias("n_spaces"),
            h32(F.col("text")).alias("h"),
            F.length("text").alias("ln"),
        ).collect()
    }
    for r in q128_unicode_hygiene(spark, SF_DIR).collect():
        n_spaces, clean_h, ln = expected[r.doc_id]
        cls = r.doc_id % 4
        assert r.has_bidi == (cls == 2)
        assert r.n_zero_width == (n_spaces if cls == 1 else 0)
        assert r.n_mixed_tokens == (1 if cls == 3 else 0)
        if cls == 3:
            # nothing stripped: cleaned = text + the spoof token
            assert r.clean_len == ln + 7
        else:
            # scrub restores the original text exactly (fixpoint on
            # clean input, inverse of the planting on hostile input)
            assert (r.clean_len, r.clean_h) == (ln, clean_h)
