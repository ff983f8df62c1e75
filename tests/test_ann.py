"""ANN (banded SRP-LSH) semantics: q19's bucketed pairs must be a
SUBSET of the brute-force pairs (no false positives — every candidate
is re-scored with the exact cosine), with recall bounded below by the
banding math documented in operators/similarity.py."""

from __future__ import annotations

from ocr_service_spark.operators.similarity import (
    LSH_BANDS,
    LSH_ROWS,
    embedding_neardup_bruteforce,
    q19_embedding_neardup_pairs,
    q21_lsh_ann_buckets,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df) -> set[tuple]:
    return {(r.vec_a, r.vec_b, r.cosine) for r in df.collect()}


def test_q19_is_subset_of_bruteforce_with_recall(spark):
    lsh = _pairs(q19_embedding_neardup_pairs(spark, SF_DIR))
    exact = _pairs(embedding_neardup_bruteforce(spark, SF_DIR))
    assert lsh <= exact  # re-scoring candidates means zero false positives
    if exact:
        recall = len(lsh) / len(exact)
        # cos>=0.45 => p_agree ~ 0.648 => band hit p^rows, OR over bands;
        # on this adversarially-random corpus the expectation is ~0.79.
        # Require half of that to keep the test robust to tiny samples.
        assert recall >= 0.4, (len(lsh), len(exact))


def test_q21_bucket_structure(spark):
    rows = q21_lsh_ann_buckets(spark, SF_DIR).collect()
    bands = {r.band for r in rows}
    assert bands <= set(range(LSH_BANDS))
    assert all(0 <= r.bucket_key < (1 << LSH_ROWS) for r in rows)
    # every vector appears once per band
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    per_band: dict[int, int] = {}
    for r in rows:
        per_band[r.band] = per_band.get(r.band, 0) + r.n_vectors
    assert all(v == n_vecs for v in per_band.values()), per_band
