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


def test_kmeans_partitions_all_vectors(spark):
    """q55 invariants: every vector lands in exactly one cluster, at
    most KM_K clusters exist, and no cluster is empty on this corpus."""
    from ocr_service_spark.operators.similarity import KM_K, q55_kmeans_clusters

    rows = q55_kmeans_clusters(spark, "/root/testdata/sf0.001").collect()
    n_total = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert sum(r["n_members"] for r in rows) == n_total
    assert len(rows) <= KM_K
    assert all(r["n_members"] > 0 for r in rows)


def test_kmeans_iteration_does_not_increase_inertia(spark):
    """One Lloyd iteration must not increase total within-cluster
    distance (the monotone-descent property of k-means)."""
    from pyspark.sql import functions as F

    from ocr_service_spark.operators.similarity import (
        KM_K,
        _km_assign,
        _km_codes,
        _km_update,
    )

    codes = _km_codes(spark, "/root/testdata/sf0.001")
    cent0 = [
        [int(v) for v in r["c"]]
        for r in codes.filter(F.col("vec_id") < KM_K).orderBy("vec_id").collect()
    ]

    def inertia(cent):
        a = _km_assign(codes, cent)
        structs = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            "c",
                            F.array(*[F.lit(int(v)) for v in comp]),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    F.lit(cid).alias("cid"),
                )
                for cid, comp in enumerate(cent)
            ]
        )
        return (
            a.withColumn("best", F.array_min(structs)["d"])
            .agg(F.sum("best"))
            .collect()[0][0]
        )

    i0 = inertia(cent0)
    cent1 = _km_update(_km_assign(codes, cent0), cent0)
    i1 = inertia(cent1)
    # q55 uses floor(sum/count) integer centroids, not the exact mean.
    # Writing centroid = mean + e with e in [0,1) per component, the
    # cross term sums to zero at the exact mean, so the floored
    # centroid's inertia exceeds the exact-mean inertia by at most
    # sum(e^2) <= n_vectors * dim — monotone descent holds up to
    # exactly that slack.
    n_vectors = codes.count()
    dim = len(cent0[0])
    assert i1 <= i0 + n_vectors * dim


def test_semdedup_matches_bruteforce_within_cells(spark):
    """q85 semantics against an independent reimplementation: assign
    cells with the same deterministic centroids, score every
    within-cell pair exactly (numpy), and replay the drop rule —
    dropped iff some lower-vec_id cellmate has rounded cosine >=
    SEMDEDUP_MIN_COS, keeper = the smallest such id. The keep set and
    every keeper election must match."""
    import numpy as np

    from ocr_service_spark.operators.similarity import (
        EMB_DIM,
        IVF_CELLS,
        SEMDEDUP_MIN_COS,
        _centroid_norm,
        _centroid_weight,
        q85_semdedup,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    cents = np.array(
        [
            [_centroid_weight(c, i) for i in range(EMB_DIM)]
            for c in range(IVF_CELLS)
        ]
    )
    norms = np.array([_centroid_norm(c) for c in range(IVF_CELLS)])

    cells: dict[int, list[int]] = {}
    for vid, v in vecs.items():
        scores = cents @ v / norms
        cells.setdefault(int(np.argmax(scores)) + 1, []).append(vid)

    expected: dict[int, tuple[int, float]] = {}
    for cell, ids in cells.items():
        for b in ids:
            best = None
            for a in ids:
                if a >= b:
                    continue
                cos = float(
                    vecs[a] @ vecs[b]
                    / (np.sqrt(vecs[a] @ vecs[a]) * np.sqrt(vecs[b] @ vecs[b]))
                )
                if round(cos, 6) >= SEMDEDUP_MIN_COS:
                    if best is None or a < best[0]:
                        best = (a, cell)
            if best is not None:
                expected[b] = best

    got = {
        r.vec_id: (r.keeper, r.cell)
        for r in q85_semdedup(spark, SF_DIR).collect()
    }
    assert got == expected
    assert expected, "corpus must produce a non-trivial drop set"


def test_semdedup_plan_is_cell_bounded(spark):
    """The within-cell pair generator must stay bounded by the cell
    grouping — one hash exchange on cell feeding the Arrow group stage
    (round-6 shape: the per-cell scorer runs in applyInPandas, so the
    assign subtree is planned ONCE instead of once per join side) —
    never a cartesian/nested-loop pass over all vector pairs."""
    import re

    from ocr_service_spark.operators.similarity import q85_semdedup

    df = q85_semdedup(spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "hashpartitioning(cell" in plan, plan
    # the assign subtree is shared: exactly one embeddings scan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_pq_codes_pack_and_reconstruction(spark):
    """q91 invariants: packed code stays within PQ_M*4 bits, every
    vector gets a code, and each training vector (vec_id < PQ_K)
    reconstructs its OWN subvectors exactly in every subspace where it
    is the unique nearest entry — in particular its reconstruction
    error can never exceed any other codebook assignment's."""
    from ocr_service_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        q91_pq_codes,
    )

    rows = {r.vec_id: r for r in q91_pq_codes(spark, SF_DIR).collect()}
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(rows) == n
    assert all(0 <= r.pq_code < PQ_K**PQ_M for r in rows.values())
    assert all(r.recon_sqdist >= 0 for r in rows.values())
    # a training vector IS a codebook entry in every subspace: its
    # nearest entry has distance 0, so its reconstruction is exact
    for vid in range(PQ_K):
        assert rows[vid].recon_sqdist == 0, (vid, rows[vid])


def test_pq_adc_approximates_exact_int_distances(spark):
    """q92 sanity: ADC top-k must overlap the EXACT integer-L2 top-k
    (computed brute-force on the same int codes) — PQ is lossy, but on
    64 dims with 16 entries/subspace the overlap should be substantial."""
    from ocr_service_spark.operators.similarity import (
        QUERY_VEC_ID,
        TOPK,
        _km_codes,
        q92_pq_adc_topk,
    )

    adc = [r.vec_id for r in q92_pq_adc_topk(spark, SF_DIR).collect()]
    assert len(adc) == TOPK
    codes = {r.vec_id: list(r.c) for r in _km_codes(spark, SF_DIR).collect()}
    q = codes[QUERY_VEC_ID]
    exact = sorted(
        (sum((a - b) ** 2 for a, b in zip(v, q)), vid)
        for vid, v in codes.items()
        if vid != QUERY_VEC_ID
    )[:TOPK]
    exact_ids = {vid for _, vid in exact}
    overlap = len(exact_ids & set(adc)) / TOPK
    assert overlap >= 0.3, (sorted(adc), sorted(exact_ids))
