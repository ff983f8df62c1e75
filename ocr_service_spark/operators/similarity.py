"""Similarity search over the embeddings table.

- ``q20_cosine_topk`` — brute-force cosine top-k against a query
  vector (the baseline; DuckDB-oracled). The query vector is the
  embedding of vec_id 0, broadcast to every partition; arithmetic is
  all-double, sequential-order fold, so both engines produce identical
  bits before rounding.
- ``q21_lsh_ann_buckets`` — the scale path: random-hyperplane signs
  (hyperplanes derived deterministically from md5, so no stored model)
  bucket vectors; candidates share a bucket. Spark-side rows-only
  (16 deterministic hyperplane components per dim make the oracle SQL
  disproportionate).

At 100 TB the brute-force path is a broadcast-join + per-row fold
(no shuffle); the LSH path turns top-k into a bucket-local problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_service_spark.functions.hashing import h32

TOPK = 10
QUERY_VEC_ID = 0
N_PLANES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def q20_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn("vec", F.col("embedding").cast("array<double>"))
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("vec").alias("qvec"))
    joined = emb.filter(F.col("vec_id") != QUERY_VEC_ID).crossJoin(F.broadcast(query))
    cos = _dot(F.col("vec"), F.col("qvec")) / (
        F.sqrt(_dot(F.col("vec"), F.col("vec"))) * F.sqrt(_dot(F.col("qvec"), F.col("qvec")))
    )
    from pyspark.sql import Window

    scored = joined.select("vec_id", "label", F.round(cos, 6).alias("cosine"))
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(
        F.col("rank") <= TOPK
    )


NEARDUP_MIN_COS = 0.45  # corpus has no true dups; keeps output non-trivial


def q19_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup candidate pairs (brute-force baseline;
    the LSH buckets in q21 are the 100 TB candidate-generation path).
    The filter applies to the ROUNDED cosine so both engines cut on
    identical values."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return (
        pairs.select("vec_a", "vec_b", F.round(cos, 4).alias("cosine"))
        .filter(F.col("cosine") >= NEARDUP_MIN_COS)
    )


def q21_lsh_ann_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH: hyperplane component (p, dim) is a
    deterministic pseudo-random value in [-1, 1) derived from md5 —
    reproducible on any engine/cluster without a stored model."""
    emb = _emb(spark, sf_dir).withColumn("vec", F.col("embedding").cast("array<double>"))

    def plane_component(p: int, i):
        # h32 in [0, 2^32) -> [-1, 1)
        return (
            h32(F.concat(F.lit(f"plane{p}|"), i.cast("string"))) / F.lit(2147483648.0)
        ) - F.lit(1.0)

    bits = []
    for p in range(N_PLANES):
        proj = F.aggregate(
            F.zip_with(
                F.col("vec"),
                F.transform(F.sequence(F.lit(0), F.size("vec") - 1), lambda i: plane_component(p, i)),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return (
        emb.select("vec_id", "label", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("label").alias("n_labels"),
            F.min("vec_id").alias("min_vec_id"),
        )
    )


ORACLES: dict[str, str] = {
    "q19_embedding_neardup_pairs": f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(
                 list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
               4) AS cosine
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE round(
                 list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
              4) >= {NEARDUP_MIN_COS}
    """,
    "q20_cosine_topk": f"""
        WITH q AS (
            SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
            FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
        ),
        scored AS (
            SELECT vec_id, label,
                   round(
                     list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qvec)
                     / (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                              list_transform(embedding, x -> CAST(x AS DOUBLE))))
                        * sqrt(list_dot_product(qvec, qvec))),
                   6) AS cosine
            FROM embeddings, q WHERE vec_id != {QUERY_VEC_ID}
        )
        SELECT vec_id, label, cosine,
               row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank
        FROM scored QUALIFY rank <= {TOPK}
    """,
}

QUERIES = {
    "q19_embedding_neardup_pairs": q19_embedding_neardup_pairs,
    "q20_cosine_topk": q20_cosine_topk,
    "q21_lsh_ann_buckets": q21_lsh_ann_buckets,  # rows-only (no oracle)
}
