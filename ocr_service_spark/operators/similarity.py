"""Similarity search over the embeddings table.

- ``q20_cosine_topk`` — brute-force cosine top-k against a query
  vector (the baseline; DuckDB-oracled). The query vector is the
  embedding of vec_id 0, broadcast to every partition; the top-k is a
  global ``orderBy().limit(k)`` so Spark plans TakeOrderedAndProject
  (per-partition heap + driver merge) instead of a single-partition
  window sort over all scored rows.
- ``q21_lsh_ann_buckets`` — banded sign-random-projection LSH
  buckets (the ANN index). Hyperplane component (p, dim) is a
  deterministic pseudo-random value in [-1, 1) derived from md5, so
  there is no stored model and the DuckDB oracle reproduces every
  bucket bit-for-bit.
- ``q19_embedding_neardup_pairs`` — embedding near-dup pairs at
  scale: candidates are generated WITHIN the LSH buckets (posting-list
  pair explode, never an all-pairs self-join) and only candidates are
  scored. Recall vs brute force is a tunable of (bands, rows): with
  8 bands x 4 planes and a genuinely-random corpus at cos >= 0.45 it
  is ~0.8; on real near-dup corpora (cos >= 0.9, p_agree ~ 0.86) the
  same shape reaches ~0.99+ while pruning quadratically more. The
  brute-force scorer is kept as :func:`embedding_neardup_bruteforce`
  for small-n verification only (tests assert the LSH output is a
  subset of it and measure recall).

At 100 TB: q20 is broadcast-join + per-row fold + TakeOrdered (no
shuffle); q19/q21 shuffle on (band, bucket_key) — bounded groups —
then one join back to vectors for candidate scoring.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOPK = 10
QUERY_VEC_ID = 0

EMB_DIM = 64
LSH_BANDS = 8
LSH_ROWS = 4  # planes per band; planes are indexed band*LSH_ROWS + j
NEARDUP_MIN_COS = 0.45  # corpus has no true dups; keeps output non-trivial


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


# -- deterministic hyperplanes ------------------------------------------------
def _plane_weight(p: int, i: int) -> float:
    """Hyperplane component (plane p, dim i) in [-1, 1): the md5-derived
    32-bit hash (identical to functions.hashing.h32) scaled. Computed
    driver-side once and shipped as a literal array — the per-row work
    is then a pure JVM fold, no hashing in the hot path."""
    h = int(hashlib.md5(f"plane{p}|{i}".encode()).hexdigest()[:8], 16)
    return h / 2147483648.0 - 1.0


def _plane_weights_lit(p: int):
    return F.array(*[F.lit(_plane_weight(p, i)) for i in range(EMB_DIM)])


def _band_key(vec, band: int):
    """Integer bucket key for one band: LSH_ROWS sign bits packed."""
    key = None
    for j in range(LSH_ROWS):
        p = band * LSH_ROWS + j
        bit = F.when(_dot(vec, _plane_weights_lit(p)) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        key = bit if key is None else key + bit
    return key


def _with_band_keys(emb: DataFrame) -> DataFrame:
    vec = F.col("embedding").cast("array<double>")
    cols = [F.col(c) for c in emb.columns]
    return emb.select(*cols, *[_band_key(vec, b).alias(f"k{b}") for b in range(LSH_BANDS)])


def _stacked_keys(emb: DataFrame) -> DataFrame:
    """(vec_id, label?, band, bucket_key) — one row per vector per band."""
    keyed = _with_band_keys(emb)
    pairs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), F.col(f"k{b}").alias("bucket_key"))
            for b in range(LSH_BANDS)
        ]
    )
    keep = [c for c in ("vec_id", "label") if c in emb.columns]
    return keyed.select(*keep, F.explode(pairs).alias("bk")).select(
        *keep, F.col("bk.band").alias("band"), F.col("bk.bucket_key").alias("bucket_key")
    )


# -- q20: brute-force cosine top-k --------------------------------------------
def q20_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn("vec", F.col("embedding").cast("array<double>"))
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("vec").alias("qvec"))
    joined = emb.filter(F.col("vec_id") != QUERY_VEC_ID).crossJoin(F.broadcast(query))
    cos = _dot(F.col("vec"), F.col("qvec")) / (
        F.sqrt(_dot(F.col("vec"), F.col("vec"))) * F.sqrt(_dot(F.col("qvec"), F.col("qvec")))
    )
    scored = joined.select("vec_id", "label", F.round(cos, 6).alias("cosine"))
    # TakeOrderedAndProject (per-partition top-k heap + driver merge),
    # NOT a global single-partition window over all scored rows; the
    # window below ranks only the k surviving rows.
    top = scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(TOPK)
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


# -- q21: LSH bucket index ------------------------------------------------------
def q21_lsh_ann_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SRP-LSH bucket stats: one row per (band, bucket_key)."""
    stacked = _stacked_keys(_emb(spark, sf_dir))
    return stacked.groupBy("band", "bucket_key").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.countDistinct("label").alias("n_labels"),
        F.min("vec_id").alias("min_vec_id"),
    )


# -- q19: bucketed near-dup pairs ------------------------------------------------
def q19_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH candidates: vectors
    sharing any band bucket are candidates (posting-list pair explode,
    same shape as dedup.q14 — never an n^2 self-join); only candidates
    are scored, and the filter applies to the ROUNDED cosine so both
    engines cut on identical values."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    stacked = _stacked_keys(emb.select("vec_id", F.col("vec").alias("embedding")))
    posting = (
        stacked.groupBy("band", "bucket_key")
        .agg(F.array_sort(F.collect_list("vec_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda a, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda b: F.struct(a.alias("vec_a"), b.alias("vec_b")),
            ),
        )
    )
    cand = (
        posting.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.vec_a").alias("vec_a"), F.col("p.vec_b").alias("vec_b"))
        .distinct()
    )
    # norms are per-VECTOR, not per-pair: precompute once on each join
    # side (same IEEE ops as the oracle's sqrt(dot(e,e)), evaluated once
    # instead of per candidate — ~3x less fold work in the scorer)
    normed = emb.select(
        "vec_id", "vec", F.sqrt(_dot(F.col("vec"), F.col("vec"))).alias("norm")
    )
    a = normed.select(
        F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    b = normed.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"), F.col("norm").alias("nb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", F.round(cos, 4).alias("cosine"))
        .filter(F.col("cosine") >= NEARDUP_MIN_COS)
        .select("vec_a", "vec_b", "cosine")
    )


def embedding_neardup_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs scorer — small-n VERIFICATION BASELINE ONLY (O(n^2);
    tests use it to measure q19's LSH recall). Never the scale path."""
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


# -- DuckDB oracle twins ---------------------------------------------------------
def _w_sql(p: int) -> str:
    """DuckDB twin of _plane_weights_lit(p): same md5-derived doubles."""
    return (
        f"list_transform(range(0, {EMB_DIM}), i -> "
        f"CAST(('0x' || substr(md5('plane{p}|' || i), 1, 8)) AS BIGINT)"
        f" / 2147483648.0 - 1.0)"
    )


def _band_key_sql(band: int, e: str = "e") -> str:
    bits = []
    for j in range(LSH_ROWS):
        p = band * LSH_ROWS + j
        bits.append(
            f"CASE WHEN list_dot_product({e}, {_w_sql(p)}) >= 0 THEN {1 << j} ELSE 0 END"
        )
    return "(" + " + ".join(bits) + ")"


def _keys_cte(with_label: bool) -> str:
    label = ", label" if with_label else ""
    arms = "\n            UNION ALL ".join(
        f"SELECT vec_id{label}, {b} AS band, {_band_key_sql(b)} AS bucket_key FROM v"
        for b in range(LSH_BANDS)
    )
    return f"""
        v AS (
            SELECT vec_id{label},
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        keys AS (
            {arms}
        )
    """


_COS_SQL = (
    "list_dot_product(a.e, b.e)"
    " / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))"
)

ORACLES: dict[str, str] = {
    "q19_embedding_neardup_pairs": f"""
        WITH {_keys_cte(with_label=False)},
        cand AS (
            SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
            FROM keys x JOIN keys y
              ON x.band = y.band AND x.bucket_key = y.bucket_key
             AND x.vec_id < y.vec_id
        )
        SELECT vec_a, vec_b, round({_COS_SQL}, 4) AS cosine
        FROM cand
        JOIN v a ON a.vec_id = vec_a
        JOIN v b ON b.vec_id = vec_b
        WHERE round({_COS_SQL}, 4) >= {NEARDUP_MIN_COS}
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
    "q21_lsh_ann_buckets": f"""
        WITH {_keys_cte(with_label=True)}
        SELECT band, bucket_key,
               count(*) AS n_vectors,
               count(DISTINCT label) AS n_labels,
               min(vec_id) AS min_vec_id
        FROM keys GROUP BY 1, 2
    """,
}

QUERIES = {
    "q19_embedding_neardup_pairs": q19_embedding_neardup_pairs,
    "q20_cosine_topk": q20_cosine_topk,
    "q21_lsh_ann_buckets": q21_lsh_ann_buckets,
}
