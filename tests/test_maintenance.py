"""Output compaction: row-exact rewrite into fewer, larger files."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ocr_service_spark.plans.maintenance import compact_parquet


def test_compact_parquet_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "results")
    # 64 tiny files (the post-ingest small-file shape)
    spark.range(20_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("h")
    ).repartition(64).write.parquet(path)

    before_hash = duckdb.sql(
        f"SELECT count(*), sum(id), md5(string_agg(h, '' ORDER BY id)) FROM '{path}/*.parquet'"
    ).fetchone()

    n_before, n_after = compact_parquet(spark, path, target_mb=1)
    assert n_before == 64
    assert n_after < n_before

    after_hash = duckdb.sql(
        f"SELECT count(*), sum(id), md5(string_agg(h, '' ORDER BY id)) FROM '{path}/*.parquet'"
    ).fetchone()
    assert after_hash == before_hash  # content byte-identical, layout only

    # already-compact tables are left untouched
    again = compact_parquet(spark, path, target_mb=1)
    assert again == (n_after, n_after)
