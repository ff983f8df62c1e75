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


def test_compact_preserves_hive_partitioning(spark, tmp_path):
    """Compacting a partitionBy(part_hash) results table must keep the
    partition layout — flattening it would break the resume path's
    dynamic partition overwrite and read_as_of's pruning."""
    import os

    from ocr_service_spark.plans.maintenance import compact_parquet

    path = str(tmp_path / "parted")
    df = spark.range(200).selectExpr("id", "cast(id % 4 as int) as part_hash")
    # many small files per partition
    df.repartition(10).write.partitionBy("part_hash").parquet(path)
    before, after = compact_parquet(spark, path, target_mb=256)
    assert after < before
    dirs = {d for d in os.listdir(path) if d.startswith("part_hash=")}
    assert dirs == {f"part_hash={i}" for i in range(4)}
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert set(back.columns) == {"id", "part_hash"}
    # dynamic partition overwrite still lands inside a partition dir
    (
        spark.range(5)
        .selectExpr("id + 1000 as id", "cast(0 as int) as part_hash")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part_hash")
        .parquet(path)
    )
    again = spark.read.parquet(path)
    assert again.filter("part_hash = 0").count() == 5
    assert again.filter("part_hash = 1").count() == 50


def test_interrupted_rollback_swap_is_recovered(spark, tmp_path):
    """A crash between rollback's two renames leaves a backup and NO
    manifest; the next manifest read must restore it instead of
    treating the store as fresh (silent full recompute)."""
    import os

    from ocr_service_spark.plans.manifest import completed_parts
    from ocr_service_spark.plans.snapshots import latest_commit

    manifest = str(tmp_path / "manifest")
    rows = spark.createDataFrame(
        [("snap", 3, 10, 0, [0] * 10, 2)],
        "input_snapshot_id string, part_hash int, doc_count long, "
        "empty_text_count long, conf_histogram array<long>, commit_seq long",
    )
    rows.write.parquet(manifest)
    # simulate the crash window: manifest renamed away, staging not yet in
    os.rename(manifest, manifest + "__prerollback")
    assert latest_commit(spark, manifest) == 2  # recovered, not 0
    done = completed_parts(spark, manifest, "snap")
    assert done is not None and done.count() == 1
    assert not os.path.isdir(manifest + "__prerollback")
