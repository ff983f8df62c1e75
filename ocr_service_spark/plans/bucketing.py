"""Bucketed result tables: co-located joins without a shuffle.

Downstream pipelines repeatedly join extraction results with other
per-url tables (media features, quality scores, dedup verdicts). At
100 TB each such join would shuffle terabytes; writing both sides
bucketed by ``url`` pre-partitions them identically, so Spark plans a
shuffle-free sort-merge join (no Exchange on either side — pinned by
``tests/test_plans.py::test_bucketed_join_has_no_exchange``).

Parquet ``bucketBy`` needs a table catalog (saveAsTable); the default
session catalog/warehouse works locally, a Hive/Iceberg catalog at
scale (Iceberg's equivalent is a bucket partition transform:
``bucket(N, url)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    key: str = "url",
    sort: bool = True,
) -> None:
    # a crashed previous run (or a prior session's in-memory catalog)
    # can leave the managed location behind with no catalog entry;
    # clear both so overwrite is truly idempotent
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    jvm = spark._jvm
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    # managed location: <warehouse>/<db>.db/<table> for a qualified
    # name — 'analytics.results' does NOT live at <warehouse>/
    # analytics.results, and checking the wrong path would leave the
    # real orphan in place (saveAsTable then fails on non-empty dir)
    if "." in table:
        db, tbl = table.lower().rsplit(".", 1)
        rel = f"{db}.db/{tbl}"
    else:
        rel = table.lower()
    location = jvm.org.apache.hadoop.fs.Path(warehouse, rel)
    fs = location.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(location):
        fs.delete(location, True)
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "url"
) -> DataFrame:
    """Join two identically-bucketed tables; with matching bucket specs
    Spark elides both Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), key)
