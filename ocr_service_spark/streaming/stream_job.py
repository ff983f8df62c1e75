"""Structured Streaming variant of the extraction job.

The reference is a request/response service; its streaming analogue is
a continuously-landing pages table (e.g. crawler output dropping
parquet files). ``readStream`` over the directory -> the same
mapInPandas extraction operator -> ``writeStream`` with checkpointing
gives exactly-once file-to-file semantics; Spark's checkpoint replaces
the manifest table on this path (the batch manifest remains the
resume mechanism for bounded backfills).

The salted big-PDF branch is a batch-only optimization (its groupBy
re-agg would need watermark plumbing that buys nothing here): payloads
above the salt threshold are rare and a streaming micro-batch can
afford a straggler task, so the stream routes everything single-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ocr_service_spark.operators.extract import extract_documents
from ocr_service_spark.sources.pages import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def start_extraction_stream(
    spark: SparkSession,
    pages_path: str,
    results_path: str,
    checkpoint_path: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Continuous extraction: new pages files -> results parquet.

    ``available_now=True`` drains the current backlog and stops —
    the bounded-backfill mode used by tests and reprocessing jobs.
    """
    pages = read_pages_stream(spark, pages_path)
    results = extract_documents(pages)
    writer = (
        results.writeStream.format("parquet")
        .option("path", results_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
