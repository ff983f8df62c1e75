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


def windowed_ingest_stats(pages_stream: DataFrame, window: str = "1 hour") -> DataFrame:
    """Watermarked windowed aggregation over the crawl feed: documents
    and payload bytes per (event-time window, lang). Late pages beyond
    the watermark are dropped — the standard late-data policy for a
    continuously-landing crawl."""
    from pyspark.sql import functions as F

    return (
        pages_stream.withWatermark("warc_ts", "2 hours")
        .groupBy(F.window("warc_ts", window), F.col("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length("html")).alias("bytes_in"),
        )
    )


_DEDUP_OUTPUT = "content_hash string, url string, first_seen boolean"
_DEDUP_STATE = "seen int"


def stream_dedup_first_seen(pages_stream: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): exact
    streaming dedup keyed by payload hash — the first document with a
    given content hash passes, later copies are flagged. State is one
    int per distinct hash; at 10^12 docs shard the key space by adding
    a hash prefix to the grouping key if a single key's state store
    partition grows hot."""

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    def dedup(key, frames, state) -> "pd.DataFrame":
        first_rows = []
        seen = state.get[0] if state.exists else 0
        for frame in frames:
            for url in sorted(frame["url"]):  # deterministic within a batch
                first_rows.append((key[0], url, seen == 0))
                seen += 1
        state.update((seen,))
        return iter([pd.DataFrame(first_rows, columns=["content_hash", "url", "first_seen"])])

    hashed = pages_stream.filter(F.col("html").isNotNull()).select(
        F.md5(F.col("html")).alias("content_hash"), "url"
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        dedup,
        outputStructType=_DEDUP_OUTPUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
