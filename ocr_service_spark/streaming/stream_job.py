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
        # collect across ALL Arrow chunks before sorting: sorting per
        # chunk would make which url gets first_seen depend on chunk
        # boundaries (maxRecordsPerBatch), not on the data
        urls: list = []
        for frame in frames:
            urls.extend(frame["url"])
        for url in sorted(urls):  # deterministic within a batch
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


SESSION_GAP_MIN = 30
_SESSION_OUTPUT = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint, closed_by_timeout boolean"
)
_SESSION_STATE = "start_us long, last_us long, n long"


def stream_user_sessions(events_stream: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """Custom stateful operator #2: streaming gap-based sessionization
    (the batch q06 semantics, continuously). State per user is one open
    session (start, last, count); events extend it or close it on a
    >SESSION_GAP_MIN gap, and an EVENT-TIME TIMEOUT closes idle
    sessions once the watermark passes last_event + gap — the part a
    stateless window cannot express. Emits one row per CLOSED session;
    the open session lives only in the state store. At 10^12 events the
    state is one small tuple per active user and the shuffle key is
    user_id — the same key the batch sessionizer shuffles on."""

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    gap_ms = SESSION_GAP_MIN * 60 * 1_000

    def sessions(key, frames, state) -> "pd.DataFrame":
        cols = [
            "user_id",
            "session_start_us",
            "session_end_us",
            "n_events",
            "closed_by_timeout",
        ]
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            return iter(
                [pd.DataFrame([(key[0], start_us, last_us, n, True)], columns=cols)]
            )

        ts_us: list[int] = []
        for frame in frames:
            # datetime64[ns] -> integer microseconds (same unit as the
            # batch sessionizer's timestampdiff)
            ts_us.extend(int(v) // 1_000 for v in frame["ts"].astype("int64"))
        ts_us.sort()

        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts_us:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((key[0], start_us, last_us, n, False))
                start_us, last_us, n = t, t, 1
            elif start_us - t > gap_us:
                # a straggler older than the open session by more than
                # the gap: it can no longer extend anything — emit it
                # as its own already-closed one-event session
                closed.append((key[0], t, t, 1, False))
            else:
                # late-but-in-gap events EXTEND the session backwards
                # too (batch q06 would report the earlier start)
                start_us = min(start_us, t)
                last_us, n = max(last_us, t), n + 1
        state.update((start_us, last_us, n))
        # wake up when the watermark passes the gap after the last event
        # (must be strictly beyond the current watermark)
        state.setTimeoutTimestamp(
            max(last_us // 1_000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        return iter([pd.DataFrame(closed, columns=cols)])

    from pyspark.sql import functions as F

    # Watermarks require TIMESTAMP (not NTZ). The NTZ->TIMESTAMP cast
    # interprets wall-clock in spark.sql.session.timeZone, and the
    # event-time timeout compares against the watermark derived from the
    # cast column — so UTC is a hard requirement, not a convention.
    # build_session pins it; enforce here for sessions built elsewhere
    # (runtime conf, safe to set before the stream starts).
    events_stream.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")

    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessions,
            outputStructType=_SESSION_OUTPUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
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
