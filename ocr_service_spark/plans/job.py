"""End-to-end extraction job: route -> extract -> union -> (manifest).

The physical plan, designed for a 1000-executor / 100 TB run and
exercised identically on local[N]:

1. **Scan** the pages table with column pruning (url + payload only
   reach the extraction stage; Catalyst prunes the rest).
2. **Route** declaratively: payloads that are big AND carry the PDF
   magic take the salted page-range path; everything else takes the
   single-pass path. The predicate is pure Column logic, evaluated
   JVM-side at the scan.
3. **Size-skew repartition**: the single-pass branch repartitions by a
   hash of (url) after filtering; Arrow batches are bounded so one
   task never holds too many big payloads (AQE handles residual skew).
4. **Salted branch**: page-count parse -> explode (url, page-bucket)
   -> per-bucket extraction -> ordered re-agg (array_sort concat) —
   the north rule's "salting on (url, page_range) with explode/re-agg
   ordered concat".
5. **Union** both branches (unionByName) into the results schema.

Checkpoint/lineage (resume_*) lives in plans/manifest.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_service_spark.operators.extract import (
    explode_pdf_buckets,
    extract_documents,
    extract_pdf_buckets,
    reassemble_pdf_results,
)

# Payloads above this byte size that sniff as PDF go to the salted path.
SALT_MIN_BYTES = 2 * 1024 * 1024
PDF_MAGIC = bytes(b"%PDF")


def is_big_pdf(payload_col: str = "html", salt_min_bytes: int = SALT_MIN_BYTES):
    """Declarative router predicate (JVM-side, pushable)."""
    col = F.col(payload_col)
    return (
        col.isNotNull()
        & (F.octet_length(col) > F.lit(salt_min_bytes))
        & (F.substring(col, 1, 4) == F.lit(PDF_MAGIC))
    )


def run_extraction(
    pages: DataFrame,
    payload_col: str = "html",
    salt_min_bytes: int = SALT_MIN_BYTES,
    bucket_pages: int = 16,
    repartition: int | None = None,
    repartition_by_size: bool = False,
    metrics=None,
    mode: str = "NO_OCR",
) -> DataFrame:
    """pages -> results DataFrame (operators.extract.RESULT_SCHEMA).

    ``repartition`` spreads the single-pass branch by url hash;
    ``repartition_by_size=True`` uses repartitionByRange on payload
    byte-size instead — range partitioning clusters similar-sized
    payloads, so the heavy tail lands in dedicated partitions that AQE
    can split instead of hiding one giant doc inside a random hash
    partition. Prefer it when the size distribution is long-tailed
    BELOW the salt threshold (above it the salted page-bucket path
    already dissolves the skew)."""
    if mode != "NO_OCR":
        # OCR tier: per-document engine recognition; the page-image
        # fan-out lives in operators/ocr.py for pre-rendered pages
        return extract_documents(pages, payload_col, metrics=metrics, mode=mode)

    big = is_big_pdf(payload_col, salt_min_bytes)

    normal = pages.filter(~F.coalesce(big, F.lit(False)))
    if repartition and repartition_by_size:
        normal = normal.repartitionByRange(
            repartition, F.octet_length(payload_col).asc_nulls_first(), F.col("url")
        )
    elif repartition:
        # spread payloads across tasks; size skew beyond this is AQE's job
        normal = normal.repartition(repartition, "url")
    normal_results = extract_documents(normal, payload_col, metrics=metrics)

    # Salted branch: big PDFs are rare by construction (the router
    # threshold keeps this to a sliver of documents), so collapse the
    # scan to a few tasks — per-task Python-worker overhead on dozens of
    # near-empty partitions otherwise dominates. The bucket explode then
    # re-spreads the real work across the cluster by (url, bucket).
    salted = pages.filter(F.coalesce(big, F.lit(False))).coalesce(4)
    buckets = explode_pdf_buckets(salted, payload_col, bucket_pages)
    if repartition:
        buckets = buckets.repartition(repartition, "url", "bucket")
    else:
        buckets = buckets.repartition("url", "bucket")  # AQE coalesces when tiny
    salted_results = reassemble_pdf_results(extract_pdf_buckets(buckets, bucket_pages))

    return normal_results.unionByName(salted_results)
