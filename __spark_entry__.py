"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship extraction run on sf0.001.
``queries``    — one entry per implemented operator (SURVEY.md §2 plus
                 the training-data operators: dedup, text analytics,
                 similarity search, extraction roundtrips).
``oracle_sql`` — DuckDB-equivalent SQL for every query except
                 x43 (OCR tier: engine output is environment-dependent
                 by design, rows-only). Extraction queries whose
                 semantics aren't SQL-expressible (x40-x42) are checked
                 against committed, reviewed expected tables instead.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ocr_service_spark.operators import (  # noqa: E402
    corpus,
    dedup,
    main_content,
    relational,
    roundtrip,
    similarity,
    temporal,
    text_stats,
)


def _ship_package(spark: SparkSession) -> None:
    """Executor Python workers need the package regardless of how the
    driver created its SparkSession (the driver may not have used our
    session builder)."""
    from ocr_service_spark.plans.session import _package_zip

    try:
        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already added in this session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full extraction job (router + salted PDF path +
    single-pass path) over a pages table derived from sf0.001 documents
    wrapped per-row into html/rtf/xml payloads."""
    _ship_package(spark)
    from ocr_service_spark.plans.job import run_extraction

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fmt_html = "<!DOCTYPE html>\n<html><head><title>t</title></head><body><p>%s</p></body></html>"
    fmt_rtf = "{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Arial;}}%s\\par}"
    fmt_xml = '<?xml version="1.0"?><doc kind="synthetic">%s</doc>'
    payload = (
        F.when(F.col("doc_id") % 3 == 0, F.format_string(fmt_html, F.col("text")))
        .when(F.col("doc_id") % 3 == 1, F.format_string(fmt_rtf, F.col("text")))
        .otherwise(F.format_string(fmt_xml, F.col("text")))
    )
    ext = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("html"))
        .when(F.col("doc_id") % 3 == 1, F.lit("rtf"))
        .otherwise(F.lit("xml"))
    )
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string"), F.lit("."), ext).alias("url"),
        F.encode(payload, "utf-8").alias("html"),
    )
    return run_extraction(pages)


def _x40_extract_fixtures(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ship_package(spark)
    from ocr_service_spark.plans.job import run_extraction
    from ocr_service_spark.sources.pages import load_fixture_pages

    res = run_extraction(load_fixture_pages(spark), salt_min_bytes=100_000)
    return res.select(
        "url", "doc_class", "content_type", "pages", "success", "ocr_skipped",
        "fallback_reason", "extracted_text",
    )


def _x41_extract_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ship_package(spark)
    from ocr_service_spark.plans.job import run_extraction
    from ocr_service_spark.sources.pages import generate_pages

    res = run_extraction(generate_pages(spark, 500, seed=42))
    return (
        res.groupBy("doc_class")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("success"), 1).otherwise(0)).alias("n_success"),
            F.sum(F.length(F.coalesce("extracted_text", F.lit("")))).alias("total_chars"),
        )
    )


def _x43_ocr_mode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCR-tier smoke: the same fixture corpus through OPERATION_MODE=OCR
    (engine recognition for images, fallback cascade for text formats);
    rows-only — engine output is environment-dependent by design."""
    _ship_package(spark)
    from ocr_service_spark.plans.job import run_extraction
    from ocr_service_spark.sources.pages import load_fixture_pages

    res = run_extraction(load_fixture_pages(spark), mode="OCR")
    return res.groupBy("doc_class").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("success"), 1).otherwise(0)).alias("n_success"),
        F.sum(F.when(F.col("confidence").isNotNull(), 1).otherwise(0)).alias("n_with_confidence"),
    )


def _x42_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ship_package(spark)
    from ocr_service_spark.operators.multimodal import extract_media_features
    from ocr_service_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 300, seed=42).filter(F.col("html").isNotNull())
    feats = extract_media_features(pages)
    return feats.select("url", "media_type", "width", "height", "n_frames", "feature_hash")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(temporal.QUERIES)
    out.update(text_stats.QUERIES)
    out.update(corpus.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)

    def _wrap(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return wrapped

    for name, fn in roundtrip.QUERIES.items():
        out[name] = _wrap(fn)
    for name, fn in main_content.QUERIES.items():
        out[name] = _wrap(fn)
    out["x40_extract_fixtures"] = _x40_extract_fixtures
    out["x41_extract_synthetic"] = _x41_extract_synthetic
    out["x42_media_features"] = _x42_media_features
    out["x43_ocr_mode_stats"] = _x43_ocr_mode_stats
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(temporal.ORACLES)
    out.update(text_stats.ORACLES)
    out.update(corpus.ORACLES)
    out.update(dedup.ORACLES)
    out.update(similarity.ORACLES)
    out.update(roundtrip.ORACLES)
    out.update(main_content.ORACLES)
    # x40/x41/x42 are deterministic end-to-end (NO_OCR tier, seeded
    # corpora, deterministic fake media decoder); their expected outputs
    # are committed, reviewed golden tables (tools/gen_expected.py) the
    # oracle reads back. x43 stays rows-only BY DESIGN (OCR-tier output
    # depends on which engine binary the environment provides).
    golden = Path(__file__).resolve().parent / "tests/golden"
    out["x40_extract_fixtures"] = (
        "SELECT url, doc_class, content_type, pages, success, ocr_skipped, "
        f"fallback_reason, extracted_text FROM '{golden / 'x40_expected.parquet'}'"
    )
    out["x41_extract_synthetic"] = (
        f"SELECT doc_class, n_docs, n_success, total_chars FROM '{golden / 'x41_expected.parquet'}'"
    )
    out["x42_media_features"] = (
        "SELECT url, media_type, width, height, n_frames, feature_hash "
        f"FROM '{golden / 'x42_expected.parquet'}'"
    )
    return out
