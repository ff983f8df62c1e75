"""E2E Spark tests: the extraction job must reproduce the pure-Python
extraction results exactly — including through the salted big-PDF path —
and the checkpoint manifest must make runs resumable."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from ocr_service_spark.extraction import extract_document
from ocr_service_spark.plans.job import run_extraction
from ocr_service_spark.plans.manifest import (
    input_snapshot_id,
    resume_filter,
    run_with_checkpoint,
    with_part_hash,
)
from ocr_service_spark.sources.pages import (
    decode_payload_ladder,
    generate_pages,
    load_fixture_pages,
)

REFERENCE_DOCS = Path("/root/reference/ocr_service/tests/resources/docs")


@pytest.fixture(scope="module")
def fixture_results(spark):
    pages = load_fixture_pages(spark)
    # low threshold forces ex1*.pdf (194 KB) onto the salted path
    res = run_extraction(pages, salt_min_bytes=100_000)
    return {r["url"]: r for r in res.collect()}


def test_spark_matches_pure_python(fixture_results):
    checked = 0
    for url, row in fixture_results.items():
        name = url.rsplit("/", 1)[-1]
        matches = list(REFERENCE_DOCS.rglob(name))
        if not matches:
            continue
        want = extract_document(matches[0].read_bytes(), url)
        got = row.asDict(recursive=True)
        for key in ("url", "extracted_text", "content_type", "pages", "success",
                    "ocr_skipped", "fallback_reason", "doc_class"):
            assert got[key] == want[key], (name, key)
        assert dict(got["metadata"]) == {k: str(v) for k, v in want["metadata"].items()}, name
        checked += 1
    assert checked >= 20


def test_salted_path_used_for_big_pdf(fixture_results):
    row = fixture_results["https://fixtures.test/pdf/ex1.pdf"]
    assert row["pages"] == 10
    assert row["success"] is True
    assert "Replace this" in row["extracted_text"]
    # salted rows carry no elapsed_ms (re-agg path) — proves the route
    assert row["elapsed_ms"] is None


def test_null_and_empty_rows(fixture_results):
    null_row = fixture_results["https://fixtures.test/null-payload"]
    assert null_row["success"] is True and null_row["ocr_skipped"] is True
    empty_row = fixture_results["https://fixtures.test/empty-payload"]
    assert empty_row["success"] is False


def test_payload_ladder(spark):
    import base64

    html = b"<html><body>ladder</body></html>"
    rows = [
        ("raw", html.decode()),
        ("b64", base64.b64encode(html).decode()),
        ("json_b64", '{"binary_data": "%s", "footer": {"k": "v"}}' % base64.b64encode(html).decode()),
        ("json_null", '{"binary_data": null}'),
        ("json_text", '{"binary_data": "plain text payload"}'),
    ]
    df = spark.createDataFrame(rows, "url string, body string")
    out = {r["url"]: r for r in decode_payload_ladder(df, "body").collect()}
    assert bytes(out["raw"]["html"]) == html
    assert bytes(out["b64"]["html"]) == html
    assert bytes(out["json_b64"]["html"]) == html
    assert out["json_b64"]["footer"]["k"] == "v"
    assert out["json_null"]["html"] is None
    assert bytes(out["json_text"]["html"]) == b"plain text payload"


def test_nifi_record_payload(spark):
    # the reference's NiFi-record shape (tests/test_process.py:169-256):
    # a JSON ARRAY wrapping {binary_data, footer}; the ladder takes
    # record[0] (api/process.py:56-57) and base64-decodes binary_data
    body = Path(
        "/root/reference/ocr_service/tests/resources/payloads/sample_base64_record_nifi.json"
    ).read_text()
    df = spark.createDataFrame([("nifi", body)], "url string, body string")
    decoded = decode_payload_ladder(df, "body")
    row = run_extraction(decoded.select("url", "html")).collect()[0]
    assert row["doc_class"] == "html"
    assert row["success"] is True
    assert "Bart Davidson" in row["extracted_text"]


def test_generator_deterministic(spark):
    a = generate_pages(spark, 200, seed=7).orderBy("url").collect()
    b = generate_pages(spark, 200, seed=7).orderBy("url").collect()
    assert a == b
    classes = {r["url"].rsplit(".", 1)[-1] for r in a}
    assert {"html", "txt", "rtf", "xml", "docx", "pdf", "png", "bin"} <= classes


def test_generated_pages_extract(spark):
    n = 1000
    pages = generate_pages(spark, n, seed=3)
    res = run_extraction(pages)
    stats = (
        res.groupBy("doc_class")
        .agg(F.count("*").alias("n"), F.sum(F.when(F.col("success"), 1).otherwise(0)).alias("ok"))
        .collect()
    )
    by_class = {r["doc_class"]: (r["n"], r["ok"]) for r in stats}
    assert sum(v[0] for v in by_class.values()) == n  # no row loss
    assert by_class["html"][0] > n // 2
    assert by_class["html"][0] == by_class["html"][1]  # all html succeed
    assert "encrypted_office" in by_class
    assert by_class["rtf"][0] == by_class["rtf"][1]
    assert by_class["image"][1] == by_class["image"][0]  # skip => success


def test_checkpoint_resume(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    results_path = str(tmp_path / "results")
    manifest_path = str(tmp_path / "manifest")
    generate_pages(spark, 120, seed=11).write.parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    n_parts = 8
    snapshot = input_snapshot_id(pages_path, n_parts)

    # simulate a killed run: first run only sees parts 0-3
    first_half = with_part_hash(pages, n_parts).filter(F.col("part_hash") < 4).drop("part_hash")
    run_with_checkpoint(
        spark, first_half, pages_path, results_path, manifest_path, n_parts=n_parts
    )
    manifest1 = spark.read.parquet(manifest_path)
    done1 = {r["part_hash"] for r in manifest1.select("part_hash").collect()}
    assert done1 <= {0, 1, 2, 3} and done1

    # resume must only schedule the missing parts
    todo = resume_filter(pages, spark, manifest_path, snapshot, n_parts)
    remaining = {r["part_hash"] for r in todo.select("part_hash").distinct().collect()}
    assert remaining.isdisjoint(done1)

    # complete the run; results must cover every url exactly once
    run_with_checkpoint(spark, pages, pages_path, results_path, manifest_path, n_parts=n_parts)
    results = spark.read.parquet(results_path)
    assert results.count() == 120
    assert results.select("url").distinct().count() == 120
    manifest2 = spark.read.parquet(manifest_path)
    assert manifest2.select("part_hash").distinct().count() == len(
        {r["part_hash"] for r in with_part_hash(pages, n_parts).select("part_hash").distinct().collect()}
    )
    # lineage counts reconcile with results
    total = manifest2.agg(F.sum("doc_count")).collect()[0][0]
    assert total == 120
