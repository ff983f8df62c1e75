"""WARC ingest (extraction/warc.py + sources/warc.py): member
splitting, record/HTTP parsing, degradation on truncation and
garbage, and the Spark mapInPandas source. The reference service has
no crawl source (SURVEY.md §3.2) — this is the beyond-reference
Common-Crawl-shaped ingest rung exercised end-to-end by q74 and
chained into the real extraction pipeline by q76."""

from __future__ import annotations

import gzip
import zlib

import pytest

from ocr_service_spark.extraction.warc import (
    build_warc,
    parse_http_response,
    parse_record,
    split_members,
    warc_to_pages,
)

RESP = {
    "warc_type": "response",
    "url": "https://example.com/a",
    "ts": "2026-03-01T00:00:00Z",
    "status": 200,
    "body": b"<html><body>hello warc</body></html>",
    "http_headers": {"Content-Type": "text/html; charset=utf-8"},
}
INFO = {
    "warc_type": "warcinfo",
    "url": "",
    "ts": "2026-03-01T00:00:00Z",
    "block": b"software: graft\r\n",
}


def test_roundtrip_gzip_members() -> None:
    data = build_warc([INFO, RESP])
    rows = warc_to_pages(data)
    assert [r["warc_type"] for r in rows] == ["warcinfo", "response"]
    info, resp = rows
    assert info["payload"] is None and info["status"] is None
    assert resp["url"] == "https://example.com/a"
    assert resp["status"] == 200
    assert resp["content_type"] == "text/html"
    assert resp["payload"] == RESP["body"]
    assert resp["warc_ts"] == "2026-03-01T00:00:00Z"


def test_roundtrip_uncompressed() -> None:
    data = build_warc([INFO, RESP], compress=False)
    rows = warc_to_pages(data)
    assert [r["warc_type"] for r in rows] == ["warcinfo", "response"]
    assert rows[1]["payload"] == RESP["body"]


def test_member_split_is_sequential_not_magic_scan() -> None:
    # a body containing the gzip magic must not split the walk
    tricky = dict(RESP, body=b"\x1f\x8b fake magic inside body \x1f\x8b\x08")
    data = build_warc([tricky, RESP])
    members = split_members(data)
    assert len(members) == 2
    rows = warc_to_pages(data)
    assert rows[0]["payload"] == tricky["body"]
    assert rows[1]["payload"] == RESP["body"]


def test_http_content_encoding_inflates() -> None:
    gzipped = dict(
        RESP,
        body=gzip.compress(b"inflate me", mtime=0),
        http_headers={
            "Content-Type": "text/plain",
            "Content-Encoding": "gzip",
        },
    )
    rows = warc_to_pages(build_warc([gzipped]))
    assert rows[0]["payload"] == b"inflate me"
    assert rows[0]["content_type"] == "text/plain"

    deflated = dict(
        gzipped,
        body=zlib.compress(b"inflate me too"),
        http_headers={
            "Content-Type": "text/plain",
            "Content-Encoding": "deflate",
        },
    )
    rows = warc_to_pages(build_warc([deflated]))
    assert rows[0]["payload"] == b"inflate me too"


def test_truncated_member_keeps_prior_records() -> None:
    data = build_warc([RESP, RESP, RESP])
    rows = warc_to_pages(data[:-20])  # cut into the last member
    assert len(rows) == 2
    assert all(r["payload"] == RESP["body"] for r in rows)


def test_non_http_response_block_passes_through_raw() -> None:
    raw_block = dict(RESP, body=None, block=b"not an http message")
    rows = warc_to_pages(build_warc([raw_block]))
    assert rows[0]["warc_type"] == "response"
    assert rows[0]["status"] is None
    assert rows[0]["payload"] == b"not an http message"


def test_malformed_record_yields_invalid_row() -> None:
    rows = warc_to_pages(gzip.compress(b"GARBAGE not a warc record", mtime=0))
    assert rows == [
        {
            "warc_type": "invalid",
            "url": None,
            "warc_ts": None,
            "status": None,
            "content_type": None,
            "payload": None,
        }
    ]


def test_parse_record_header_case_and_length() -> None:
    raw = (
        b"WARC/1.0\r\n"
        b"warc-type: RESPONSE\r\n"
        b"CONTENT-LENGTH: 4\r\n"
        b"\r\n"
        b"bodyEXTRA"
    )
    rec = parse_record(raw)
    assert rec is not None
    assert rec["headers"]["warc-type"] == "RESPONSE"
    assert rec["block"] == b"body"  # Content-Length bounds the block


def test_parse_http_response_malformed_status() -> None:
    assert parse_http_response(b"HTTP/1.1 abc OK\r\n\r\nx") == (
        None,
        {},
        b"HTTP/1.1 abc OK\r\n\r\nx",
    )


@pytest.mark.parametrize("n", range(8))
def test_fuzz_never_raises(n: int) -> None:
    import random

    rng = random.Random(1000 + n)
    junk = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 4096)))
    for data in (junk, b"\x1f\x8b" + junk, gzip.compress(junk, mtime=0)):
        for row in warc_to_pages(data):
            assert "warc_type" in row


def test_spark_source_with_id_cols(spark) -> None:
    from ocr_service_spark.sources.warc import read_warc

    blobs = spark.createDataFrame(
        [
            ("shard-0", build_warc([INFO, RESP])),
            ("shard-1", build_warc([RESP])),
            ("shard-2", None),
        ],
        "path string, data binary",
    )
    rows = read_warc(blobs, id_cols=("path",)).collect()
    by_path = {}
    for r in rows:
        by_path.setdefault(r["path"], []).append(r)
    assert [r["warc_type"] for r in by_path["shard-0"]] == ["warcinfo", "response"]
    assert by_path["shard-0"][1]["payload"] == RESP["body"]
    assert [r["warc_type"] for r in by_path["shard-1"]] == ["response"]
    assert "shard-2" not in by_path  # null blob -> zero records


def test_q76_crawl_to_text_single_stage_chain(spark) -> None:
    """The WARC parse and the extractor must share one scan-side
    stage chain: the only exchange in the plan is the applyInPandas
    shard BUILD (test-corpus construction) — with real *.warc.gz files
    on disk even that disappears. And the gzip Content-Encoding rung
    (doc_id%4==0) must extract identically to the uncompressed rungs,
    proving the HTTP-body inflate ran."""
    from ocr_service_spark.operators.roundtrip import q76_warc_extract

    df = q76_warc_extract(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows, "no rows"
    assert all(r["extracted_text"] == f"warc doc {d} body" for d, r in rows.items())
    gz = [d for d in rows if d % 4 == 0]
    assert gz, "no gzip-rung docs in corpus"
    assert all(d % 17 != 0 for d in rows)  # 404s never reach extraction


def test_conversion_records_roundtrip() -> None:
    """WET-style conversion records: the block is the payload, the
    record-level Content-Type is surfaced directly (no HTTP parse),
    and the writer's content_type override lands in the header."""
    from ocr_service_spark.extraction.warc import build_warc, warc_to_pages

    data = build_warc(
        [
            {
                "warc_type": "warcinfo",
                "url": "",
                "ts": "2026-03-01T00:00:00Z",
                "block": b"software: graft-wet\r\n",
                "content_type": "application/warc-fields",
            },
            {
                "warc_type": "conversion",
                "url": "https://a.example.com/doc/7",
                "ts": "2026-03-01T00:00:00Z",
                "block": "warc doc 7 body".encode(),
                "content_type": "text/plain",
            },
        ]
    )
    rows = warc_to_pages(data)
    assert [r["warc_type"] for r in rows] == ["warcinfo", "conversion"]
    info, conv = rows
    assert info["payload"] is None and info["content_type"] is None
    assert conv["payload"] == b"warc doc 7 body"
    assert conv["content_type"] == "text/plain"
    assert conv["url"] == "https://a.example.com/doc/7"
    # response records keep the default msgtype header (byte-stable
    # corpora from earlier rounds must not change)
    legacy = build_warc(
        [{"warc_type": "response", "url": "u", "ts": "t", "body": b"x"}],
        compress=False,
    )
    assert b"Content-Type: application/http; msgtype=response" in legacy


def test_q117_wet_export_one_build_shuffle(spark) -> None:
    """The WET job's only exchange is the per-shard file assembly;
    parse -> extract -> record build -> re-parse otherwise stay
    map-side. Every conversion record's Content-Length must equal its
    re-parsed payload length (the self-consistency a WET consumer
    relies on)."""
    from ocr_service_spark.operators.roundtrip import q117_wet_export

    df = q117_wet_export(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two exchanges total: the test-corpus shard BUILD (q76 shares it)
    # and the WET per-shard assembly
    assert plan.count("Exchange") == 2, plan
    rows = df.collect()
    conv = [r for r in rows if r["warc_type"] == "conversion"]
    info = [r for r in rows if r["warc_type"] == "warcinfo"]
    assert conv and info
    assert all(r["content_length"] == len(r["wet_text"].encode()) for r in conv)
    assert {r["shard"] for r in info} == {r["shard"] for r in conv}
