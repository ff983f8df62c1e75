"""Transfer-encoding unwrap (extraction/transfer.py): gzip/zlib
payloads decompress (budget-capped, bounded nesting) and re-enter
classification; anything undecodable passes through unchanged."""

from __future__ import annotations

import gzip
import zlib

from ocr_service_spark.extraction.pipeline import extract_document
from ocr_service_spark.extraction.transfer import (
    MAX_LAYERS,
    decode_transfer_encoding,
    looks_compressed,
)

HTML = b"<html><head><title>t</title></head><body><p>compressed body</p></body></html>"


def test_gzip_roundtrip() -> None:
    data, label = decode_transfer_encoding(gzip.compress(HTML, mtime=0))
    assert (data, label) == (HTML, "gzip")


def test_zlib_roundtrip() -> None:
    data, label = decode_transfer_encoding(zlib.compress(HTML))
    assert (data, label) == (HTML, "deflate")


def test_nested_layers_unwrap_and_report_in_order() -> None:
    wrapped = zlib.compress(gzip.compress(HTML, mtime=0))
    data, label = decode_transfer_encoding(wrapped)
    assert (data, label) == (HTML, "deflate,gzip")


def test_nesting_is_bounded() -> None:
    payload = HTML
    for _ in range(MAX_LAYERS + 2):
        payload = gzip.compress(payload, mtime=0)
    data, label = decode_transfer_encoding(payload)
    assert label == ",".join(["gzip"] * MAX_LAYERS)
    assert looks_compressed(data) == "gzip"  # innermost layers remain


def test_budget_breach_passes_through() -> None:
    bomb = gzip.compress(b"\x00" * 1_000_000, mtime=0)
    data, label = decode_transfer_encoding(bomb, budget=1024)
    assert (data, label) == (bomb, None)


def test_truncated_stream_passes_through() -> None:
    cut = gzip.compress(HTML, mtime=0)[:-5]
    assert decode_transfer_encoding(cut) == (cut, None)


def test_plain_text_starting_with_x_is_not_deflate() -> None:
    # 0x78 0x5e is a valid zlib header byte pair but also ASCII "x^";
    # the adler/eof check rejects the false positive
    payload = b"x^ not actually zlib at all, just text"
    assert decode_transfer_encoding(payload) == (payload, None)


def test_uncompressed_payload_untouched() -> None:
    assert decode_transfer_encoding(HTML) == (HTML, None)


def test_pipeline_extracts_gzipped_html_and_records_encoding() -> None:
    row = extract_document(gzip.compress(HTML, mtime=0), "doc://1.html")
    assert row["doc_class"] == "html"
    assert row["extracted_text"] == "t\ncompressed body"
    assert row["metadata"]["content_encoding"] == "gzip"
    assert row["success"] is True


def test_pipeline_gzipped_plain_text() -> None:
    row = extract_document(gzip.compress(b"plain words here", mtime=0), "doc://2.txt")
    assert row["doc_class"] == "plain"
    assert row["extracted_text"] == "plain words here"
    assert row["metadata"]["content_encoding"] == "gzip"


def test_pipeline_uncompressed_metadata_has_no_encoding_key() -> None:
    row = extract_document(HTML, "doc://3.html")
    assert "content_encoding" not in row["metadata"]
