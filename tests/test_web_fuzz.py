"""Property/fuzz tests for the web-ingest parsers added in round 4:
charset sniff/decode, transfer-encoding unwrap, link extraction.
Invariant: arbitrary bytes NEVER raise, outputs are bounded and
well-typed, and compression round-trips are lossless."""

from __future__ import annotations

import gzip
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.extraction.charset import (
    decode_markup,
    decode_text,
    sniff_charset,
)
from ocr_service_spark.extraction.links import MAX_LINKS, extract_links
from ocr_service_spark.extraction.transfer import decode_transfer_encoding

BYTES = st.binary(max_size=4096)


@settings(max_examples=200, deadline=None)
@given(BYTES)
def test_charset_never_raises(payload: bytes) -> None:
    codec, strip, source = sniff_charset(payload)
    assert isinstance(codec, str) and strip >= 0
    assert source in ("bom", "declared", "probe", "fallback")
    for fn in (decode_markup, decode_text):
        label, text = fn(payload)
        assert isinstance(label, str) and isinstance(text, str)


@settings(max_examples=200, deadline=None)
@given(BYTES)
def test_transfer_never_raises_and_is_stable(payload: bytes) -> None:
    data, label = decode_transfer_encoding(payload)
    assert isinstance(data, (bytes, bytearray))
    if label is None:
        assert data == payload  # pass-through is byte-exact
    # unwrap is idempotent on its own output unless layers remain
    data2, label2 = decode_transfer_encoding(data)
    if label is None:
        assert (data2, label2) == (payload, None)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_transfer_gzip_roundtrip_lossless(payload: bytes) -> None:
    data, label = decode_transfer_encoding(gzip.compress(payload, mtime=0))
    assert (data, label) == (payload, "gzip")
    data, label = decode_transfer_encoding(zlib.compress(payload))
    assert (data, label) == (payload, "deflate")


@settings(max_examples=200, deadline=None)
@given(BYTES)
def test_links_never_raise_and_are_bounded(payload: bytes) -> None:
    links, noindex = extract_links(payload, "https://h.example/p/q.html")
    assert isinstance(noindex, bool)
    assert len(links) <= MAX_LINKS
    assert all(isinstance(link, str) for link in links)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2048))
def test_links_on_arbitrary_text(html: str) -> None:
    links, _ = extract_links(html.encode(), "https://h.example/")
    assert len(links) <= MAX_LINKS
