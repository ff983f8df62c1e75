"""Property-based tests (hypothesis) for the extraction core.

The reference has no property tests; these pin the invariants the
Spark job relies on: total functions over arbitrary bytes (no
exceptions escape extract_document), finalize idempotence, classifier
determinism/priority, RTF state-machine robustness.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.extraction import extract_document
from ocr_service_spark.extraction.classify import classify
from ocr_service_spark.extraction.finalize import finalize_output_text
from ocr_service_spark.extraction.rtf_text import rtf_to_text

BYTES = st.binary(max_size=2048)


@settings(max_examples=300, deadline=None)
@given(BYTES)
def test_extract_document_total(payload: bytes):
    """Any byte payload yields a well-formed result row, never raises."""
    row = extract_document(payload, "https://x.test/doc")
    assert isinstance(row["extracted_text"], str)
    assert isinstance(row["success"], bool)
    assert row["metadata"].get("log_message") is not None
    # success iff text or skip (utils/utils.py:179-187)
    if row["extracted_text"]:
        assert row["success"]
    elif not row["ocr_skipped"]:
        assert not row["success"]


@settings(max_examples=300, deadline=None)
@given(BYTES)
def test_classify_deterministic_and_total(payload: bytes):
    a = classify(payload, "https://x.test/f")
    b = classify(payload, "https://x.test/f")
    assert a == b
    assert a.doc_class in {
        "encrypted_office", "pdf", "xml", "html", "rtf", "office",
        "image", "plain", "unknown",
    }


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=512))
def test_finalize_idempotent(text: str):
    once = finalize_output_text(text)
    assert finalize_output_text(once) == once
    assert "\r" not in once
    assert "\n\n\n" not in once
    assert "  " not in once.replace("\n", "#")  # no space runs


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=0x7F), max_size=400))
def test_rtf_never_crashes_on_ascii(text: str):
    try:
        out = rtf_to_text("{\\rtf1 " + text + "}")
    except UnicodeDecodeError:
        return  # strict cp1252 decode failure is reference behavior
    assert isinstance(out, str)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from("abc defg 123".split()), min_size=1, max_size=40))
def test_rtf_plain_words_roundtrip(words: list[str]):
    body = " ".join(words)
    assert rtf_to_text("{\\rtf1\\ansi " + body + "}") == body


MAGIC_PREFIXES = (
    b"{\\rtf1", b"<?xml version='1.0'?>", b"%PDF-1.4\n", b"<!DOCTYPE html>",
    b"\xff\xd8\xff\xe0", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"II*\x00",
    b"MM\x00*", b"PK\x03\x04", b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1",
    b"\x1f\x8b\x08", b"RIFF1234WAVE", b"\x00\x00\x00\x18ftypisom",
)


@settings(max_examples=400, deadline=None)
@given(st.sampled_from(MAGIC_PREFIXES), st.binary(max_size=1536))
def test_extract_document_total_behind_every_magic(prefix: bytes, junk: bytes):
    """Arbitrary-byte fuzz rarely ROUTES past the sniffer, so force every
    dispatch branch: each magic prefix + junk must still yield a
    well-formed row (the per-format parsers, not just the sniffer, see
    hostile bytes at crawl scale)."""
    row = extract_document(prefix + junk, "https://x.test/doc")
    assert isinstance(row["extracted_text"], str)
    assert isinstance(row["success"], bool)
