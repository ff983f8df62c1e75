"""Classifier priority + detection heuristics.

Mirrors the reference's tests/test_filename_handling.py expectations
plus the D1-D9 priority order from SURVEY.md §2.2.
"""

from __future__ import annotations

from ocr_service_spark.extraction import sniff
from ocr_service_spark.extraction.classify import classify, url_extension


def test_unknown_binary_stays_unknown():
    # test_filename_handling.py:17-19 — no extension inferred
    cls = classify(b"\x00\x01\x02\x03", "https://x.test/request-id")
    assert cls.doc_class == "unknown"
    assert cls.ext is None
    assert not cls.is_text_like


def test_plain_text_threshold():
    assert sniff.is_file_content_plain_text(b"hello world\n")
    assert not sniff.is_file_content_plain_text(b"")
    assert not sniff.is_file_content_plain_text(b"\xff\xfe binary")
    # exactly at the 95% boundary: 19 printable + 1 non-printable = 95%
    assert sniff.is_file_content_plain_text(b"a" * 19 + b"\x00")
    assert not sniff.is_file_content_plain_text(b"a" * 18 + b"\x00\x00")


def test_html_beats_xml_and_plain():
    payload = b"<!DOCTYPE html><html><body>hi</body></html>"
    assert classify(payload).doc_class == "html"
    # well-formed XML without html marker routes to xml
    assert classify(b"<?xml version='1.0'?><r><a>hi</a></r>").doc_class == "xml"
    # sax-parseable XML that mentions <html in head routes to html
    assert classify(b"<r><html>x</html></r>").doc_class == "html"


def test_rtf_detection_lstrip_head():
    assert classify(b"  {\\rtf1 hi}").doc_class == "rtf"
    assert classify(b"{\\rtf1\\ansi x}").doc_class == "rtf"


def test_pdf_requires_magic_at_offset_zero(fixture_bytes):
    assert classify(b"%PDF-1.7\n...").doc_class == "pdf"
    # ex2_ocr.pdf carries junk before the header: filetype misses it
    assert classify(fixture_bytes("pdf/ex2_ocr.pdf")).doc_class == "unknown"


def test_office_containers(fixture_bytes):
    assert classify(fixture_bytes("generic/pat_id_1.docx")).doc_class == "office"
    assert classify(fixture_bytes("generic/pat_id_1.docx")).ext == "docx"
    assert classify(fixture_bytes("generic/pat_id_1.odt")).ext == "odt"
    assert classify(fixture_bytes("generic/pat_id_1.doc")).doc_class == "office"
    assert classify(fixture_bytes("generic/pat_id_1.doc")).ext == "doc"


def test_encrypted_ooxml_detected(fixture_bytes):
    # test_filename_handling.py:29-35
    stream = fixture_bytes("invalid/word_enc_noerror.docx")
    assert sniff.is_encrypted_office_document(stream)
    cls = classify(stream)
    assert cls.doc_class == "encrypted_office"
    assert cls.ext == "docx"


def test_non_office_zip_is_not_document(fixture_bytes):
    cls = classify(fixture_bytes("invalid/tiff_multipage_spp2.tiff.zip"))
    assert cls.doc_class == "unknown"


def test_image_magic(fixture_bytes):
    assert classify(fixture_bytes("generic/pat_id_1.png")).doc_class == "image"


def test_url_extension_parsing():
    assert url_extension("https://a.test/path/doc.DOCX?q=1") == "docx"
    assert url_extension("https://a.test/path/doc") is None
    assert url_extension(None) is None


def test_caller_extension_wins_over_content():
    # an odt payload behind a .docx url takes the docx zip-xml path
    cls = classify(b"PK\x03\x04 not really a zip", "https://a.test/f.docx")
    assert cls.ext == "docx"


def test_ole_stream_names(fixture_bytes):
    names = sniff.ole_stream_names(fixture_bytes("generic/pat_id_1.doc"))
    assert "worddocument" in names
    names_enc = sniff.ole_stream_names(fixture_bytes("invalid/word_enc_noerror.docx"))
    assert {"encryptedpackage", "encryptioninfo"} <= names_enc
