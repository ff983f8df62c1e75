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


def test_media_sniff_and_classify():
    # ISO BMFF: the magic lives at offset 4 (ftyp), the one non-offset-0
    # magic; RIFF/WAVE must not be shadowed by the RIFF/WEBP check
    from ocr_service_spark.extraction.mp4_codec import encode_avc1_mp4

    mp4 = encode_avc1_mp4(16, 16, [bytes(256)])
    ft = sniff.detect_file_type(mp4)
    assert (ft.ext, ft.mime) == ("mp4", "video/mp4")
    assert classify(mp4).doc_class == "media"

    import struct

    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = b"RIFF" + struct.pack("<I", 4 + len(fmt)) + b"WAVE" + fmt
    ft = sniff.detect_file_type(wav)
    assert (ft.ext, ft.mime) == ("wav", "audio/x-wav")
    assert classify(wav).doc_class == "media"
    # WEBP still wins its RIFF slot
    webp = b"RIFF" + struct.pack("<I", 4) + b"WEBP"
    assert sniff.detect_file_type(webp).ext == "webp"


def test_media_route_skips_with_container_metadata():
    from ocr_service_spark.extraction.mp4_codec import encode_avc1_mp4
    from ocr_service_spark.extraction.pipeline import extract_document

    # 36x22 display dims force SPS cropping: the metadata must carry the
    # SPS truth, not the 48x32 coded size
    out = extract_document(
        encode_avc1_mp4(36, 22, [bytes(36 * 22)] * 3), "https://x.test/clip.mp4"
    )
    assert out["doc_class"] == "media"
    assert out["content_type"] == "video/mp4"
    assert out["success"] is False and not out["extracted_text"]
    md = out["metadata"]
    assert md["media_skipped"] == "True"
    assert md["media_codec"] == "avc1"
    assert (md["media_width"], md["media_height"]) == ("36", "22")
    assert md["media_profile"] == "66" and md["media_keyframes"] == "3"

    import struct

    data = struct.pack("<40h", *range(40))
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 2, 9000, 36000, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + len(fmt) + 8 + len(data)) + b"WAVE"
           + fmt + b"data" + struct.pack("<I", len(data)) + data)
    out = extract_document(wav, "https://x.test/a.wav")
    assert out["doc_class"] == "media"
    assert out["metadata"]["media_sample_rate"] == "9000"
    assert out["metadata"]["media_channels"] == "2"


def test_media_route_truncated_container_still_skips():
    # a bare ftyp header with no moov: doc_class media, no metadata
    # enrichment, no crash
    from ocr_service_spark.extraction.pipeline import extract_document

    out = extract_document(b"\x00\x00\x00\x08ftypisom" + b"\x00" * 16, "u.mp4")
    assert out["doc_class"] == "media"
    assert out["metadata"]["media_skipped"] == "True"
    assert "media_codec" not in out["metadata"]
