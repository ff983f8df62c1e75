"""Charset sniffing + decoding (extraction/charset.py) and its
integration into classify/extract.

The reference decodes everything as UTF-8 (converter.py:70-106 via
bs4); the charset ladder is a beyond-reference web-corpus extension,
so these tests pin two things: (a) the WHATWG-style precedence
(BOM > declared > UTF-8 probe > cp1252) on synthetic payloads, and
(b) byte-parity on valid UTF-8 — the pinned tier must be unchanged.
"""

from __future__ import annotations

import codecs

import pytest

from ocr_service_spark.extraction.charset import (
    decode_markup,
    decode_text,
    normalize_label,
    sniff_bom,
    sniff_charset,
)
from ocr_service_spark.extraction.pipeline import extract_document
from ocr_service_spark.extraction.sniff import (
    is_file_content_plain_text,
    is_file_type_html,
)

HTML_FMT = (
    "<!DOCTYPE html>\n<html><head>%s<title>t</title></head>"
    "<body><p>%s</p></body></html>"
)


def _html(body: str, decl: str = "") -> str:
    return HTML_FMT % (decl, body)


# ---------------------------------------------------------------- BOMs


@pytest.mark.parametrize(
    "bom,codec",
    [
        (codecs.BOM_UTF8, "utf-8-sig"),
        (codecs.BOM_UTF16_LE, "utf-16-le"),
        (codecs.BOM_UTF16_BE, "utf-16-be"),
        (codecs.BOM_UTF32_LE, "utf-32-le"),
        (codecs.BOM_UTF32_BE, "utf-32-be"),
    ],
)
def test_bom_table(bom: bytes, codec: str) -> None:
    assert sniff_bom(bom + b"xx") == (codec, len(bom))


def test_utf32_bom_wins_over_utf16_prefix() -> None:
    # FF FE 00 00 starts with FF FE: the 4-byte mark must match first
    assert sniff_bom(codecs.BOM_UTF32_LE + b"data")[0] == "utf-32-le"


def test_bom_beats_declared_charset() -> None:
    payload = codecs.BOM_UTF16_LE + _html("x", '<meta charset="cp1251">').encode(
        "utf-16-le"
    )
    codec, strip, source = sniff_charset(payload)
    assert (codec, strip, source) == ("utf-16-le", 2, "bom")


# ------------------------------------------------------ declared labels


def test_meta_charset_declaration() -> None:
    payload = _html("déjà", '<meta charset="windows-1252">').encode("cp1252")
    assert sniff_charset(payload) == ("cp1252", 0, "declared")
    assert decode_markup(payload)[1].count("déjà") == 1


def test_http_equiv_content_type_declaration() -> None:
    decl = '<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">'
    payload = _html("café € —", decl).encode("cp1252")
    # WHATWG: latin-1 labels mean cp1252 on the web — the euro (0x80)
    # and em-dash (0x97) only decode correctly under that mapping
    codec, _, source = sniff_charset(payload)
    assert (codec, source) == ("cp1252", "declared")
    assert "€" in decode_markup(payload)[1]
    assert "—" in decode_markup(payload)[1]


def test_xml_declaration_encoding() -> None:
    payload = '<?xml version="1.0" encoding="windows-1252"?><d>cé</d>'.encode(
        "cp1252"
    )
    assert sniff_charset(payload) == ("cp1252", 0, "declared")


def test_utf16_label_in_meta_maps_to_utf8() -> None:
    # a byte-sniffable meta tag cannot sit in real UTF-16 content
    payload = _html("ascii body", '<meta charset="UTF-16">').encode("ascii")
    assert sniff_charset(payload)[0] == "utf-8"


def test_unknown_label_falls_through_to_probe() -> None:
    payload = _html("plain ascii", '<meta charset="no-such-encoding">').encode()
    assert sniff_charset(payload) == ("utf-8", 0, "probe")


@pytest.mark.parametrize(
    "label,expected",
    [
        ("ISO-8859-1", "cp1252"),
        ("latin1", "cp1252"),
        ("US-ASCII", "cp1252"),
        ("Windows-1252", "cp1252"),
        ("UTF8", "utf-8"),
        ("utf-8", "utf-8"),
        ("shift_jis", "shift_jis"),
        ("KOI8-R", "koi8-r"),
        ("", None),
        ("bogus-charset", None),
    ],
)
def test_normalize_label(label: str, expected: str | None) -> None:
    assert normalize_label(label) == expected


def test_declaration_scan_limited_to_head() -> None:
    # a charset= mention past the 1024-byte prescan window is ignored
    payload = b"<html><head>" + b" " * 1100 + b'<meta charset="cp1251">--'
    assert sniff_charset(payload)[2] == "probe"


# --------------------------------------------------- probe + fallback


def test_utf8_probe_and_cp1252_fallback() -> None:
    assert sniff_charset("café utf8".encode())[2] == "probe"
    raw = b"smart \x93quote\x94 \x97 dash"  # cp1252 punctuation, invalid UTF-8
    codec, _, source = sniff_charset(raw, markup=False)
    assert (codec, source) == ("cp1252", "fallback")
    assert decode_text(raw)[1] == "smart “quote” — dash"


def test_valid_utf8_decodes_byte_identically_to_pinned_tier() -> None:
    for text in ("plain ascii", "café αβγ 中文"):
        payload = text.encode()
        assert decode_text(payload) == ("utf-8", payload.decode("utf-8", "ignore"))
        assert decode_markup(payload)[1] == payload.decode("utf-8", "ignore")


def test_decode_strips_bom() -> None:
    assert decode_text(codecs.BOM_UTF8 + b"x")[1] == "x"
    assert decode_text(codecs.BOM_UTF16_BE + "x".encode("utf-16-be"))[1] == "x"


# ---------------------------------------------- classify + pipeline


def test_utf16_html_classifies_and_extracts() -> None:
    payload = codecs.BOM_UTF16_LE + _html("Юникод ok").encode("utf-16-le")
    assert is_file_type_html(payload)
    row = extract_document(payload, "doc://1.html")
    assert row["doc_class"] == "html"
    assert row["extracted_text"] == "t\nЮникод ok"
    assert row["metadata"]["charset"] == "utf-16-le"
    assert row["success"] is True


def test_utf16_plain_text_classifies_and_extracts() -> None:
    payload = codecs.BOM_UTF16_BE + "hello plain world".encode("utf-16-be")
    assert is_file_content_plain_text(payload)
    row = extract_document(payload, "doc://2.txt")
    assert row["doc_class"] == "plain"
    assert row["extracted_text"] == "hello plain world"
    assert row["metadata"]["charset"] == "utf-16-be"


def test_utf8_bom_plain_text() -> None:
    row = extract_document(codecs.BOM_UTF8 + b"bom utf8 text", "doc://3.txt")
    assert row["doc_class"] == "plain"
    assert row["extracted_text"] == "bom utf8 text"
    assert row["metadata"]["charset"] == "utf-8-sig"


def test_declared_cp1252_html_extracts_and_records_charset() -> None:
    decl = '<meta http-equiv="content-type" content="text/html; charset=iso-8859-1">'
    payload = _html("naïve € — x", decl).encode("cp1252")
    row = extract_document(payload, "doc://4.html")
    assert row["extracted_text"] == "t\nnaïve € — x"
    assert row["metadata"]["charset"] == "cp1252"


def test_utf8_html_has_no_charset_metadata() -> None:
    # the pinned tier's metadata map must not grow a key on UTF-8 docs
    row = extract_document(_html("plain utf8 body").encode(), "doc://5.html")
    assert "charset" not in row["metadata"]
    assert row["extracted_text"] == "t\nplain utf8 body"


def test_mojibake_repair_levels_and_noops():
    from ocr_service_spark.extraction.charset import mojibake, repair_mojibake

    for s in ("café résumé", "über naïve", "‘quoted’ €9"):
        assert repair_mojibake(mojibake(s)) == (s, 1)
        assert repair_mojibake(mojibake(s, 2)) == (s, 2)
    # legitimate text is never touched: plain ASCII, lone accents, and
    # chars outside cp1252 (which fail the encode gate)
    for s in ("plain ascii", "é alone", "naïve café", "日本語 text", ""):
        assert repair_mojibake(s) == (s, 0)


def test_mojibake_writer_rejects_unrepairable():
    import pytest as _pytest

    from ocr_service_spark.extraction.charset import mojibake

    # U+201D's UTF-8 encoding contains 0x9D, unmapped in cp1252 — the
    # writer must refuse rather than emit an unrepairable fixture
    with _pytest.raises(UnicodeDecodeError):
        mojibake("curly ”")


# -- fuzz: decode + mojibake repair are total over untrusted input ------------
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.extraction.charset import decode_payload, repair_mojibake


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_decode_payload_fuzz_never_raises(b: bytes):
    for markup in (True, False):
        text, enc = decode_payload(b, markup=markup)
        assert isinstance(text, str) and isinstance(enc, str)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=1024))
def test_repair_mojibake_fuzz_never_raises(s: str):
    out, iters = repair_mojibake(s)
    assert isinstance(out, str) and iters >= 0
    # repair is a fixpoint: repairing repaired text changes nothing
    again, extra = repair_mojibake(out)
    assert again == out and extra == 0
