"""Unit tests for the deterministic text extractors (T1-T6, C5-C7)."""

from __future__ import annotations

import pytest

from ocr_service_spark.extraction.fallback import (
    extract_office_zip_text_fallback,
    extract_text_fallback,
)
from ocr_service_spark.extraction.finalize import finalize_output_text, success_and_log
from ocr_service_spark.extraction.html_text import html_all_strings, html_to_text
from ocr_service_spark.extraction.pdf_text import (
    PdfEncryptedError,
    pdf_page_texts,
    pdf_to_text,
)
from ocr_service_spark.extraction.rtf_text import rtf_to_text
from ocr_service_spark.extraction.xml_text import xml_all_strings, xml_iter_text


# ---- T1 html -------------------------------------------------------------
def test_html_all_strings_joins_every_text_node():
    html = b"<html><head><title>T</title></head><body><p>a</p><p>b</p></body></html>"
    # bs4 get_text("\n") joins each NavigableString with newline
    assert html_all_strings(html) == "T\na\nb"


def test_html_includes_style_and_script():
    html = b"<html><style>p{}</style><script>var x;</script><p>hi</p></html>"
    assert html_all_strings(html) == "p{}\nvar x;\nhi"


def test_html_excludes_comments_and_doctype():
    html = b"<!DOCTYPE html><html><!-- no --><p>yes</p></html>"
    assert html_all_strings(html) == "yes"


def test_html_entities_double_unescaped():
    # parser unescapes once (convert_charrefs), final unescape again:
    # &amp;amp; -> &amp; -> &
    assert html_to_text(b"<p>&amp;amp;</p>") == "&"
    assert html_to_text(b"<p>AT&amp;T</p>") == "AT&T"


def test_tag_strip_regexes_apply_to_extracted_text():
    # literal markup surviving inside text nodes is stripped
    # (converter.py:93-95)
    html = b"<p>keep &lt;br/&gt; and &lt;b&gt;bold&lt;/b&gt;</p>"
    assert html_to_text(html) == "keep  and bold"


# ---- C6 / fallback xml ----------------------------------------------------
def test_xml_iter_text_includes_attribute_values():
    xml = b'<root a="A"><child b=" B ">text<tail/>tail</child></root>'
    # per element: stripped text, then attrib values, then tails,
    # space-joined (converter.py:391-408); root attrs come first
    assert xml_iter_text(xml) == "A text B tail"


def test_xml_all_strings_keeps_raw_segments():
    xml = b"<r><a>one</a> <b>two</b></r>"
    assert xml_all_strings(xml) == "one\n \ntwo"


def test_xml_fallback_retries_html_parser():
    bad_xml = b"<r><unclosed>text</r>"
    out = extract_text_fallback(bad_xml, is_xml=True)
    assert "text" in out


# ---- T2 rtf ----------------------------------------------------------------
def test_rtf_basic_par_and_unicode():
    rtf = r"{\rtf1\ansi Hello \u8217\'92World\par done}"
    assert rtf_to_text(rtf) == "Hello ’World\ndone"


def test_rtf_destination_groups_ignored():
    rtf = r"{\rtf1{\fonttbl{\f0 Arial;}}{\*\generator X}body}"
    assert rtf_to_text(rtf) == "body"


def test_rtf_hex_cp1252():
    assert rtf_to_text(r"{\rtf1 a\'92b}") == "a’b"


def test_rtf_escaped_braces():
    assert rtf_to_text(r"{\rtf1 a\{b\}c\\d}") == "a{b}c\\d"


def test_rtf_newlines_ignored():
    assert rtf_to_text("{\\rtf1 one\ntwo\r\nthree}") == "onetwothree"


def test_rtf_uc_skip():
    # \uc2 means two fallback tokens are skipped after \uN
    assert rtf_to_text(r"{\rtf1\uc2\u233 ab c}") == "\xe9 c"


def test_rtf_uppercase_hex_quirk():
    # the hex branch matches lowercase digits only (striprtf tokenizer
    # quirk): \'9A tokenizes as control-symbol \' (ignored) + text "9A"
    assert rtf_to_text(r"{\rtf1 a\'9Ab}") == "a9Ab"
    assert rtf_to_text(r"{\rtf1 a\'9ab}") == "ašb"  # lowercase decodes


def test_rtf_control_word_consumes_one_space():
    # exactly one space after a control word is part of the token;
    # further spaces are text
    assert rtf_to_text(r"{\rtf1\b  two}") == " two"
    assert rtf_to_text(r"{\rtf1\b one}") == "one"


def test_rtf_group_state_restored_on_close():
    # \uc set inside a group must not leak after the group closes
    assert rtf_to_text(r"{\rtf1{\uc3 x}\u233 a b}") == "x\xe9 b"


def test_rtf_pard_is_not_par():
    # longest-match tokenization: \pard is its own word, no newline
    assert rtf_to_text(r"{\rtf1\pard text\par done}") == "text\ndone"


# ---- T5 finalize ------------------------------------------------------------
def test_finalize_order_and_collapse():
    # \r\n -> \n, [ \t]+ -> " ", \n{3,} -> "\n\n", strip — in this order
    # (converter.py:58-68)
    raw = "a\r\n\r\n\r\nb\t\t c   d\r"
    assert finalize_output_text(raw) == "a\n\nb c d"


def test_finalize_surrogates_replaced():
    # encode(errors="replace") substitutes "?" (converter.py:68)
    assert finalize_output_text("x\ud800y") == "x?y"


def test_success_rule():
    assert success_and_log("text", False) == (True, "")
    assert success_and_log("", True) == (True, "OCR skipped; no text generated.")
    assert success_and_log("", False) == (False, "No text has been generated.")


# ---- C5 pdf -----------------------------------------------------------------
def test_pdf_fixture_pages_and_text(fixture_bytes):
    text, pages = pdf_to_text(fixture_bytes("generic/pat_id_1.pdf"))
    assert pages == 1
    assert "Bart Davidson" in text
    assert "07754828992" in text


def test_pdf_multipage_order(fixture_bytes):
    texts = pdf_page_texts(fixture_bytes("pdf/ex1.pdf"))
    assert len(texts) == 10
    # page order must be document order, not completion order
    assert "Replace this" in texts[0]


def test_pdf_encrypted_raises(fixture_bytes):
    # no password -> same failure a password-less pdfium open would hit
    with pytest.raises(PdfEncryptedError):
        pdf_to_text(fixture_bytes("pdf/ex1_enc.pdf"))


def test_pdf_standard_security_decrypts_with_password(fixture_bytes):
    # RC4-128 standard security handler (public spec); the fixture's
    # user password is "test" — decrypted content must match the
    # plaintext twin byte-for-byte through the whole parser
    enc_text, pages = pdf_to_text(fixture_bytes("pdf/ex1_enc.pdf"), password=b"test")
    plain_text, _ = pdf_to_text(fixture_bytes("pdf/ex1.pdf"))
    assert pages == 10
    assert enc_text == plain_text


def test_pdf_concat_no_separator():
    # mirrors the reference's tests/test_pdf_text_cleanup.py "firstsecond"
    # expectation: page texts concatenate with no separator
    from unittest.mock import patch

    with patch(
        "ocr_service_spark.extraction.pdf_text.pdf_page_texts",
        return_value=["first", "second"],
    ):
        text, pages = pdf_to_text(b"%PDF-fake")
        assert text == "firstsecond"
        assert pages == 2


# ---- C7 office zip ----------------------------------------------------------
def test_docx_fallback_contains_canonical_name(fixture_bytes):
    # test_filename_handling.py:104-113
    out = extract_office_zip_text_fallback(fixture_bytes("generic/pat_id_1.docx"), "docx")
    assert "Bart Davidson" in out


def test_odt_fallback_contains_canonical_name(fixture_bytes):
    # test_filename_handling.py:115-124
    out = extract_office_zip_text_fallback(fixture_bytes("generic/pat_id_1.odt"), "odt")
    assert "Bart Davidson" in out


def test_office_zip_unknown_ext_empty(fixture_bytes):
    assert extract_office_zip_text_fallback(fixture_bytes("generic/pat_id_1.docx"), "xlsx") == ""
