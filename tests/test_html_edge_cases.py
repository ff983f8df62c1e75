"""Tricky-markup pins for the T1 HTML extractor: these lock the stdlib
tokenizer behaviors the byte-parity claim rests on (bs4's html.parser
builder bottoms out in the same CPython tokenizer)."""

from __future__ import annotations

from ocr_service_spark.extraction.html_text import html_all_strings, html_to_text


def test_script_containing_markup_is_cdata():
    # tokenizer stays in CDATA mode until the real </script>
    html = b"<script>if (a < b) { x = '</p>'; }</script><p>after</p>"
    out = html_all_strings(html)
    assert "if (a < b)" in out
    assert "after" in out


def test_entities_without_semicolon():
    # convert_charrefs resolves known entity prefixes without ';'
    assert html_to_text(b"<p>a&ampb</p>") == "a&b"


def test_numeric_and_hex_charrefs():
    assert html_to_text(b"<p>&#65;&#x42;</p>") == "AB"


def test_attribute_with_gt_inside_quotes():
    html = b'<a title="x > y">link</a>'
    assert html_all_strings(html) == "link"


def test_malformed_comment_variants():
    # a proper comment vanishes; the malformed "<!--->" tail is emitted
    # as character data by the tokenizer (and survives the strip
    # regexes: neither `<[^>]+/>` nor `</?[\w:.-]+>` matches it)
    assert html_all_strings(b"<!-- ok --><p>a</p><!--->b") == "a\n<!--->\nb"
    assert html_to_text(b"<!-- ok --><p>a</p><!--->b") == "a\n<!--->\nb"


def test_unclosed_tags_text_survives():
    html = b"<div><p>one<p>two<div>three"
    assert html_all_strings(html) == "one\ntwo\nthree"


def test_mixed_case_tags_and_void_elements():
    html = b"<P>one</P><BR/><IMG src=x><p>two</p>"
    assert html_all_strings(html) == "one\ntwo"


def test_text_after_html_close():
    html = b"<html><body>in</body></html>trailing"
    assert html_all_strings(html) == "in\ntrailing"


def test_nested_entities_double_unescape():
    # one parser unescape + the explicit second pass (converter.py:106)
    assert html_to_text(b"<p>&amp;lt;tag&amp;gt;</p>") == "<tag>"


def test_tag_strip_regex_hits_literal_markup_after_double_unescape():
    # literal "<b>" appears only after the parser pass; the bare-tag
    # regex then strips it (converter.py:93-95 applies before unescape,
    # so &amp;lt;... survives as markup text)
    out = html_to_text(b"<p>&lt;i/&gt; kept</p>")
    assert out == " kept"
