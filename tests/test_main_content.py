"""Block text-density main-content extraction (extraction/main_content.py):
the north-star boilerplate stripper, distinct from the reference-parity
all-strings fallback."""

from __future__ import annotations

from ocr_service_spark.extraction.main_content import (
    MIN_BLOCK_CHARS,
    extract_main_content,
    html_blocks,
)

PAGE = b"""<!DOCTYPE html><html><head><title>Site</title><style>p{}</style></head><body>
<nav><a href="/">home</a> <a href="/a">about</a> <a href="/c">contact</a></nav>
<header><h1>Brand Site Name Here</h1></header>
<div class="sidebar"><a href="1">link one</a> <a href="2">link two</a> <a href="3">many more links</a></div>
<article>
<p>This is the real article paragraph with plenty of prose content that a reader actually wants to read.</p>
<p>Second real paragraph also long enough to be kept by the density filters with no links inside.</p>
<p>short</p>
<p>A paragraph long enough but mostly <a href="x">one giant link covering most of the characters in this block of text</a> y.</p>
</article>
<footer>copyright line that is plenty long enough to pass the chars floor</footer>
</body></html>"""


def test_keeps_prose_drops_boilerplate():
    text, kept, total = extract_main_content(PAGE)
    assert kept == 2
    assert text.startswith("This is the real article paragraph")
    assert "Second real paragraph" in text
    # boilerplate, short, and link-heavy blocks all die
    for bad in ("home", "Brand Site", "link one", "short", "giant link", "copyright"):
        assert bad not in text
    assert total > kept


def test_footer_dropped_even_when_long():
    # structural ancestor beats length: the footer above clears
    # MIN_BLOCK_CHARS but must still be dropped
    blocks = html_blocks(PAGE)
    footers = [b for b in blocks if "copyright" in b.text]
    assert footers and all(b.boilerplate for b in footers)
    assert all(not b.keep() for b in footers)


def test_script_style_never_content():
    page = (
        b"<body><script>var x = 'this is a long script body over the floor';"
        b"</script><p>Real paragraph content that is long enough to keep here.</p></body>"
    )
    text, kept, _ = extract_main_content(page)
    assert kept == 1
    assert "script body" not in text


def test_entities_unescaped_in_output():
    page = (
        b"<p>Fish &amp; chips is a paragraph long enough to pass every filter "
        b"threshold easily.</p>"
    )
    text, kept, _ = extract_main_content(page)
    assert kept == 1
    assert "Fish & chips" in text


def test_degenerate_inputs():
    assert extract_main_content(b"") == ("", 0, 0)
    short = b"<p>tiny</p>"
    text, kept, _ = extract_main_content(short)
    assert (text, kept) == ("", 0)
    # bare text with no tags at all: one block, kept if long enough
    bare = b"bare prose with no markup at all but comfortably over the floor"
    text, kept, _ = extract_main_content(bare)
    assert kept == 1 and text.startswith("bare prose")
    assert len(bare) >= MIN_BLOCK_CHARS


def test_nested_boilerplate_restores_state():
    page = (
        b"<nav><div><a href='/'>deep nav link</a></div></nav>"
        b"<p>Content paragraph after the nav that is clearly long enough to keep.</p>"
        b"<footer><nav><a href='x'>f</a></nav></footer>"
        b"<p>Another content paragraph after the footer, also long enough to keep.</p>"
    )
    text, kept, _ = extract_main_content(page)
    assert kept == 2
    assert "deep nav link" not in text


# -- fuzz: block parser must never raise ------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_fuzz_junk_never_raises(junk: bytes):
    text, kept, total = extract_main_content(junk)
    assert isinstance(text, str) and kept <= total


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="<>ap/ bhnrv&#;x1=\"'", max_size=400))
def test_fuzz_taglike_text_never_raises(s: str):
    text, kept, total = extract_main_content(s.encode())
    assert isinstance(text, str) and kept <= total


# -- source spans (the north rule's "text/spans per document") ----------------
from ocr_service_spark.extraction.main_content import (
    extract_content_spans,
    html_block_spans,
)


def test_spans_slice_back_to_source():
    # every kept block's span, sliced out of the source, whitespace-
    # normalizes to exactly the block's extracted text
    import re
    src = PAGE.decode()
    spans = extract_content_spans(PAGE)
    assert len(spans) == 2
    for idx, (i, s, e, text) in enumerate(spans):
        assert i == idx and 0 <= s < e <= len(src)
        assert re.sub(r"\s+", " ", src[s:e]).strip() == text


def test_span_exact_single_line():
    pre = '<html><body><nav><a href="/">x</a></nav><p>'
    body = "A deterministic paragraph long enough to clear every filter."
    src = pre + body + "</p></body></html>"
    spans = extract_content_spans(src.encode())
    assert spans == [(0, len(pre), len(pre) + len(body), body)]


def test_span_end_exact_with_charrefs():
    # &amp; decodes to 1 char but occupies 5 source chars: the span end
    # anchors at the closing tag, so the source slice stays exact
    src = "<body><p>Alpha &amp; beta gamma delta epsilon zeta eta theta!</p></body>"
    [(_, s, e, text)] = extract_content_spans(src.encode())
    assert src[s:e] == "Alpha &amp; beta gamma delta epsilon zeta eta theta!"
    assert text == "Alpha & beta gamma delta epsilon zeta eta theta!"


def test_span_multiline_and_comment_sealed():
    src = (
        "<html>\n<body>\n  <p>\n    First kept paragraph with plenty of prose"
        " to clear the floor.\n  </p>\n  <!-- comment -->\n"
        "  <p>Second kept paragraph also long enough for the prose floor.</p>\n"
        "</body>\n</html>"
    )
    spans = extract_content_spans(src.encode())
    assert len(spans) == 2
    (_, s0, e0, t0), (_, s1, e1, t1) = spans
    assert src[s0] == "F" and src[s1] == "S"  # starts skip whitespace
    # first span ends at the </p> markup, not past the comment
    assert src[e0:].lstrip().startswith("</p>")
    assert t0.startswith("First kept") and t1.startswith("Second kept")


def test_span_blocks_match_plain_blocks():
    # the span parser must keep/drop exactly the same blocks as the
    # plain parser it subclasses
    plain = [(b.text, b.keep()) for b in html_blocks(PAGE)]
    spanned = [(b.text, b.keep()) for b in html_block_spans(PAGE)]
    assert plain == spanned


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_fuzz_spans_never_raise_and_stay_in_bounds(junk: bytes):
    src = junk.decode("utf-8", "ignore")
    for i, s, e, text in extract_content_spans(junk):
        assert 0 <= s < e <= len(src)
        assert isinstance(text, str)


def test_span_start_skips_entity_encoded_leading_whitespace():
    """char_start must slice the ORIGINAL source at the first visible
    char even when the leading whitespace is spelled as character
    references (&#32; is 5 source chars for 1 decoded char) — counting
    decoded chars landed mid-entity (round-5 review fix)."""
    from ocr_service_spark.extraction.main_content import extract_content_spans

    body = (
        "Hello world this is a fine paragraph of prose text, "
        "with enough words to keep."
    )
    src = f"<p>&#32;&#32;{body}</p>".encode()
    spans = extract_content_spans(src)
    assert len(spans) == 1
    _, a, b, txt = spans[0]
    assert src.decode()[a:b] == body
    # a leading ref that decodes to a VISIBLE char anchors AT the ref
    src2 = f"<p>&amp; {body}</p>".encode()
    (_, a2, b2, _t2), = extract_content_spans(src2)
    assert src2.decode()[a2:b2] == f"&amp; {body}"


def test_link_density_survives_anchor_with_dropped_svg_inside():
    """</a> inside a dropped subtree (svg icon in an anchor) must not
    zero the link accounting — otherwise a 100%-link block slips past
    the link-density filter."""
    from ocr_service_spark.extraction.main_content import html_blocks

    body = (
        '<p><a href="x">spam spam <svg><a></a></svg> fifty more chars of '
        "pure link text to make this block long enough</a></p>"
    )
    blocks = [b for b in html_blocks(body.encode()) if b.text]
    assert len(blocks) == 1
    b = blocks[0]
    # essentially every visible char is inside the outer anchor (the
    # per-chunk trim can undercount a boundary space or two)
    assert b.n_link_chars >= len(b.text) - 2
    assert not b.keep()
