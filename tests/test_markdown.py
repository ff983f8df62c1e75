"""HTML -> Markdown converter (extraction/markdown.py): the pinned
dialect, edge semantics, and the Spark mapInPandas stage shape."""

from __future__ import annotations

from ocr_service_spark.extraction.markdown import (
    html_to_markdown,
    html_to_markdown_blocks,
)

FULL = (
    "<!DOCTYPE html><html><head><title>t</title><style>p{}</style>"
    "<script>var x=1;</script></head><body>\n"
    "<h1>Doc 5</h1>\n<h3>Deep</h3>\n"
    "<p>Some body   text\nhere.</p>\n"
    '<ul><li>alpha</li><li><b>beta</b> <a href="https://ex.org/5">link 5</a></li></ul>\n'
    "<ol><li>one</li><li><i>two</i> and <code>x_5</code></li></ol>\n"
    "<blockquote><p>quoted</p></blockquote>\n"
    "<pre>raw_5\n  line2</pre>\n"
    "</body></html>"
)


def test_full_dialect():
    assert html_to_markdown(FULL) == (
        "# Doc 5\n\n"
        "### Deep\n\n"
        "Some body text here.\n\n"
        "- alpha\n- **beta** [link 5](https://ex.org/5)\n\n"
        "1. one\n2. *two* and `x_5`\n\n"
        "> quoted\n\n"
        "```\nraw_5\n  line2\n```"
    )


def test_head_content_dropped():
    md = html_to_markdown(
        "<head><title>TITLE</title><style>h1{}</style><script>s()</script></head>"
        "<body><p>kept</p></body>"
    )
    assert md == "kept"


def test_implicit_paragraph_and_entities():
    # text outside any block element forms a paragraph; entities fold in
    assert html_to_markdown("<body>a &amp; b<p>c</p>tail</body>") == "a & b\n\nc\n\ntail"


def test_br_is_a_space_and_whitespace_collapses():
    assert html_to_markdown("<p>a<br>b   c\t\nd</p>") == "a b c d"


def test_anchor_without_href_is_bare_text():
    assert html_to_markdown('<p><a name="x">plain</a></p>') == "plain"


def test_inline_markers_trim_inner_edges():
    # edge whitespace inside <b> must stay OUTSIDE the ** markers
    assert html_to_markdown("<p>x <b> bold </b> y</p>") == "x **bold** y"


def test_empty_emphasis_vanishes():
    assert html_to_markdown("<p>x <b>  </b> y</p>") == "x y"


def test_mis_nested_inline_tolerated():
    # </i></b> closing order flipped: nearest-match pop keeps output sane
    md = html_to_markdown("<p><b>a <i>b</b> c</i></p>")
    assert "a" in md and "b" in md and "c" in md and md.count("**") in (0, 2)


def test_nested_list_flattens_into_parent():
    md = html_to_markdown(
        "<ul><li>top<ul><li>inner</li></ul></li><li>after</li></ul>"
    )
    assert md == "- top\n- inner\n- after"


def test_ordered_numbering_restarts_per_list():
    md = html_to_markdown("<ol><li>a</li></ol><ol><li>b</li><li>c</li></ol>")
    assert md == "1. a\n\n1. b\n2. c"


def test_nested_blockquote_stacks_prefixes():
    md = html_to_markdown(
        "<blockquote><p>outer</p><blockquote><p>inner</p></blockquote></blockquote>"
    )
    assert md == "> outer\n\n> > inner"


def test_pre_preserves_verbatim_and_inner_tags_ignored():
    md = html_to_markdown("<pre>\ndef f():\n    return 1  \n</pre>")
    assert md == "```\ndef f():\n    return 1  \n```"


def test_unclosed_li_and_trailing_list_flushed():
    assert html_to_markdown("<ul><li>a<li>b</ul>") == "- a\n- b"
    # document ends with the list never closed
    assert html_to_markdown("<ul><li>a<li>b") == "- a\n- b"


def test_structural_tags_transparent():
    md = html_to_markdown("<div><span>x</span> <em>y</em></div><p>z</p>")
    assert md == "x *y*\n\nz"


def test_bytes_input_charset_ladder():
    md = html_to_markdown("<p>café</p>".encode("utf-8"))
    assert md == "café"


def test_empty_and_hostile_inputs():
    assert html_to_markdown(b"") == ""
    assert html_to_markdown(b"<p>") == ""
    assert html_to_markdown_blocks(b"</b></p></ul>") == []


def test_spark_stage_shape(spark):
    from pyspark.sql import functions as F

    from ocr_service_spark.operators.markdown_ops import html_to_markdown_table

    pages = spark.createDataFrame(
        [("u1", b"<h1>T</h1><p>body</p>"), ("u2", None)], "url string, html binary"
    )
    out = html_to_markdown_table(pages)
    rows = {r["url"]: r for r in out.collect()}
    assert rows["u1"]["markdown"] == "# T\n\nbody"
    assert rows["u1"]["n_blocks"] == 2
    assert rows["u2"]["markdown"] == "" and rows["u2"]["n_blocks"] == 0
    # zero shuffles: the whole stage is one mapInPandas over the scan
    jvm = out.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = out._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in plan


def test_block_elements_inside_li_stay_in_the_list():
    """<li><p>...</p></li> is the common real-world shape: the item's
    content must stay ON its list line, never hoisted out (round-5
    review fix — flushing on the inner <p> consumed the pending '- '
    prefix and emitted the body before the list)."""
    from ocr_service_spark.extraction.markdown import html_to_markdown

    assert (
        html_to_markdown("<ul><li>a</li><li><p>b</p></li><li>c</li></ul>")
        == "- a\n- b\n- c"
    )
    # adjacent inner blocks join with a single space
    assert html_to_markdown("<ul><li><p>x</p><p>y</p></li></ul>") == "- x y"
    # headings inside items are transparent too
    assert (
        html_to_markdown("<ol><li><h2>t</h2> rest</li><li>z</li></ol>")
        == "1. t rest\n2. z"
    )
    # nested lists still flatten after the parent item
    assert (
        html_to_markdown("<ul><li>a<ul><li>n</li></ul></li></ul>") == "- a\n- n"
    )


def test_empty_anchor_and_unclosed_nested_list():
    from ocr_service_spark.extraction.markdown import html_to_markdown

    # image-only anchor (logo link) must not emit a stray [](url)
    assert (
        html_to_markdown('<p>x</p><a href="/"><img src="l.png"></a><p>y</p>')
        == "x\n\ny"
    )
    # input truncated mid-list: document order preserved (outer first)
    assert html_to_markdown("<ul><li>outer<ul><li>inner</li>") == "- outer\n- inner"


# -- fuzz: html_to_markdown is total and deterministic ------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=2048))
def test_html_to_markdown_fuzz_text_never_raises(s: str):
    out = html_to_markdown(s)
    assert isinstance(out, str)
    assert html_to_markdown(s) == out  # deterministic


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_html_to_markdown_fuzz_bytes_never_raises(b: bytes):
    out = html_to_markdown(b)
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(
    ["<p>", "</p>", "<li>", "<td>", "<h1>", "</h1>", "<table>", "</ul>",
     "<a href='x'>", "</a>", "<pre>", "</pre>", "<blockquote>", "x & < > \"']]>",
     "<![CDATA[", "<!--", "-->", "<br>", "<img src=y>", "&#x41;", "&amp;", "\x00"]
), max_size=40))
def test_html_to_markdown_fuzz_tag_soup_never_raises(parts: list):
    out = html_to_markdown("".join(parts))
    assert isinstance(out, str)
