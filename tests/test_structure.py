"""Document-structure tier: HTML table extraction, heading outlines,
sentence segmentation (extraction/html_tables.py + operators/structure.py).

Unit tests pin the dialect edges the q120/q123 fixtures exercise only
partially (implicit rows, auto-close recovery, caps, deep nesting) plus
fuzz totality over untrusted markup, mirroring test_web_fuzz.py."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.extraction.html_tables import (
    MAX_CELLS,
    MAX_HEADINGS,
    extract_outline,
    extract_tables,
)


def test_basic_table_grid():
    cells = extract_tables(
        b"<table><tr><th>a</th><th>b</th></tr>"
        b"<tr><td>1</td><td>2</td></tr></table>"
    )
    assert cells == [
        (0, 0, 0, True, "a"),
        (0, 0, 1, True, "b"),
        (0, 1, 0, False, "1"),
        (0, 1, 1, False, "2"),
    ]


def test_inline_markup_entities_and_whitespace_collapse():
    cells = extract_tables(
        b"<table><tr><td> a <b>b &amp; c</b>\n\t d </td></tr></table>"
    )
    assert cells == [(0, 0, 0, False, "a b & c d")]


def test_unclosed_cells_autoclose_like_browsers():
    # no </td> or </tr> anywhere: a new td/tr closes the open one
    cells = extract_tables(b"<table><tr><td>a<td>b<tr><td>c</table>")
    assert cells == [
        (0, 0, 0, False, "a"),
        (0, 0, 1, False, "b"),
        (0, 1, 0, False, "c"),
    ]


def test_cell_before_any_tr_opens_implicit_row_zero():
    cells = extract_tables(b"<table><td>x</td></table>")
    assert cells == [(0, 0, 0, False, "x")]


def test_nested_table_isolated_from_parent_cell():
    cells = extract_tables(
        b"<table><tr><td>outer "
        b"<table><tr><td>inner</td></tr></table>"
        b" tail</td></tr></table>"
    )
    assert (1, 0, 0, False, "inner") in cells
    assert (0, 0, 0, False, "outer tail") in cells
    assert len(cells) == 2


def test_text_outside_tables_and_orphan_cells_ignored():
    assert extract_tables(b"<p>no tables here</p>") == []
    # td/tr outside any <table> contribute nothing
    assert extract_tables(b"<tr><td>orphan</td></tr>") == []


def test_table_cell_cap_bounds_explode():
    page = b"<table>" + b"<tr><td>x</td></tr>" * (MAX_CELLS + 50) + b"</table>"
    assert len(extract_tables(page)) == MAX_CELLS


def test_outline_breadcrumbs_pop_and_nest():
    out = extract_outline(
        b"<h1>A</h1><h2>B</h2><h3>C</h3><h2>D</h2><h1>E</h1>"
    )
    assert [(lvl, path) for _, lvl, _, path in out] == [
        (1, "A"),
        (2, "A > B"),
        (3, "A > B > C"),
        (2, "A > D"),  # h2 pops the previous h2 and its h3
        (1, "E"),  # h1 pops everything
    ]
    assert [i for i, _, _, _ in out] == [0, 1, 2, 3, 4]


def test_outline_deep_heading_without_ancestors():
    # an h4 with no open shallower headings is its own path
    out = extract_outline(b"<h4>lonely</h4>")
    assert out == [(0, 4, "lonely", "lonely")]


def test_outline_unclosed_heading_ends_at_next_heading():
    out = extract_outline(b"<h1>A<h2>B</h2>")
    assert [(lvl, txt) for _, lvl, txt, _ in out] == [(1, "A"), (2, "B")]


def test_outline_inline_markup_stripped():
    out = extract_outline(b"<h1>Doc <em>7</em>!</h1>")
    assert out[0][2] == "Doc 7!"


def test_outline_cap():
    page = b"<h2>x</h2>" * (MAX_HEADINGS + 10)
    assert len(extract_outline(page)) == MAX_HEADINGS


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_tables_total_over_untrusted_bytes(payload: bytes) -> None:
    cells = extract_tables(payload)
    assert len(cells) <= MAX_CELLS
    for tbl, row, col, hdr, text in cells:
        assert tbl >= 0 and row >= 0 and col >= 0
        assert isinstance(hdr, bool) and isinstance(text, str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2048))
def test_outline_total_over_untrusted_text(markup: str) -> None:
    out = extract_outline(markup.encode())
    assert len(out) <= MAX_HEADINGS
    for idx, level, text, path in out:
        assert 1 <= level <= 6
        assert path.endswith(text) if text else isinstance(path, str)


def test_segment_sentences_spark(spark):
    from ocr_service_spark.operators.structure import segment_sentences

    df = spark.createDataFrame(
        [(1, "One two. Three!  Four? Five no terminator"),
         (2, "no boundary at all"),
         (3, "ends with period. ")],
        "doc_id bigint, text string",
    )
    rows = {
        (r.doc_id, r.sent_idx): r.sentence
        for r in segment_sentences(df).collect()
    }
    assert rows[(1, 0)] == "One two."
    assert rows[(1, 1)] == "Three!"
    assert rows[(1, 2)] == "Four?"
    assert rows[(1, 3)] == "Five no terminator"
    assert rows[(2, 0)] == "no boundary at all"
    # trailing "<term><spaces>" yields no empty trailing sentence
    assert [k for k in rows if k[0] == 3] == [(3, 0)]
    assert rows[(3, 0)] == "ends with period."
