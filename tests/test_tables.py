"""Variant B of the HTML table extractor (html_tables.py
``extract_tables_spanned`` + weburl.q165): the pinned grid dialect —
colspan cursor advance, nested-table close-at-child-start, tolerant
error recovery, and the MAX_CELLS explode cap. Variant A's dialect is
pinned by test_structure.py; the two share one collector state
machine."""

from __future__ import annotations

from ocr_service_spark.extraction.html_tables import (
    MAX_CELLS,
    extract_tables_spanned,
)

SF_DIR = "/root/testdata/sf0.001"


def _grid(payload):
    return list(extract_tables_spanned(payload))


def test_basic_grid_headers_entities_and_empty_cell():
    html = (
        "<table><tr><th>name</th><th>value</th></tr>"
        "<tr><td><b>bold</b> k0 &amp; 7</td><td>v0</td></tr>"
        "<tr><td>k1</td><td></td></tr></table>"
    )
    assert _grid(html) == [
        (0, 0, 0, True, "name"),
        (0, 0, 1, True, "value"),
        (0, 1, 0, False, "bold k0 & 7"),
        (0, 1, 1, False, "v0"),
        (0, 2, 0, False, "k1"),
        (0, 2, 1, False, ""),
    ]


def test_colspan_advances_cursor_and_junk_spans_read_as_one():
    html = (
        '<table><tr><td colspan="2">wide</td><td>after</td></tr></table>'
        '<table><td colspan="x">a</td><td colspan="-3">b</td></table>'
    )
    assert _grid(html) == [
        (0, 0, 0, False, "wide"),
        (0, 0, 2, False, "after"),
        # second table: implicit row, junk colspans read as 1
        (1, 0, 0, False, "a"),
        (1, 0, 1, False, "b"),
    ]


def test_nested_table_closes_the_open_parent_cell():
    html = (
        "<table><tr><td>outer"
        "<table><tr><td>inner</td></tr></table>"
        "</td><td>o2</td></tr></table>"
    )
    assert _grid(html) == [
        (0, 0, 0, False, "outer"),
        (1, 0, 0, False, "inner"),
        (0, 0, 1, False, "o2"),
    ]


def test_unclosed_rows_and_cells_recover():
    # no </td>/</tr> anywhere, table never closed: browser-style
    # recovery — new cells close the previous, close() flushes
    html = "<table><tr><td>a<td>b<tr><td>c"
    assert _grid(html) == [
        (0, 0, 0, False, "a"),
        (0, 0, 1, False, "b"),
        (0, 1, 0, False, "c"),
    ]


def test_cells_outside_any_table_are_ignored():
    assert _grid("<td>stray</td><tr><td>also stray</td></tr>") == []


def test_explode_cap_bounds_a_huge_grid():
    rows = "".join("<tr><td>x</td><td>y</td></tr>" for _ in range(MAX_CELLS))
    cells = extract_tables_spanned("<table>" + rows + "</table>")
    assert len(cells) == MAX_CELLS


def test_bytes_payload_goes_through_charset_ladder():
    html = "<table><tr><td>café</td></tr></table>".encode("utf-8")
    assert _grid(html) == [(0, 0, 0, False, "café")]


def test_q165_planting_matches_parser_end_to_end(spark):
    from ocr_service_spark.operators.weburl import q165_html_tables

    rows = q165_html_tables(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every doc contributes its 6-cell base grid; %3 docs add 2 more
    assert all(len(v) in (6, 8) for v in by_doc.values())
    d12 = sorted(
        (r["table_idx"], r["row_idx"], r["col_idx"], r["cell_text"])
        for r in by_doc[12]  # 12: %3==0 (second table), %4==0 (markup cell)
    )
    assert (1, 0, 2, "after 12") in d12
    assert (0, 1, 0, "bold k0 & 12") in d12
