"""HTML table extraction — tables as structured (row, col, text) cells.

The structured-data sibling of the image-text (images.py) and link
(links.py) parsers: tables are the densest supervised signal on the
web (table-to-text, table QA, entity corpora are all built from
them), and a main-content extractor that flattens ``<td>`` soup into
prose loses the grid. Beyond-reference (CogStack/ocr-service
``processor/processor.py:25-62`` extracts linear text only), built on
the same stdlib tokenizer + charset ladder as the other parsers.

Pinned dialect:

- one record per ``<td>``/``<th>`` cell: ``(table_idx, row_idx,
  col_idx, is_header, text)``;
- ``table_idx`` by document open order; a nested ``<table>`` gets its
  own index and its cells attribute to it (the innermost open table),
  never to the ancestor's grid;
- ``row_idx`` counts ``<tr>`` opens within the table; a cell arriving
  with no open row opens an implicit row (tolerant parse);
- ``col_idx`` is the running column cursor within the row; ``colspan``
  advances it by n (non-numeric / < 1 values read as 1). ``rowspan``
  does NOT project into later rows — each row's cursor starts at 0,
  the pragmatic rule the HTML-table corpora (e.g. WDC) use;
- cell text is the concatenated character data with inline markup
  stripped, entities unescaped, whitespace collapsed — '' for an
  empty cell;
- a new cell/row/table-end implicitly closes an open cell (browsers'
  error recovery);
- output is capped at MAX_CELLS records per document (a million-cell
  scraped grid yields MAX_CELLS rows, not an unbounded explode).
"""

from __future__ import annotations

from html.parser import HTMLParser

MAX_CELLS = 2000


def _collapse(s: str) -> str:
    return " ".join(s.split())


def _span(attrs: dict[str, str]) -> int:
    try:
        n = int(attrs.get("colspan", "1"))
    except ValueError:
        return 1
    return n if n >= 1 else 1


class _TableCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # emitted: (table_idx, row_idx, col_idx, is_header, text)
        self.cells: list[tuple[int, int, int, bool, str]] = []
        self._next_table = 0
        # open-table stack: [table_idx, row_idx, col_cursor, row_open]
        self._tables: list[list] = []
        # open cell: [is_header, colspan, text_parts] or None
        self._cell: list | None = None

    # -- helpers -------------------------------------------------------------
    def _close_cell(self) -> None:
        if self._cell is None or not self._tables:
            self._cell = None
            return
        is_header, span, parts = self._cell
        t = self._tables[-1]
        if len(self.cells) < MAX_CELLS:
            self.cells.append(
                (t[0], t[1], t[2], is_header, _collapse("".join(parts)))
            )
        t[2] += span
        self._cell = None

    # -- tokenizer hooks -----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            self._close_cell()
            self._tables.append([self._next_table, 0, 0, False])
            self._next_table += 1
        elif not self._tables:
            return
        elif tag == "tr":
            self._close_cell()
            t = self._tables[-1]
            if t[3]:
                t[1] += 1
            t[2] = 0
            t[3] = True
        elif tag in ("td", "th"):
            self._close_cell()
            t = self._tables[-1]
            if not t[3]:  # cell with no open row: implicit row
                t[3] = True
            a = {k: (v if v is not None else "") for k, v in attrs}
            self._cell = [tag == "th", _span(a), []]

    def handle_endtag(self, tag: str) -> None:
        if not self._tables:
            return
        if tag in ("td", "th"):
            self._close_cell()
        elif tag == "tr":
            self._close_cell()
            self._tables[-1][3] = False
            self._tables[-1][1] += 1
        elif tag == "table":
            self._close_cell()
            self._tables.pop()

    def handle_data(self, data: str) -> None:
        if self._cell is not None and data:
            self._cell[2].append(data)

    def close(self) -> None:  # flush unclosed tables (tolerant parse)
        super().close()
        while self._tables:
            self.handle_endtag("table")


def extract_tables(payload: bytes | str) -> list[dict]:
    """Document-ordered cell records:
    ``{table_idx, row_idx, col_idx, is_header, text}``."""
    if isinstance(payload, (bytes, bytearray)):
        from ocr_service_spark.extraction.charset import decode_markup

        text = decode_markup(bytes(payload))[1]
    else:
        text = payload
    parser = _TableCollector()
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        pass
    return [
        {
            "table_idx": ti,
            "row_idx": ri,
            "col_idx": ci,
            "is_header": hd,
            "text": tx,
        }
        for ti, ri, ci, hd, tx in parser.cells
    ]
