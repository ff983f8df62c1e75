"""HTML table + heading-outline extraction (document-structure tier).

Structured data the flat text extractor (T1, html_text.py — reference
``converter.py:70-106``) deliberately throws away: ``<table>`` cells
become typed rows and ``<h1>-<h6>`` headings become a section outline
with breadcrumb paths. Both are standard corpus-construction signals —
table cells feed table-to-text / QA pair mining, and section paths feed
section-aware chunking (the structure-preserving twin of q108's sliding
windows). The reference service has no notion of document structure;
this module is beyond-reference like links.py / markdown.py, and is
built on the same stdlib ``html.parser`` tokenizer as T1 so entity
handling is identical across every HTML rung.

Pinned dialect (tables) — shared core, ONE collector state machine,
two published variants:

- tables are numbered by ``<table>`` START-tag document order;
- a nested ``<table>`` gets its own table_idx; a ``<td>``/``<th>``
  before any ``<tr>`` opens implicit row 0; a new
  ``<tr>``/``<td>``/``<th>`` auto-closes any open row/cell (browser
  recovery behavior);
- ``is_header`` is the cell's own tag (``th``), not its row's;
- cell text is the cell's character data (nested non-table markup
  contributes its text, tags stripped by the tokenizer, entities
  unescaped via ``convert_charrefs``) with whitespace runs collapsed
  to single spaces and trimmed;
- output is capped at MAX_CELLS cells per page: a pathological page
  yields a bounded explode, never an unbounded one (same guard as
  links.py MAX_LINKS);
- ``rowspan`` is never projected into later rows in either variant —
  each row's cursor restarts (the pragmatic cell-grid rule HTML-table
  corpora such as WDC use, not the render grid).

Variant A — :func:`extract_tables` (q120 document-structure tier):
``colspan`` is NOT expanded (every cell advances the column cursor by
exactly 1), and a nested table's text does not leak into the enclosing
cell — the parent cell is shadowed during the child and RESUMES after
``</table>`` (its text stitches around the child).

Variant B — :func:`extract_tables_spanned` (q165 grid-semantics
tier): ``colspan`` ADVANCES the column cursor by n (non-numeric or
< 1 values read as 1), so downstream grid consumers see render-true
column positions; a nested ``<table>`` start CLOSES the open parent
cell (the parent's pre-child text is emitted as the finished cell,
matching how grid corpora attribute split cells).

Pinned dialect (headings):

- ``h1``-``h6`` collected in document order; an unclosed heading ends
  at the next heading start tag;
- ``section_path`` is the breadcrumb of the nearest preceding heading
  of each SHALLOWER level joined with " > " (a new h2 replaces the
  previous h2 and pops everything deeper); the path includes the
  heading itself as its last component;
- capped at MAX_HEADINGS per page.

Totality: both collectors never raise on untrusted markup (pinned by
the fuzz suite alongside the other web parsers).
"""

from __future__ import annotations

from html.parser import HTMLParser

MAX_CELLS = 10_000
MAX_HEADINGS = 1_000

_H_LEVELS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


def _collapse(parts: list[str]) -> str:
    return " ".join("".join(parts).split())


def _decode(payload: bytes | str) -> str:
    if isinstance(payload, (bytes, bytearray)):
        from ocr_service_spark.extraction.charset import decode_markup

        return decode_markup(bytes(payload))[1]
    return payload


def _colspan(attrs) -> int:
    try:
        n = int(dict(attrs).get("colspan") or "1")
    except (ValueError, TypeError):
        return 1
    return n if n >= 1 else 1


class _TableCollector(HTMLParser):
    """One state machine, both published dialects (module docstring):
    ``expand_colspan`` switches the per-cell cursor advance from 1 to
    the parsed colspan; ``close_parent_cell`` switches nested-table
    handling from shadow-and-resume to close-at-child-start."""

    def __init__(
        self, *, expand_colspan: bool = False, close_parent_cell: bool = False
    ) -> None:
        super().__init__(convert_charrefs=True)
        # (table_idx, row_idx, col_idx, is_header, cell_text)
        self.cells: list[tuple[int, int, int, bool, str]] = []
        self._expand_colspan = expand_colspan
        self._close_parent_cell = close_parent_cell
        self._n_tables = 0
        # one frame per OPEN table: nested tables push a frame, so the
        # parent's open cell is shadowed (its text excludes the child)
        self._stack: list[dict] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            if self._close_parent_cell and self._stack:
                self._flush_cell()
            self._stack.append(
                {"idx": self._n_tables, "row": -1, "col": 0,
                 "cell": None, "header": False, "span": 1}
            )
            self._n_tables += 1
            return
        if not self._stack:
            return
        if tag == "tr":
            self._flush_cell()
            self._stack[-1]["row"] += 1
            self._stack[-1]["col"] = 0
        elif tag in ("td", "th"):
            self._flush_cell()
            t = self._stack[-1]
            if t["row"] < 0:  # cell before any <tr>: implicit row 0
                t["row"] = 0
            t["cell"] = []
            t["header"] = tag == "th"
            t["span"] = _colspan(attrs) if self._expand_colspan else 1

    def handle_endtag(self, tag: str) -> None:
        if not self._stack:
            return
        if tag in ("td", "th", "tr"):
            self._flush_cell()
        elif tag == "table":
            self._flush_cell()
            self._stack.pop()

    def handle_data(self, data: str) -> None:
        if self._stack and self._stack[-1]["cell"] is not None and data:
            self._stack[-1]["cell"].append(data)

    def _flush_cell(self) -> None:
        t = self._stack[-1]
        if t["cell"] is None:
            return
        if len(self.cells) < MAX_CELLS:
            self.cells.append(
                (t["idx"], max(t["row"], 0), t["col"], t["header"],
                 _collapse(t["cell"]))
            )
        t["col"] += t["span"]
        t["cell"] = None

    def close(self) -> None:  # flush unclosed tables (tolerant parse)
        super().close()
        while self._stack:
            self.handle_endtag("table")


def _run_collector(payload: bytes | str, **knobs) -> list[tuple]:
    parser = _TableCollector(**knobs)
    try:
        parser.feed(_decode(payload))
        parser.close()
    except Exception:
        pass  # keep whatever was collected before the parse error
    return parser.cells


def extract_tables(payload: bytes | str) -> list[tuple[int, int, int, bool, str]]:
    """Payload -> [(table_idx, row_idx, col_idx, is_header, cell_text)]
    in document order, variant A (colspan not expanded, nested parent
    cell resumes). Total: returns [] rather than raising on any input."""
    return _run_collector(payload)


def extract_tables_spanned(
    payload: bytes | str,
) -> list[tuple[int, int, int, bool, str]]:
    """Variant B: colspan advances the column cursor by n; a nested
    table start closes the open parent cell. Same record shape and
    totality as :func:`extract_tables`."""
    return _run_collector(payload, expand_colspan=True, close_parent_cell=True)


class _OutlineCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.headings: list[tuple[int, str]] = []  # (level, text)
        self._level: int | None = None
        self._parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _H_LEVELS:
            self._flush()
            self._level = _H_LEVELS[tag]
            self._parts = []

    def handle_endtag(self, tag: str) -> None:
        if tag in _H_LEVELS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._level is not None and data:
            self._parts.append(data)

    def _flush(self) -> None:
        if self._level is not None and len(self.headings) < MAX_HEADINGS:
            self.headings.append((self._level, _collapse(self._parts)))
        self._level = None
        self._parts = []


def extract_outline(payload: bytes | str) -> list[tuple[int, int, str, str]]:
    """Payload -> [(heading_idx, level, heading_text, section_path)] in
    document order. section_path is the breadcrumb of nearest-shallower
    headings ending in the heading itself (see module dialect). Total."""
    parser = _OutlineCollector()
    try:
        parser.feed(_decode(payload))
        parser.close()
    except Exception:
        pass
    out: list[tuple[int, int, str, str]] = []
    crumb: list[tuple[int, str]] = []  # (level, text) strictly increasing
    for idx, (level, text) in enumerate(parser.headings):
        while crumb and crumb[-1][0] >= level:
            crumb.pop()
        crumb.append((level, text))
        out.append((idx, level, text, " > ".join(t for _, t in crumb)))
    return out
