"""Main-content extraction: block-level text-density boilerplate strip.

The north-star pipeline calls for a trafilatura-style DOM boilerplate
stripper over Common-Crawl-style pages — distinct from the reference's
all-strings fallback (html_text.py, which reproduces the reference's
bs4 get_text semantics byte-for-byte). This module is the
from-scratch, deterministic block model, built on the same stdlib
HTMLParser tokenizer:

1. the document is segmented into BLOCKS at block-level tag
   boundaries (p, div, li, h1-h6, td, article, ...);
2. each block accumulates: visible text, inline-tag count, chars
   inside <a>, and whether any ancestor is structural boilerplate
   (nav/header/footer/aside/form) or non-content (script/style/
   noscript/template/svg);
3. blocks are kept when they look like prose: enough characters,
   low link density, high text-per-inline-tag density, no
   boilerplate ancestor;
4. kept blocks are joined with "\n".

All thresholds are module constants so the Spark operator and the
DuckDB roundtrip oracle (operators/main_content.py) agree exactly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

# block segmentation boundaries
BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html",
    "li", "main", "nav", "ol", "p", "pre", "section", "table", "tbody",
    "td", "tfoot", "th", "thead", "title", "tr", "ul",
}
# subtree is never content
DROP_TAGS = {"script", "style", "noscript", "template", "svg", "head"}
# subtree is structural boilerplate (kept out of main text)
BOILERPLATE_TAGS = {"nav", "header", "footer", "aside", "form"}
MIN_BLOCK_CHARS = 25      # prose floor
MAX_LINK_DENSITY = 1 / 3  # chars inside <a> / chars
MIN_TEXT_DENSITY = 8.0    # chars per (1 + inline tag)

_WS = re.compile(r"\s+")


@dataclass
class Block:
    text_parts: list[str] = field(default_factory=list)
    n_inline_tags: int = 0
    n_link_chars: int = 0
    boilerplate: bool = False
    # source character span of the block's visible text (set only by
    # _SpanBlockParser): [span_start, span_end) in the decoded source
    span_start: int | None = None
    span_end: int | None = None

    @property
    def text(self) -> str:
        return _WS.sub(" ", "".join(self.text_parts)).strip()

    def keep(self) -> bool:
        text = self.text
        if self.boilerplate or len(text) < MIN_BLOCK_CHARS:
            return False
        if self.n_link_chars / max(len(text), 1) > MAX_LINK_DENSITY:
            return False
        return len(text) / (1 + self.n_inline_tags) >= MIN_TEXT_DENSITY


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._cur = Block()
        self._drop_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0

    def _flush(self) -> None:
        if self._cur.text_parts or self._cur.n_inline_tags:
            self.blocks.append(self._cur)
        self._cur = Block()
        self._cur.boilerplate = self._boiler_depth > 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if tag in BOILERPLATE_TAGS:
            self._flush()
            self._boiler_depth += 1
            self._cur.boilerplate = True
            return
        if tag in BLOCK_TAGS:
            self._flush()
            return
        if self._drop_depth == 0:
            self._cur.n_inline_tags += 1
            if tag == "a":
                self._link_depth += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS or tag in BOILERPLATE_TAGS or tag in BLOCK_TAGS:
            # a self-closing structural tag is an empty open+close
            self.handle_starttag(tag, attrs)
            self.handle_endtag(tag)
        elif self._drop_depth == 0:
            self._cur.n_inline_tags += 1  # inline void (img, input, ...)

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag in BOILERPLATE_TAGS:
            self._flush()
            self._boiler_depth = max(0, self._boiler_depth - 1)
            self._cur.boilerplate = self._boiler_depth > 0
            return
        if tag in BLOCK_TAGS:
            self._flush()
            return
        # only balance <a> outside dropped subtrees: handle_starttag
        # never increments inside one, so an </a> within e.g. an <svg>
        # icon inside an anchor must not zero the accounting and let a
        # link farm's text escape the link-density filter
        if tag == "a" and self._drop_depth == 0 and self._link_depth > 0:
            self._link_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        self._cur.text_parts.append(data)
        if self._link_depth:
            self._cur.n_link_chars += len(_WS.sub(" ", data).strip())

    def close(self) -> None:  # flush the trailing block
        super().close()
        self._flush()


def html_blocks(stream: bytes) -> list[Block]:
    parser = _BlockParser()
    parser.feed(unescape_safe(stream))
    parser.close()
    return parser.blocks


_CHARREF_RE = re.compile(r"&(?:#[0-9]+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")


class _SpanBlockParser(_BlockParser):
    """_BlockParser that additionally records, per block, the raw-source
    character span its visible text was read from.

    Span definition (the one the north rule's "extracted text/spans per
    document" asks for): ``span_start`` is the source offset of the
    first non-whitespace visible text run of the block; ``span_end`` is
    the source offset of the markup event that terminates the block's
    last visible text run (exclusive). Anchoring the end at the NEXT
    markup event — instead of adding the decoded text length — keeps
    spans exact even when a run contains character references
    (``&amp;`` decodes to 1 char but occupies 5 source chars).
    HTMLParser's ``getpos()`` is (lineno, col); a precomputed
    line-start table converts it to an absolute offset.
    """

    def __init__(self, source: str) -> None:
        super().__init__()
        self._line_starts = [0]
        start = 0
        while True:
            nl = source.find("\n", start)
            if nl < 0:
                break
            start = nl + 1
            self._line_starts.append(start)
        self._source = source
        self._source_len = len(source)
        self._data_open = False

    def _abs(self) -> int:
        lineno, col = self.getpos()
        return self._line_starts[lineno - 1] + col

    def _seal(self) -> None:
        # close the current text run at this markup event's position
        if self._data_open:
            if self._cur.span_start is not None:
                self._cur.span_end = self._abs()
            self._data_open = False

    def handle_starttag(self, tag: str, attrs) -> None:
        self._seal()
        super().handle_starttag(tag, attrs)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._seal()
        super().handle_startendtag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        self._seal()
        super().handle_endtag(tag)

    def handle_comment(self, data: str) -> None:
        self._seal()

    def handle_decl(self, decl: str) -> None:
        self._seal()

    def handle_pi(self, data: str) -> None:
        self._seal()

    def handle_data(self, data: str) -> None:
        if self._drop_depth == 0 and data.strip():
            if self._cur.span_start is None:
                # anchor at the first non-whitespace char of the run,
                # advancing in SOURCE text: the decoded run's leading
                # whitespace may be spelled as character references
                # (&#32; is 5 source chars for 1 decoded char), so
                # counting decoded chars would land mid-entity
                self._cur.span_start = self._skip_source_ws(self._abs())
            self._data_open = True
        super().handle_data(data)

    def _skip_source_ws(self, i: int) -> int:
        """Advance past source chars (and character references) that
        decode to whitespace, stopping at the first visible char."""
        from html import unescape as _unescape

        src = self._source
        while i < len(src):
            ch = src[i]
            if ch.isspace():
                i += 1
                continue
            if ch == "&":
                m = _CHARREF_RE.match(src, i)
                if m:
                    decoded = _unescape(m.group(0))
                    if decoded != m.group(0) and decoded.isspace():
                        i = m.end()
                        continue
            break
        return i

    def close(self) -> None:
        if self._data_open and self._cur.span_start is not None:
            self._cur.span_end = self._source_len
            self._data_open = False
        super().close()


def html_block_spans(stream: bytes) -> list[Block]:
    source = unescape_safe(stream)
    parser = _SpanBlockParser(source)
    parser.feed(source)
    parser.close()
    return parser.blocks


def extract_content_spans(stream: bytes) -> list[tuple[int, int, int, str]]:
    """Kept-block source spans: [(kept_idx, span_start, span_end,
    normalized_text), ...] — the span table the north rule pairs with
    the extracted text (reference twin: the service returns only the
    concatenated text; spans are the Spark-side addition that lets a
    100 TB consumer slice the original page bytes without re-parsing).
    """
    out: list[tuple[int, int, int, str]] = []
    for b in html_block_spans(stream):
        if b.keep() and b.span_start is not None and b.span_end is not None:
            # the extra unescape over already-decoded text is DELIBERATE
            # reference parity: the service runs a second html.unescape
            # pass after parsing (html_text.py's T6 rule), and the span
            # text must match the extracted-text tier byte-for-byte
            out.append((len(out), b.span_start, b.span_end, unescape(b.text)))
    return out


def unescape_safe(stream: bytes) -> str:
    return stream.decode("utf-8", "ignore")


def extract_main_content(stream: bytes) -> tuple[str, int, int]:
    """(main_text, n_blocks_kept, n_blocks_total). Deterministic; ''
    when nothing passes the prose filters."""
    blocks = html_blocks(stream)
    kept = [b for b in blocks if b.keep()]
    text = "\n".join(unescape(b.text) for b in kept)
    return text, len(kept), len(blocks)
