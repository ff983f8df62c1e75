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
# void/self-closing tags never get an end tag
VOID_TAGS = {"area", "base", "br", "col", "embed", "hr", "img", "input",
             "link", "meta", "source", "track", "wbr"}

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
        if tag == "a" and self._link_depth > 0:
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


def unescape_safe(stream: bytes) -> str:
    return stream.decode("utf-8", "ignore")


def extract_main_content(stream: bytes) -> tuple[str, int, int]:
    """(main_text, n_blocks_kept, n_blocks_total). Deterministic; ''
    when nothing passes the prose filters."""
    blocks = html_blocks(stream)
    kept = [b for b in blocks if b.keep()]
    text = "\n".join(unescape(b.text) for b in kept)
    return text, len(kept), len(blocks)
