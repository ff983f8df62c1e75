"""HTML -> Markdown conversion (structured-text tier).

Most LLM web corpora ship the extracted page as *Markdown*, not flat
text: headings, lists, links, and code blocks carry structure the
model can learn from (cf. the reference's flat ``get_text`` path,
converter.py:70-106, which this tier deliberately goes beyond). This
module is a from-scratch converter on the stdlib ``html.parser``
tokenizer — the same foundation as ``html_text.py`` — with precisely
pinned, deterministic output semantics so the whole stage is
closed-form oracle-checkable in DuckDB (q110).

Output contract (the pinned dialect):

- blocks (h1-h6, p, li groups, pre, blockquote content) are joined
  with one blank line (``"\\n\\n"``);
- inline whitespace inside a block collapses to single spaces and the
  block is edge-trimmed; NFC/entity handling is the tokenizer's
  (``convert_charrefs=True`` folds entities into text);
- ``h1``-``h6`` -> ``#``*level + space + text;
- ``ul``/``ol`` -> one block, one line per ``li``: ``- item`` for
  unordered, ``1. item`` / ``2. item`` (1-based, per list) for
  ordered; nested lists are flattened into their own lines after the
  parent item (depth is not indented — pinned, documented);
- ``a href`` -> ``[text](href)``; an ``a`` without href -> bare text;
- ``b``/``strong`` -> ``**text**``; ``i``/``em`` -> ``*text*``;
  ``code`` (outside ``pre``) -> `` `text` `` — inner text is
  collapse-trimmed *before* the markers attach, so markers never
  enclose edge whitespace;
- ``pre`` -> a fenced block: ```` ``` ```` + raw inner text (verbatim,
  no collapse, edge newlines stripped) + ```` ``` ````;
- ``blockquote`` -> every line of every block it contains gets a
  ``"> "`` prefix (nested quotes stack prefixes);
- ``br`` inside a block contributes a single space (collapse rule);
- block elements opening INSIDE an ``li`` (``<li><p>…</p></li>``,
  headings in items) are transparent: their text joins the item line
  with a single space at each block boundary — flushing there would
  hoist the content out of the list (pinned, documented);
- ``script``/``style``/``title``/``head`` contents, comments, doctype
  and processing instructions are dropped;
- text that appears outside any block element forms an implicit
  paragraph (flushed when the next block opens or the document ends).

100 TB shape: the converter is pure per-document Python executed via
one Arrow-batched ``mapInPandas`` (see operators/markdown_ops.py) —
zero shuffles, column-pruned scan, the same single-pass branch shape
as the extraction job's T1 path.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"\s+")

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_INLINE_MARKS = {
    "b": ("**", "**"),
    "strong": ("**", "**"),
    "i": ("*", "*"),
    "em": ("*", "*"),
    "code": ("`", "`"),
}
_SKIP_CONTENT = {"script", "style", "title"}


def _collapse(s: str) -> str:
    return _WS.sub(" ", s).strip()


class _MarkdownBuilder(HTMLParser):
    """Single-pass block/inline state machine producing Markdown blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self.frags: list[str] = []          # current block's fragments
        self.block_prefix: str = ""          # e.g. "## " or "- " or "3. "
        self.in_block = False                # explicit block element open
        self.skip_depth = 0                  # inside script/style/title
        self.pre_depth = 0                   # inside <pre>
        self.pre_parts: list[str] = []
        self.quote_depth = 0
        self.list_stack: list[list] = []     # ["ul"] or ["ol", counter]
        self.list_lines: list[list[str]] = []  # lines per open list
        self.inline_stack: list[tuple] = []  # (tag, frag_pos, extra)

    # -- block helpers -------------------------------------------------
    def _flush_block(self) -> None:
        """Finalize the current fragment buffer into a block (or a list
        line when a list is open)."""
        text = _collapse("".join(self.frags))
        self.frags = []
        prefix, self.block_prefix = self.block_prefix, ""
        self.in_block = False
        self.inline_stack = []
        if not text:  # empty blocks (and empty list items) vanish
            return
        line = prefix + text
        if self.list_lines and prefix and (prefix == "- " or prefix[:1].isdigit()):
            self.list_lines[-1].append(line)
            return
        if self.quote_depth:
            q = "> " * self.quote_depth
            line = "\n".join(q + ln for ln in line.split("\n"))
        self.blocks.append(line)

    def _in_list_item(self) -> bool:
        """An <li> block is currently open (its prefix is pending)."""
        return self.in_block and (
            self.block_prefix == "- " or self.block_prefix[:1].isdigit()
        )

    def _flush_implicit(self) -> None:
        """A new block element is opening: finalize whatever is
        pending — an open block (e.g. an <li> whose nested list starts
        mid-item) or loose text outside any block element (which
        becomes an implicit paragraph; whitespace-only is dropped)."""
        if self.in_block or self.frags:
            self._flush_block()

    def _emit(self, block: str) -> None:
        if self.quote_depth:
            q = "> " * self.quote_depth
            block = "\n".join(q + ln for ln in block.split("\n"))
        self.blocks.append(block)

    # -- tokenizer callbacks -------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if self.skip_depth:
            if tag in _SKIP_CONTENT:
                self.skip_depth += 1
            return
        if tag in _SKIP_CONTENT:
            self.skip_depth = 1
            return
        if self.pre_depth:
            if tag == "pre":
                self.pre_depth += 1
            return
        if tag == "pre":
            self._flush_implicit()
            self.pre_depth = 1
            self.pre_parts = []
            return
        if tag in _HEADINGS:
            if self._in_list_item():
                self.frags.append(" ")  # block boundary -> one space
                return  # block elements inside <li> are transparent
            self._flush_implicit()
            self.in_block = True
            self.block_prefix = "#" * _HEADINGS[tag] + " "
            return
        if tag == "p":
            # <li><p>text</p></li> is extremely common on real pages:
            # flushing here would consume the pending "- " prefix on an
            # empty buffer and hoist the <p> body OUT of the list, so
            # block elements inside an open list item are transparent —
            # their text joins the item line (pinned, documented).
            if self._in_list_item():
                self.frags.append(" ")  # block boundary -> one space
                return
            self._flush_implicit()
            self.in_block = True
            return
        if tag in ("ul", "ol"):
            self._flush_implicit()
            self.list_stack.append([tag, 0])
            self.list_lines.append([])
            return
        if tag == "li":
            if self.frags or self.in_block:
                self._flush_block()
            self.in_block = True
            if self.list_stack and self.list_stack[-1][0] == "ol":
                self.list_stack[-1][1] += 1
                self.block_prefix = f"{self.list_stack[-1][1]}. "
            else:
                self.block_prefix = "- "
            return
        if tag == "blockquote":
            self._flush_implicit()
            self.quote_depth += 1
            return
        if tag == "br":
            self.frags.append(" ")
            return
        if tag == "a":
            href = next((v for k, v in attrs if k == "href" and v), None)
            self.inline_stack.append((tag, len(self.frags), href))
            return
        if tag in _INLINE_MARKS:
            self.inline_stack.append((tag, len(self.frags), None))
            return
        # unknown / structural tags (div, span, table, ...) are
        # transparent: their text participates in the enclosing block

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "br":
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if self.skip_depth:
            if tag in _SKIP_CONTENT:
                self.skip_depth -= 1
            return
        if self.pre_depth:
            if tag == "pre":
                self.pre_depth -= 1
                if self.pre_depth == 0:
                    body = "".join(self.pre_parts).strip("\n")
                    self._emit("```\n" + body + "\n```")
            return
        if tag in _HEADINGS or tag == "p" or tag == "li":
            if tag != "li" and self._in_list_item():
                return  # closing a transparent block inside <li>
            self._flush_block()
            return
        if tag in ("ul", "ol"):
            if self.frags or self.in_block:  # unclosed trailing <li>
                self._flush_block()
            if self.list_stack:
                self.list_stack.pop()
            if self.list_lines:
                lines = self.list_lines.pop()
                if lines:
                    if self.list_lines:  # nested list: splice into parent
                        self.list_lines[-1].extend(lines)
                    else:
                        self._emit("\n".join(lines))
            return
        if tag == "blockquote":
            self._flush_implicit()
            if self.quote_depth:
                self.quote_depth -= 1
            return
        if tag == "a" or tag in _INLINE_MARKS:
            # pop the matching open marker (tolerate mis-nesting by
            # searching top-down for the nearest same-tag entry)
            for i in range(len(self.inline_stack) - 1, -1, -1):
                if self.inline_stack[i][0] == tag:
                    _, pos, extra = self.inline_stack.pop(i)
                    inner = _collapse("".join(self.frags[pos:]))
                    del self.frags[pos:]
                    if tag == "a":
                        # image-only anchors (logo links) collapse to
                        # empty inner text: drop them like empty marks
                        # instead of emitting a stray [](url)
                        wrapped = (
                            f"[{inner}]({extra})" if extra and inner else inner
                        )
                    else:
                        o, c = _INLINE_MARKS[tag]
                        wrapped = f"{o}{inner}{c}" if inner else ""
                    if wrapped:
                        self.frags.append(wrapped)
                    return
            return

    def handle_data(self, data: str) -> None:
        if self.skip_depth:
            return
        if self.pre_depth:
            self.pre_parts.append(data)
            return
        self.frags.append(data)

    def close(self) -> None:  # flush any trailing implicit paragraph
        super().close()
        if self.frags:
            self._flush_block()
        while self.list_lines:
            # unclosed nested lists: splice innermost into its parent
            # (the </ul> path's rule) so document order is preserved —
            # emitting each popped list directly would reverse it
            lines = self.list_lines.pop()
            if lines:
                if self.list_lines:
                    self.list_lines[-1].extend(lines)
                else:
                    self._emit("\n".join(lines))


def html_to_markdown_blocks(stream: bytes | str) -> list[str]:
    """Convert an HTML payload to a list of Markdown blocks.

    Byte inputs go through the same charset ladder as the T1 text path
    (BOM -> declared charset -> UTF-8 probe -> cp1252) so both tiers
    see identical decoded text. Parse failures degrade to whatever was
    built before the failure (the tokenizer is non-throwing on real
    pages; the guard mirrors html_text.py's).
    """
    if isinstance(stream, (bytes, bytearray)):
        from ocr_service_spark.extraction.charset import decode_markup

        text = decode_markup(bytes(stream))[1]
    else:
        text = stream
    builder = _MarkdownBuilder()
    try:
        builder.feed(text)
        builder.close()
    except Exception:
        pass
    return builder.blocks


def html_to_markdown(stream: bytes | str) -> str:
    """Blocks joined with one blank line — the full pinned dialect."""
    return "\n\n".join(html_to_markdown_blocks(stream))
