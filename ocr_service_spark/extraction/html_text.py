"""HTML/markup text extraction (operator T1 in SURVEY.md §2.4).

Reproduces the reference's ``_extract_text_fallback`` HTML path
(converter.py:70-106): ``BeautifulSoup(stream, "html.parser")
.get_text(separator="\\n")`` followed by two tag-strip regexes and a
second ``html.unescape`` pass — rebuilt from scratch on the stdlib
``html.parser`` tokenizer (the same CPython tokenizer bs4's
html.parser builder bottoms out in, which is what makes byte-parity
attainable without bs4).

``get_text("\\n")`` semantics reproduced here:
- every character-data chunk the tokenizer emits becomes one string
  node; nodes are joined with "\\n" (bs4 joins per NavigableString);
- ``convert_charrefs=True`` (bs4 default): entity/char refs are folded
  into the surrounding text, so adjacent text+entity runs form a
  single node;
- script/style contents are included (they are string nodes);
- comments, doctype, processing instructions are excluded;
- CDATA sections are included (bs4 CData is an included string type).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

# Post-extraction tag-strip regexes (converter.py:93,95).
_SELF_CLOSING_TAG = re.compile(r"<[^>]+/>")
_BARE_TAG = re.compile(r"</?[\w:.-]+>")


class _TextCollector(HTMLParser):
    """Collects character-data chunks in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []

    def handle_data(self, data: str) -> None:
        self.chunks.append(data)

    def unknown_decl(self, data: str) -> None:
        # <![CDATA[...]]> arrives here as "CDATA[...": bs4 turns it into
        # a CData string node, which get_text() includes.
        if data.startswith("CDATA["):
            self.chunks.append(data[6:])


def html_all_strings(stream: bytes) -> str:
    """``BeautifulSoup(stream, "html.parser").get_text(separator="\\n")``."""
    # bs4 detects the document encoding (UnicodeDammit); the from-scratch
    # equivalent is charset.decode_markup (BOM -> declared meta/xml-decl
    # charset -> UTF-8 probe -> cp1252). Valid UTF-8 without a contrary
    # declaration decodes identically to the old utf-8/"ignore" path, so
    # the byte-parity goldens are untouched.
    if isinstance(stream, (bytes, bytearray)):
        from ocr_service_spark.extraction.charset import decode_markup

        text = decode_markup(bytes(stream))[1]
    else:
        text = stream
    parser = _TextCollector()
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        pass
    return "\n".join(parser.chunks)


def strip_tags_and_unescape(text: str) -> str:
    """The two tag-strip regexes + second unescape pass
    (converter.py:93-106): removes XML-ish self-closing tags and bare
    tags that survived parsing, then ``html.unescape``."""
    text = _SELF_CLOSING_TAG.sub("", text)
    text = _BARE_TAG.sub("", text)
    return unescape(text)


def html_to_text(stream: bytes) -> str:
    """Full T1: parse -> join strings with newline -> strip -> unescape."""
    return strip_tags_and_unescape(html_all_strings(stream))
