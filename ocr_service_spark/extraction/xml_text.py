"""XML text extraction — two distinct reference semantics.

1. ``xml_iter_text`` — the NO_OCR standalone-XML branch
   (``DocumentConverter._xml_to_text``, converter.py:391-408):
   ``ElementTree.iter()`` appending stripped element text, every
   attribute value, and tails, joined with single spaces. Exceptions
   propagate (the reference lets them bubble to ``process_stream``).

2. ``xml_all_strings`` — the office-zip / fallback XML path
   (``_extract_text_fallback`` with ``is_xml=True``, converter.py:78-95):
   ``BeautifulSoup(stream, "lxml-xml").get_text(separator="\\n")``,
   i.e. every character-data node (including whitespace-only nodes
   between elements) joined with "\\n". Rebuilt on stdlib
   ``ElementTree``: lxml and expat produce the same merged
   character-data segments (element .text / .tail) in document order,
   entities resolved, comments/PIs excluded. On parse failure the
   reference retries with html.parser — mirrored via
   ``html_all_strings``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET



def xml_iter_text(stream: bytes) -> str:
    """converter.py:391-408 — byte-identical by construction (same stdlib)."""
    root = ET.fromstring(stream)
    parts: list[str] = []
    for elem in root.iter():
        if elem.text and elem.text.strip():
            parts.append(elem.text.strip())
        for value in elem.attrib.values():
            if value and value.strip():
                parts.append(value.strip())
        if elem.tail and elem.tail.strip():
            parts.append(elem.tail.strip())
    return " ".join(parts)


def _all_strings(root: ET.Element, out: list[str]) -> None:
    if root.text is not None and root.text != "":
        out.append(root.text)
    for child in root:
        _all_strings(child, out)
        if child.tail is not None and child.tail != "":
            out.append(child.tail)


def xml_all_strings(stream: bytes) -> str:
    """lxml-xml ``get_text("\\n")`` equivalence: all character-data
    segments in document order joined with newlines."""
    root = ET.fromstring(stream)
    parts: list[str] = []
    _all_strings(root, parts)
    return "\n".join(parts)


