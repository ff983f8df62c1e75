"""EPUB text extraction — the book-format rung of the dispatch tree.

EPUB (IDPF/W3C) is a ZIP whose ``mimetype`` member is
``application/epub+zip``; books are a routine minority class in web
corpora and a disproportionately VALUABLE one for training data (long,
edited, coherent prose), so the route is worth having even though the
reference engine has no EPUB path (its dispatch ends at office zips,
``utils/utils.py:275-300``).

Pinned dialect (the q133 oracle hash-checks every rule):

- ``META-INF/container.xml`` names the OPF package file (first
  ``<rootfile full-path=...>``); the OPF ``<spine>`` gives READING
  ORDER by ``idref`` into the ``<manifest>`` — zip member order is
  NOT document order and manifest items absent from the spine (cover
  pages, stylesheets, images) contribute nothing.
- Only spine items whose manifest ``media-type`` is
  ``application/xhtml+xml`` are extracted, each through the house HTML
  extractor (``html_text.html_to_text``), chapters joined with one
  blank line (``\\n\\n`` — survives T5 normalization exactly).
- ``<dc:title>`` is surfaced as metadata (five XML entities
  unescaped, the sitemap table).
- hrefs resolve relative to the OPF's own directory (the spec rule;
  real books keep content under ``OEBPS/``).
- Chapter fan-out is capped at :data:`MAX_CHAPTERS` (the MAX_ENTRIES
  contract) and the whole reader is TOTAL over hostile bytes: any
  structural failure degrades to ``(None, [])`` — never an exception
  (fuzz-pinned in tests/test_epub.py).
"""

from __future__ import annotations

import posixpath
import re
import zipfile
from io import BytesIO
from urllib.parse import unquote

MAX_CHAPTERS = 500

_ROOTFILE = re.compile(
    r"<rootfile\b[^>]*\bfull-path\s*=\s*(\"([^\"]*)\"|'([^']*)')", re.IGNORECASE
)
_ITEM = re.compile(r"<item\b[^>]*>", re.IGNORECASE)
_ITEMREF = re.compile(
    r"<itemref\b[^>]*\bidref\s*=\s*(\"([^\"]*)\"|'([^']*)')", re.IGNORECASE
)
_TITLE = re.compile(r"<dc:title[^>]*>(.*?)</dc:title>", re.IGNORECASE | re.DOTALL)
_ATTR = {
    name: re.compile(r"\b" + name + r"\s*=\s*(\"([^\"]*)\"|'([^']*)')", re.IGNORECASE)
    for name in ("id", "href", "media-type")
}

# one XML-entity table for the whole container-format family
from ocr_service_spark.extraction.sitemap import unescape_xml_entities as _unescape


def _attr(tag: str, name: str) -> str | None:
    m = _ATTR[name].search(tag)
    if not m:
        return None
    return _unescape(m.group(2) or m.group(3) or "")


_OCF_MIMETYPE = b"application/epub+zip"


def ocf_prefix_is_epub(stream: bytes) -> bool:
    """Cheap OCF probe for the sniff hot path: the OCF spec REQUIRES
    ``mimetype`` to be the FIRST zip member, STORED (uncompressed), so
    a conforming book is recognizable from the first local-file-header
    bytes — no central-directory parse, no second archive open per
    non-office zip at corpus scale. Non-conforming books (deflated or
    non-first mimetype) sniff as generic zip, the documented dialect
    (every epub toolchain and epubcheck enforce stored-first)."""
    import struct

    if len(stream) < 58 or not stream.startswith(b"PK\x03\x04"):
        return False
    method, = struct.unpack_from("<H", stream, 8)
    name_len, extra_len = struct.unpack_from("<HH", stream, 26)
    if method != 0 or name_len != 8 or stream[30:38] != b"mimetype":
        return False
    start = 38 + extra_len
    return stream[start : start + len(_OCF_MIMETYPE)] == _OCF_MIMETYPE


def is_epub(stream: bytes) -> bool:
    """ZIP whose ``mimetype`` member declares application/epub+zip —
    the authoritative (archive-opening) check for library callers; the
    sniffer uses :func:`ocf_prefix_is_epub` instead."""
    if not stream.startswith(b"PK\x03\x04"):
        return False
    try:
        with zipfile.ZipFile(BytesIO(stream)) as archive:
            return (
                archive.read("mimetype").decode("ascii", "ignore").strip()
                == "application/epub+zip"
            )
    except Exception:
        return False


def extract_epub(stream: bytes) -> tuple[str | None, list[str]]:
    """(dc:title or None, chapter texts in SPINE order)."""
    from ocr_service_spark.extraction.html_text import html_to_text

    try:
        with zipfile.ZipFile(BytesIO(stream)) as archive:
            container = archive.read("META-INF/container.xml").decode(
                "utf-8", "replace"
            )
            m = _ROOTFILE.search(container)
            if not m:
                return None, []
            opf_path = _unescape(m.group(2) or m.group(3) or "")
            opf = archive.read(opf_path).decode("utf-8", "replace")
            opf_dir = posixpath.dirname(opf_path)

            manifest: dict[str, tuple[str, str]] = {}  # id -> (href, media-type)
            for tag in _ITEM.findall(opf):
                item_id, href = _attr(tag, "id"), _attr(tag, "href")
                if item_id and href:
                    manifest[item_id] = (href, _attr(tag, "media-type") or "")
            tm = _TITLE.search(opf)
            title = _unescape(tm.group(1).strip()) if tm else None

            chapters: list[str] = []
            for ref in _ITEMREF.finditer(opf):
                if len(chapters) >= MAX_CHAPTERS:
                    break
                idref = _unescape(ref.group(2) or ref.group(3) or "")
                href, media_type = manifest.get(idref, (None, ""))
                if href is None or media_type != "application/xhtml+xml":
                    continue
                # manifest hrefs are URIs (OPF spec): strip any fragment
                # and percent-decode before the ZIP member lookup, or a
                # book whose files have spaces loses those chapters
                href = unquote(href.split("#", 1)[0])
                member = posixpath.normpath(posixpath.join(opf_dir, href))
                try:
                    chapters.append(html_to_text(archive.read(member)))
                except KeyError:
                    continue  # dangling manifest href: skip the chapter
            return title, chapters
    except Exception:
        return None, []
