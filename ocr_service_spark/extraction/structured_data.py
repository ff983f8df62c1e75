"""Embedded structured-data extraction: Open Graph / allowlisted meta
tags and schema.org JSON-LD blocks — the WAT-style metadata mining real
crawl pipelines run on top of flat text extraction (the reference's
``converter.py:70-106`` produces only the flat text; Common Crawl ships
this as the WAT sidecar; schema.org JSON-LD is the dominant carrier of
page-level structured facts).

Pinned dialect (the q126 oracle hash-checks every rule):

- ``<meta property="og:*" content=...>`` -> kind ``og``, key = the full
  property (``og:title``), value = the content attribute with HTML
  entities unescaped (the stdlib parser unescapes attribute values).
  Attribute order and quote style are irrelevant.
- ``<meta name=... content=...>`` -> kind ``meta``, but only for names
  in :data:`META_ALLOWLIST` — everything else (viewport, generator,
  theme-color, ...) is presentation noise and is dropped.
- ``<script type="application/ld+json">`` (type matched
  case-insensitively, surrounding whitespace ignored) -> kind ``ld``:
  the block is parsed as JSON; a top-level object contributes its
  SCALAR fields (str / int / float / bool — nested objects and arrays
  are not flattened), a top-level array contributes each object
  element's scalar fields in order; anything else (malformed JSON,
  scalar roots) contributes nothing — hostile or broken markup must
  degrade to absence, never to an error.
- Values are strings: bool -> ``true``/``false`` (JSON spelling,
  checked before int — bool is an int subclass), numbers via ``str``.
- Rows carry ``field_idx``, the 0-based emission index in document
  order, and total emission is capped at :data:`MAX_FIELDS` so a
  pathological page (a meta farm or a megabyte JSON-LD catalog) bounds
  its own fan-out — the MAX_CELLS/MAX_LINKS contract.

Total over untrusted bytes: :func:`extract_structured` returns a list
for ANY input (fuzz-pinned in tests/test_structured_data.py).
"""

from __future__ import annotations

import json
from html.parser import HTMLParser

MAX_FIELDS = 1_000
MAX_LD_BYTES = 1_000_000  # a JSON-LD block larger than 1 MB is not metadata

META_ALLOWLIST = frozenset(
    {
        "description",
        "keywords",
        "author",
        "robots",
        "twitter:title",
        "twitter:card",
        "twitter:description",
    }
)


def _decode(payload: bytes | str) -> str:
    if isinstance(payload, (bytes, bytearray)):
        from ocr_service_spark.extraction.charset import decode_markup

        return decode_markup(bytes(payload))[1]
    return payload


def _scalar(value: object) -> str | None:
    # bool FIRST: isinstance(True, int) is True, and the JSON spelling
    # ("true") is the pinned output, not Python's ("True")
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float, str)):
        return str(value)
    return None


def _ld_fields(block: str) -> list[tuple[str, str]]:
    """One ld+json block -> [(key, value)] scalar fields, total."""
    if len(block) > MAX_LD_BYTES:
        return []
    try:
        root = json.loads(block)
    except Exception:
        return []
    objs = root if isinstance(root, list) else [root]
    out: list[tuple[str, str]] = []
    for obj in objs:
        if not isinstance(obj, dict):
            continue
        for key, raw in obj.items():
            val = _scalar(raw)
            if isinstance(key, str) and val is not None:
                out.append((key, val))
    return out


class _StructuredCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # (kind, key, value) in document order
        self.fields: list[tuple[str, str, str]] = []
        self._in_ld = False
        self._ld_parts: list[str] = []

    def _emit(self, kind: str, key: str, value: str) -> None:
        if len(self.fields) < MAX_FIELDS:
            self.fields.append((kind, key, value))

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "meta":
            a = {k: v for k, v in attrs if v is not None}
            content = a.get("content")
            if content is None:
                return
            prop = (a.get("property") or "").strip().lower()
            name = (a.get("name") or "").strip().lower()
            if prop.startswith("og:"):
                self._emit("og", prop, content)
            elif name in META_ALLOWLIST:
                self._emit("meta", name, content)
        elif tag == "script":
            a = {k: v for k, v in attrs if v is not None}
            if (a.get("type") or "").strip().lower() == "application/ld+json":
                self._in_ld = True
                self._ld_parts = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "script" and self._in_ld:
            self._in_ld = False
            for key, value in _ld_fields("".join(self._ld_parts)):
                self._emit("ld", key, value)
            self._ld_parts = []

    def handle_data(self, data: str) -> None:
        if self._in_ld:
            self._ld_parts.append(data)


def extract_structured(payload: bytes | str) -> list[tuple[int, str, str, str]]:
    """Payload -> [(field_idx, kind, key, value)] per the pinned dialect
    above, in document order. Total: returns [] for any input that is
    not parseable markup; never raises on hostile bytes."""
    try:
        parser = _StructuredCollector()
        parser.feed(_decode(payload))
        parser.close()
    except Exception:
        return []
    return [
        (i, kind, key, value)
        for i, (kind, key, value) in enumerate(parser.fields)
    ]
