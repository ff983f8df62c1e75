"""RSS / Atom feed-item extraction — the discovery-source twin of the
sitemap reader (extraction/sitemap.py): feeds are how crawl pipelines
find FRESH pages between sitemap publishes, and a feed's items carry
the three fields the frontier needs (link, title, publication instant).
The reference engine has no feed reader (it starts at fetched payload
bytes); this is the corpus-construction layer above it, like WARC/CDXJ.

Pinned dialect (the q130 oracle hash-checks every rule):

- Kind sniff on the first root-ish tag: ``<feed`` -> atom, ``<rss`` or
  ``<rdf`` -> rss, anything else -> no items. Same tolerant
  tag-scanning as the sitemap reader — a truncated or interleaved feed
  yields the items that DO parse, never an exception.
- RSS items: ``<item>`` blocks in document order; ``<title>`` (the
  five XML entities unescaped — the sitemap reader's table),
  ``<link>`` text, ``<pubDate>`` parsed as RFC 822
  (``05 Mar 2013 14:30:00 +0200`` — weekday optional, zone offset
  honored).
- Atom entries: ``<entry>`` blocks; ``<title>`` text; the first
  ``<link ... href=...>`` whose ``rel`` is absent or ``alternate``
  (Atom links are attribute-carried and usually self-closing, so this
  is an attribute scan, not a content scan); ``<updated>`` parsed as
  ISO 8601 (RFC 3339).
- Publication instants NORMALIZE TO UTC and render as
  ``YYYY-MM-DD HH:MM:SS`` — feeds mix zones freely and a frontier
  ordered by local times interleaves wrongly; naive stamps are taken
  as already-UTC. Unparseable stamps yield None (the item survives).
- Items without a link are dropped (a frontier entry IS a link);
  emission is capped at :data:`MAX_ITEMS` per feed so a pathological
  payload bounds its own fan-out (the MAX_ENTRIES contract).
- Total over untrusted bytes: ``parse_feed`` returns (kind, items)
  for ANY input (fuzz-pinned in tests/test_feeds.py).
"""

from __future__ import annotations

import datetime as dt
import email.utils
import html
import re

from ocr_service_spark.extraction.sitemap import _find_tag, _text_of

MAX_ITEMS = 1_000

_ATOM_LINK = re.compile(
    r"<link\b[^>]*\bhref\s*=\s*(\"([^\"]*)\"|'([^']*)')[^>]*>", re.IGNORECASE
)
_REL_ATTR = re.compile(r"\brel\s*=\s*(\"([^\"]*)\"|'([^']*)')", re.IGNORECASE)


def _to_utc_str(d: dt.datetime | None) -> str | None:
    if d is None:
        return None
    if d.tzinfo is not None:
        d = d.astimezone(dt.timezone.utc)
    return d.strftime("%Y-%m-%d %H:%M:%S")


def parse_rfc822(value: str | None) -> str | None:
    """RFC 822/1123 date-time -> UTC ``YYYY-MM-DD HH:MM:SS``, or None."""
    if not value:
        return None
    try:
        return _to_utc_str(email.utils.parsedate_to_datetime(value.strip()))
    except Exception:
        return None


def parse_rfc3339(value: str | None) -> str | None:
    """ISO 8601 / RFC 3339 date-time -> UTC ``YYYY-MM-DD HH:MM:SS``,
    or None. A bare date is midnight; ``Z`` and numeric offsets both
    resolve; naive values are taken as UTC."""
    if not value:
        return None
    v = value.strip()
    if v.endswith(("Z", "z")):
        v = v[:-1] + "+00:00"
    try:
        return _to_utc_str(dt.datetime.fromisoformat(v))
    except ValueError:
        return None


def _first_alternate_href(block: str) -> str | None:
    for m in _ATOM_LINK.finditer(block):
        rel = _REL_ATTR.search(m.group(0))
        if rel is not None and (rel.group(2) or rel.group(3) or "").lower() not in (
            "",
            "alternate",
        ):
            continue
        href = (m.group(2) or m.group(3) or "").strip()
        if href:
            return html.unescape(href)
    return None


def sniff_feed_kind(text: str) -> str | None:
    """'rss' / 'atom' / None from the first root-ish tag."""
    m = re.search(r"<\s*(feed|rss|rdf)[\s>:]", text[:4096], re.IGNORECASE)
    if not m:
        return None
    return "atom" if m.group(1).lower() == "feed" else "rss"


def parse_feed(payload: bytes | str) -> tuple[str | None, list[dict]]:
    """(feed kind, item dicts ``{item_idx, title, link, pub_utc}``)."""
    if isinstance(payload, (bytes, bytearray)):
        from ocr_service_spark.extraction.charset import decode_markup

        text = decode_markup(bytes(payload))[1]
    else:
        text = payload
    kind = sniff_feed_kind(text)
    if kind is None:
        return None, []
    items: list[dict] = []
    container = "entry" if kind == "atom" else "item"
    pos = 0
    while len(items) < MAX_ITEMS:
        start, cs, ce = _find_tag(text, container, pos)
        if start < 0:
            break
        block = text[cs:ce]
        title = _text_of(block, "title")
        if kind == "atom":
            link = _first_alternate_href(block)
            pub = parse_rfc3339(_text_of(block, "updated"))
        else:
            link = _text_of(block, "link")
            pub = parse_rfc822(_text_of(block, "pubDate"))
        if link:
            items.append(
                {"item_idx": len(items), "title": title, "link": link, "pub_utc": pub}
            )
        pos = ce + 1
    return kind, items
