"""Sitemap (sitemaps.org XML) parsing — the crawl-frontier seed.

A crawler reconciles what a site DECLARES (its sitemap) against what
the crawl actually FETCHED; the difference drives the frontier
(declared-but-uncrawled) and orphan detection (crawled-but-undeclared).
The reference service has no crawl surface (SURVEY.md §3.2) — this is
a beyond-reference web-corpus rung like robots.txt (extraction/
robots.py), and follows the same Spark placement: parsing runs
Python-side on the per-HOST sitemap table (tiny next to pages), and
everything after the parse is relational.

From-scratch tag scan, not a full XML parser: sitemaps are a fixed
two-level vocabulary (``urlset/url/loc|lastmod``,
``sitemapindex/sitemap/loc``) with spec-lowercase tags, and
real-world feeds are full of undeclared entities and truncation — the
scanner tolerates both and returns what it can. Budgets bound the
walk (50k URLs per file is the protocol's own limit)."""

from __future__ import annotations

from typing import Any

MAX_ENTRIES = 50_000  # sitemaps.org hard limit per file


def _find_tag(text: str, tag: str, pos: int) -> tuple[int, int, int]:
    """Next ``<tag ...>...</tag>`` at/after pos (attributes
    tolerated). Returns (start, content_start, content_end) or
    (-1, -1, -1)."""
    needle = "<" + tag
    i = pos
    while True:
        i = text.find(needle, i)
        if i < 0:
            return -1, -1, -1
        after = i + len(needle)
        if after < len(text) and text[after] not in " \t\r\n>/":
            i = after  # e.g. <urlset> while seeking <url>
            continue
        gt = text.find(">", after)
        if gt < 0:
            return -1, -1, -1
        end = text.find("</" + tag, gt)
        if end < 0:
            return -1, -1, -1
        return i, gt + 1, end


XML_ENTITIES = (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                ("&quot;", '"'), ("&apos;", "'"))


def unescape_xml_entities(value: str) -> str:
    """The five predefined XML entities (shared by the sitemap, feed
    and epub readers — one table, one dialect)."""
    for ent, ch in XML_ENTITIES:
        value = value.replace(ent, ch)
    return value


def _text_of(block: str, tag: str) -> str | None:
    _, cs, ce = _find_tag(block, tag, 0)
    if cs < 0:
        return None
    # sitemap locs are frequently entity-escaped (& in query strings)
    return unescape_xml_entities(block[cs:ce].strip()) or None


def parse_sitemap(xml_text: str) -> list[dict[str, Any]]:
    """Sitemap or sitemap-index XML -> entry dicts
    ``{kind: 'url'|'sitemap', loc, lastmod}``. Unknown structure or
    truncation yields the entries that did parse; entries without a
    ``<loc>`` are dropped (the spec makes loc mandatory)."""
    entries: list[dict[str, Any]] = []
    for container, kind in (("url", "url"), ("sitemap", "sitemap")):
        pos = 0
        while len(entries) < MAX_ENTRIES:
            start, cs, ce = _find_tag(xml_text, container, pos)
            if start < 0:
                break
            block = xml_text[cs:ce]
            loc = _text_of(block, "loc")
            if loc is not None:
                entries.append(
                    {"kind": kind, "loc": loc, "lastmod": _text_of(block, "lastmod")}
                )
            pos = ce + 1
        if entries and kind == "url":
            break  # a urlset never also carries <sitemap> children
    return entries
