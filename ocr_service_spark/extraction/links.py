"""Outlink + robots-directive extraction from HTML payloads.

The web-graph layer of a crawl pipeline: every page contributes its
``<a href>`` edges (for frontier/PageRank/host-degree work) and its
``<meta name="robots">`` directive (pages marked ``noindex`` are
excluded from training corpora). The reference service has no notion
of links — beyond-reference, like the charset/transfer rungs.

Built on the same stdlib ``html.parser`` tokenizer as T1
(html_text.py) and the charset ladder (attribute values arrive
entity-unescaped from the tokenizer; bytes are decoded via
``decode_markup``). Link hygiene:

- pseudo-scheme hrefs (``javascript:``, ``mailto:``, ``tel:``,
  ``data:``) and pure-fragment hrefs are dropped;
- relative hrefs resolve against the page URL with
  ``urllib.parse.urljoin`` (RFC 3986 dot-segment semantics);
- document order is preserved and capped (a link farm with 10^5
  anchors yields MAX_LINKS rows, not an unbounded explode).
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:")

# <link rel=alternate> MIME types that announce a feed (the
# autodiscovery convention every browser/reader implements)
FEED_TYPES = {
    "application/rss+xml": "rss",
    "application/atom+xml": "atom",
}
MAX_LINKS = 1000


class _LinkCollector(HTMLParser):
    """Collects (href, anchor text) pairs plus robots directives.

    Anchor text is the character data between an ``<a href>`` and its
    ``</a>`` (nested tags contribute their text; an unclosed ``<a>``
    ends at the next ``<a>`` — browsers' auto-close behavior)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, list[str]]] = []  # (href, text parts)
        self.robots: list[str] = []
        self.canonicals: list[str] = []  # <link rel=canonical> hrefs, in order
        # <link rel=alternate type=rss/atom>: (href, kind, title), in order
        self.feeds: list[tuple[str, str, str | None]] = []
        # <link rel=alternate hreflang=...>: (hreflang, href), in order
        self.hreflangs: list[tuple[str, str]] = []
        self._open = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._open = False
            for name, value in attrs:
                if name == "href" and value:
                    self.anchors.append((value, []))
                    self._open = True
                    break
        elif tag == "meta":
            a = dict(attrs)
            if (a.get("name") or "").lower() == "robots":
                self.robots.append(a.get("content") or "")
        elif tag == "link":
            a = {k: v for k, v in attrs if v is not None}
            rel_tokens = (a.get("rel") or "").lower().split()
            if "canonical" in rel_tokens and a.get("href"):
                self.canonicals.append(a["href"])
            elif "alternate" in rel_tokens and a.get("href"):
                kind = FEED_TYPES.get((a.get("type") or "").lower().strip())
                if kind:
                    self.feeds.append((a["href"], kind, a.get("title")))
                elif a.get("hreflang"):
                    self.hreflangs.append(
                        (a["hreflang"].strip().lower(), a["href"])
                    )

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._open = False

    def handle_data(self, data: str) -> None:
        if self._open and data:
            self.anchors[-1][1].append(data)


def _parse(payload: bytes | str) -> _LinkCollector:
    """Decode + tokenize one payload into a collector; total over
    hostile bytes (parser exceptions leave a partial collect)."""
    if isinstance(payload, (bytes, bytearray)):
        from ocr_service_spark.extraction.charset import decode_markup

        text = decode_markup(bytes(payload))[1]
    else:
        text = payload
    parser = _LinkCollector()
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        pass
    return parser


def _resolve(href: str, base_url: str | None) -> str | None:
    """Shared link hygiene: strip, drop fragment-only and pseudo-scheme
    hrefs, resolve relatives against the page URL. None = unusable."""
    h = href.strip()
    if not h or h.startswith("#") or h.lower().startswith(SKIP_SCHEMES):
        return None
    if base_url:
        try:
            h = urljoin(base_url, h)
        except ValueError:
            return None
    return h


def extract_anchors(
    payload: bytes | str, base_url: str | None = None
) -> tuple[list[tuple[str, str]], bool]:
    """((resolved outlink, whitespace-normalized anchor text) in
    document order, noindex flag). Same hygiene as ``extract_links``;
    anchor text is the text content of the ``<a>`` element with runs
    of whitespace collapsed to single spaces."""
    parser = _parse(payload)
    out: list[tuple[str, str]] = []
    for href, parts in parser.anchors:
        h = _resolve(href, base_url)
        if h is None:
            continue
        out.append((h, " ".join("".join(parts).split())))
        if len(out) >= MAX_LINKS:
            break
    noindex = any("noindex" in c.lower() for c in parser.robots)
    return out, noindex


def extract_links(payload: bytes | str, base_url: str | None = None) -> tuple[list[str], bool]:
    """(resolved outlinks in document order, noindex flag)."""
    anchors, noindex = extract_anchors(payload, base_url)
    return [href for href, _ in anchors], noindex


def extract_canonical(payload: bytes | str, base_url: str | None = None) -> str | None:
    """The page's declared canonical URL, or None.

    ``<link rel="canonical" href=...>`` with ``canonical`` matched
    case-insensitively among the space-separated rel tokens; the FIRST
    declaration wins (Google's documented tie-break — later ones are
    ignored); relative hrefs resolve against the page URL; fragment-only
    and pseudo-scheme hrefs yield None. Total over hostile bytes."""
    parser = _parse(payload)
    for href in parser.canonicals:
        # first declaration wins, even when unusable
        return _resolve(href, base_url)
    return None


def extract_feed_links(
    payload: bytes | str, base_url: str | None = None
) -> list[tuple[str, str, str | None]]:
    """Feed autodiscovery: (resolved feed URL, 'rss'|'atom', title or
    None) per ``<link rel=alternate>`` whose type is a feed MIME type
    (:data:`FEED_TYPES`), in document order. Other alternates
    (hreflang variants, AMP pages) are excluded by the type gate;
    unusable hrefs are dropped (unlike canonical there is no
    first-wins contest — every declared feed is a discovery). Total
    over hostile bytes."""
    out: list[tuple[str, str, str | None]] = []
    for href, kind, title in _parse(payload).feeds:
        h = _resolve(href, base_url)
        if h is None:
            continue
        out.append((h, kind, title))
        if len(out) >= MAX_LINKS:
            break
    return out


def extract_hreflangs(
    payload: bytes | str, base_url: str | None = None
) -> list[tuple[str, str]]:
    """hreflang alternates: (language tag lowercased, resolved target
    URL) per ``<link rel=alternate hreflang=...>``, in document order —
    the language-edition graph (Google's hreflang convention; a feed
    MIME type on the same tag wins the feed interpretation instead).
    Unusable hrefs drop; capped at MAX_LINKS; total over hostile
    bytes."""
    out: list[tuple[str, str]] = []
    for lang, href in _parse(payload).hreflangs:
        h = _resolve(href, base_url)
        if h is None:
            continue
        out.append((lang, h))
        if len(out) >= MAX_LINKS:
            break
    return out
