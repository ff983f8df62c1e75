"""Publication-date extraction: the htmldate/trafilatura-style
precedence ladder crawl pipelines run to timestamp every page — the
single most load-bearing metadata field for corpus curation (dated
dedup tie-breaks, temporal split construction, freshness filters).
The reference engine extracts only flat text (``converter.py:70-106``);
publication dating is the corpus-construction layer above it.

Pinned dialect (the q129 oracle hash-checks every rule):

- Precedence ladder, first hit wins:
    1. ``meta`` — ``<meta property="article:published_time">`` (the
       Open Graph article namespace), then ``<meta name=...>`` for
       names in :data:`DATE_META_NAMES` (``date``, ``dc.date``,
       ``dcterms.date``, ``datepublished``, ``article:published_time``
       spelled as a name), in DOCUMENT order within each rung.
    2. ``time`` — the first ``<time datetime=...>`` element.
    3. ``url`` — a ``/YYYY/MM/DD/`` (or ``/YYYY/M/D/``) path segment
       in the page URL.
  JSON-LD ``datePublished`` is deliberately NOT a rung: structured-data
  mining is q126's job and double-extraction would double-count.
- Candidate values parse as ISO 8601 prefixes: the leading
  ``YYYY-MM-DD`` of the string (time-of-day and zone suffixes are
  accepted and ignored — day precision is what corpus curation uses).
- Calendar-valid dates only, inside the sanity window
  [:data:`MIN_DATE`, :data:`MAX_DATE`] — a 1492 or 3021 "publication"
  is markup noise, and an invalid candidate does NOT consume its rung
  (the ladder keeps descending).
- Total over untrusted bytes: returns ``(None, "none")`` for any
  unparseable input, never raises (fuzz-pinned in tests/test_dates.py).
"""

from __future__ import annotations

import datetime as dt
import re
from html.parser import HTMLParser

DATE_META_NAMES = frozenset(
    {"date", "dc.date", "dcterms.date", "datepublished", "article:published_time"}
)

# htmldate's default sanity window, shifted to this engine's era: web
# publication dates before the web's mass era or in the far future are
# scraper noise, not signal.
MIN_DATE = dt.date(1995, 1, 1)
MAX_DATE = dt.date(2035, 12, 31)

_ISO_PREFIX = re.compile(r"\s*(\d{4})-(\d{2})-(\d{2})(?:$|[T\s])")
_URL_DATE = re.compile(r"/((?:19|20)\d{2})/(\d{1,2})/(\d{1,2})(?:/|$)")


def parse_iso_date(value: str | None) -> dt.date | None:
    """The leading YYYY-MM-DD of an ISO 8601 string as a date, or None.

    Calendar-validated and clamped to the sanity window; a trailing
    time-of-day/zone (``T10:30:00+02:00``, `` 08:00``) is accepted and
    ignored; anything else (bare years, ``12/05/2023``, garbage) is
    None."""
    if not value:
        return None
    m = _ISO_PREFIX.match(value)
    if not m:
        return None
    try:
        d = dt.date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    except ValueError:
        return None
    return d if MIN_DATE <= d <= MAX_DATE else None


def url_date(url: str | None) -> dt.date | None:
    """A /YYYY/MM/DD/ path segment as a date, or None."""
    if not url:
        return None
    m = _URL_DATE.search(url)
    if not m:
        return None
    try:
        d = dt.date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    except ValueError:
        return None
    return d if MIN_DATE <= d <= MAX_DATE else None


class _DateCollector(HTMLParser):
    """Collects date candidates per rung in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.og: list[str] = []  # article:published_time properties
        self.named: list[str] = []  # allowlisted <meta name=...>
        self.times: list[str] = []  # <time datetime=...>

    def handle_starttag(self, tag: str, attrs) -> None:
        a = {k: v for k, v in attrs if v is not None}
        if tag == "meta":
            content = a.get("content")
            if not content:
                return
            if (a.get("property") or "").lower() == "article:published_time":
                self.og.append(content)
            elif (a.get("name") or "").lower() in DATE_META_NAMES:
                self.named.append(content)
        elif tag == "time":
            datetime_attr = a.get("datetime")
            if datetime_attr:
                self.times.append(datetime_attr)


def extract_pub_date(
    payload: bytes | str, url: str | None = None
) -> tuple[dt.date | None, str]:
    """(publication date, source rung) for one page.

    Source is ``meta`` / ``time`` / ``url`` / ``none`` — the first
    ladder rung that yields a calendar-valid, in-window date."""
    if isinstance(payload, (bytes, bytearray)):
        from ocr_service_spark.extraction.charset import decode_markup

        text = decode_markup(bytes(payload))[1]
    else:
        text = payload
    parser = _DateCollector()
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        pass
    for candidate in parser.og + parser.named:
        d = parse_iso_date(candidate)
        if d is not None:
            return d, "meta"
    for candidate in parser.times:
        d = parse_iso_date(candidate)
        if d is not None:
            return d, "time"
    d = url_date(url)
    if d is not None:
        return d, "url"
    return None, "none"
