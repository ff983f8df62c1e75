"""Publication-date extraction dialect (extraction/dates.py, q129).

Pins the precedence ladder (meta > time > url), per-rung parsing
(ISO prefix with time/zone suffixes, /YYYY/MM/DD/ path dates), the
rejection rules (calendar-invalid, out-of-window — and that rejection
does NOT consume the rung), and totality over hostile bytes.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.extraction.dates import (
    extract_pub_date,
    parse_iso_date,
    url_date,
)

URL = "https://news.example.com/a/p1.html"
URL_DATED = "https://news.example.com/2019/07/04/p1.html"


def test_parse_iso_date_accepts_prefixes_and_rejects_noise():
    assert parse_iso_date("2023-05-12") == dt.date(2023, 5, 12)
    assert parse_iso_date("2023-05-12T10:30:00+02:00") == dt.date(2023, 5, 12)
    assert parse_iso_date("  2023-05-12 08:00") == dt.date(2023, 5, 12)
    assert parse_iso_date("2023-05-12x") is None  # glued suffix: not ISO
    assert parse_iso_date("12/05/2023") is None
    assert parse_iso_date("2023") is None
    assert parse_iso_date("2021-02-30") is None  # calendar-invalid
    assert parse_iso_date("1492-01-01") is None  # out of window
    assert parse_iso_date("3021-01-01") is None
    assert parse_iso_date(None) is None


def test_url_date_path_segments():
    assert url_date(URL_DATED) == dt.date(2019, 7, 4)
    # single-digit month/day accepted
    assert url_date("http://h.test/2019/7/4/x") == dt.date(2019, 7, 4)
    # trailing at end-of-string accepted
    assert url_date("http://h.test/2019/07/04") == dt.date(2019, 7, 4)
    assert url_date("http://h.test/2019/13/04/") is None
    assert url_date("http://h.test/a/b") is None
    assert url_date(None) is None


def test_ladder_precedence_meta_beats_time_beats_url():
    meta = b'<meta property="article:published_time" content="2020-01-02T08:00:00Z">'
    time_el = b'<time datetime="2021-03-04">x</time>'
    assert extract_pub_date(meta + time_el, URL_DATED) == (
        dt.date(2020, 1, 2),
        "meta",
    )
    assert extract_pub_date(time_el, URL_DATED) == (dt.date(2021, 3, 4), "time")
    assert extract_pub_date(b"<p>hi</p>", URL_DATED) == (dt.date(2019, 7, 4), "url")
    assert extract_pub_date(b"<p>hi</p>", URL) == (None, "none")


def test_named_meta_rung_and_attr_robustness():
    # name=date, reversed attr order, single quotes, mixed case name
    assert extract_pub_date(
        b"<meta content='2022-11-30' name='Date'>", URL
    ) == (dt.date(2022, 11, 30), "meta")
    assert extract_pub_date(
        b'<meta name="dcterms.date" content="2022-11-30">', URL
    ) == (dt.date(2022, 11, 30), "meta")
    # OG property beats a named meta that appears EARLIER in the page
    html = (
        b'<meta name="date" content="2001-01-01">'
        b'<meta property="article:published_time" content="2002-02-02">'
    )
    assert extract_pub_date(html, URL) == (dt.date(2002, 2, 2), "meta")


def test_invalid_candidates_do_not_consume_their_rung():
    # out-of-window meta and calendar-invalid time: ladder descends to url
    html = (
        b'<meta name="date" content="1492-01-01">'
        b'<time datetime="2021-02-30">bad</time>'
    )
    assert extract_pub_date(html, URL_DATED) == (dt.date(2019, 7, 4), "url")
    # a later VALID candidate on the same rung still wins that rung
    html2 = (
        b'<meta name="date" content="not a date">'
        b'<meta name="date" content="2018-06-15">'
    )
    assert extract_pub_date(html2, URL) == (dt.date(2018, 6, 15), "meta")


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_pub_date_fuzz_never_raises(b: bytes):
    d, src = extract_pub_date(b, "https://h.test/2019/07/04/x")
    assert src in {"meta", "time", "url", "none"}
    assert d is None or isinstance(d, dt.date)
