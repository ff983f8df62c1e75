"""Sitemap parsing (extraction/sitemap.py) + coverage reconciliation
(operators/weburl.py): the crawl-frontier seed, q77's unit level."""

from __future__ import annotations

import pytest

from ocr_service_spark.extraction.sitemap import parse_sitemap

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example/p/1</loc><lastmod>2026-01-02</lastmod></url>
  <url>
    <loc> https://a.example/p/2?x=1&amp;y=2 </loc>
  </url>
  <url><lastmod>2026-01-03</lastmod></url>
</urlset>"""


def test_urlset_parse_entities_and_whitespace() -> None:
    entries = parse_sitemap(URLSET)
    assert entries == [
        {"kind": "url", "loc": "https://a.example/p/1", "lastmod": "2026-01-02"},
        # loc trimmed, &amp; unescaped; loc-less third entry dropped
        {"kind": "url", "loc": "https://a.example/p/2?x=1&y=2", "lastmod": None},
    ]


def test_sitemapindex_parse() -> None:
    xml = """<sitemapindex>
      <sitemap><loc>https://a.example/maps/1.xml</loc>
               <lastmod>2026-02-01</lastmod></sitemap>
      <sitemap><loc>https://a.example/maps/2.xml</loc></sitemap>
    </sitemapindex>"""
    entries = parse_sitemap(xml)
    assert [e["kind"] for e in entries] == ["sitemap", "sitemap"]
    assert entries[0]["loc"] == "https://a.example/maps/1.xml"
    assert entries[0]["lastmod"] == "2026-02-01"


def test_tag_prefix_does_not_confuse_scan() -> None:
    # <urlset> must not match while scanning for <url>; attributes ok
    xml = '<urlset><url changefreq="daily"><loc>https://x/1</loc></url></urlset>'
    assert parse_sitemap(xml) == [
        {"kind": "url", "loc": "https://x/1", "lastmod": None}
    ]


def test_truncated_keeps_complete_entries() -> None:
    cut = URLSET[: URLSET.index("<url>\n")]  # cut before the 2nd entry
    assert [e["loc"] for e in parse_sitemap(cut)] == ["https://a.example/p/1"]


@pytest.mark.parametrize(
    "junk", ["", "not xml at all", "<urlset><url><loc></loc></url></urlset>",
             "<url><loc>x", "\x00\x01\x02"]
)
def test_degenerate_inputs_no_raise(junk: str) -> None:
    for e in parse_sitemap(junk):
        assert e["loc"]


def test_coverage_statuses(spark) -> None:
    from ocr_service_spark.operators.weburl import sitemap_coverage, sitemap_entries

    sitemaps = spark.createDataFrame(
        [
            (
                "a.example",
                "<urlset><url><loc>https://a.example/both</loc>"
                "<lastmod>2026-03-01</lastmod></url>"
                "<url><loc>https://a.example/frontier</loc></url></urlset>",
            )
        ],
        "host string, sitemap_xml string",
    )
    crawled = spark.createDataFrame(
        [("https://a.example/both",), ("https://a.example/orphan",)], "url string"
    )
    out = {r["url"]: r.asDict() for r in
           sitemap_coverage(crawled, sitemap_entries(sitemaps)).collect()}
    assert out["https://a.example/both"]["status"] == "both"
    assert out["https://a.example/both"]["lastmod"] == "2026-03-01"
    assert out["https://a.example/frontier"]["status"] == "sitemap_only"
    assert out["https://a.example/orphan"]["status"] == "crawled_only"
    assert all(r["host"] == "a.example" for r in out.values())


def test_fetch_schedule_per_host_spacing(spark) -> None:
    from ocr_service_spark.operators.weburl import fetch_schedule

    frontier = spark.createDataFrame(
        [
            ("https://a.example/new", "a.example", "2026-03-05"),
            ("https://a.example/old", "a.example", "2026-01-01"),
            ("https://a.example/mid", "a.example", "2026-02-01"),
            ("https://b.example/only", "b.example", None),
            ("https://c.example/nodelay", "c.example", "2026-01-01"),
        ],
        "url string, host string, lastmod string",
    )
    delays = spark.createDataFrame(
        [("a.example", 10), ("b.example", 5)], "host string, delay_s bigint"
    )
    out = {r["url"]: r.asDict() for r in fetch_schedule(frontier, delays).collect()}
    # fresher first within a host, slots spaced by the host delay
    assert (out["https://a.example/new"]["rank"], out["https://a.example/new"]["slot_s"]) == (1, 0)
    assert (out["https://a.example/mid"]["rank"], out["https://a.example/mid"]["slot_s"]) == (2, 10)
    assert (out["https://a.example/old"]["rank"], out["https://a.example/old"]["slot_s"]) == (3, 20)
    # hosts schedule independently; missing delay defaults to 1s
    assert out["https://b.example/only"]["slot_s"] == 0
    assert (out["https://c.example/nodelay"]["rank"], out["https://c.example/nodelay"]["slot_s"]) == (1, 0)


# -- fuzz: the sitemap parser is total over untrusted text --------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=2048))
def test_sitemap_fuzz_never_raises(s: str):
    for e in parse_sitemap(s):
        assert isinstance(e, dict)
