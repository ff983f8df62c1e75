"""Outlink/robots extraction (extraction/links.py) + the exploded
operator (operators/weburl.extract_outlinks)."""

from __future__ import annotations

import codecs

from ocr_service_spark.extraction.links import MAX_LINKS, extract_links

BASE = "https://www.example.com/dir/page.html"


def _links(html: str, base: str | None = BASE):
    return extract_links(html.encode(), base)


def test_absolute_and_relative_resolution() -> None:
    links, _ = _links(
        '<a href="https://other.org/x">a</a>'
        '<a href="/root/y">b</a>'
        '<a href="sub/z">c</a>'
        '<a href="../up">d</a>'
    )
    assert links == [
        "https://other.org/x",
        "https://www.example.com/root/y",
        "https://www.example.com/dir/sub/z",
        "https://www.example.com/up",
    ]


def test_pseudo_schemes_and_fragments_dropped() -> None:
    links, _ = _links(
        '<a href="#sec">a</a><a href="javascript:void(0)">b</a>'
        '<a href="MAILTO:x@y.z">c</a><a href="tel:+1">d</a>'
        '<a href="data:text/plain,hi">e</a><a href="">f</a><a>g</a>'
        '<a href="/keep">h</a>'
    )
    assert links == ["https://www.example.com/keep"]


def test_entity_unescape_and_case_insensitive_tags() -> None:
    links, _ = _links('<A HREF="/p?a=1&amp;b=2">x</A>')
    assert links == ["https://www.example.com/p?a=1&b=2"]


def test_document_order_preserved() -> None:
    links, _ = _links("".join(f'<a href="/p{i}">x</a>' for i in range(5)))
    assert links == [f"https://www.example.com/p{i}" for i in range(5)]


def test_link_farm_capped() -> None:
    html = "".join(f'<a href="/p{i}">x</a>' for i in range(MAX_LINKS + 50))
    links, _ = _links(html)
    assert len(links) == MAX_LINKS


def test_noindex_variants() -> None:
    assert _links('<meta name="robots" content="noindex">')[1] is True
    assert _links('<meta name="ROBOTS" content="NOINDEX, nofollow">')[1] is True
    assert _links('<meta name="robots" content="index, follow">')[1] is False
    assert _links("<p>no meta</p>")[1] is False
    # non-robots meta must not trigger
    assert _links('<meta name="description" content="noindex zone">')[1] is False


def test_charset_aware_decode() -> None:
    page = '<html><body><a href="/ünïcode">x</a></body></html>'
    payload = codecs.BOM_UTF16_LE + page.encode("utf-16-le")
    links, _ = extract_links(payload, BASE)
    assert links == ["https://www.example.com/ünïcode"]


def test_no_base_keeps_raw_href() -> None:
    links, _ = extract_links(b'<a href="/x">a</a>', None)
    assert links == ["/x"]


def test_operator_emits_placeholder_row_for_linkless_page(spark) -> None:
    from ocr_service_spark.operators.weburl import extract_outlinks

    pages = spark.createDataFrame(
        [
            ("u://1", b'<meta name="robots" content="noindex"><p>none</p>'),
            ("u://2", b'<a href="https://a.example/x">l</a>'),
        ],
        "url string, html binary",
    )
    rows = {r["url"]: r for r in extract_outlinks(pages).collect()}
    assert rows["u://1"]["seq"] == -1
    assert rows["u://1"]["outlink"] is None
    assert rows["u://1"]["noindex"] is True
    assert rows["u://2"]["outlink"] == "https://a.example/x"
    assert rows["u://2"]["noindex"] is False


# -- anchor text (extract_anchors) -------------------------------------------


def test_anchor_text_basic() -> None:
    from ocr_service_spark.extraction.links import extract_anchors

    anchors, _ = extract_anchors(
        b'<a href="https://a.example/x">Breaking <b>News</b>  today</a>'
        b'<a href="/rel">rel\n\tlink</a>',
        BASE,
    )
    assert anchors == [
        ("https://a.example/x", "Breaking News today"),
        ("https://www.example.com/rel", "rel link"),
    ]


def test_anchor_unclosed_a_autocloses_at_next_a() -> None:
    from ocr_service_spark.extraction.links import extract_anchors

    anchors, _ = extract_anchors(
        b'<a href="https://b.example/y">first<a href="https://c.example/z">second</a>tail',
        BASE,
    )
    assert anchors == [
        ("https://b.example/y", "first"),
        ("https://c.example/z", "second"),
    ]


def test_anchor_empty_text_and_entities() -> None:
    from ocr_service_spark.extraction.links import extract_anchors

    anchors, _ = extract_anchors(
        b'<a href="https://d.example/">&lt;tag&gt; &amp; more</a>'
        b'<a href="https://e.example/"></a>',
        BASE,
    )
    assert anchors == [
        ("https://d.example/", "<tag> & more"),
        ("https://e.example/", ""),
    ]


def test_extract_links_unchanged_by_anchor_capture() -> None:
    """extract_links stays the href-only view of extract_anchors."""
    html = (
        '<a href="https://other.org/x">a</a><a href="#f">f</a>'
        '<a href="mailto:a@b">m</a><a href="/root/y">b</a>'
    )
    links, noindex = _links(html)
    assert links == ["https://other.org/x", "https://www.example.com/root/y"]
    assert noindex is False


# -- fuzz: the outlink extractor is total over untrusted bytes ----------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_links_fuzz_bytes_never_raises(b: bytes):
    links, nofollow = extract_links(b, "https://h.test/a/b")
    assert isinstance(links, list) and isinstance(nofollow, bool)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(
    ['<a href="', '">', "</a>", "http://x/", "//y/", "?q=1#f", "javascript:",
     "mailto:z", " ", "\x00", "%zz", "<base href='ftp://b/'>", "data:text/x,1",
     '<meta name="robots" content="nofollow">', "../..", "HTTPS://UP.TEST/P"]
), max_size=30))
def test_extract_links_fuzz_markup_soup_never_raises(parts: list):
    links, _ = extract_links("".join(parts), "https://h.test/")
    for u in links:
        assert isinstance(u, str)


# -- rel=canonical extraction (q127's dialect) --------------------------------
from ocr_service_spark.extraction.links import extract_canonical


def test_canonical_absolute_relative_and_first_wins():
    base = "https://www.example.com/dir/page.html"
    assert extract_canonical(
        b'<link rel="canonical" href="https://c.example.org/x">', base
    ) == "https://c.example.org/x"
    # relative resolves against the page URL
    assert extract_canonical(
        b"<link href='/p/1' rel='CANONICAL'>", base
    ) == "https://www.example.com/p/1"
    # first declaration wins; rel token list matched, stylesheet ignored
    html = (
        b'<link rel="stylesheet" href="/s.css">'
        b'<link rel="canonical alternate" href="/first">'
        b'<link rel="canonical" href="/second">'
    )
    assert extract_canonical(html, base) == "https://www.example.com/first"


def test_canonical_absent_or_unusable_is_none():
    base = "https://h.test/"
    assert extract_canonical(b"<html><body>x</body></html>", base) is None
    assert extract_canonical(b'<link rel="canonical" href="#frag">', base) is None
    assert extract_canonical(
        b'<link rel="canonical" href="javascript:void(0)">', base
    ) is None
    # no base: absolute kept, nothing to resolve relatives against
    assert extract_canonical(
        b'<link rel="canonical" href="http://a.test/x">', None
    ) == "http://a.test/x"


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_canonical_fuzz_never_raises(b: bytes):
    out = extract_canonical(b, "https://h.test/a/b")
    assert out is None or isinstance(out, str)


# -- feed autodiscovery (q134's dialect) ---------------------------------------
from ocr_service_spark.extraction.links import extract_feed_links


def test_feed_links_type_gate_resolution_and_order():
    base = "https://www.example.com/dir/page.html"
    html = (
        b'<link rel="alternate" hreflang="de" href="/de/">'
        b'<link rel="alternate" type="application/rss+xml" title="A &amp; B" href="/f.xml">'
        b'<link rel="alternate" type="text/html" href="/amp/">'
        b"<link rel='ALTERNATE' type='Application/Atom+XML' href='a.atom'>"
    )
    assert extract_feed_links(html, base) == [
        ("https://www.example.com/f.xml", "rss", "A & B"),
        ("https://www.example.com/dir/a.atom", "atom", None),
    ]
    # unusable hrefs drop without ending discovery (no first-wins rule)
    html2 = (
        b'<link rel="alternate" type="application/rss+xml" href="javascript:x">'
        b'<link rel="alternate" type="application/rss+xml" href="http://x.test/f">'
    )
    assert extract_feed_links(html2, base) == [("http://x.test/f", "rss", None)]
    assert extract_feed_links(b"<p>no feeds</p>", base) == []


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_feed_links_fuzz_never_raises(b: bytes):
    for furl, kind, title in extract_feed_links(b, "https://h.test/"):
        assert kind in ("rss", "atom") and isinstance(furl, str)


# -- hreflang alternates (q136's dialect) ---------------------------------------
from ocr_service_spark.extraction.links import extract_hreflangs


def test_hreflang_extraction_dialect():
    base = "https://www.example.com/en/page"
    html = (
        b'<link rel="alternate" hreflang="DE" href="/de/page">'
        b'<link rel="alternate" type="application/rss+xml" hreflang="en" href="/f.xml">'
        b'<link rel="alternate" hreflang="x-default" href="https://www.example.com/">'
        b'<link rel="alternate" hreflang="fr" href="javascript:x">'
    )
    # feed-typed alternates win the feed interpretation; tags lowercase;
    # relative resolves; pseudo-scheme drops
    assert extract_hreflangs(html, base) == [
        ("de", "https://www.example.com/de/page"),
        ("x-default", "https://www.example.com/"),
    ]
    assert extract_hreflangs(b"<p>none</p>", base) == []


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_hreflangs_fuzz_never_raises(b: bytes):
    for lang, target in extract_hreflangs(b, "https://h.test/"):
        assert isinstance(lang, str) and isinstance(target, str)
