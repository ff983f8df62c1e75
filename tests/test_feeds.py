"""Feed-item extraction dialect (extraction/feeds.py, q130).

Pins: kind sniffing, RSS item field recovery with RFC 822 pubDate
parsed and UTC-normalized, Atom entry recovery with the rel=self skip
and RFC 3339 updated stamps, the link-is-mandatory drop rule, the
MAX_ITEMS cap, and totality over hostile bytes.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.extraction.feeds import (
    MAX_ITEMS,
    parse_feed,
    parse_rfc822,
    parse_rfc3339,
    sniff_feed_kind,
)

RSS = (
    b'<?xml version="1.0"?><rss version="2.0"><channel><title>Chan</title>'
    b"<item><title>A &amp; B</title><link>http://h.test/1</link>"
    b"<pubDate>Tue, 05 Mar 2013 14:30:00 +0200</pubDate></item>"
    b"<item><title>no link, dropped</title></item>"
    b"<item><link>http://h.test/2</link>"
    b"<pubDate>garbage date</pubDate></item>"
    b"</channel></rss>"
)

ATOM = (
    b'<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>'
    b"<entry><title>E1</title>"
    b'<link rel="self" href="http://x.test/self"/>'
    b"<link href='http://h.test/a?x=1&amp;y=2'/>"
    b"<updated>2013-03-05T14:30:00+02:00</updated></entry>"
    b"<entry><title>E2</title><link rel='alternate' href=\"http://h.test/b\"/>"
    b"<updated>2014-01-02</updated></entry>"
    b"</feed>"
)


def test_rss_items_with_utc_shift_and_drop_rules():
    kind, items = parse_feed(RSS)
    assert kind == "rss"
    # the channel <title> must not leak into item titles; the link-less
    # item is dropped; item_idx is the EMITTED index
    assert [(i["item_idx"], i["title"], i["link"]) for i in items] == [
        (0, "A & B", "http://h.test/1"),
        (1, None, "http://h.test/2"),
    ]
    assert items[0]["pub_utc"] == "2013-03-05 12:30:00"  # +0200 -> UTC
    assert items[1]["pub_utc"] is None  # unparseable stamp, item survives


def test_atom_entries_rel_skip_and_rfc3339():
    kind, items = parse_feed(ATOM)
    assert kind == "atom"
    assert [(i["title"], i["link"]) for i in items] == [
        ("E1", "http://h.test/a?x=1&y=2"),  # self skipped, href unescaped
        ("E2", "http://h.test/b"),  # explicit rel=alternate accepted
    ]
    assert items[0]["pub_utc"] == "2013-03-05 12:30:00"
    assert items[1]["pub_utc"] == "2014-01-02 00:00:00"  # bare date


def test_kind_sniff_and_non_feeds():
    assert sniff_feed_kind("<rss version='2.0'>") == "rss"
    assert sniff_feed_kind("<feed xmlns='...'>") == "atom"
    assert sniff_feed_kind("<rdf:RDF>") == "rss"
    assert sniff_feed_kind("<html><body>") is None
    assert parse_feed(b"\x00\xff not a feed") == (None, [])
    assert parse_feed(b"") == (None, [])
    # feed-looking but truncated: the items that DO parse come back
    kind, items = parse_feed(b"<rss><channel><item><title>t</title>")
    assert kind == "rss" and items == []


def test_date_parsers():
    assert parse_rfc822("05 Mar 2013 14:30:00 +0200") == "2013-03-05 12:30:00"
    assert parse_rfc822("Tue, 05 Mar 2013 14:30:00 GMT") == "2013-03-05 14:30:00"
    assert parse_rfc822("not a date") is None
    assert parse_rfc3339("2013-03-05T14:30:00Z") == "2013-03-05 14:30:00"
    assert parse_rfc3339("2013-03-05T14:30:00") == "2013-03-05 14:30:00"  # naive=UTC
    assert parse_rfc3339("2013-13-05") is None


def test_max_items_cap_bounds_hostile_fan_out():
    blob = b"<rss>" + b"<item><link>http://h.test/x</link></item>" * (MAX_ITEMS + 50)
    _, items = parse_feed(blob)
    assert len(items) == MAX_ITEMS


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_parse_feed_fuzz_never_raises(b: bytes):
    kind, items = parse_feed(b)
    assert kind in {None, "rss", "atom"}
    for it in items:
        assert it["link"]
