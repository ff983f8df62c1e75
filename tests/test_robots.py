"""robots.txt parsing + fetch policy (extraction/robots.py,
operators/weburl.py q72).

Semantics under test are RFC 9309's: group selection (most specific
user-agent token, specific group REPLACES *, duplicate groups merge),
longest-match precedence with Allow winning ties, ``*``/``$`` pattern
matching, and the relational evaluation (fetch_policy's single
max(struct) aggregation) agreeing with the driver-side ``is_allowed``
on every (host, path) of the q72 corpus.
"""

from __future__ import annotations

import pytest

from ocr_service_spark.extraction.robots import (
    is_allowed,
    parse_robots,
    rules_for_agent,
)

BASIC = """
# politeness file
User-agent: *
Disallow: /private/
Allow: /private/pub/

User-agent: graftbot
User-agent: otherbot
Disallow: /tmp/

Sitemap: https://x.example/sitemap.xml
User-agent: graftbot-images
Disallow: /img/
"""


def test_group_structure():
    groups = parse_robots(BASIC)
    assert [a for a, _ in groups] == [
        ["*"], ["graftbot", "otherbot"], ["graftbot-images"]
    ]
    assert [(r.allow, r.pattern) for r in groups[0][1]] == [
        (False, "/private/"), (True, "/private/pub/")
    ]


def test_star_group_for_unknown_agent():
    rules = rules_for_agent(BASIC, "randombot/2.0")
    assert is_allowed(rules, "/private/x") is False
    assert is_allowed(rules, "/private/pub/y") is True  # longer Allow wins
    assert is_allowed(rules, "/private/pubx") is False  # NOT a /private/pub/ prefix
    assert is_allowed(rules, "/anything") is True


def test_specific_group_replaces_star():
    rules = rules_for_agent(BASIC, "graftbot")
    assert [(r.allow, r.pattern) for r in rules] == [(False, "/tmp/")]
    assert is_allowed(rules, "/private/x") is True  # * group does NOT merge in
    assert is_allowed(rules, "/tmp/z") is False


def test_longest_ua_token_wins():
    rules = rules_for_agent(BASIC, "graftbot-images/1.0")
    assert [(r.allow, r.pattern) for r in rules] == [(False, "/img/")]
    assert is_allowed(rules, "/tmp/z") is True  # graftbot group replaced


def test_duplicate_matching_groups_merge():
    txt = "User-agent: a\nDisallow: /x/\nUser-agent: a\nDisallow: /y/\n"
    rules = rules_for_agent(txt, "a")
    assert {r.pattern for r in rules} == {"/x/", "/y/"}


def test_wildcard_and_dollar_anchor():
    rules = rules_for_agent("User-agent: *\nDisallow: /*.zip$\nDisallow: /a*b\n", "x")
    assert is_allowed(rules, "/file.zip") is False
    assert is_allowed(rules, "/file.zip.html") is True  # $ anchors the end
    assert is_allowed(rules, "/aXXXb") is False
    assert is_allowed(rules, "/aXXX") is True
    # regex metacharacters in patterns are literal
    rules2 = rules_for_agent("User-agent: *\nDisallow: /a.b\n", "x")
    assert is_allowed(rules2, "/aXb") is True
    assert is_allowed(rules2, "/a.b/c") is False


def test_tie_allow_wins():
    rules = rules_for_agent("User-agent: *\nDisallow: /dir/\nAllow: /dir*\n", "x")
    assert is_allowed(rules, "/dir/x") is True  # equal length 5: Allow wins


def test_empty_disallow_is_allow_all():
    rules = rules_for_agent("User-agent: *\nDisallow:\n", "x")
    assert rules == []
    assert is_allowed(rules, "/anything") is True


def test_junk_lines_ignored():
    txt = "garbage\nDisallow: /early/\nUser-agent: *\nCrawl-delay: 10\nDisallow: /p/\n"
    rules = rules_for_agent(txt, "x")
    # the pre-group Disallow is dropped, crawl-delay skipped
    assert [r.pattern for r in rules] == ["/p/"]


def test_fetch_policy_matches_driver_side_decisions(spark):
    """The relational max(struct) evaluation must agree with
    ``is_allowed`` for every page of the q72 corpus."""
    from ocr_service_spark.operators.weburl import (
        _ROBOTS_AGENT,
        _robots_corpus,
        fetch_policy,
        robots_rules_table,
    )

    pages, robots = _robots_corpus(spark, "/root/testdata/sf0.001")
    rules = robots_rules_table(robots, _ROBOTS_AGENT)
    got = {r["doc_id"]: r for r in fetch_policy(pages, rules).collect()}

    host_rules = {
        r["host"]: rules_for_agent(r["robots_txt"], _ROBOTS_AGENT)
        for r in robots.collect()
    }
    n = 0
    for p in pages.collect():
        expected = is_allowed(host_rules[p["host"]], p["path"])
        assert got[p["doc_id"]]["fetchable"] == expected, (p["host"], p["path"])
        n += 1
    assert n == 500 and len(got) == 500


def test_fetch_policy_no_rules_host_is_fetchable(spark):
    """A host absent from the robots table (left join -> null rules)
    must come back fetchable with a null winning_rule."""
    from ocr_service_spark.operators.weburl import fetch_policy, robots_rules_table

    pages = spark.createDataFrame(
        [(1, "nowhere.example.com", "/any/path")], "doc_id long, host string, path string"
    )
    robots = spark.createDataFrame(
        [("other.example.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    row = fetch_policy(pages, robots_rules_table(robots, "bot")).collect()[0]
    assert row["fetchable"] is True and row["winning_rule"] is None


# -- fuzz: the policy parser is total over untrusted text ---------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=2048))
def test_robots_fuzz_never_raises(s: str):
    rules = rules_for_agent(s, "graftbot")
    assert isinstance(rules, list)
    assert isinstance(is_allowed(rules, "/any/path"), bool)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(
    ["User-agent: *", "user-agent:", "Disallow: /a*", "Allow: /a/b$",
     "Disallow:", "Crawl-delay: x", "Sitemap: :::", "Disallow: /%%%",
     "#c", ":", "User-agent: graftbot", "Disallow: /$$$^[("]
), max_size=30))
def test_robots_fuzz_directive_soup_never_raises(lines: list):
    text = "\n".join(lines)
    rules = rules_for_agent(text, "graftbot")
    assert isinstance(is_allowed(rules, "/a/b"), bool)


# -- Sitemap records (q135's dialect) ------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.extraction.robots import sitemap_urls


def test_sitemap_records_dialect():
    text = (
        "SITEMAP: https://h.test/s1.xml  # nightly\n"
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: http://h.test/s2.xml\n"  # inside a group: still found
        "Sitemap: /relative-dropped\n"
        "Sitemap:\n"
        "NotSitemap: https://h.test/nope\n"
    )
    assert sitemap_urls(text) == ["https://h.test/s1.xml", "http://h.test/s2.xml"]
    assert sitemap_urls("") == []


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=2048))
def test_sitemap_urls_fuzz_never_raises(t: str):
    for u in sitemap_urls(t):
        assert u.lower().startswith(("http://", "https://"))
