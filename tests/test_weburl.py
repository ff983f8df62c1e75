"""URL canonicalization + host rollups (operators/weburl.py).

Unit-level: the canonical form on hand-built hazard URLs. Plan-level:
q63 must stay a pure projection (no shuffle — it's meant to run inside
the scan stage of a 100-TB read) and q64 exactly one hash shuffle.
"""

from __future__ import annotations

import re

import pytest

from ocr_service_spark.operators.weburl import canonicalize_urls

SF = "/root/testdata/sf0.001"


def _canon(spark, url: str) -> dict:
    df = canonicalize_urls(spark.createDataFrame([(url,)], "url string"))
    return df.collect()[0].asDict()


@pytest.mark.parametrize(
    "url,expected",
    [
        # case, default port, fragment, duplicate slashes, tracking params
        (
            "HTTP://WWW.Example.COM:80//a//b?utm_source=x&b=2&a=1#frag",
            "http://www.example.com/a/b?a=1&b=2",
        ),
        ("https://Host.Example.org:443/x", "https://host.example.org/x"),
        # non-default port survives; trailing host dot stripped
        ("http://news.example.com.:8080/p", "http://news.example.com:8080/p"),
        # empty path -> "/"; empty query dropped
        ("https://example.com?utm_medium=a", "https://example.com/"),
        # param order normalized
        ("http://e.com/p?z=1&a=2", "http://e.com/p?a=2&z=1"),
    ],
)
def test_canonical_url(spark, url: str, expected: str) -> None:
    assert _canon(spark, url)["canonical_url"] == expected


def test_host_and_domain_and_depth(spark) -> None:
    row = _canon(spark, "HTTP://WWW.News3.Example.COM.:80//Articles//item-7#x")
    assert row["host"] == "www.news3.example.com"
    assert row["registered_domain"] == "example.com"
    assert row["path_depth"] == 2


def _formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q63_plan_is_shuffle_free(spark) -> None:
    from ocr_service_spark.operators.weburl import q63_url_canonicalize

    plan = _formatted_plan(q63_url_canonicalize(spark, SF))
    assert "Exchange" not in plan, plan


def test_q64_plan_has_single_shuffle(spark) -> None:
    from ocr_service_spark.operators.weburl import q64_host_stats

    df = q64_host_stats(spark, SF)
    plan = _formatted_plan(df)
    # one Exchange for the groupBy; partial aggregation must sit below it
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "HashAggregate" in plan


def test_host_pagerank_hand_computed(spark) -> None:
    """Two-node graph a->b, a->a: hand-unrolled fixed-point values.

    outdeg(a)=2. iter1: mass(a)=mass(b)=1000000//2=500000;
    pr1 = 150000 + (17*500000)//20 = 575000 for both.
    iter2: contributions 575000//2 = 287500 each;
    pr2 = 150000 + (17*287500)//20 = 394375 for both (b is dangling —
    its mass is dropped, the pinned convention)."""
    from ocr_service_spark.operators.weburl import host_pagerank

    edges = spark.createDataFrame([("a", "b"), ("a", "a")], "src string, dst string")
    ranks = {r["host"]: r["pr"] for r in host_pagerank(edges).collect()}
    assert ranks == {"a": 394375, "b": 394375}


def test_q63_q64_row_shapes(spark) -> None:
    from ocr_service_spark.operators.weburl import q63_url_canonicalize, q64_host_stats

    q63 = q63_url_canonicalize(spark, SF)
    assert q63.count() == 500  # sf0.001 documents
    assert q63.filter("canonical_url IS NULL OR host = ''").count() == 0
    hosts = q64_host_stats(spark, SF)
    assert hosts.count() == 7  # doc_id % 7 hosts
    assert hosts.filter("registered_domain <> 'example.com'").count() == 0


# -- crawl-lifecycle suite (q71 churn / q72 robots / q73 anchors) ------------


def test_snapshot_churn_statuses(spark) -> None:
    """Hand-built two-snapshot corpus: every status rung appears."""
    from ocr_service_spark.operators.weburl import snapshot_churn

    old = spark.createDataFrame(
        [("u1", "h1", "AAA"), ("u2", "h1", "BBB"), ("u3", "h2", "CCC")],
        "url string, host string, content_hash string",
    )
    new = spark.createDataFrame(
        [("u1", "h1", "AAA"), ("u2", "h1", "XXX"), ("u4", "h2", "DDD")],
        "url string, host string, content_hash string",
    )
    got = {r["url"]: r["status"] for r in snapshot_churn(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "changed", "u3": "deleted", "u4": "added"}


def test_q71_plan_joins_then_single_rollup_shuffle(spark) -> None:
    """Full-outer join on url (two scan-side exchanges at test scale —
    bucketed tables remove them in production) + ONE host rollup
    exchange with partial aggregation below it."""
    from ocr_service_spark.operators.weburl import q71_crawl_churn

    plan = _formatted_plan(q71_crawl_churn(spark, SF))
    assert "FullOuter" in plan or "full_outer" in plan.lower(), plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 3, plan
    assert "partial_sum" in plan  # map-side combine before the rollup shuffle


def test_q72_rules_join_not_forced_broadcast(spark) -> None:
    """fetch_policy must not hint-force the rules broadcast (a 10^8-host
    robots table can exceed executor memory) — AQE may still choose
    broadcast at this size, but the logical plan carries no hint, and
    no cartesian/nested-loop plan is acceptable."""
    from ocr_service_spark.operators.weburl import q72_robots_policy

    df = q72_robots_policy(spark, SF)
    logical = df._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical and "hint" not in logical.lower()
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q73_uses_window_group_limit(spark) -> None:
    """The per-host top-K rank must plan Spark's WindowGroupLimit
    pushdown (partial limit before the shuffle), not a full sort of
    every (host, term) count."""
    from ocr_service_spark.operators.weburl import q73_anchor_terms

    plan = _formatted_plan(q73_anchor_terms(spark, SF))
    assert "WindowGroupLimit" in plan, plan


def _redirect_rows(spark, rows):
    from ocr_service_spark.operators.weburl import resolve_redirects

    snap = spark.createDataFrame(rows, "url string, status int, location string")
    return {r["src_url"]: r.asDict() for r in resolve_redirects(snap).collect()}


def test_resolve_redirects_hand_built_hazards(spark) -> None:
    rows = [
        # 2-hop chain a -> b -> c(200)
        ("https://h/a", 301, "https://h/b"),
        ("https://h/b", 302, "https://h/c"),
        ("https://h/c", 200, None),
        # 2-cycle loop
        ("https://h/p", 301, "https://h/q"),
        ("https://h/q", 301, "https://h/p"),
        # dangling: Location outside the snapshot
        ("https://h/d", 307, "https://off/x"),
        # over-cap chain e0 -> e1 -> ... -> e5(200): 5 hops > cap 4
        ("https://h/e0", 308, "https://h/e1"),
        ("https://h/e1", 308, "https://h/e2"),
        ("https://h/e2", 308, "https://h/e3"),
        ("https://h/e3", 308, "https://h/e4"),
        ("https://h/e4", 308, "https://h/e5"),
        ("https://h/e5", 200, None),
    ]
    out = _redirect_rows(spark, rows)
    assert out["https://h/a"] == {
        "src_url": "https://h/a", "final_url": "https://h/c",
        "hops": 2, "resolution": "resolved",
    }
    assert out["https://h/b"]["resolution"] == "resolved"
    assert out["https://h/p"]["resolution"] == "unresolved"
    assert out["https://h/p"]["hops"] == 4  # hop cap
    assert out["https://h/d"] == {
        "src_url": "https://h/d", "final_url": "https://off/x",
        "hops": 1, "resolution": "dangling",
    }
    # the over-cap chain's head stalls one short of its terminal: the
    # resting URL is itself a redirect source -> unresolved at the cap
    assert out["https://h/e0"]["resolution"] == "unresolved"
    assert out["https://h/e0"]["hops"] == 4
    # but the suffix inside budget resolves fine
    assert out["https://h/e2"] == {
        "src_url": "https://h/e2", "final_url": "https://h/e5",
        "hops": 3, "resolution": "resolved",
    }


def test_resolve_redirects_non_3xx_and_null_location_excluded(spark) -> None:
    rows = [
        ("https://h/ok", 200, "https://h/ignored"),  # 200 with stray location
        ("https://h/gone", 404, None),
        ("https://h/nl", 301, None),  # malformed 3xx without Location
        ("https://h/r", 303, "https://h/ok"),
    ]
    out = _redirect_rows(spark, rows)
    assert set(out) == {"https://h/r"}
    assert out["https://h/r"]["resolution"] == "resolved"


def test_q75_plan_no_cartesian_and_pushed_status_filter(spark) -> None:
    from ocr_service_spark.operators.weburl import q75_redirect_chains

    plan = q75_redirect_chains(spark, SF)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_fetch_batch_semantics(spark) -> None:
    """q80's MERGE branches on a hand-built store/batch: matched+gone
    deletes, matched changed updates, matched same keeps, unmatched
    batch row inserts, gone-but-never-stored is a no-op, store rows
    absent from the batch are kept untouched."""
    from ocr_service_spark.operators.weburl import merge_fetch_batch

    store = spark.createDataFrame(
        [
            ("u/del", "h1", "aaa"),
            ("u/upd", "h1", "bbb"),
            ("u/same", "h2", "ccc"),
            ("u/untouched", "h2", "ddd"),
        ],
        "url string, host string, content_hash string",
    )
    batch = spark.createDataFrame(
        [
            ("u/del", "h1", "aaa", 1),
            ("u/upd", "h1", "bbb2", 0),
            ("u/same", "h2", "ccc", 0),
            ("u/new", "h3", "eee", 0),
            ("u/ghost404", "h3", "fff", 1),  # 404 for a url never stored
        ],
        "url string, host string, content_hash string, gone int",
    )
    out = {
        r.url: (r.host, r.content_hash, r.action)
        for r in merge_fetch_batch(store, batch).collect()
    }
    assert out == {
        "u/upd": ("h1", "bbb2", "update"),
        "u/same": ("h2", "ccc", "keep"),
        "u/untouched": ("h2", "ddd", "keep"),
        "u/new": ("h3", "eee", "insert"),
    }


def test_q84_host_quota_uses_window_group_limit(spark) -> None:
    """q84's rank<=K filter must push into WindowGroupLimit so hot
    hosts pre-limit map-side before the host shuffle; kept rows never
    exceed the quota per host."""
    from collections import Counter

    from ocr_service_spark.operators.weburl import HOST_QUOTA, q84_host_quota

    df = q84_host_quota(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    hosts = Counter(r.host for r in df.collect())
    assert hosts and max(hosts.values()) <= HOST_QUOTA
    assert all(1 <= r.sample_rank <= HOST_QUOTA for r in df.collect())


def test_bloom_seen_set_contract(spark):
    """q89: zero false negatives ever; the fp rate lands in the band
    the sizing math predicts (fill ~52% at 500 urls x 3 hashes in
    2048 bits -> fp ~ 0.52^3 ~ 14%); the probe join broadcasts the
    word table."""
    from ocr_service_spark.operators.weburl import q89_bloom_seen_set

    df = q89_bloom_seen_set(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    seen = [r for r in rows if r.truly_seen]
    novel = [r for r in rows if not r.truly_seen]
    assert all(r.bloom_hit for r in seen), "bloom filters cannot miss"
    assert not any(r.false_positive for r in seen)
    fp = sum(r.bloom_hit for r in novel) / len(novel)
    assert 0.03 < fp < 0.35, fp

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
