"""URL canonicalization + host-level rollups for a web-pages corpus.

A Common-Crawl-style pages table keys on ``url`` (BASELINE input
hint), and every real crawl pipeline needs one canonical form per
page before dedup/partitioning: scheme/host case, trailing host dots,
default ports, duplicate path slashes, fragments and tracking
parameters all produce distinct strings for the same resource. The
reference service never sees URLs (its API carries filenames only —
SURVEY.md §3.2), so this is a beyond-reference corpus operator, like
the dedup/similarity suite.

Design for 100 TB: canonicalization is a pure projection — every
step is a built-in string/array function (regexp_extract /
regexp_replace / split / filter / array_sort / array_join), fully
inside whole-stage codegen, no Python, no shuffle. The host rollup
(q64) is one hash-shuffle groupBy on the canonical registered domain
— the partitioning key a politeness-aware crawler would use anyway.

Canonical form (the SURT-adjacent subset expressible identically in
Spark and DuckDB SQL, which is what makes the oracle exact):

    1. drop the fragment;
    2. lowercase scheme and host; strip trailing dots from the host;
    3. drop the default port (http:80 / https:443);
    4. collapse duplicate slashes in the path; empty path -> "/";
    5. drop ``utm_*`` tracking parameters, sort the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Dialect-portable regexes (same semantics in Java regex and RE2).
_RE_FRAGMENT = r"#.*$"
_RE_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*):"
_RE_HOSTPORT = r"^[^:]+://([^/?#]*)"
_RE_PORT = r":([0-9]+)$"
_RE_PATH = r"^[^:]+://[^/?#]*([^?#]*)"
_RE_QUERY = r"\?([^#]*)"
_RE_TRACKING = "^utm_"
_RE_REG_DOMAIN = r"([^.]+\.[^.]+)$"


def canonicalize_urls(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Append canonical columns to any DataFrame with a URL column:
    ``canonical_url``, ``host``, ``registered_domain``, ``path_depth``.
    Pure projection — safe to apply inside the scan stage of a 100-TB
    pipeline read."""
    no_frag = F.regexp_replace(F.col(url_col), _RE_FRAGMENT, "")
    scheme = F.lower(F.regexp_extract(no_frag, _RE_SCHEME, 1))
    hostport = F.regexp_extract(no_frag, _RE_HOSTPORT, 1)
    host = F.regexp_replace(
        F.lower(F.regexp_replace(hostport, _RE_PORT, "")), r"\.+$", ""
    )
    port = F.regexp_extract(hostport, _RE_PORT, 1)
    port = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(port)
    path = F.regexp_replace(F.regexp_extract(no_frag, _RE_PATH, 1), "/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.regexp_extract(no_frag, _RE_QUERY, 1), "&"),
                lambda x: (x != "") & ~x.rlike(_RE_TRACKING),
            )
        ),
        "&",
    )
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    depth = F.size(F.filter(F.split(path, "/"), lambda x: x != "")).cast("int")
    return pages.withColumns(
        {
            "canonical_url": canonical,
            "host": host,
            "registered_domain": F.regexp_extract(host, _RE_REG_DOMAIN, 1),
            "path_depth": depth,
        }
    )


def _messy_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic messy-URL corpus from the documents table: every
    canonicalization hazard appears in a closed-form pattern the
    oracle reconstructs (mixed case, trailing host dot, default and
    explicit ports, duplicate slashes, tracking params, fragments)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    host = F.concat(
        F.lit("WWW.News"),
        (d % 7).cast("string"),
        F.lit(".Example.COM"),
        F.when(d % 5 == 0, F.lit(".")).otherwise(F.lit("")),
    )
    port = (
        F.when(d % 4 == 0, F.lit(":80"))
        .when(d % 4 == 1, F.lit(":443"))
        .when(d % 4 == 2, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(F.lit("/Articles//item-"), d.cast("string"))
    query = (
        F.when(d % 3 == 0, F.lit("?utm_source=feed&b=2&a=1"))
        .when(d % 3 == 1, F.lit("?b=2&a=1"))
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 2 == 0, F.lit("#Section-2")).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(scheme, F.lit("://"), host, port, path, query, frag).alias("url"),
    )


def q63_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document canonicalization — one row per doc, every hazard
    rung exercised; plain projection end to end."""
    out = canonicalize_urls(_messy_urls(spark, sf_dir))
    return out.select(
        "doc_id", "url", "canonical_url", "host", "registered_domain", "path_depth"
    )


def q64_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level rollup over canonical URLs: docs per host +
    distinct-scheme count — the politeness/partitioning profile of a
    crawl. One hash-shuffle groupBy on host; AQE coalesces the
    post-shuffle partitions at real scale. The distinct-scheme count
    uses size(collect_set(...)) rather than countDistinct: the scheme
    domain is bounded (http/https), and the collect_set form keeps the
    plan at ONE shuffle where countDistinct's expand would add a
    second (pinned by test_q64_plan_has_single_shuffle)."""
    canon = canonicalize_urls(_messy_urls(spark, sf_dir))
    scheme = F.regexp_extract("canonical_url", _RE_SCHEME, 1)
    return (
        canon.groupBy("host", "registered_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.size(F.collect_set(scheme)).cast("bigint").alias("n_schemes"),
            F.max("path_depth").alias("max_depth"),
            F.sum(F.when(F.col("canonical_url").contains("?"), 1).otherwise(0)).alias(
                "n_with_query"
            ),
        )
    )


def extract_outlinks(
    pages: DataFrame, url_col: str = "url", payload_col: str = "html"
) -> DataFrame:
    """HTML payloads -> one row per outlink: (url, seq, outlink,
    noindex). Arrow-batched mapInPandas over the stdlib link parser
    (extraction/links.py); relative hrefs resolve against the page
    URL, link farms are capped at MAX_LINKS per page. A page with no
    links still yields one seq=-1 row carrying its noindex flag, so
    the robots signal survives for link-free pages."""
    import pandas as pd

    def gen(batches):
        from ocr_service_spark.extraction.links import extract_links

        for batch in batches:
            rows = []
            for url, payload in zip(batch[url_col], batch[payload_col]):
                links, noindex = extract_links(
                    bytes(payload) if payload is not None else b"", url
                )
                if not links:
                    rows.append(
                        {"url": url, "seq": -1, "outlink": None, "noindex": noindex}
                    )
                for seq, link in enumerate(links):
                    rows.append(
                        {"url": url, "seq": seq, "outlink": link, "noindex": noindex}
                    )
            yield pd.DataFrame(rows, columns=["url", "seq", "outlink", "noindex"])

    return pages.mapInPandas(
        gen, schema="url string, seq int, outlink string, noindex boolean"
    )


def _link_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic pages whose outlinks are closed-form: every doc links
    an absolute cross-host URL and a root-relative path, docs with
    doc_id%3==0 add a subdirectory-relative link, every doc carries a
    fragment/javascript/mailto trio that must be dropped, and docs
    with doc_id%7==0 are marked noindex."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    d = F.col("doc_id").cast("string")
    url = F.format_string(
        "https://www.src%s.example.com/dir/page%s.html",
        (F.col("doc_id") % 5).cast("string"),
        d,
    )
    robots = F.when(
        F.col("doc_id") % 7 == 0,
        F.lit('<meta name="robots" content="noindex, nofollow">'),
    ).otherwise(F.lit(""))
    third = F.when(
        F.col("doc_id") % 3 == 0,
        F.format_string('<a href="sub/p%s">s</a>', d),
    ).otherwise(F.lit(""))
    page = F.concat(
        F.lit("<html><head>"),
        robots,
        F.lit("<title>t</title></head><body>"),
        F.format_string(
            '<a href="https://news%s.example.com/story/%s">n</a>',
            (F.col("doc_id") % 7).cast("string"),
            d,
        ),
        F.format_string('<a href="/rel/%s">r</a>', d),
        third,
        F.lit('<a href="#frag">f</a><a href="javascript:void(0)">j</a>'),
        F.lit('<a href="mailto:a@b.example">m</a></body></html>'),
    )
    return docs.select(
        "doc_id", url.alias("url"), F.encode(page, "utf-8").alias("html")
    )


def q67_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page outlink extraction: absolute kept as-is, relative
    resolved against the page URL, pseudo-scheme/fragment links
    dropped, noindex carried through."""
    pages = _link_pages(spark, sf_dir)
    links = extract_outlinks(pages)
    doc_id = F.regexp_extract("url", r"page(\d+)\.html", 1).cast("bigint")
    return links.select(doc_id.alias("doc_id"), "seq", "outlink", "noindex")


def q68_link_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host in-degree over the outlink edges — the web-graph profile a
    frontier scheduler or PageRank seed needs. The noindex filter
    drops edges from deindexed pages map-side, before any shuffle;
    n_source_pages is a true countDistinct over unbounded page
    cardinality, so Catalyst's two-phase distinct expansion (partial
    agg on (host, url), then on host) is the correct scale shape —
    unlike q64's bounded scheme set, a collect_set here would grow
    per-host state without bound."""
    links = extract_outlinks(_link_pages(spark, sf_dir)).filter(
        F.col("outlink").isNotNull() & ~F.col("noindex")
    )
    host = F.regexp_extract("outlink", _RE_HOSTPORT, 1)
    return links.groupBy(host.alias("target_host")).agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct("url").alias("n_source_pages"),
    )


PR_SCALE = 1_000_000  # fixed-point unit: pr=1.0
PR_BASE = 150_000  # (1 - 0.85) * SCALE
PR_ITERS = 2


def host_pagerank(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Integer-exact PageRank over a (src, dst) host edge list.

    Fixed-point arithmetic (like q55's k-means): ranks are bigints
    scaled by PR_SCALE, the damping step is ``base + (17 * mass) div
    20`` with truncating integer division at each stage — every value
    is exactly reproducible in any SQL engine, no float drift. The
    iteration is the standard two-shuffle round: contributions =
    edges ⋈ ranks ⋈ outdeg (hash joins on the host key), then a
    groupBy(dst) sum; at web scale all three relations hash-partition
    on the same key, so AQE reuses the partitioning across rounds.
    Dangling mass (hosts with no outlinks) is dropped, parallel edges
    each carry a contribution — both conventions mirrored exactly by
    the oracle. Iterations are unrolled into one lazy plan; a
    production run at 10^8 hosts would checkpoint per round instead.
    """
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("pr", F.lit(PR_SCALE).cast("bigint"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["host"])
            .join(outdeg, "src")
            .select(F.col("dst"), F.expr("pr div outdeg").alias("c"))
        )
        mass = contrib.groupBy("dst").agg(F.sum("c").alias("mass"))
        ranks = nodes.join(mass, nodes["host"] == mass["dst"], "left").select(
            "host",
            (
                F.lit(PR_BASE) + F.expr(f"(17 * coalesce(mass, 0L)) div 20")
            ).cast("bigint").alias("pr"),
        )
    return ranks


def q69_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the synthetic link graph (all edges, including
    self-links from relative hrefs — conventions pinned in
    host_pagerank's docstring); two unrolled integer-exact iterations
    the oracle replays verbatim."""
    links = extract_outlinks(_link_pages(spark, sf_dir)).filter(
        F.col("outlink").isNotNull()
    )
    edges = links.select(
        F.regexp_extract("url", _RE_HOSTPORT, 1).alias("src"),
        F.regexp_extract("outlink", _RE_HOSTPORT, 1).alias("dst"),
    )
    return host_pagerank(edges).select("host", F.col("pr").alias("pr_scaled"))


# DuckDB mirror of _messy_urls + the canonical steps. The messy URL is
# rebuilt closed-form; canonicalization uses the same regex/list ops.
_MESSY_SQL = """
    SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
           || '://WWW.News' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM'
           || (CASE WHEN doc_id % 5 = 0 THEN '.' ELSE '' END)
           || (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN ':80' WHEN 1 THEN ':443'
                    WHEN 2 THEN ':8080' ELSE '' END)
           || '/Articles//item-' || CAST(doc_id AS VARCHAR)
           || (CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '?utm_source=feed&b=2&a=1'
                    WHEN 1 THEN '?b=2&a=1' ELSE '' END)
           || (CASE WHEN doc_id % 2 = 0 THEN '#Section-2' ELSE '' END) AS url
    FROM documents
"""

_CANON_SQL = f"""
    WITH m AS ({_MESSY_SQL}),
    s AS (
        SELECT doc_id, url,
               regexp_replace(url, '{_RE_FRAGMENT}', '') AS nf
        FROM m
    ),
    p AS (
        SELECT doc_id, url, nf,
               lower(regexp_extract(nf, '{_RE_SCHEME}', 1)) AS scheme,
               regexp_extract(nf, '{_RE_HOSTPORT}', 1) AS hostport,
               regexp_extract(nf, '{_RE_PATH}', 1) AS rawpath,
               regexp_extract(nf, '\\?([^#]*)', 1) AS rawquery
        FROM s
    ),
    c AS (
        SELECT doc_id, url, scheme,
               regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')),
                              '\\.+$', '') AS host,
               CASE WHEN (scheme = 'http'
                          AND regexp_extract(hostport, ':([0-9]+)$', 1) = '80')
                      OR (scheme = 'https'
                          AND regexp_extract(hostport, ':([0-9]+)$', 1) = '443')
                    THEN ''
                    ELSE regexp_extract(hostport, ':([0-9]+)$', 1) END AS port,
               CASE WHEN regexp_replace(rawpath, '/{{2,}}', '/') = '' THEN '/'
                    ELSE regexp_replace(rawpath, '/{{2,}}', '/') END AS path,
               coalesce(array_to_string(
                   list_sort(list_filter(string_split(rawquery, '&'),
                       x -> x <> '' AND NOT regexp_matches(x, '^utm_'))),
                   '&'), '') AS query
        FROM p
    ),
    canon AS (
        SELECT doc_id, url, scheme, host, path,
               regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS registered_domain,
               scheme || '://' || host
               || (CASE WHEN port = '' THEN '' ELSE ':' || port END)
               || path
               || (CASE WHEN query = '' THEN '' ELSE '?' || query END)
                   AS canonical_url,
               CAST(len(list_filter(string_split(path, '/'), x -> x <> ''))
                    AS INT) AS path_depth
        FROM c
    )
"""

ORACLES: dict[str, str] = {
    "q63_url_canonicalize": _CANON_SQL
    + """
    SELECT doc_id, url, canonical_url, host, registered_domain, path_depth
    FROM canon
    """,
    "q64_host_stats": _CANON_SQL
    + """
    SELECT host, registered_domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT scheme) AS BIGINT) AS n_schemes,
           CAST(max(path_depth) AS INT) AS max_depth,
           CAST(sum(CASE WHEN canonical_url LIKE '%?%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_query
    FROM canon
    GROUP BY host, registered_domain
    """,
}

ORACLES["q67_outlinks"] = """
    SELECT doc_id, CAST(0 AS INT) AS seq,
           'https://news' || (doc_id % 7) || '.example.com/story/' || doc_id
               AS outlink,
           doc_id % 7 = 0 AS noindex
    FROM documents
    UNION ALL
    SELECT doc_id, CAST(1 AS INT),
           'https://www.src' || (doc_id % 5) || '.example.com/rel/' || doc_id,
           doc_id % 7 = 0
    FROM documents
    UNION ALL
    SELECT doc_id, CAST(2 AS INT),
           'https://www.src' || (doc_id % 5) || '.example.com/dir/sub/p' || doc_id,
           doc_id % 7 = 0
    FROM documents WHERE doc_id % 3 = 0
"""

ORACLES["q68_link_hosts"] = """
    WITH e AS (
        SELECT doc_id, 'news' || (doc_id % 7) || '.example.com' AS h
        FROM documents WHERE doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id, 'www.src' || (doc_id % 5) || '.example.com'
        FROM documents WHERE doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id, 'www.src' || (doc_id % 5) || '.example.com'
        FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 3 = 0
    )
    SELECT h AS target_host,
           CAST(count(*) AS BIGINT) AS n_inlinks,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_source_pages
    FROM e GROUP BY h
"""

ORACLES["q69_host_pagerank"] = f"""
    WITH e AS (
        SELECT 'www.src' || (doc_id % 5) || '.example.com' AS src,
               'news' || (doc_id % 7) || '.example.com' AS dst
        FROM documents
        UNION ALL
        SELECT 'www.src' || (doc_id % 5) || '.example.com',
               'www.src' || (doc_id % 5) || '.example.com'
        FROM documents
        UNION ALL
        SELECT 'www.src' || (doc_id % 5) || '.example.com',
               'www.src' || (doc_id % 5) || '.example.com'
        FROM documents WHERE doc_id % 3 = 0
    ),
    nodes AS (SELECT DISTINCT host FROM (SELECT src AS host FROM e
                                         UNION ALL SELECT dst FROM e)),
    outdeg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    pr0 AS (SELECT host, CAST({PR_SCALE} AS BIGINT) AS pr FROM nodes),
    m1 AS (
        SELECT e.dst, sum(pr0.pr // o.outdeg) AS mass
        FROM e JOIN pr0 ON e.src = pr0.host JOIN outdeg o ON e.src = o.src
        GROUP BY e.dst
    ),
    pr1 AS (
        SELECT n.host,
               CAST({PR_BASE} + (17 * coalesce(m1.mass, 0)) // 20 AS BIGINT) AS pr
        FROM nodes n LEFT JOIN m1 ON n.host = m1.dst
    ),
    m2 AS (
        SELECT e.dst, sum(pr1.pr // o.outdeg) AS mass
        FROM e JOIN pr1 ON e.src = pr1.host JOIN outdeg o ON e.src = o.src
        GROUP BY e.dst
    ),
    pr2 AS (
        SELECT n.host,
               CAST({PR_BASE} + (17 * coalesce(m2.mass, 0)) // 20 AS BIGINT) AS pr
        FROM nodes n LEFT JOIN m2 ON n.host = m2.dst
    )
    SELECT host, pr AS pr_scaled FROM pr2
"""

QUERIES = {
    "q63_url_canonicalize": q63_url_canonicalize,
    "q64_host_stats": q64_host_stats,
    "q67_outlinks": q67_outlinks,
    "q68_link_hosts": q68_link_hosts,
    "q69_host_pagerank": q69_host_pagerank,
}
