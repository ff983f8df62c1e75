"""q138 URL-templating dialect + verdict semantics on handwritten URLs.

The oracle pins the fixture; here the templating rules the fixture
leaves unexercised are pinned (hex session segments, mixed paths,
case folding, fragment handling) plus both verdicts end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.weburl import (
    q138_trap_detection,
    with_url_template,
)

SF_DIR = "/root/testdata/sf0.001"


def test_templating_dialect(spark):
    urls = [
        "http://H.test/Cal/2024/05/17/",
        "http://h.test/s/deadbeef00112233/x",   # >=8 hex chars -> <h>
        "http://h.test/s/beef/x",               # 4 hex chars: kept
        "http://h.test/a/b?page=2",
        "http://h.test/a/b#frag",               # fragment not part of path
        "http://h.test/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.url: (r.host, r.template) for r in with_url_template(df).collect()}
    assert got["http://H.test/Cal/2024/05/17/"] == ("h.test", "/cal/<d>/<d>/<d>")
    assert got["http://h.test/s/deadbeef00112233/x"][1] == "/s/<h>/x"
    assert got["http://h.test/s/beef/x"][1] == "/s/beef/x"
    assert got["http://h.test/a/b?page=2"][1] == "/a/b?*"
    assert got["http://h.test/a/b#frag"][1] == "/a/b"
    assert got["http://h.test/"][1] == "/"


def test_both_verdicts_present(spark):
    rows = q138_trap_detection(spark, SF_DIR).collect()
    traps = [r for r in rows if r.is_trap]
    clean = [r for r in rows if not r.is_trap]
    assert traps and clean
    for r in traps:
        assert r.template == "/cal/<d>" and 2 * r.n_urls > r.host_urls
    # every URL is accounted for exactly once
    assert sum(r.n_urls for r in rows) == spark.read.parquet(
        f"{SF_DIR}/documents.parquet"
    ).count()
