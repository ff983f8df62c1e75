"""sources/cdx.py: CDXJ line parse — field typing, malformed-line
drop, and the q87 ingest invariants (latest-wins, digest dedup)."""

from __future__ import annotations

from ocr_service_spark.sources.cdx import parse_cdx

SF_DIR = "/root/testdata/sf0.001"

GOOD = (
    'com,example)/a 20260101120000 {"url": "https://example.com/a",'
    ' "mime": "text/html", "status": "200", "digest": "d1",'
    ' "length": "512", "offset": "1024", "filename": "c-00000.warc.gz"}'
)
BAD = [
    "",  # empty
    "just some noise",  # no timestamp/json
    "com,example)/b 2026 {}",  # short timestamp
    'com,example)/c 20260101120000 not-json',  # json missing
]


def test_parse_cdx_fields_and_malformed_drop(spark):
    df = spark.createDataFrame([(x,) for x in [GOOD, *BAD]], "line string")
    rows = parse_cdx(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.urlkey == "com,example)/a"
    assert r.cdx_ts == "20260101120000"
    assert r.url == "https://example.com/a"
    assert r.status == 200 and isinstance(r.status, int)
    assert r.length == 512 and r.offset == 1024
    assert r.filename == "c-00000.warc.gz"


def test_q87_ingest_invariants(spark):
    from ocr_service_spark.operators.roundtrip import q87_cdx_ingest

    rows = q87_cdx_ingest(spark, SF_DIR).collect()
    by_key = {r.urlkey: r for r in rows}
    assert len(by_key) == len(rows)  # one row per surviving urlkey
    for r in rows:
        # latest-wins: the early 20260101 capture never wins election
        assert r.latest_ts.startswith("20260302")
        doc_id = int(r.urlkey.rsplit("/", 1)[1])
        assert r.n_captures == (2 if doc_id % 5 == 0 else 1)
        # filters really dropped the non-fetchable rungs
        assert doc_id % 17 != 0 and doc_id % 13 != 0 and doc_id % 9 != 0
        # canonical element is the group minimum and is marked
        assert r.is_canonical == (r.urlkey == r.canonical_urlkey)
        assert by_key[r.canonical_urlkey].is_canonical
    # the dup-digest rung produces real multi-url digest groups
    assert any(r.n_urls_with_digest > 1 for r in rows)
