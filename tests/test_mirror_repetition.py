"""q151 (mirror hosts), q152 (repetition battery), q153 (text
citations) semantic pins on handwritten data.

Oracles pin cross-engine values; here the semantics: a content
cluster's canonical is counted on exactly one host, the repetition
verdict fires on the planted repeats and ONLY them, and citation
extraction strips sentence punctuation without eating URL structure.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.quality import q152_repetition_battery
from ocr_service_spark.operators.weburl import (
    q151_mirror_hosts,
    q153_text_citations,
)

SF = "/root/testdata/sf0.001"


def test_q151_accounting(spark):
    rows = q151_mirror_hosts(spark, SF).collect()
    assert len(rows) == 17
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == docs
    # every content cluster elects exactly one canonical host; all 120
    # planted contents exist at sf0.001 (500 docs)
    # canonical doc rows are counted per doc, so the sum equals the
    # number of docs living on their cluster's canonical host
    assert sum(r.n_canonical for r in rows) > 0
    for r in rows:
        assert r.n_canonical <= r.n_docs and r.n_mirrored <= r.n_docs
        assert r.mirrored_bp == r.n_mirrored * 10000 // r.n_docs
    # with 120 contents over 17 hosts nearly everything is mirrored
    assert sum(r.n_mirrored for r in rows) >= docs * 9 // 10


def test_q152_verdicts_follow_planting(spark):
    rows = q152_repetition_battery(spark, SF).collect()
    for r in rows:
        if r.doc_id % 10 == 0:
            # five identical lines -> 4/5 duplicate lines = 8000 bp
            assert r.n_lines == 5 and r.dup_line_frac_bp == 8000, r
            assert r.repetitive
        else:
            assert r.dup_line_frac_bp == 0 or r.n_lines == 4
    # word-salad prose: some normal docs may trip a top-gram threshold,
    # but the planted repeats must be a superset of line-verdict docs
    line_reps = {r.doc_id for r in rows if r.dup_line_frac_bp > 3000}
    assert line_reps == {r.doc_id for r in rows if r.doc_id % 10 == 0}


def test_q153_citation_dialect(spark):
    rows = q153_text_citations(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.url.startswith(("https://ref", "http://mirror"))
        # trailing sentence punctuation stripped, path intact
        assert not r.url.endswith((".", ";", ")"))
        assert f"/{r.doc_id}" in r.url or r.url.endswith(str(r.doc_id))
        assert r.host and "/" not in r.host
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, cites in by_doc.items():
        want = 2 if doc_id % 15 == 0 else 1
        assert len(cites) == want, (doc_id, cites)
        assert sorted(c.seq for c in cites) == list(range(want))
