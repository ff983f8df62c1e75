"""q95/q96/q97 — published web-corpus quality filters.

The oracle parity itself is covered by tests/test_entry_oracle.py (and
the driver gate); these tests pin the SEMANTICS: each Gopher fixture
row fails exactly its designed rule, the C4 page hazards fire on the
engineered doc_ids, the URL scorer decomposes correctly, and all three
plans stay shuffle-free map-only projections (the 100 TB shape).
"""

from __future__ import annotations

import pytest

from ocr_service_spark.operators.quality import (
    _GOPHER_SYN,
    q95_gopher_quality,
    q96_c4_line_filter,
    q97_url_filter,
)

SF_DIR = "/root/testdata/sf0.001"

RULE_FLAGS = [
    "pass_word_count",
    "pass_mean_word_len",
    "pass_symbol_ratio",
    "pass_bullet_lines",
    "pass_ellipsis_lines",
    "pass_alpha_words",
    "pass_stop_words",
]

# fixture doc_id -> the single rule it is engineered to fail
EXPECTED_FAIL = {
    1000001: "pass_word_count",
    1000002: "pass_mean_word_len",
    1000003: "pass_symbol_ratio",
    1000004: "pass_bullet_lines",
    1000005: "pass_ellipsis_lines",
    1000006: "pass_stop_words",
    1000007: "pass_alpha_words",
}


def test_gopher_fixture_rows_fail_exactly_their_rule(spark):
    rows = {
        r["doc_id"]: r
        for r in q95_gopher_quality(spark, SF_DIR)
        .filter("doc_id >= 1000000")
        .collect()
    }
    assert set(rows) == set(_GOPHER_SYN)
    for doc_id, rule in EXPECTED_FAIL.items():
        r = rows[doc_id]
        failed = [f for f in RULE_FLAGS if not r[f]]
        assert failed == [rule], f"doc {doc_id}: failed {failed}, want [{rule}]"
        assert not r["keep"]
    # 1000000 is the engineered all-pass row: keep must not be vacuous
    assert all(rows[1000000][f] for f in RULE_FLAGS)
    assert rows[1000000]["keep"]


def test_gopher_natural_corpus_is_scored_per_rule(spark):
    nat = q95_gopher_quality(spark, SF_DIR).filter("doc_id < 1000000")
    rows = nat.collect()
    assert rows
    # the word-soup corpus never carries two distinct Gopher stop words
    # (only 'the' is in its vocabulary) — Gopher correctly rejects it
    assert all(not r["pass_stop_words"] for r in rows)
    # but the other rules discriminate: word-count splits the corpus
    counts = {r["pass_word_count"] for r in rows}
    assert counts == {True, False}


def test_c4_page_hazards_fire_on_engineered_doc_ids(spark):
    rows = q96_c4_line_filter(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["has_lorem"] == (r["doc_id"] % 7 == 0)
        assert r["has_brace"] == (r["doc_id"] % 11 == 3)
        if r["has_lorem"] or r["has_brace"]:
            assert not r["page_keep"]
        # kept lines can only come from decorations 0 ('.') and 3 ('!')
        # plus the always-kept lorem hazard line
        ceiling = r["n_lines"]
        assert 0 <= r["kept_lines"] <= ceiling


def test_c4_clean_md5_is_empty_text_hash_when_nothing_survives(spark):
    import hashlib

    empty = hashlib.md5(b"").hexdigest()
    rows = q96_c4_line_filter(spark, SF_DIR).filter("kept_lines = 0").collect()
    for r in rows:
        assert r["clean_md5"] == empty


def test_url_filter_score_decomposition(spark):
    rows = {r["doc_id"]: r for r in q97_url_filter(spark, SF_DIR).collect()}
    for doc_id, r in rows.items():
        want_block = 2 if doc_id % 11 == 0 else 0
        assert 2 * r["blockword_hits"] == want_block
        assert r["digit_host"] == (doc_id % 17 == 0)
        assert r["bad_tld"] == (doc_id % 13 == 0)
        assert r["deep_path"] == (doc_id % 19 == 0 and doc_id % 11 != 0)
        score = (
            want_block
            + int(r["digit_host"])
            + int(r["bad_tld"])
            + int(r["deep_path"])
        )
        assert r["score"] == score
        assert r["keep"] == (score == 0)
    # doc 0 trips casino + spam TLD + digit host at once
    assert rows[0]["score"] == 4 and not rows[0]["keep"]
    assert rows[1]["score"] == 0 and rows[1]["keep"]


@pytest.mark.parametrize("fn", [q95_gopher_quality, q96_c4_line_filter, q97_url_filter])
def test_quality_plans_are_shuffle_free(spark, fn):
    """All three filters must stay map-only scans — at 10^12 docs any
    Exchange here would be the pipeline's largest shuffle."""
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# -- q98: the JSONL corpus-export sink ----------------------------------------
def test_export_writes_hive_partitioned_jsonl(spark, tmp_path):
    import json
    from pathlib import Path

    from ocr_service_spark.operators.corpus import (
        EXPORT_SHARDS,
        export_jsonl_shards,
    )

    out = str(tmp_path / "export")
    back = export_jsonl_shards(spark, SF_DIR, out)
    # layout: shard=K/part-*.json, every shard present
    shard_dirs = sorted(p.name for p in Path(out).iterdir() if p.is_dir())
    assert shard_dirs == sorted(f"shard={k}" for k in range(EXPORT_SHARDS))
    # files are real line-delimited JSON with the full record
    some = next(Path(out, shard_dirs[0]).glob("*.json"))
    rec = json.loads(some.read_text().splitlines()[0])
    assert set(rec) == {"doc_id", "text", "lang"}
    # the round trip is lossless: every source doc comes back once
    import duckdb

    src = duckdb.connect().execute(
        f"SELECT count(*), sum(doc_id) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()
    got = back.selectExpr("count(*)", "sum(doc_id)").collect()[0]
    assert (got[0], got[1]) == (src[0], src[1])


# -- q164: independent-filter ablation Venn ------------------------------------
def test_ablation_venn_is_fully_populated(spark):
    """The 12 _ABLATION_SYN cells plus the natural corpus must cover
    all 16 (fail_gopher, fail_c4, fail_url, fail_lang) combinations,
    and every filter must earn a unique-removal attribution — the
    diagnostic is worthless if any cell is structurally empty."""
    from ocr_service_spark.operators.quality import q164_filter_ablation

    rows = q164_filter_ablation(spark, SF_DIR).collect()
    cells = {
        (r["fail_gopher"], r["fail_c4"], r["fail_url"], r["fail_lang"]): r
        for r in rows
    }
    assert len(cells) == 16
    uniq = {r["unique_filter"] for r in rows if r["unique_filter"]}
    assert uniq == {"gopher", "c4", "url", "lang"}
    # n_failing is the popcount of the cell key, all-pass cell exists
    for key, r in cells.items():
        assert r["n_failing"] == sum(key)
    assert cells[(False, False, False, False)]["n_docs"] >= 1
    # shares are basis points of one corpus: they sum to <= 10000 with
    # rounding slack < 16 (integer div truncation per cell)
    total_bp = sum(r["share_bp"] for r in rows)
    assert 10000 - 16 < total_bp <= 10000
