"""Semantic pins for the round-5 webtext additions: q111 (SURT
latest-capture dedup), q112 (integer-exact readability), q113 (domain
blocklist), q114 (cross-corpus paragraph dedup), q115/q116 (retrieval).

Cross-engine equivalence is covered by test_entry_oracle; these tests
pin what the oracles can't — that the semantics MEAN the right thing
(spelling variants collapse, subdomains match, first occurrence wins
corpus-wide, conjunctive search implies every term present)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.dedup import q114_paragraph_dedup
from ocr_service_spark.operators.quality import q112_readability
from ocr_service_spark.operators.retrieval import (
    RETRIEVAL_TERMS,
    q115_inverted_search,
    q116_bm25_topk,
)
from ocr_service_spark.operators.weburl import (
    _capture_urls,
    q111_surt_dedup,
    q113_domain_blocklist,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_q111_surt_collapses_spelling_variants(spark):
    out = q111_surt_dedup(spark, SF01)
    rows = {r["surt_key"]: r for r in out.collect()}
    # 500 docs over 200 pages -> every page is one SURT group
    assert len(rows) == 200
    counts = sorted({r["n_captures"] for r in rows.values()})
    assert counts == [2, 3]  # pages 0-99 have 3 captures, 100-199 have 2
    # SURT form: reversed host labels, no scheme, no www, ')' separator
    for key in rows:
        assert key.startswith("com,example,news")
        assert ")" in key and "www" not in key and "://" not in key
    # the kept capture is the argmax timestamp of its group
    caps = _capture_urls(spark, SF01).collect()
    by_page: dict[int, list] = {}
    for c in caps:
        by_page.setdefault(c["doc_id"] % 200, []).append(c)
    for r in rows.values():
        group = by_page[r["doc_id"] % 200]
        best = max(group, key=lambda c: (c["capture_ts"], c["doc_id"]))
        assert r["doc_id"] == best["doc_id"]
        assert r["capture_ts"] == best["capture_ts"]


def test_q113_blocklist_match_rungs(spark):
    out = {r["doc_id"]: r for r in q113_domain_blocklist(spark, SF).collect()}
    # doc 0: subdomain of ads-track.example (also %13/%17 — CASE order wins)
    assert out[0]["category"] == "ads" and out[0]["blocked"]
    assert out[0]["matched_domain"] == "ads-track.example"
    # doc 13: exact match on the blocklisted registrable domain
    assert out[13]["category"] == "gambling"
    assert out[13]["host"] == "casino-win.example"
    # doc 17: two labels below the blocklisted domain still matches
    assert out[17]["category"] == "malware"
    assert out[17]["host"].endswith(".cdn.malware-cdn.example")
    # doc 3: exact host-level entry (news3.example.com)
    assert out[3]["category"] == "blocked-host"
    # doc 1: clean host
    assert not out[1]["blocked"] and out[1]["category"] == "none"
    assert out[1]["matched_domain"] == "" and out[1]["severity"] == 0
    # example.com itself is NOT blocklisted: suffix matching must not
    # leak from news3.example.com to sibling hosts
    assert not out[8]["blocked"]  # news1.example.com


def test_q112_fixture_verdicts(spark):
    out = {r["doc_id"]: r for r in q112_readability(spark, SF).collect()}
    easy = out[1000000]
    assert (easy["n_words"], easy["n_sentences"]) == (9, 3)
    assert easy["easy_read"]
    novowel = out[1000001]
    assert novowel["n_words"] == 7 and novowel["n_syllables"] == 7
    assert novowel["easy_read"]
    assert not out[1000002]["easy_read"]
    empty = out[1000003]
    assert empty["n_words"] == 0 and empty["n_sentences"] == 0
    assert empty["fk_num"] == 39 - 2359  # both clamps engaged, Sy = 0
    assert empty["easy_read"]


def test_q114_first_occurrence_is_global(spark):
    out = q114_paragraph_dedup(spark, SF01).collect()
    assert all(r["n_paras"] == 3 for r in out)
    assert all(r["n_kept"] + r["n_dropped"] == 3 for r in out)
    # the 50-slot pool is fully covered, and each pool paragraph
    # survives exactly once corpus-wide
    assert sum(r["n_kept"] for r in out) == 50
    # doc 0 owns pids 0,1,2 first (lowest doc_id) -> keeps all three
    doc0 = next(r for r in out if r["doc_id"] == 0)
    assert doc0["n_kept"] == 3
    # doc 50 re-draws pids 0,1,2 ((50*3+j) % 50 = j) -> keeps none
    doc50 = next(r for r in out if r["doc_id"] == 50)
    assert doc50["n_kept"] == 0
    import hashlib

    assert doc50["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_q115_conjunctive_semantics(spark):
    hits = q115_inverted_search(spark, SF).collect()
    assert 0 < len(hits) <= 10
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)
    for r in hits:
        toks = docs[r["doc_id"]].lower().split()
        per_term = {t: toks.count(t) for t in RETRIEVAL_TERMS}
        assert all(per_term[t] > 0 for t in RETRIEVAL_TERMS)
        assert r["score"] == sum(per_term.values())
        for t in RETRIEVAL_TERMS:
            assert r[f"tf_{t}"] == per_term[t]


def test_q116_rational_bm25_weights(spark):
    hits = q116_bm25_topk(spark, SF).collect()
    assert len(hits) == 10
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)
    # recompute the pinned dialect in plain Python for the top hit
    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    df = {t: sum(1 for toks in docs.values() if t in toks) for t in RETRIEVAL_TERMS}
    top = hits[0]
    toks = docs[top["doc_id"]]
    expect = 0
    n_terms = 0
    for t in RETRIEVAL_TERMS:
        tf = toks.count(t)
        if tf:
            n_terms += 1
            expect += ((11000 * tf) // (5 * tf + 6)) * (1_000_000 // (df[t] + 1))
    assert top["score"] == expect
    assert top["n_terms"] == n_terms


def test_q118_sketch_matches_exact_quantiles(spark):
    from ocr_service_spark.operators.text_stats import (
        HIST_BIN_W,
        HIST_PCTS,
        q118_hist_quantiles,
    )

    rows = {r["pct"]: r for r in q118_hist_quantiles(spark, SF).collect()}
    assert set(rows) == set(HIST_PCTS)
    toks = sorted(
        len(r["text"].split())
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    )
    n = len(toks)
    for pct, r in rows.items():
        assert r["n_total"] == n
        assert r["lo_tokens"] == r["bin"] * HIST_BIN_W
        assert r["hi_tokens"] == r["lo_tokens"] + HIST_BIN_W - 1
        # election rule: lowest bin whose cumulative count reaches pct% of N
        want_bin = None
        cum = 0
        from collections import Counter

        by_bin = Counter(t // HIST_BIN_W for t in toks)
        for b in sorted(by_bin):
            cum += by_bin[b]
            if cum * 100 >= pct * n:
                want_bin = b
                break
        assert r["bin"] == want_bin
        # the sketch brackets the exact percentile value
        exact = toks[max(0, -(-pct * n // 100) - 1)]
        assert r["lo_tokens"] <= exact <= r["hi_tokens"]


def test_q119_report_rolls_up_both_signals(spark):
    from ocr_service_spark.operators.weburl import q119_host_quality_report

    rows = {r["host"]: r for r in q119_host_quality_report(spark, SF).collect()}
    assert sum(r["n_docs"] for r in rows.values()) == 500
    blocked_hosts = {h for h in rows if "ads-track" in h or "casino" in h
                     or "malware" in h or h == "news3.example.com"}
    for h, r in rows.items():
        if h in blocked_hosts:
            assert r["n_blocked"] == r["n_docs"], h
        else:
            assert r["n_blocked"] == 0, h
        assert 0 <= r["n_easy"] <= r["n_docs"]
        assert r["easy_bp"] == (10000 * r["n_easy"]) // r["n_docs"]
        assert r["mean_tokens_milli"] == (1000 * r["sum_tokens"]) // r["n_docs"]


def test_q121_collocation_verdict(spark):
    from ocr_service_spark.operators.text_stats import q121_collocations

    rows = {(r["a"], r["b"]): r for r in q121_collocations(spark, SF).collect()}
    assert len(rows) == 20
    # the fixture phrase is a true collocation and dominates by count
    tc = rows[("tensor", "core")]
    assert tc["collocated"] and tc["c_ab"] == 30
    # verdict and lift replay the pinned integer dialect
    for r in rows.values():
        lhs = r["c_ab"] * _n_tokens(spark) ** 2
        rhs = 2 * _m_bigrams(spark) * r["c_a"] * r["c_b"]
        assert r["collocated"] == (lhs > rhs)
        assert r["lift_milli"] == (1000 * r["c_ab"] * _n_tokens(spark) ** 2) // (
            _m_bigrams(spark) * r["c_a"] * r["c_b"]
        )
    # word-soup adjacencies are near-independent: at least one top pair
    # must NOT be a collocation (the FALSE branch is exercised)
    assert any(not r["collocated"] for r in rows.values())


_TOTALS: dict[str, int] = {}


def _corpus_tokens(spark):
    if "toks" not in _TOTALS:
        from ocr_service_spark.operators.text_stats import _COLL_SYN

        texts = [
            r["text"]
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
        ] + [t for _, t in sorted(_COLL_SYN.items())]
        _TOTALS["toks"] = [t.lower().split() for t in texts]
    return _TOTALS["toks"]


def _n_tokens(spark):
    return sum(len(t) for t in _corpus_tokens(spark))


def _m_bigrams(spark):
    return sum(len(t) - 1 for t in _corpus_tokens(spark) if len(t) >= 2)
