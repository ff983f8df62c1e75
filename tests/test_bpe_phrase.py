"""q144 (BPE encode-apply) and q145 (positional phrase search)
semantic pins.

q144's oracle pins the planted lexicon against hand-derived token
sequences; here the ENCODER DIALECT is pinned on words outside the
lexicon (repeat runs, merge-priority interactions, unknown chars).
q145's oracle pins ranking; here adjacency semantics are pinned (order
matters, gaps don't match, overlapping occurrences count).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.retrieval import (
    PHRASE,
    q145_phrase_search,
    positional_postings,
)
from ocr_service_spark.operators.text_stats import (
    BPE_LEXICON,
    _BPE_EXPECTED,
    bpe_apply,
    q144_bpe_encode,
)

SF = "/root/testdata/sf0.001"


def test_bpe_apply_lexicon_matches_hand_derivation():
    for w in BPE_LEXICON:
        assert " ".join(bpe_apply(w)) == _BPE_EXPECTED[w], w


def test_bpe_apply_dialect_edges():
    # one left-to-right pass per merge: 'eee' + (e,s) stays 3 symbols
    assert bpe_apply("eee") == ["e", "e", "e"]
    # repeats under a matching merge pair off left-to-right: 'erer'
    # -> [er, er]; 'erer' never re-pairs across merge outputs
    assert bpe_apply("erer") == ["er", "er"]
    # unknown characters pass through as single symbols
    assert bpe_apply("xyz") == ["x", "y", "z"]
    # merge priority: 'es' forms before 'est' needs it; 'st' never merges
    assert bpe_apply("est") == ["est"]
    assert bpe_apply("set") == ["s", "e", "t"]


def test_q144_runs_real_encoder_over_planting(spark):
    rows = q144_bpe_encode(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.tokens == _BPE_EXPECTED[r.word]
        assert r.n_tokens == len(r.tokens.split())


def test_phrase_adjacency_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "table part x"),          # one occurrence
            (2, "part table x"),          # reversed: no match
            (3, "table x part"),          # gap: no match
            (4, "table part table part"), # two occurrences
            (5, "table table part"),      # one (second 'table' starts it)
        ],
        "doc_id bigint, text string",
    )
    p = positional_postings(docs, PHRASE)
    assert PHRASE == ("table", "part")
    first = p.filter(F.col("term") == "table").select(
        "doc_id", F.col("pos").alias("start_pos"), (F.col("pos") + 1).alias("want")
    )
    second = p.filter(F.col("term") == "part").select(
        "doc_id", F.col("pos").alias("npos")
    )
    hits = (
        first.join(second, ["doc_id"])
        .filter(F.col("want") == F.col("npos"))
        .groupBy("doc_id")
        .count()
    )
    got = {r.doc_id: r["count"] for r in hits.collect()}
    assert got == {1: 1, 4: 2, 5: 1}


def test_q145_topk_contract(spark):
    rows = q145_phrase_search(spark, SF).collect()
    assert 0 < len(rows) <= 10
    tfs = [r.phrase_tf for r in rows]
    assert tfs == sorted(tfs, reverse=True)
    # every reported doc really contains the adjacent phrase
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id").isin([r.doc_id for r in rows]))
        .collect()
    }
    for r in rows:
        toks = docs[r.doc_id].lower().split()
        occ = [
            i
            for i in range(len(toks) - 1)
            if toks[i] == PHRASE[0] and toks[i + 1] == PHRASE[1]
        ]
        assert len(occ) == r.phrase_tf and occ[0] == r.first_pos, r.doc_id
