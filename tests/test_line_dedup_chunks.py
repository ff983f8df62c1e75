"""Corpus-wide first-occurrence segment dedup (corpus.q107) and
sliding-window overlap chunking (corpus.q108): semantics pinned on
hand-computed corpora; oracle parity runs in tests/test_entry_oracle.py
like every registered query."""

from __future__ import annotations

from ocr_service_spark.operators.corpus import (
    CHUNK_S,
    CHUNK_W,
    SEG_WORDS,
    q107_line_dedup_first,
    q108_chunk_overlap,
)

assert SEG_WORDS == 3  # hand-computed expectations below encode 3
assert (CHUNK_W, CHUNK_S) == (8, 4)  # and W=8 / S=4


def _write_docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    return sf_dir


def test_first_occurrence_wins_across_docs(spark, tmp_path):
    # doc 0 owns segments "a b c" and "d e f"; doc 1 repeats "a b c"
    # (dropped: doc 0 saw it first) and adds "g h i" (kept); doc 2 is
    # all repeats; doc 3 has < SEG_WORDS tokens -> zero segments ->
    # absent from the output entirely
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            (0, "a b c d e f"),
            (1, "a b c g h i"),
            (2, "d e f a b c"),
            (3, "x y"),
        ],
    )
    out = {
        r.doc_id: (r.n_segments, r.n_kept, r.n_dropped)
        for r in q107_line_dedup_first(spark, sf_dir).collect()
    }
    assert out == {0: (2, 2, 0), 1: (2, 1, 1), 2: (2, 0, 2)}


def test_first_occurrence_within_one_doc(spark, tmp_path):
    # the same segment twice INSIDE one doc: the earlier seg_idx wins
    sf_dir = _write_docs(spark, tmp_path, [(7, "a b c a b c")])
    [row] = q107_line_dedup_first(spark, sf_dir).collect()
    assert (row.n_segments, row.n_kept, row.n_dropped) == (2, 1, 1)


def test_chunk_boundaries_and_overlap(spark, tmp_path):
    # 10 tokens, W=8, S=4 -> ceil((10-8)/4)+1 = 2 chunks:
    # [t0..t7] (8 tokens) and [t4..t9] (6 tokens, overlaps by 4);
    # 8 tokens -> exactly 1 chunk; 1 token -> 1 chunk of 1
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            (0, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
            (1, "u0 u1 u2 u3 u4 u5 u6 u7"),
            (2, "solo"),
        ],
    )
    rows = q108_chunk_overlap(spark, sf_dir).collect()
    got = {(r.doc_id, r.chunk_idx): r.n_tokens for r in rows}
    assert got == {(0, 0): 8, (0, 1): 6, (1, 0): 8, (2, 0): 1}


def test_chunk_final_tail_reaches_last_token(spark, tmp_path):
    # 13 tokens -> ceil((13-8)/4)+1 = 3 chunks: starts 0, 4, 8 ->
    # sizes 8, 8, 5; identical text chunks hash identically
    text = " ".join(f"w{i}" for i in range(13))
    sf_dir = _write_docs(spark, tmp_path, [(0, text), (1, text)])
    rows = q108_chunk_overlap(spark, sf_dir).collect()
    sizes = sorted(
        (r.chunk_idx, r.n_tokens) for r in rows if r.doc_id == 0
    )
    assert sizes == [(0, 8), (1, 8), (2, 5)]
    h0 = {r.chunk_idx: r.chunk_h for r in rows if r.doc_id == 0}
    h1 = {r.chunk_idx: r.chunk_h for r in rows if r.doc_id == 1}
    assert h0 == h1
