"""Substring-level duplicate-span removal (dedup.q79): Lee et al.-style
cross-document span dedup via duplicated K-shingle coverage. Semantics
pinned on a hand-computed corpus; oracle parity runs in
tests/test_entry_oracle.py like every registered query."""

from __future__ import annotations

from ocr_service_spark.operators.dedup import SPAN_K, q79_span_dedup

assert SPAN_K == 6  # the hand-computed expectations below encode K=6


def _write_docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    return sf_dir


def test_shared_span_removed_from_both_docs(spark, tmp_path):
    # docs 0/1 share the 7-token span "a b c d e f g" at different
    # offsets -> both its K=6 shingles are duplicated, covering exactly
    # positions 0-6 (doc 0) and 2-8 (doc 1); doc 2 is unique; doc 3 is
    # shorter than K (no shingles, untouchable); docs 4/5 are exact
    # 6-token duplicates (whole text removed)
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            (0, "a b c d e f g x y z"),
            (1, "p q a b c d e f g r"),
            (2, "u v w k y zz qq"),
            (3, "s t u"),
            (4, "m1 m2 m3 m4 m5 m6"),
            (5, "m1 m2 m3 m4 m5 m6"),
        ],
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.kept_text)
        for r in q79_span_dedup(spark, sf_dir).collect()
    }
    assert out == {
        0: (10, 7, "x y z"),
        1: (10, 7, "p q r"),
        2: (7, 0, "u v w k y zz qq"),
        3: (3, 0, "s t u"),
        4: (6, 6, ""),
        5: (6, 6, ""),
    }


def test_within_doc_repeat_is_not_removed(spark, tmp_path):
    # the SAME 6-shingle repeated twice inside ONE doc is not a
    # cross-document duplicate (distinct-doc frequency 1) -> kept whole
    text = "r1 r2 r3 r4 r5 r6 zz r1 r2 r3 r4 r5 r6"
    sf_dir = _write_docs(spark, tmp_path, [(0, text), (1, "w1 w2 w3 w4 w5 w6 w7")])
    out = {r.doc_id: (r.n_removed, r.kept_text) for r in q79_span_dedup(spark, sf_dir).collect()}
    assert out[0] == (0, text)
    assert out[1] == (0, "w1 w2 w3 w4 w5 w6 w7")
