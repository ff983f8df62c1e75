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


def test_bpe_pretokenizer_counts_agree_with_duckdb(spark, tmp_path):
    """q83's BPE-ish pattern must count identically under Java regex
    (Spark) and RE2 (DuckDB) — pinned on adversarial text the ASCII
    corpus never exercises: Unicode letters/digits, contractions,
    punctuation runs, mixed whitespace."""
    import duckdb

    from ocr_service_spark.operators.text_stats import q83_bpe_token_counts

    rows = [
        (0, "Hello world, it's 42 degrees -- isn't it? café№9"),
        (1, "tabs\tand\nnewlines  double  spaces"),
        (2, "we'll you've they'd I'm CAN'T 3.14159 x2"),
        (3, "日本語۱۲۳ mixed nbsp"),
        (4, ""),
    ]
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = {
        r.doc_id: (r.ws_tokens, r.bpe_tokens)
        for r in q83_bpe_token_counts(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    import ocr_service_spark.operators.text_stats as ts

    want = {r[0]: (r[1], r[2]) for r in con.execute(
        ts.ORACLES["q83_bpe_token_counts"]).fetchall()}
    assert got == want
    assert got[0][1] == 15  # the hand-verified sample
