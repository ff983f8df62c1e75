"""Unicode NFC canonicalization (text_stats.q109): the normalizer must
agree with Python's unicodedata (the reference implementation of
UAX #15 in this sandbox) on cases harder than the fixture corpus —
Hangul Jamo composition, stacked combining marks, canonical-class
reordering, singleton decompositions, blocked composition — and be
idempotent. Oracle parity against DuckDB's utf8proc runs in
tests/test_entry_oracle.py like every registered query; this file pins
the semantics on adversarial inputs built from explicit codepoint
escapes (no literal combining chars in source).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import functions as F

from ocr_service_spark.operators.text_stats import q109_unicode_nfc

# (label, raw, expected_nfc) triples; expected is the UAX #15 answer,
# cross-checked against unicodedata in the test body too.
_CASES = [
    # NFD latin: e + COMBINING ACUTE (0301) -> U+00E9
    ("latin_nfd", "café", "café"),
    # stacked marks out of canonical order: s + COMBINING CIRCUMFLEX
    # (0302, ccc=230) + COMBINING DOT BELOW (0323, ccc=220) must
    # canonically reorder to s+0323+0302 then compose s+0323 -> U+1E63
    ("reorder_then_compose", "ṣ̂", "ṣ̂"),
    # Hangul Jamo L+V+T -> precomposed syllable (algorithmic mapping)
    ("hangul_jamo", "한", "한"),
    # singleton: ANGSTROM SIGN U+212B -> U+00C5
    ("singleton_angstrom", "Å", "Å"),
    # blocked composition: e + 0300 composes to U+00E8; the following
    # 0301 (same ccc as the consumed 0300) cannot also compose
    ("blocked", "è́", "è́"),
    # already NFC: must pass through identical
    ("already_nfc", "café naïve", "café naïve"),
    ("ascii", "plain ascii text", "plain ascii text"),
    ("empty", "", ""),
]


def _spark_nfc(spark, texts):
    """Run the exact pandas-UDF shape q109 uses, standalone over texts."""

    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    rows = df.select("i", nfc("t").alias("n")).orderBy("i").collect()
    return [r["n"] for r in rows]


def test_nfc_matches_unicodedata_on_adversarial_cases(spark):
    got = _spark_nfc(spark, [raw for _, raw, _ in _CASES])
    for (label, raw, expected), out in zip(_CASES, got):
        # the hand-written expectation and the stdlib agree
        assert unicodedata.normalize("NFC", raw) == expected, label
        assert out == expected, label
        # NFC is idempotent: a second pass must be a no-op
        assert unicodedata.normalize("NFC", out) == out, f"{label}: not idempotent"


def test_q109_changed_flag_and_length_contract(spark, tmp_path):
    # q109 NFD-decomposes every 'e' itself, so any doc containing 'e'
    # must recompose (changed=1, n_cp_nfc < n_cp_raw); docs without
    # 'e' pass through untouched (changed=0, equal lengths).
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "no vocal hit"), (2, "")],
        "doc_id long, text string",
    ).write.parquet(f"{sf_dir}/documents.parquet")
    out = {r["doc_id"]: r for r in q109_unicode_nfc(spark, sf_dir).collect()}
    assert out[0]["changed"] == 1 and out[0]["n_cp_nfc"] < out[0]["n_cp_raw"]
    assert out[1]["changed"] == 0 and out[1]["n_cp_nfc"] == out[1]["n_cp_raw"]
    assert out[2]["changed"] == 0 and out[2]["n_cp_raw"] == 0
