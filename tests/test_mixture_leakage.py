"""q99 (corpus mixture sampling) and q100 (split leakage guard).

Oracle parity runs under tests/test_entry_oracle.py; these pin the
semantics: mixture rates follow the integer-exact weight math and cap
at 10000 bps, sampling respects the rate gate, the leakage guard
quarantines only val docs, and verified leaks include BOTH the
engineered clones (jaccard 1.0) and the corpus's genuine near-dups.
"""

from __future__ import annotations

from ocr_service_spark.operators.corpus import (
    MIX_BPS,
    MIX_WEIGHT_MOD,
    q99_corpus_mixture,
)
from ocr_service_spark.operators.dedup import (
    LEAK_CLONE_OFFSET,
    MINHASH_VERIFY_MIN,
    q100_split_leakage_guard,
)

SF_DIR = "/root/testdata/sf0.001"


def test_mixture_rates_follow_weight_math(spark):
    rows = q99_corpus_mixture(spark, SF_DIR).collect()
    assert rows
    total_chars = sum(r["actual_chars"] for r in rows)
    total_weight = sum(r["weight"] for r in rows)
    for r in rows:
        assert r["weight"] == int(r["source"][3:]) % MIX_WEIGHT_MOD + 1
        want_target = (total_chars * r["weight"]) // total_weight
        assert r["target_chars"] == want_target
        assert r["rate_bps"] == min(
            MIX_BPS, want_target * MIX_BPS // r["actual_chars"]
        )
        assert 0 <= r["kept_chars"] <= r["actual_chars"]
        # a full-rate source keeps everything
        if r["rate_bps"] == MIX_BPS:
            assert r["kept_chars"] == r["actual_chars"]
    # under- and over-weight sources must both occur (rates not constant)
    assert {r["rate_bps"] == MIX_BPS for r in rows} == {True, False}


def test_mixture_downsamples_toward_target(spark):
    rows = q99_corpus_mixture(spark, SF_DIR).collect()
    # capped sources keep everything; uncapped sources land near their
    # target (hash gate is unbiased; tolerance wide for small samples)
    for r in rows:
        if r["rate_bps"] < MIX_BPS:
            assert r["kept_chars"] < r["actual_chars"]


def test_leakage_guard_quarantines_only_val(spark):
    rows = q100_split_leakage_guard(spark, SF_DIR).collect()
    leaks = [r for r in rows if r["leak"]]
    assert leaks, "fixture clones guarantee at least one leak"
    for r in rows:
        if r["leak"]:
            assert r["split"] == "val"
            assert r["final_split"] == "quarantine"
            assert r["max_jaccard"] >= MINHASH_VERIFY_MIN
            assert r["n_leak_matches"] >= 1
        else:
            assert r["final_split"] == r["split"]
            assert r["n_leak_matches"] == 0 and r["max_jaccard"] == 0.0


def test_leakage_guard_catches_clone_and_natural_dups(spark):
    rows = q100_split_leakage_guard(spark, SF_DIR).collect()
    leaks = [r for r in rows if r["leak"]]
    by_origin = {
        "clone": [r for r in leaks if r["doc_id"] >= LEAK_CLONE_OFFSET],
        "natural": [r for r in leaks if r["doc_id"] < LEAK_CLONE_OFFSET],
    }
    # every clone that landed in val while its original landed in train
    # is a perfect leak
    assert all(r["max_jaccard"] == 1.0 for r in by_origin["clone"])
    # the synthetic corpus carries genuine near-dups; the guard must
    # catch those too, not just the engineered ones
    assert by_origin["natural"], [r["doc_id"] for r in leaks]
