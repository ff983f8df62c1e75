"""q86 BPE merge learning: the closed-form greedy-apply (run-offset
parity for x==y, simple lookback for x!=y) must agree with a
sequential greedy reference scan on adversarial words, and the full
query must expose the learned merge's effect (merge pair absent from
step 2, merged symbols present)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.operators.text_stats import _bpe_apply, q86_bpe_merges

SF_DIR = "/root/testdata/sf0.001"


def _greedy_reference(word: str, x: str, y: str) -> list[str]:
    """Sequential greedy left-to-right BPE merge — the definition."""
    out: list[str] = []
    for ch in word:
        if out and out[-1] == x and ch == y:
            out[-1] = x + y
        else:
            out.append(ch)
    return out


def _apply_via_spark(spark, words: list[str], x: str, y: str) -> dict[str, list[str]]:
    df = spark.createDataFrame(
        [(w, len(w), 1) for w in words], "word string, len int, wcnt long"
    )
    # tokens concatenate back to the word, so the concat keys the row
    return {"".join(r["t"]): list(r["t"]) for r in _bpe_apply(df, x, y).collect()}


ADVERSARIAL = [
    "aaab", "aaaa", "aaaaa", "baaa", "abab", "aabb", "abba",
    "aa", "ab", "ba", "xyxyx", "xxyy", "ayxya",
]


def test_greedy_apply_matches_sequential_reference(spark):
    for x, y in (("a", "a"), ("a", "b"), ("x", "y")):
        got = _apply_via_spark(spark, ADVERSARIAL, x, y)
        for w in ADVERSARIAL:
            assert got[w] == _greedy_reference(w, x, y), (w, x, y)
            assert "".join(got[w]) == w, (w, x, y)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=2, max_size=12), min_size=1, max_size=8
    )
)
def test_greedy_apply_property(spark, words):
    got = _apply_via_spark(spark, list(dict.fromkeys(words)), "a", "a")
    for w, toks in got.items():
        assert toks == _greedy_reference(w, "a", "a"), w


def test_q86_merge_is_applied(spark):
    rows = q86_bpe_merges(spark, SF_DIR).collect()
    step1 = {(r["sym_a"], r["sym_b"]): r["cnt"] for r in rows if r["step"] == 1}
    step2 = {(r["sym_a"], r["sym_b"]): r["cnt"] for r in rows if r["step"] == 2}
    assert len(step1) == len(step2) == 12
    merge1 = min(step1, key=lambda p: (-step1[p], p))
    # the learned pair is consumed: it cannot survive into step 2
    assert merge1 not in step2
    merged_sym = merge1[0] + merge1[1]
    # and the merged symbol appears as a pair member in the new counts
    assert any(merged_sym in p for p in step2), (merge1, step2)
