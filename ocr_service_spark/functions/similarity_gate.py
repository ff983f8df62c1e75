"""The reference's E2E quality gate, re-expressed (tests/utils_helpers.py:45-76).

The reference accepts a per-format extraction when its normalized
Levenshtein similarity to the canonical document text is >= 0.60
(tests/test_process.py:23). We reproduce the exact helper — including
its quirks: typographic-quote/whitespace normalization applied to the
FIRST argument only (the candidate), and the swap that compares against
the longer string — so our outputs pass the same bar the reference's
outputs do. Usable as a Spark pandas UDF for corpus-level QA gates.
"""

from __future__ import annotations

import re

# canonical content of the pat_id_1.* fixture family
# (tests/utils_helpers.py:28-34)
CANONICAL_PAT_ID_1 = (
    "The patient’s name is Bart Davidson. His carer’s Name Paul Wayne. "
    "His telephone number is 07754828992. His Address is 61 Basildon Way, "
    "East Croyhurst, Angelton, AL64 9HT. His mother’s name is Pauline Smith. "
    "He is on 100mg Paracetamol, 20 milligrams clozapine."
)

SIMILARITY_THRESHOLD = 0.60  # tests/test_process.py:23


def levenshtein(candidate: str, target: str) -> int:
    """Edit distance with the reference's candidate-only normalization
    (quotes, escaped newlines, whitespace collapse) and longer-first swap."""
    s = (
        candidate.replace("‘", "'")
        .replace("“", '"')
        .replace("”", '"')
        .replace("\\\n", " ")
    )
    s = re.sub(r"\s+", " ", s).strip()
    t = target
    if len(s) < len(t):
        s, t = t, s
    m, n = len(s), len(t)
    if n == 0:
        return m
    if s == t:
        return 0
    prev = list(range(n + 1))
    for i, sc in enumerate(s, 1):
        curr = [i] + [0] * n
        for j, tc in enumerate(t, 1):
            ins = curr[j - 1] + 1
            delete = prev[j] + 1
            sub = prev[j - 1] + (sc != tc)
            curr[j] = min(ins, delete, sub)
        prev = curr
    return prev[n]


def lev_similarity(candidate: str, target: str) -> float:
    """Normalized similarity in [0, 1]; 1.0 means identical."""
    if not candidate and not target:
        return 1.0
    distance = levenshtein(candidate, target)
    return 1.0 - distance / max(len(candidate), len(target))


def passes_reference_gate(candidate: str, target: str = CANONICAL_PAT_ID_1) -> bool:
    return lev_similarity(candidate, target) >= SIMILARITY_THRESHOLD
