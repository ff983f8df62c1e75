"""Image perceptual-hash dedup (q94 machinery): dHash invariants and
the banded-Hamming pipeline's near-dup semantics on codec round trips."""

from __future__ import annotations

from ocr_service_spark.operators.multimodal import (
    PHASH_MAX_HAM,
    dhash_words,
)


def test_dhash_is_gradient_only():
    """dHash ignores uniform brightness shifts (it hashes the gradient
    SIGN), flips under gradient reversal, and both words stay 32-bit."""
    w, h = 20, 12
    base = bytes((11 * p) % 256 for p in range(w * h))
    brighter = bytes((v + 40) % 256 if v < 216 else v for v in base)
    # a pure offset that never wraps: add 40 where safe keeps order
    safe = bytes(min(v, 215) for v in base)
    safe_b = bytes(v + 40 for v in safe)
    assert dhash_words(w, h, safe) == dhash_words(w, h, safe_b)
    rev = bytes(reversed(base))
    a0, a1 = dhash_words(w, h, base)
    r0, r1 = dhash_words(w, h, rev)
    assert (a0, a1) != (r0, r1)
    for word in (a0, a1, r0, r1):
        assert 0 <= word < (1 << 32)


def test_phash_pipeline_finds_perturbed_variants(spark):
    """Every group's one-pixel-perturbed variant (v1) must pair with
    its base (v0) within the Hamming budget; the structurally different
    v2 never pairs with its own group's base."""
    import __spark_entry__ as em

    rows = em.queries()["q94_image_phash_dedup"](spark, "/root/testdata/sf0.001").collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in rows}
    assert all(h <= PHASH_MAX_HAM for h in pairs.values())
    found = sum(1 for g in range(30) if (3 * g, 3 * g + 1) in pairs)
    assert found >= 27, found  # v0-v1: hamming <= 2, band guarantee holds
    assert all((3 * g, 3 * g + 2) not in pairs for g in range(30))
