"""q159 (cross-source duplication matrix) and q160 (per-source quality
calibration) semantic pins.

q159: the matrix must be complete over the planted sharing structure
and bounded by source sizes. q160: calibrated keep rates must be
EQUAL across sources (that is the point of calibration), while the
naive global cut's keep rate varies with each source's score draw.
"""

from __future__ import annotations

from ocr_service_spark.operators.corpus import (
    CALIB_KEEP_BP,
    q159_source_overlap,
    q160_quality_calibration,
)

SF = "/root/testdata/sf0.001"


def test_q159_matrix_structure(spark):
    rows = q159_source_overlap(spark, SF).collect()
    assert rows
    pairs = {(r.source_a, r.source_b) for r in rows}
    for r in rows:
        assert r.source_a != r.source_b
        assert 0 < r.n_shared <= r.n_docs_a
        assert r.shared_bp == r.n_shared * 10000 // r.n_docs_a
    # sharing is planted symmetric in EXISTENCE (content on a and b
    # implies both directions appear), though counts may differ
    for a, b in pairs:
        assert (b, a) in pairs, (a, b)


def test_q160_calibration_equalizes_keep_rates(spark):
    rows = q160_quality_calibration(spark, SF).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    global_rates = []
    for src, rs in by_src.items():
        n = len(rs)
        kept_cal = sum(1 for r in rs if r.keep_calibrated)
        # top-20% by construction: (rank-1)*10000 div (n-1) >= 8000
        want = sum(
            1 for i in range(1, n + 1) if (i - 1) * 10000 // max(n - 1, 1) >= CALIB_KEEP_BP
        )
        assert kept_cal == want, (src, kept_cal, want)
        global_rates.append(sum(1 for r in rs if r.keep_global) / n)
        # percent-rank is within [0, 10000] and hits both ends
        bps = sorted(r.calib_bp for r in rs)
        assert bps[0] == 0 and bps[-1] == 10000
    # the naive global threshold keeps unequal fractions across sources
    assert max(global_rates) - min(global_rates) > 0.05
