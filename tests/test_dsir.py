"""DSIR importance-resampling selection (q93): the importance weight
must actually separate the target domain — target-language docs score
higher than raw average, and the keep rule follows the closed-form
threshold exactly."""

from __future__ import annotations

from ocr_service_spark.operators.text_stats import (
    DSIR_TARGET_LANG,
    q93_dsir_selection,
)

SF_DIR = "/root/testdata/sf0.001"


def test_dsir_prefers_target_domain(spark):
    rows = q93_dsir_selection(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang")
    lang = {r.doc_id: r.lang for r in docs.collect()}
    assert len(rows) == len(lang)

    def avg(pred):
        sel = [r.importance / r.n_tokens for r in rows if pred(lang[r.doc_id])]
        return sum(sel) / len(sel)

    # target-language docs carry more target-model mass per token
    assert avg(lambda l: l == DSIR_TARGET_LANG) > avg(lambda l: l != DSIR_TARGET_LANG)
    # keep == top-quantile by avg_score: every kept doc outscores
    # every dropped doc, and roughly the keep-quantile share survives
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    assert kept and dropped
    assert min(r.avg_score for r in kept) >= max(r.avg_score for r in dropped)
    frac = len(kept) / len(rows)
    assert 0.1 <= frac <= 0.5, frac
    # the target language is over-represented among the kept docs
    en_kept = sum(1 for r in kept if lang[r.doc_id] == DSIR_TARGET_LANG) / len(kept)
    en_all = sum(1 for l in lang.values() if l == DSIR_TARGET_LANG) / len(lang)
    assert en_kept > en_all, (en_kept, en_all)
