#!/usr/bin/env python3
"""Benchmark: extraction throughput + headline query timings.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>, ...extras}

Env:
    SPARK_GRAFT_SF_DIR  table dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
    BENCH_DOCS          override synthetic corpus size
    BENCH_REPS          timing repetitions, best-of (default 3 —
                        the shared box shows 2x hypervisor-steal
                        swings between runs; min is the robust read)
    BENCH_NUM_QUERIES   run only the first N headline queries (A/B
                        probe for session-state accumulation across a
                        long single-process query run)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# extraction corpus: ~200k docs/sf-unit keeps sf0.1 around 20k documents
DOCS_PER_SF = 200_000

HEADLINE_QUERIES = [
    "q01_pricing_summary",
    "q02_revenue_by_region",
    "q03_top_orders_per_customer",
    "q05_events_daily",
    "q06_user_sessions",
    "q10_dedup_exact",
    "q11_token_stats",
    "q13_lang_id",
    "q14_jaccard_pairs",
    "q15_minhash_signatures",
    "q17_simhash",
    "q18_fingerprints",
    "q19_embedding_neardup_pairs",
    "q20_cosine_topk",
    "q22_asof_attribution",
    "q23_conversion_pairs",
    "q25_ivf_topk",
    "q34_minhash_neardup_pairs",
    "q30_extract_html_roundtrip",
    "q33_payload_ladder_roundtrip",
    "q35_main_content_roundtrip",
    "q36_token_percentiles",
    "q51_boilerplate_segments",
    "q53_tfidf_top_terms",
    # round 4 additions — charset/transfer extraction + web-URL/graph ops
    "q62_charset_roundtrip",
    "q66_gzip_roundtrip",
    "q63_url_canonicalize",
    "q64_host_stats",
    "q68_link_hosts",
    "q70_corpus_filter",
    "q71_crawl_churn",
    "q72_robots_policy",
    "q73_anchor_terms",
    "q74_warc_ingest",
    "q75_redirect_chains",
    "q76_warc_extract",
    "q77_sitemap_coverage",
    "q78_fetch_schedule",
    "q79_span_dedup",
    # round 4 late additions — corpus-construction + index ops
    "q85_semdedup",
    "q86_bpe_merges",
    "q87_cdx_ingest",
    "q88_mojibake_repair",
    # round 4 closing additions — published quality filters + corpus
    # assembly (mixture, export sink, split leakage guard)
    "q95_gopher_quality",
    "q96_c4_line_filter",
    "q97_url_filter",
    "q98_corpus_export",
    "q99_corpus_mixture",
    "q100_split_leakage_guard",
    # round 5 additions — metadata tier + the avc1/H.264 video tier
    "q102_exif_metadata",
    "q103_pdf_metadata",
    "q104_avc1_streams",
    "q105_media_route",
    # round 5 closing additions — span table + corpus line-dedup/chunking
    # + unicode canonicalization
    "q106_content_spans",
    "q107_line_dedup_first",
    "q108_chunk_overlap",
    "q109_unicode_nfc",
    "q110_html_markdown",
    # round 5 final additions — SURT dedup, readability, blocklist,
    # paragraph dedup, retrieval tier
    "q111_surt_dedup",
    "q112_readability",
    "q113_domain_blocklist",
    "q114_paragraph_dedup",
    "q115_inverted_search",
    "q116_bm25_topk",
    "q117_wet_export",
    "q118_hist_quantiles",
    "q139_count_min_tokens",
    "q140_crawl_depth",
    "q141_hits_scores",
    "q142_serving_state",
    "q143_vocab_growth",
    "q144_bpe_encode",
    "q145_phrase_search",
    "q146_code_routing",
    "q147_clf_inference",
    "q148_reshard_stability",
    "q149_host_skew",
    "q150_budget_selection",
    "q151_mirror_hosts",
    "q152_repetition_battery",
    "q153_text_citations",
    "q154_cluster_sizes",
    "q155_fuzzy_contamination",
    "q156_lsh_precision",
    "q157_typosquat_pairs",
    "q158_simhash_neardup",
    "q159_source_overlap",
    "q160_quality_calibration",
    "q161_image_text_pairs",
    "q162_page_image",
    "q119_host_quality_report",
    "q121_collocations",
    # round 5 structure tier — table cells, sentence table, outline
    "q120_table_extract",
    "q122_sentence_segmentation",
    "q123_section_outline",
    # round 5 dedup-evaluation tier — Broder containment + measured
    # LSH recall S-curve under the live bucket cap
    "q124_containment_pairs",
    "q125_lsh_recall",
    # round 5 structured-data tier — OG/meta/JSON-LD extraction
    "q126_structured_data",
    # round 5 web-hygiene tier — rel=canonical clusters, Unicode scrub
    "q127_canonical_clusters",
    "q128_unicode_hygiene",
    # round 5 page-metadata tier — publication-date ladder, feed items
    "q129_pub_dates",
    "q130_feed_items",
    # round 5 multilingual tier — per-paragraph language segmentation
    "q131_paragraph_langs",
    # round 5 host-identity tier — public-suffix registrable domains
    "q132_registrable_domains",
    # round 5 book tier — EPUB spine extraction through the real pipeline
    "q133_epub_roundtrip",
    # round 5 discovery tier — feed autodiscovery, robots Sitemap records
    "q134_feed_discovery",
    "q135_sitemap_discovery",
    # round 5 language-edition tier — hreflang reciprocity audit
    "q136_hreflang_reciprocity",
    # round 5 crawl-economics tier — recrawl priority from measured churn
    "q137_recrawl_priority",
    # round 5 frontier-protection tier — crawler-trap detection
    "q138_trap_detection",
    # round 5 closing — independent-filter ablation Venn
    "q164_filter_ablation",
    # round 5 closing — HTML table cell extraction
    "q165_html_tables",
    # round 5 closing — bitext paragraph alignment (Gale-Church DP)
    "q166_bitext_align",
    # round 5 closing — GPS privacy scrub (byte-surgery proof columns)
    "q167_gps_scrub",
]


def infer_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    sf = infer_sf(SF_DIR)
    n_docs = int(os.environ.get("BENCH_DOCS", str(max(int(DOCS_PER_SF * sf), 500))))

    from ocr_service_spark.plans.session import build_session
    from ocr_service_spark.plans.job import run_extraction
    from ocr_service_spark.sources.pages import generate_pages

    spark = build_session(app_name="ocr-service-spark-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # --- extraction throughput on the synthetic Common-Crawl-style corpus.
    # The table carries a payload byte-size metadata column (any
    # production CC-style table should): the salted-branch router
    # predicate then reaches PushedFilters and its second scan prunes
    # row groups instead of re-reading every payload.
    from pyspark.sql import functions as F

    pages_path = f"/tmp/bench_pages_sized_sf{sf}_{n_docs}.parquet"
    if not os.path.exists(pages_path):
        generate_pages(spark, n_docs, seed=42).withColumn(
            "payload_bytes", F.octet_length("html").cast("bigint")
        ).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)

    # warm up JVM/codegen/Python workers so timings measure the engine,
    # not session startup
    run_extraction(pages.limit(64), size_col="payload_bytes").groupBy().sum("pages").collect()

    reps = int(os.environ.get("BENCH_REPS", "3"))
    extract_sec, total_pages = 1e18, n_docs
    for _ in range(reps):
        t0 = time.perf_counter()
        results = run_extraction(pages, size_col="payload_bytes")
        agg = results.groupBy().sum("pages").collect()  # forces full extraction
        extract_sec = min(extract_sec, time.perf_counter() - t0)
        total_pages = agg[0][0] or n_docs

    timings: dict[str, float] = {"extract_synthetic": round(extract_sec, 3)}

    # --- headline queries over the driver tables
    import __spark_entry__ as em

    queries = em.queries()
    warm_dir = "/root/testdata/sf0.001" if os.path.isdir("/root/testdata/sf0.001") else SF_DIR
    headline = HEADLINE_QUERIES
    num_q = os.environ.get("BENCH_NUM_QUERIES")
    if num_q:
        headline = headline[: int(num_q)]
    for name in headline:
        fn = queries[name]
        # JIT-warm the query's generated code on the tiny sf before
        # timing it at the bench sf (same plan shape -> same classes)
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        best = 1e18
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total wall sec (extraction of %d synthetic docs + %d headline queries)"
        % (n_docs, len(headline)),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec": round(n_docs / extract_sec, 1),
        "pages_per_sec": round(total_pages / extract_sec, 1),
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
