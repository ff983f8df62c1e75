#!/usr/bin/env python3
"""Isolation bench (guide §1.4): time individual registered queries with
the noop sink, optionally capture .explain("formatted") to a file.

Usage:
    python bench_extra.py q152_repetition_battery q14_jaccard_pairs
    python bench_extra.py --reps 3 --explain plans/r06 --suffix before q152_repetition_battery
    python bench_extra.py --all            # every bench.py headline query

Env (same contract as bench.py):
    SPARK_GRAFT_SF_DIR  table dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[N] parallelism (default 32)

bench.py stays FROZEN; this file exists so optimization work never has
a reason to touch it. Methodology mirrors bench.py exactly: JIT-warm
each query once at sf0.001, then best-of-N noop writes at the bench SF.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: --all)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--all", action="store_true", help="run every bench.py headline query")
    ap.add_argument("--explain", metavar="DIR", help="write <dir>/<query>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from ocr_service_spark.plans.session import build_session
    import __spark_entry__ as em

    spark = build_session(app_name="ocr-service-spark-bench-extra", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries = em.queries()

    names = args.queries
    if args.all or not names:
        import bench

        names = bench.HEADLINE_QUERIES
    warm_dir = "/root/testdata/sf0.001" if os.path.isdir("/root/testdata/sf0.001") else SF_DIR

    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        if args.explain:
            out = Path(args.explain) / f"{name}_{args.suffix}.txt"
            out.parent.mkdir(parents=True, exist_ok=True)
            df = fn(spark, SF_DIR)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            out.write_text(df._jdf.queryExecution().explainString(mode))
        if args.reps <= 0:
            continue
        if not args.no_warm:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        best = 1e18
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}", file=sys.stderr, flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "reps": args.reps, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
