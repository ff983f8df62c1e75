#!/usr/bin/env python3
"""Bench EVERY registered query once with the noop sink (guide §1.4) —
the round-5 verdict's task #3: bench.py times only the headline set, so
a tail-registry regression (q152's 27 s was one) is invisible until the
driver's own artifact lands. This tool noop-writes all registered
queries at the bench SF, flags every entry slower than FLAG_RATIO x the
median, and emits a committable JSON table (BENCH_REGISTRY_rN.json).

Usage:
    python tools/bench_registry.py [--json BENCH_REGISTRY_r06.json]

Env (same contract as bench.py):
    SPARK_GRAFT_SF_DIR  table dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[N] parallelism (default 32)

bench.py stays FROZEN; this is a separate artifact generator.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FLAG_RATIO = 4.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", metavar="OUT", default=None)
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    from ocr_service_spark.plans.session import build_session

    import __spark_entry__ as em

    spark = build_session(app_name="ocr-service-spark-bench-registry", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries = em.queries()
    warm_dir = (
        "/root/testdata/sf0.001"
        if os.path.isdir("/root/testdata/sf0.001")
        else SF_DIR
    )

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in queries.items():
        try:
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
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            errors[name] = f"{type(ex).__name__}: {ex}"[:300]
            print(f"{name}: ERROR {errors[name]}", file=sys.stderr, flush=True)

    med = statistics.median(timings.values()) if timings else 0.0
    flagged = {
        k: v for k, v in sorted(timings.items(), key=lambda kv: -kv[1])
        if med and v > FLAG_RATIO * med
    }
    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "n_queries": len(timings),
        "median_sec": round(med, 3),
        "flag_ratio": FLAG_RATIO,
        "flagged_over_ratio": flagged,
        "errors": errors,
        "queries": timings,
    }
    text = json.dumps(out, indent=1)
    if args.json:
        Path(args.json).write_text(text + "\n")
    print(text)
    spark.stop()


if __name__ == "__main__":
    main()
