"""CLI entry point — the batch job as a submittable script.

Local:
    python -m ocr_service_spark --pages <dir> --results <dir> --manifest <dir>

Cluster (the north-rule deployment shape):
    spark-submit --py-files ocr_service_spark.zip run_job.py ...
    (any driver script that calls plans.manifest.run_with_checkpoint;
    this module doubles as that script when the package is on the path)

The job is resumable: re-running with the same manifest dir skips
completed partitions via the broadcast anti-join.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="ocr_service_spark")
    parser.add_argument("--pages", required=True, help="input pages table (parquet dir)")
    parser.add_argument("--results", required=True, help="output results table")
    parser.add_argument("--manifest", required=True, help="checkpoint manifest table")
    parser.add_argument("--mode", default="NO_OCR", choices=["NO_OCR", "OCR"])
    parser.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    parser.add_argument("--n-parts", type=int, default=64)
    parser.add_argument("--salt-min-bytes", type=int, default=2 * 1024 * 1024)
    parser.add_argument("--bucket-pages", type=int, default=16)
    args = parser.parse_args(argv)

    from ocr_service_spark.operators.metrics import ExtractionMetrics
    from ocr_service_spark.plans.manifest import run_with_checkpoint
    from ocr_service_spark.plans.session import build_session
    from ocr_service_spark.sources.pages import read_pages

    spark = build_session(app_name="ocr-service-spark-job", cpus=args.cpus)
    spark.sparkContext.setLogLevel("WARN")
    metrics = ExtractionMetrics.create(spark)
    pages = read_pages(spark, args.pages)
    run_with_checkpoint(
        spark,
        pages,
        args.pages,
        args.results,
        args.manifest,
        n_parts=args.n_parts,
        salt_min_bytes=args.salt_min_bytes,
        bucket_pages=args.bucket_pages,
        metrics=metrics,
        mode=args.mode,
    )
    print(json.dumps({"status": "ok", "metrics": metrics.snapshot()}))
    spark.stop()


if __name__ == "__main__":
    main()
