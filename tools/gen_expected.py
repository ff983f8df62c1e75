#!/usr/bin/env python3
"""Generate committed expected tables for the deterministic extraction
driver queries (tests/golden/q4*_expected.parquet).

q40 (fixture extraction), q41 (synthetic-corpus extraction stats) and
q42 (media features over the deterministic fake decoder) are
deterministic end-to-end on the NO_OCR tier, so their expected outputs
are reviewable artifacts the driver's DuckDB oracle reads back
(``SELECT ... FROM '<path>'``), upgrading them from rows-only to
hash-checked. q43 stays rows-only BY DESIGN: its OCR-tier output
depends on which engine binary is present.

Regenerate only on a deliberate semantic change, and eyeball the diff
like any golden.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

GOLDEN = REPO / "tests" / "golden"

TARGETS = {
    "q40_extract_fixtures": ("q40_expected.parquet", "url"),
    "q41_extract_synthetic": ("q41_expected.parquet", "doc_class"),
    "q42_media_features": ("q42_expected.parquet", "url"),
}


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("gen-expected")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    qs = em.queries()
    for name, (fname, sort_col) in TARGETS.items():
        pdf = qs[name](spark, "/root/testdata/sf0.001").toPandas()
        pdf = pdf.sort_values(sort_col, ignore_index=True)
        out = GOLDEN / fname
        pdf.to_parquet(out, index=False)
        print(f"wrote {out}: {len(pdf)} rows, cols={list(pdf.columns)}")
    spark.stop()


if __name__ == "__main__":
    main()
