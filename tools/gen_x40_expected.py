#!/usr/bin/env python3
"""Generate the committed expected table for the x40 fixture-extraction
driver query (tests/golden/x40_expected.parquet).

x40 runs the REAL extraction job over the reference fixture corpus —
fully deterministic on the NO_OCR tier — so its expected output is a
reviewable artifact the driver's DuckDB oracle can read back
(``SELECT ... FROM '<path>'``), upgrading x40 from rows-only to a
hash-checked query. Regenerate only on a deliberate semantic change,
and eyeball the diff like any golden.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT = REPO / "tests" / "golden" / "x40_expected.parquet"


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("gen-x40-expected")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    pdf = em.queries()["x40_extract_fixtures"](spark, "/root/testdata/sf0.001").toPandas()
    pdf = pdf.sort_values("url", ignore_index=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {OUT}: {len(pdf)} rows")
    print(pdf[["url", "doc_class", "success"]].to_string())
    spark.stop()


if __name__ == "__main__":
    main()
