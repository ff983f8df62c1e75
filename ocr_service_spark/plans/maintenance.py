"""Table maintenance: output compaction.

A 1000-executor extraction run with per-part dynamic overwrites leaves
the results table as thousands of small parquet files; small files are
the classic scan-throughput killer (per-file open/footer costs swamp
the IO). ``compact_parquet`` rewrites a parquet directory into
~target-size files: read -> repartition(ceil(bytes/target)) -> write to
a sibling staging dir -> swap. The swap is rename-based (atomic on
POSIX/HDFS; on object stores run it from a driver with a metastore
table and use a partition-location flip instead — same two steps).

On Iceberg this whole module is `rewrite_data_files`; this is the
plain-parquet equivalent the sandbox can exercise.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _n_files(path: str) -> int:
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_parquet(
    spark: SparkSession, path: str, target_mb: int = 256
) -> tuple[int, int]:
    """Rewrite ``path`` into ceil(bytes/target_mb) files; returns
    (files_before, files_after). Row content is preserved exactly —
    compaction only changes the file layout."""
    before = _n_files(path)
    n_out = max(1, math.ceil(_dir_bytes(path) / (target_mb * 1024 * 1024)))
    if before <= n_out:
        return before, before

    staging = path.rstrip("/") + "__compacting"
    backup = path.rstrip("/") + "__precompact"
    df = spark.read.parquet(path)
    df.repartition(n_out).write.mode("overwrite").parquet(staging)
    # two renames: old table stays readable until the instant of swap,
    # and a crash between them leaves either the old or the new dir
    # plus a clearly-named leftover — never a half-written table
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return before, _n_files(path)
