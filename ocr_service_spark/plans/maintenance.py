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


def recover_interrupted_swap(path: str, suffix: str) -> None:
    """Heal a crash inside a two-rename swap: a backup dir with NO
    primary means the crash hit between the renames (restore the
    backup — the operation simply didn't happen); a backup alongside a
    primary means the crash hit after the swap (the leftover is stale:
    delete it so the next swap's rename doesn't collide)."""
    backup = path.rstrip("/") + suffix
    if os.path.isdir(backup):
        if not os.path.isdir(path):
            os.rename(backup, path)
        else:
            shutil.rmtree(backup)


def _partition_cols(path: str) -> list[str]:
    """Hive-style partition columns of a parquet dir, outermost first
    (['part_hash'] for a run_with_checkpoint results table)."""
    cols: list[str] = []
    cur = path
    while True:
        subs = [
            d
            for d in sorted(os.listdir(cur))
            if "=" in d and os.path.isdir(os.path.join(cur, d))
        ]
        if not subs:
            return cols
        cols.append(subs[0].split("=", 1)[0])
        cur = os.path.join(cur, subs[0])


def compact_parquet(
    spark: SparkSession, path: str, target_mb: int = 256
) -> tuple[int, int]:
    """Rewrite ``path`` into ~ceil(bytes/target_mb) files; returns
    (files_before, files_after). Row content is preserved exactly —
    compaction only changes the file layout. A hive-partitioned table
    (the run_with_checkpoint results layout, partitionBy part_hash) is
    rewritten WITH its partitioning: flattening it would break the
    resume path's dynamic partition overwrite and read_as_of's
    partition pruning, and leave the next run unable to mix flat files
    with partition dirs."""
    recover_interrupted_swap(path, "__precompact")
    before = _n_files(path)
    n_out = max(1, math.ceil(_dir_bytes(path) / (target_mb * 1024 * 1024)))
    if before <= n_out:
        return before, before

    staging = path.rstrip("/") + "__compacting"
    backup = path.rstrip("/") + "__precompact"
    part_cols = _partition_cols(path)
    df = spark.read.parquet(path)
    if part_cols:
        # group each partition's rows into one task -> one file per
        # partition dir (n_out caps the task count when parts are many)
        writer = df.repartition(max(n_out, 1), *part_cols).write.partitionBy(
            *part_cols
        )
    else:
        writer = df.repartition(n_out).write
    writer.mode("overwrite").parquet(staging)
    # two renames: old table stays readable until the instant of swap,
    # and a crash between them leaves either the old or the new dir
    # plus a clearly-named leftover that recover_interrupted_swap heals
    # on the next maintenance call — never a half-written table
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return before, _n_files(path)
