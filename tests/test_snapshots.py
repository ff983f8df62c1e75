"""Snapshot log / time travel / rollback (plans/snapshots.py).

Iceberg-semantics invariants over the lineage manifest:
- each completing run is one commit; the snapshot log shows them;
- read_as_of(commit N) returns exactly the rows that existed then;
- rollback(N) + rerun recomputes precisely the rolled-back partitions
  (the resume anti-join keys off the manifest, not the data files);
- an as-of read's plan prunes partitions (PartitionFilters on
  part_hash), i.e. time travel costs a pruned scan, not a table copy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_service_spark.plans.manifest import run_with_checkpoint, with_part_hash
from ocr_service_spark.plans.snapshots import (
    latest_commit,
    read_as_of,
    rollback,
    snapshot_log,
)
from ocr_service_spark.sources.pages import generate_pages

N_PARTS = 8


@pytest.fixture()
def paths(tmp_path):
    return str(tmp_path / "results"), str(tmp_path / "manifest")


def _pages(spark):
    return generate_pages(spark, 120, seed=7)


def _half(pages):
    return with_part_hash(pages, N_PARTS).filter(F.col("part_hash") < 4).drop("part_hash")


def test_commits_time_travel_and_rollback(spark, paths):
    results_path, manifest_path = paths
    pages = _pages(spark)

    # commit 1: first half of the partitions
    run_with_checkpoint(spark, _half(pages), "src", results_path, manifest_path, N_PARTS)
    assert latest_commit(spark, manifest_path) == 1
    c1 = read_as_of(spark, results_path, manifest_path).count()
    assert 0 < c1 < 120

    # commit 2: the rest
    run_with_checkpoint(spark, pages, "src", results_path, manifest_path, N_PARTS)
    assert latest_commit(spark, manifest_path) == 2
    assert read_as_of(spark, results_path, manifest_path).count() == 120
    # pinned read sees the old snapshot exactly
    assert read_as_of(spark, results_path, manifest_path, commit_seq=1).count() == c1

    log = snapshot_log(spark, manifest_path).collect()
    assert [r["commit_seq"] for r in log] == [1, 2]
    assert log[0]["doc_count"] == c1
    assert log[0]["n_parts"] == 4
    assert log[1]["doc_count"] == 120 - c1

    # rollback to commit 1: latest read shrinks to the old snapshot
    dropped = rollback(spark, manifest_path, 1)
    assert dropped == 4  # the 4 partitions commit 2 added
    assert latest_commit(spark, manifest_path) == 1
    assert read_as_of(spark, results_path, manifest_path).count() == c1

    # rerun after rollback recomputes exactly the rolled-back parts
    run_with_checkpoint(spark, pages, "src", results_path, manifest_path, N_PARTS)
    assert latest_commit(spark, manifest_path) == 2
    assert read_as_of(spark, results_path, manifest_path).count() == 120
    res = spark.read.parquet(results_path)
    assert res.select("url").distinct().count() == 120  # no duplicates


def test_noop_rerun_creates_no_commit(spark, paths):
    results_path, manifest_path = paths
    pages = _pages(spark)
    run_with_checkpoint(spark, pages, "src", results_path, manifest_path, N_PARTS)
    run_with_checkpoint(spark, pages, "src", results_path, manifest_path, N_PARTS)
    assert latest_commit(spark, manifest_path) == 1
    assert snapshot_log(spark, manifest_path).count() == 1


def test_rollback_to_latest_is_noop(spark, paths):
    results_path, manifest_path = paths
    run_with_checkpoint(spark, _pages(spark), "src", results_path, manifest_path, N_PARTS)
    assert rollback(spark, manifest_path, latest_commit(spark, manifest_path)) == 0


def test_pre_snapshot_manifest_migrates(spark, paths):
    """A manifest written before the snapshot layer (no commit_seq
    column) must keep resuming AND gain snapshot semantics: its rows
    read as commit 0, a new run becomes commit 1, and time travel to
    commit 0 sees exactly the legacy partitions. Guards against the
    parquet mixed-schema trap where a plain read silently picks the
    old schema and drops commit_seq."""
    results_path, manifest_path = paths
    pages = _pages(spark)

    # legacy run: write its manifest rows, then strip commit_seq
    run_with_checkpoint(spark, _half(pages), "src", results_path, manifest_path, N_PARTS)
    import os as _os
    import shutil as _shutil

    staging = manifest_path + "__legacy"
    spark.read.parquet(manifest_path).drop("commit_seq").write.parquet(staging)
    _shutil.rmtree(manifest_path)
    _os.rename(staging, manifest_path)
    assert latest_commit(spark, manifest_path) == 0
    c0 = read_as_of(spark, results_path, manifest_path, commit_seq=0).count()
    assert 0 < c0 < 120

    # new-layer run appends commit_seq rows -> mixed-schema directory
    run_with_checkpoint(spark, pages, "src", results_path, manifest_path, N_PARTS)
    assert latest_commit(spark, manifest_path) == 1
    assert read_as_of(spark, results_path, manifest_path).count() == 120
    assert read_as_of(spark, results_path, manifest_path, commit_seq=0).count() == c0
    log = snapshot_log(spark, manifest_path).collect()
    assert [r["commit_seq"] for r in log] == [0, 1]


def test_as_of_read_prunes_partitions(spark, paths):
    results_path, manifest_path = paths
    pages = _pages(spark)
    run_with_checkpoint(spark, _half(pages), "src", results_path, manifest_path, N_PARTS)
    run_with_checkpoint(spark, pages, "src", results_path, manifest_path, N_PARTS)
    df = read_as_of(spark, results_path, manifest_path, commit_seq=1)
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("part_hash" in ln for ln in pf), plan


def test_as_of_large_part_list_uses_broadcast_semi_join(spark, paths, monkeypatch):
    # past AS_OF_MAX_INLINE_PARTS the IN-literal list would bloat the
    # plan (the Iceberg-manifest-list concern at 10^6 partitions): the
    # filter must switch to a broadcast LEFT SEMI join with identical
    # results and still no driver-side full collect
    from ocr_service_spark.plans import snapshots as snap

    results_path, manifest_path = paths
    pages = _pages(spark)
    run_with_checkpoint(spark, _half(pages), "src", results_path, manifest_path, N_PARTS)
    run_with_checkpoint(spark, pages, "src", results_path, manifest_path, N_PARTS)

    inline = read_as_of(spark, results_path, manifest_path, commit_seq=1)
    inline_rows = {r["url"] for r in inline.select("url").collect()}

    monkeypatch.setattr(snap, "AS_OF_MAX_INLINE_PARTS", 2)
    semi = read_as_of(spark, results_path, manifest_path, commit_seq=1)
    semi_rows = {r["url"] for r in semi.select("url").collect()}
    assert semi_rows == inline_rows

    jvm = semi.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = semi._jdf.queryExecution().explainString(mode)
    assert "LeftSemi" in plan and "Broadcast" in plan, plan


def test_manifest_append_large_done_list_uses_broadcast_anti_join(
    spark, paths, monkeypatch
):
    # the manifest-append twin of the read_as_of cap: past
    # AS_OF_MAX_INLINE_PARTS completed parts the literal NOT-IN on
    # part_hash would bloat the compiled plan, so the exclusion
    # switches to a broadcast left-anti join — and the lineage rows
    # appended for the incremental commit must be identical either
    # way (exactly the NEW parts, no duplicates of commit-1 parts)
    from ocr_service_spark.plans import snapshots as snap

    results_path, manifest_path = paths
    pages = _pages(spark)
    run_with_checkpoint(spark, _half(pages), "src", results_path, manifest_path, N_PARTS)

    monkeypatch.setattr(snap, "AS_OF_MAX_INLINE_PARTS", 2)
    run_with_checkpoint(spark, pages, "src", results_path, manifest_path, N_PARTS)

    manifest = spark.read.parquet(manifest_path)
    c1_parts = {
        r["part_hash"]
        for r in manifest.filter(F.col("commit_seq") == 1).select("part_hash").collect()
    }
    c2_parts = {
        r["part_hash"]
        for r in manifest.filter(F.col("commit_seq") == 2).select("part_hash").collect()
    }
    assert c1_parts == {0, 1, 2, 3}
    assert c2_parts == {4, 5, 6, 7}, c2_parts  # no re-manifested commit-1 parts
    assert read_as_of(spark, results_path, manifest_path).count() == 120
