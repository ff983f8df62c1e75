"""CLI operational subcommands (``__main__.py``): snapshots / rollback /
compact.

Drives ``parse_ops_args`` + ``run_ops`` — the exact code the
``python -m ocr_service_spark <cmd>`` path executes — in-process against
the shared test session, over a real two-commit manifest. The run path
itself (resume, SIGKILL) is covered by tests/test_kill_resume.py; this
file pins the ops surface: argument parsing, the one-JSON-line result
shapes, and that rollback via the CLI leaves a manifest the resume
anti-join recomputes from.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_service_spark.__main__ import parse_ops_args, run_ops
from ocr_service_spark.plans.manifest import run_with_checkpoint, with_part_hash
from ocr_service_spark.plans.snapshots import latest_commit
from ocr_service_spark.sources.pages import generate_pages

N_PARTS = 8


@pytest.fixture()
def committed(spark, tmp_path):
    """Two commits: first half the partitions, then the rest."""
    results, manifest = str(tmp_path / "results"), str(tmp_path / "manifest")
    pages = generate_pages(spark, 120, seed=7)
    half = with_part_hash(pages, N_PARTS).filter(F.col("part_hash") < 4).drop("part_hash")
    run_with_checkpoint(spark, half, "src", results, manifest, N_PARTS)
    run_with_checkpoint(spark, pages, "src", results, manifest, N_PARTS)
    return results, manifest, pages


def test_snapshots_subcommand_lists_commit_log(spark, committed):
    _, manifest, _ = committed
    args = parse_ops_args(["snapshots", "--manifest", manifest])
    out = run_ops(spark, args)
    assert out["status"] == "ok"
    seqs = [s["commit_seq"] for s in out["snapshots"]]
    assert seqs == [1, 2]
    assert sum(s["doc_count"] for s in out["snapshots"]) == 120
    # completed_ts is stringified so the dict is json.dumps-able as-is
    assert all(isinstance(s["completed_ts"], str) for s in out["snapshots"])


def test_rollback_subcommand_then_resume_recomputes(spark, committed):
    results, manifest, pages = committed
    args = parse_ops_args(["rollback", "--manifest", manifest, "--to", "1"])
    out = run_ops(spark, args)
    assert out == {"status": "ok", "dropped_entries": 4, "latest_commit": 1}
    # the CLI rollback leaves a manifest the resume path recomputes from
    run_with_checkpoint(spark, pages, "src", results, manifest, N_PARTS)
    assert latest_commit(spark, manifest) == 2
    res = spark.read.parquet(results)
    assert res.count() == 120
    assert res.select("url").distinct().count() == 120


def test_compact_subcommand_preserves_rows(spark, committed):
    results, manifest, _ = committed
    before_rows = spark.read.parquet(results).count()
    args = parse_ops_args(["compact", "--path", results, "--target-mb", "64"])
    out = run_ops(spark, args)
    assert out["status"] == "ok"
    assert out["files_after"] <= out["files_before"]
    assert out["files_after"] >= 1
    assert spark.read.parquet(results).count() == before_rows


def test_run_path_flags_unchanged_by_subcommand_dispatch():
    """The flat run invocation must not be shadowed by subcommand
    names: --pages etc. still parse when argv[0] is an option."""
    from ocr_service_spark.__main__ import _SUBCOMMANDS

    assert _SUBCOMMANDS == {"snapshots", "rollback", "compact", "merge"}
    with pytest.raises(SystemExit):
        parse_ops_args(["not-a-command"])


def test_merge_subcommand_upserts_batch(spark, tmp_path):
    store_dir, batch_dir, out_dir = (
        str(tmp_path / "store"), str(tmp_path / "batch"), str(tmp_path / "out")
    )
    spark.createDataFrame(
        [("u/a", "h", "v1"), ("u/b", "h", "v1"), ("u/gone", "h", "v1")],
        "url string, host string, content_hash string",
    ).write.parquet(store_dir)
    spark.createDataFrame(
        [("u/b", "h", "v2", 0), ("u/gone", "h", "v1", 1), ("u/new", "h", "v1", 0)],
        "url string, host string, content_hash string, gone int",
    ).write.parquet(batch_dir)
    args = parse_ops_args(["merge", "--store", store_dir, "--batch", batch_dir,
                           "--out", out_dir])
    out = run_ops(spark, args)
    assert out == {"status": "ok", "out": out_dir,
                   "n_keep": 1, "n_update": 1, "n_insert": 1}
    merged = {r.url: r.content_hash for r in spark.read.parquet(out_dir).collect()}
    assert merged == {"u/a": "v1", "u/b": "v2", "u/new": "v1"}
