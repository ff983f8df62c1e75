"""Process-level kill/resume: SIGKILL the job mid-run, rerun, verify a
complete, duplicate-free result set — the north rule's 'killed run
resumes via anti-join on completed partitions' exercised for real."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
N_DOCS = 3000
N_PARTS = 16


def _cli(pages: str, results: str, manifest: str) -> list[str]:
    return [
        sys.executable,
        "-m",
        "ocr_service_spark",
        "--pages", pages,
        "--results", results,
        "--manifest", manifest,
        "--cpus", "4",
        "--n-parts", str(N_PARTS),
    ]


def test_sigkill_mid_run_then_resume(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    results_path = str(tmp_path / "results")
    manifest_path = str(tmp_path / "manifest")

    from ocr_service_spark.sources.pages import generate_pages

    generate_pages(spark, N_DOCS, seed=17).write.parquet(pages_path)

    env = dict(os.environ, PYTHONPATH=str(REPO))
    proc = subprocess.Popen(
        _cli(pages_path, results_path, manifest_path),
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    # let it get genuinely mid-flight (results files appearing), then SIGKILL
    deadline = time.time() + 180
    while time.time() < deadline and proc.poll() is None:
        if Path(results_path).exists() and any(Path(results_path).rglob("*.parquet")):
            break
        time.sleep(0.5)
    killed_mid_run = proc.poll() is None
    if killed_mid_run:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()

    # resume to completion (also covers the 'job finished before kill'
    # race: rerun must then be an idempotent no-op)
    out = subprocess.run(
        _cli(pages_path, results_path, manifest_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]

    con = duckdb.connect()
    total, distinct = con.execute(
        f"SELECT count(*), count(DISTINCT url) FROM '{results_path}/*/*.parquet'"
    ).fetchone()
    assert distinct == N_DOCS, f"incomplete after resume: {distinct}/{N_DOCS}"
    assert total == N_DOCS, f"duplicates after resume: {total} rows"
    manifest_parts = con.execute(
        f"SELECT count(DISTINCT part_hash), sum(doc_count) FROM '{manifest_path}/*.parquet'"
    ).fetchone()
    assert manifest_parts[1] == N_DOCS
