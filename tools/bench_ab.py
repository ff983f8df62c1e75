"""Controlled A/B for the r4 bench slowdown (VERDICT r4, task 2).

Hypothesis under test: the 22-of-25 one-direction regressions between
BENCH_r03 (24-query single-process run) and BENCH_r04 (49-query
single-process run) come from JVM/session state accumulating across a
longer run, not from code changes. Same commit, same box, interleaved:

    rep 1: A (first 24 headline queries)   B (all 49)
    rep 2: A                               B
    ...

Each run is a fresh subprocess (fresh JVM). Per shared query we compare
best-of-reps in mode A vs mode B: if B is systematically slower on the
SAME code, long-run session accumulation is real; if not, the r3->r4
deltas were window noise between measurement days.

Writes BENCH_AB.json and prints a markdown table.

Usage: python tools/bench_ab.py [n_reps=5]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
R3_QUERY_COUNT = 24  # r3's headline set = today's first 24 entries


def run_bench(num_queries: int | None, reps_env: str = "3") -> dict:
    env = dict(os.environ)
    env["BENCH_REPS"] = reps_env
    if num_queries is not None:
        env["BENCH_NUM_QUERIES"] = str(num_queries)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        # one failed rep must not lose the completed ones: surface the
        # failure loudly and let the caller's loop decide
        raise RuntimeError(
            f"bench rep failed (rc={out.returncode}): "
            f"{out.stderr.strip()[-500:] or out.stdout.strip()[-500:]}"
        )
    return json.loads(lines[-1])["queries"]


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    a_runs: list[dict] = []
    b_runs: list[dict] = []
    for rep in range(n_reps):
        try:
            a_runs.append(run_bench(R3_QUERY_COUNT))
            print(f"rep {rep + 1}: A done", file=sys.stderr)
            b_runs.append(run_bench(None))
            print(f"rep {rep + 1}: B done", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            # keep the completed interleaved pairs; a lost rep is noise,
            # hours of finished reps are not
            if len(a_runs) > len(b_runs):
                a_runs.pop()
            print(f"rep {rep + 1} failed, continuing: {exc}", file=sys.stderr)
    if not a_runs or not b_runs:
        raise SystemExit("no completed A/B rep pairs")

    shared = [q for q in a_runs[0] if q in b_runs[0]]
    rows = []
    for q in shared:
        a_vals = [r[q] for r in a_runs]
        b_vals = [r[q] for r in b_runs]
        a_best, b_best = min(a_vals), min(b_vals)
        rows.append(
            {
                "query": q,
                "a_best": a_best,
                "b_best": b_best,
                "a_spread": round(max(a_vals) - a_best, 3),
                "b_spread": round(max(b_vals) - b_best, 3),
                "b_over_a": round(b_best / a_best, 3) if a_best else None,
            }
        )

    slower_in_b = sum(1 for r in rows if r["b_over_a"] and r["b_over_a"] > 1.1)
    out = {
        "n_reps": n_reps,
        "mode_a": f"first {R3_QUERY_COUNT} headline queries (r3 shape)",
        "mode_b": "full headline set (r4 shape)",
        "rows": rows,
        "n_shared": len(rows),
        "n_slower_in_b_gt_10pct": slower_in_b,
        "a_runs": a_runs,
        "b_runs": b_runs,
    }
    (REPO / "BENCH_AB.json").write_text(json.dumps(out, indent=1))

    print("| query | A best | B best | B/A | A spread | B spread |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['a_best']} | {r['b_best']} | {r['b_over_a']}"
            f" | {r['a_spread']} | {r['b_spread']} |"
        )
    print(f"\nshared={len(rows)}  slower-in-B(>10%)={slower_in_b}")


if __name__ == "__main__":
    main()
