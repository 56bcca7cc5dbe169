"""Per-round skew-defense GATE (VERDICT r3 #7).

tools/bench_skew.py measures the three join strategies on the 6 M-row
Zipfian fixture (80% hot key, broadcast disabled); the r10 gate rule
(BASELINE.md, VERDICT r9 #6) asserts the LOAD-INSENSITIVE signal —
within-stage task max/p50 imbalance: plain >= 3.0 (negative control),
salted and AQE-split <= half of plain's — plus the band-cap wall gate.
This test runs the bench in gate mode (own subprocess = fresh
local[32] JVM, warm best-of-3, so the pytest session's tiny local[4]
fixture doesn't distort the timing) and fails the round if a defense
collapses.
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def _run_gate():
    return subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "bench_skew.py"),
            "--gate",
            "--band",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )


def test_skew_defenses_hold_gate():
    """Equi-join salting/AQE-split defenses AND (r7) the LSH band-bucket
    cap on the boilerplate corpus: capped >= 1.5x faster than the
    quadratic all-pairs path with hot-family rep connectivity 1.0.

    EPOCH-AWARE since r10 (VERDICT r9 #6): the equi-join gate now
    asserts the within-stage max/p50 task-runtime distribution (what
    salting/AQE-split actually change; load-insensitive because
    background load slows a stage's tasks ~uniformly) instead of wall
    speedups, which the r9 judge suite measured compressing from
    1.81x isolated to 1.24x mid-suite on IDENTICAL plans — wall is
    parallelism, exactly what load contends for. The plain run is the
    built-in negative control (>= 3.0 imbalance = what a lost defense
    looks like). The once-only retry stays as a second line for the
    residual band-gate wall ratio, and — ADVICE r9 — a first failure
    whose retry passes now leaves its output in the log instead of
    vanishing."""
    proc = _run_gate()
    if proc.returncode != 0:
        first = proc
        proc = _run_gate()  # one retry: timing band vs real collapse
        if proc.returncode == 0:
            print(
                "WARNING: skew gate first run failed, retry passed — "
                "first failure output (last 2000 chars):\n"
                f"stdout={first.stdout[-2000:]}\n"
                f"stderr={first.stderr[-2000:]}"
            )
    assert proc.returncode == 0, (
        f"skew gate failed twice consecutively:\n"
        f"stdout={proc.stdout[-2000:]}\n"
        f"stderr={proc.stderr[-2000:]}"
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    by_metric = {json.loads(l)["metric"]: json.loads(l) for l in lines}
    res = by_metric["skew_join_warm_best3"]
    ts = res["task_stats"]
    imb_plain = ts["plain"]["max_over_p50"]
    assert imb_plain >= 3.0, "negative control lost: plain join not skewed"
    assert ts["salted"]["max_over_p50"] <= imb_plain / 2
    assert ts["aqe"]["max_over_p50"] <= imb_plain / 2
    band = by_metric["lsh_band_join_boilerplate"]
    assert band["speedup_capped_vs_uncapped"] >= 1.5
    assert band["hot_family_rep_connectivity"] == 1.0
