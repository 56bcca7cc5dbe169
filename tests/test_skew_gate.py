"""Per-round skew-defense GATE (VERDICT r3 #7).

tools/bench_skew.py measures the three join strategies on the 6 M-row
Zipfian fixture (80% hot key, broadcast disabled); BASELINE.md's alert
rule says the defenses must hold salted/naive >= 1.3x and
AQE-split/naive >= 1.5x. Until now that was measured but never
ASSERTED — a Spark upgrade or conf change could silently lose the skew
defense while staying inside bench noise. This test runs the bench in
gate mode (own subprocess = fresh local[32] JVM, warm best-of-3, so the
pytest session's tiny local[4] fixture doesn't distort the timing) and
fails the round if either ratio collapses.
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

    TWO-CONSECUTIVE-FAILURES rule (r9; the r8 ADVICE principle for
    timing gates): this is a TIMING gate run from inside a long pytest
    session, and batch-position effects have produced exactly-one-round
    false failures twice now — r8 (mid-session fail, idle-box re-run
    green) and r9 (mid-suite 1.39x vs gate 1.5x; isolated re-run
    1.81x). A real defense collapse (lost salting, broken cap routing)
    fails BOTH runs; a machine-epoch band flips at most one. The retry
    is once, only after a failure, so a genuine regression still fails
    the round."""
    proc = _run_gate()
    if proc.returncode != 0:
        proc = _run_gate()  # one retry: timing band vs real collapse
    assert proc.returncode == 0, (
        f"skew gate failed twice consecutively:\n"
        f"stdout={proc.stdout[-2000:]}\n"
        f"stderr={proc.stderr[-2000:]}"
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    by_metric = {json.loads(l)["metric"]: json.loads(l) for l in lines}
    res = by_metric["skew_join_warm_best3"]
    assert res["speedup_salted_vs_plain"] >= 1.3
    assert res["speedup_aqe_vs_plain"] >= 1.5
    band = by_metric["lsh_band_join_boilerplate"]
    assert band["speedup_capped_vs_uncapped"] >= 1.5
    assert band["hot_family_rep_connectivity"] == 1.0
