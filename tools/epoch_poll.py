"""Poll the machine epoch; record the bench anchor on a fast one.

VERDICT r9 next #1: `bench_reference.json` needs its `calibration`
section recorded on a FAST epoch (cal_cpu ~ 0.185 s) so the epoch
normalizer in bench.py has a committed anchor. Epochs on this box
mode-flip with external load (measured 0.185 / 0.343 / 0.65 / 1.04 s
cal_cpu across r9-r10 sessions), so this tool polls: every INTERVAL
seconds it spawns a fresh-JVM calibration probe (the same 3 probes
bench.py embeds); when cal_cpu reads under FAST it runs
`python bench.py --record` (which co-records queries + cpu floors +
calibration in one session), then RE-probes — if the epoch shifted
mid-record (post-probe over FAST * 1.3) the recording is reverted via
git and polling continues. Every probe is appended to
evidence/epoch_poll_r10.jsonl so the round's epoch history is itself
an artifact.

Acceptance is keyed to the RECORDED HEADLINE, not the probe alone:
the anchor's purpose is tying calibration probes to the epoch class
the BASELINE.md reference band (1.9-2.2 s headline) was measured in,
so a recording is accepted iff its headline lands at or under
HEADLINE_MAX (default 2.30 s ~ 1.0x the 2.24 s baseline point) AND
the post-record probe confirms the epoch held. The probe threshold
only gates when a record ATTEMPT is worth its ~6 minutes.

Exit codes: 0 = anchor recorded and verified; 3 = deadline hit with
no fast epoch (probe log still written).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "evidence", "epoch_poll_r10.jsonl")
RECORD_OUT = os.path.join(REPO, "evidence", "bench_record_r10.json")
FAST = float(os.environ.get("EPOCH_FAST_CAL_CPU", "0.40"))
HEADLINE_MAX = float(os.environ.get("EPOCH_HEADLINE_MAX", "2.30"))
INTERVAL = int(os.environ.get("EPOCH_POLL_INTERVAL_S", "420"))
HOURS = float(os.environ.get("EPOCH_POLL_HOURS", "3.5"))

PROBE_SRC = """
import sys, json
sys.path.insert(0, {repo!r})
import bench
from mediaplaycounts_spark.session import get_spark
spark = get_spark("epoch-probe", extra_conf={{"spark.ui.enabled": "false"}})
print("CAL::" + json.dumps(bench._calibration(spark)))
""".format(repo=REPO)


def probe() -> dict | None:
    """One fresh-JVM calibration read (subprocess: no warm-session
    or JIT state can leak between polls). A timeout — the box so
    saturated the probes can't finish — is itself a 'slow epoch'
    reading, not a reason to kill the poll loop."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=900,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        if line.startswith("CAL::"):
            return json.loads(line[5:])
    return None


def log(entry: dict) -> None:
    entry["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(LOG, "a") as f:
        f.write(json.dumps(entry) + "\n")


def main() -> int:
    # Snapshot the anchor file BEFORE any recording (ADVICE r10): a
    # rejected record used to `git checkout --` the file, silently
    # discarding any pre-existing uncommitted edits along with the
    # rejected record. Restoring the snapshot reverts exactly what this
    # tool wrote and nothing else.
    ref_path = os.path.join(REPO, "bench_reference.json")
    try:
        with open(ref_path, "rb") as f:
            ref_snapshot = f.read()
    except OSError:
        ref_snapshot = None
    deadline = time.time() + HOURS * 3600
    while time.time() < deadline:
        cal = probe()
        log({"event": "probe", "cal": cal})
        if cal and cal.get("cal_cpu", 9e9) < FAST:
            rec = subprocess.run(
                [sys.executable, "bench.py", "--record"],
                capture_output=True,
                text=True,
                cwd=REPO,
                timeout=3600,
            )
            with open(RECORD_OUT, "w") as f:
                f.write(rec.stdout)
            headline = None
            for line in rec.stdout.splitlines():
                if line.startswith("{"):
                    try:
                        headline = json.loads(line).get("value")
                    except ValueError:
                        pass
            post = probe()
            log(
                {
                    "event": "record",
                    "rc": rec.returncode,
                    "headline": headline,
                    "post": post,
                }
            )
            ok = (
                rec.returncode == 0
                and headline is not None
                and headline <= HEADLINE_MAX
                and post
                and post.get("cal_cpu", 9e9) < FAST * 1.3
            )
            if ok:
                log({"event": "accepted"})
                return 0
            # epoch shifted mid-record: the recording is polluted —
            # restore the pre-run snapshot (NOT git HEAD, which would
            # also discard unrelated uncommitted edits) and keep
            # polling.
            if ref_snapshot is not None:
                with open(ref_path, "wb") as f:
                    f.write(ref_snapshot)
            log({"event": "reverted"})
        time.sleep(INTERVAL)
    log({"event": "deadline"})
    return 3


if __name__ == "__main__":
    sys.exit(main())
