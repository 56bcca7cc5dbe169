"""One-off diagnostic for the r7 sf3 jaccard wall-clock bimodality:
per-run wall vs executor CPU vs GC time (monitoring REST), fresh JVM.

If CPU-seconds are stable across runs while wall swings 2-3x, the
engine's work is linear and the variance is stalls (GC / stragglers on
32 fixed partitions); if CPU swings with wall, the plan itself is
nondeterministic somewhere. Keep: referenced from SCALE.md r7 notes.
"""
from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from mediaplaycounts_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def stage_totals(sc) -> dict[str, float]:
    base = sc.uiWebUrl
    app = sc.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete")
    )
    return {
        "cpu_s": sum(s.get("executorCpuTime", 0) for s in stages) / 1e9,
        "run_s": sum(s.get("executorRunTime", 0) for s in stages) / 1e3,
        "gc_s": sum(s.get("jvmGcTime", 0) for s in stages) / 1e3,
    }


def main() -> None:
    key = sys.argv[1] if len(sys.argv) > 1 else "dedup_ngram_jaccard"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("cpu-probe", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    spark.conf.set("spark.mediaplaycounts.pairBlockCeiling", "2000")
    spark.conf.set("spark.mediaplaycounts.bandBucketCap", "256")
    qs = entrymod.queries()

    for sf, label in (("/root/repo/.scratch/sf1", "sf1-warmup"),):
        qs[key](spark, sf).count()
        print(f"{label} done", flush=True)

    for sf in ("/root/repo/.scratch/sf1", "/root/repo/.scratch/sf3"):
        for i in range(runs):
            before = stage_totals(sc)
            t0 = time.perf_counter()
            n = qs[key](spark, sf).count()
            wall = time.perf_counter() - t0
            after = stage_totals(sc)
            d = {k: after[k] - before[k] for k in before}
            print(
                json.dumps(
                    {"key": key, "sf": sf.rsplit("/", 1)[-1], "run": i,
                     "wall_s": round(wall, 1), "rows": n,
                     "cpu_s": round(d["cpu_s"], 1),
                     "run_s": round(d["run_s"], 1),
                     "gc_s": round(d["gc_s"], 1)}
                ),
                flush=True,
            )
            try:
                spark._jvm.System.gc()
                time.sleep(3)
            except Exception:
                pass


if __name__ == "__main__":
    main()
