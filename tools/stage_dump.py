"""Generic per-stage REST dump around one registry key at one SF:
fresh JVM, warm-up + one timed run, then every NEW completed stage
sorted by executorCpuTime with spill/shuffle bytes — the quick 'which
stage grew' tool (r8, built for the dedup_near_minhash sf3 flag).

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python tools/stage_dump.py KEY SF_DIR [--prod]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def _stages(sc):
    base = sc.uiWebUrl
    return json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete"
        )
    )


def main() -> None:
    key, sf_dir = sys.argv[1], sys.argv[2]
    prod = "--prod" in sys.argv
    from mediaplaycounts_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        "stage-dump",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    if prod:
        spark.conf.set("spark.mediaplaycounts.pairBlockCeiling", "2000")
        spark.conf.set("spark.mediaplaycounts.bandBucketCap", "256")
    sc = spark.sparkContext
    qs = entrymod.queries()
    qs[key](spark, sf_dir).count()  # warm-up
    try:
        spark._jvm.System.gc()
        time.sleep(2)
    except Exception:
        pass
    before = {s["stageId"] for s in _stages(sc)}
    t0 = time.perf_counter()
    n = qs[key](spark, sf_dir).count()
    wall = time.perf_counter() - t0
    new = [s for s in _stages(sc) if s["stageId"] not in before]
    total_cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e9
    print(json.dumps({"key": key, "sf": sf_dir, "rows": n,
                      "wall_s": round(wall, 1),
                      "cpu_s": round(total_cpu, 1),
                      "stages": len(new)}))
    for s in sorted(new, key=lambda x: -x.get("executorCpuTime", 0))[:14]:
        print(json.dumps({
            "stage": s["stageId"],
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
            "tasks": s.get("numCompleteTasks"),
            "in_mb": round(s.get("inputBytes", 0) / 1e6),
            "sr_mb": round(s.get("shuffleReadBytes", 0) / 1e6),
            "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6),
            "spill_mb": round(s.get("diskBytesSpilled", 0) / 1e6),
            "spill_mem_mb": round(s.get("memoryBytesSpilled", 0) / 1e6),
            "name": s.get("name", "")[:45],
            "desc": (s.get("description") or "")[:60],
        }))


if __name__ == "__main__":
    main()
