"""Per-stage CPU dump for a production label or registry key (fresh
JVM recommended: run one key per invocation)."""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(sc):
    base = sc.uiWebUrl
    return json.load(urllib.request.urlopen(
        f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete"))


def main():
    if len(sys.argv) < 2:
        print(
            "usage: python tools/probe_stages.py <key-or-label> [sf_dir]",
            file=sys.stderr,
        )
        sys.exit(2)
    label = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from mediaplaycounts_spark.session import get_spark
    from mediaplaycounts_spark import registry
    import __spark_entry__ as entrymod

    spark = get_spark("probe-stages", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "100000",
    })
    sc = spark.sparkContext
    qs = entrymod.queries()
    prods = registry.production_paths()
    fn = prods[label].fn if label in prods else qs[label]

    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()  # warm
    before = {s["stageId"] for s in _stages(sc)}
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    new = [s for s in _stages(sc) if s["stageId"] not in before]
    total = sum(s.get("executorCpuTime", 0) for s in new) / 1e9
    print(json.dumps({"key": label, "wall_s": round(wall, 2),
                      "cpu_s": round(total, 1), "stages": len(new)}))
    for s in sorted(new, key=lambda x: -x.get("executorCpuTime", 0))[:16]:
        print(json.dumps({
            "stage": s["stageId"],
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
            "tasks": s.get("numCompleteTasks"),
            "in_mb": round(s.get("inputBytes", 0) / 1e6),
            "sr_mb": round(s.get("shuffleReadBytes", 0) / 1e6),
            "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6),
            "name": s.get("name", "")[:40],
        }))


if __name__ == "__main__":
    main()
