"""VERDICT r11 #6: decade confirmation of the ≈1-scaling headline keys.

At sf0.1 several headline keys showed 8→32-core ratios ≈1; the r11
judge's hypothesis was fixed job-scheduling/codegen overhead dominating
0.13–0.37 s walls, not serial plans. This runs the suspect keys at sf1
(10x) where real work should dominate, one fresh JVM per core count,
warm-up + best-of-3 into the noop sink (bench methodology).

Usage: python tools/scaling_sf1.py <cores> <sf_dir> [key ...]
Prints one JSON line: {"cores": N, "sf_dir": ..., "queries": {...}}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = sys.argv[1]
sf_dir = sys.argv[2]
keys = sys.argv[3:] or [
    "dedup_exact_hash",
    "text_tokenize_wordcount",
    "sim_topk_probe",
    "win_rolling_30d",
    "agg_pivot",
    "agg_multi",
]

os.environ["SPARK_GRAFT_CPUS"] = cores

from mediaplaycounts_spark.session import get_spark
import __spark_entry__ as entrymod

spark = get_spark("scaling-sf1")
#: Optional split-size override (bytes-ish string, e.g. "1m"): the sf1
#: fixture is one ~10 MB file per table, i.e. ONE 128 MB scan split —
#: scaling of the PLAN only shows once the input is splittable.
if os.environ.get("SPARK_GRAFT_MAXPB"):
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", os.environ["SPARK_GRAFT_MAXPB"]
    )
qs = entrymod.queries()
out = {}
for key in keys:
    df = qs[key](spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()  # warm-up
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    out[key] = round(best, 4)
print(json.dumps({"cores": int(cores), "sf_dir": sf_dir, "queries": out}))
spark.stop()
