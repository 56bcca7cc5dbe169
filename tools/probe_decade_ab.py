"""VERDICT r11 #3: decade-scale proof of the pair-dedup rework.

Runs one key at one SF in a fresh JVM against a given source TREE
(repo root passed first on sys.path — lets the same script measure
HEAD and the r11 tree), warm-up + best-of-2, into the noop sink, and
reports wall + executor-CPU (UI REST, complete stages).

Usage: python tools/probe_decade_ab.py TREE KEY SF_DIR [--prod]
Prints one JSON line.
"""
import json
import sys
import time

tree = sys.argv[1]
key = sys.argv[2]
sf_dir = sys.argv[3]
prod = "--prod" in sys.argv
sys.path.insert(0, tree)

from mediaplaycounts_spark.session import get_spark  # noqa: E402
from mediaplaycounts_spark import registry  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def _cpu(sc):
    import urllib.request

    base = sc.uiWebUrl
    if base is None:
        return 0.0
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete"
        )
    )
    return sum(s.get("executorCpuTime", 0) for s in stages) / 1e9


spark = get_spark(
    "probe-decade-ab",
    extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "100000"},
)
if prod:
    spark.conf.set("spark.mediaplaycounts.pairBlockCeiling", "2000")
sc = spark.sparkContext

qs = dict(entrymod.queries())
prods = registry.production_paths()
fns = {label: p.fn for label, p in prods.items()}
fn = fns.get(key) or qs[key]

fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm-up
best_wall = best_cpu = float("inf")
for _ in range(2):
    c0 = _cpu(sc)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    best_wall = min(best_wall, time.perf_counter() - t0)
    best_cpu = min(best_cpu, _cpu(sc) - c0)
print(
    json.dumps(
        {
            "tree": tree,
            "key": key,
            "sf": sf_dir,
            "prod_conf": prod,
            "wall": round(best_wall, 3),
            "cpu": round(best_cpu, 3),
        }
    )
)
spark.stop()
