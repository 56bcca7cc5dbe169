"""Phase-level timing probe for the PQ ANN path (VERDICT r11 #4).

Times, in one fresh JVM at $SPARK_GRAFT_SF_DIR:
  1. build      — topk_pq construction (training collects: init, 2
                  Lloyd rounds, dim head)
  2. write1     — first noop write of the final query (compile + exec)
  3. write2/3   — warm re-writes of the SAME DataFrame (exec only; the
                  compile constant is write1 - warm)
  4. rebuild+w  — fresh construction + write, the bench's non-
                  time_build timed region

Usage: python tools/probe_pq.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from mediaplaycounts_spark.session import get_spark
from mediaplaycounts_spark.tables import load_table
from mediaplaycounts_spark.operators import similarity as S

spark = get_spark("probe-pq")
em = load_table(spark, sf_dir, "embeddings")
n = em.count()
print(f"embeddings rows: {n}", flush=True)

probe = S.probe_vector(em, "vec_id", "embedding", 0)

t0 = time.perf_counter()
df = S.topk_pq(em, "vec_id", "embedding", probe, k=20)
t1 = time.perf_counter()
print(f"build (training collects): {t1 - t0:.3f}s", flush=True)

for i in (1, 2, 3):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    print(f"write{i}: {time.perf_counter() - t0:.3f}s", flush=True)

for i in (1, 2):
    t0 = time.perf_counter()
    d2 = S.topk_pq(em, "vec_id", "embedding", probe, k=20)
    tb = time.perf_counter()
    d2.write.mode("overwrite").format("noop").save()
    print(
        f"rebuild+write{i}: total={time.perf_counter() - t0:.3f}s "
        f"(build={tb - t0:.3f}s)",
        flush=True,
    )
spark.stop()
