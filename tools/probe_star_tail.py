"""VERDICT r11 #7: star-repair all-pairs tail worst case at sf1.

Runs the minhash pair production path at sf1 with the band bucket cap
swept from OFF down to stranger-pile-forcing values: every capped run
must emit EXACTLY the uncapped pair set (the zero-loss contract), and
the wall records what the star+peel+tail detour costs. A final
pathological cell (tail cap 2, 2 peel rounds) must raise the loud
ValueError, never return partial candidates.

Usage: python tools/probe_star_tail.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"

from mediaplaycounts_spark.session import get_spark
from mediaplaycounts_spark.tables import load_table
from mediaplaycounts_spark.operators import dedup as D

spark = get_spark("probe-star-tail")
docs = load_table(spark, sf_dir, "documents")
docs.count()

baseline = None
for cap in (None, 2000, 200, 64):
    if cap is None:
        spark.conf.unset(D.BAND_BUCKET_CAP_CONF)
    else:
        spark.conf.set(D.BAND_BUCKET_CAP_CONF, str(cap))
    t0 = time.perf_counter()
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    dt = time.perf_counter() - t0
    if baseline is None:
        baseline = got
    print(
        f"bandBucketCap={cap}: wall={dt:.2f}s pairs={len(got)} "
        f"identical_to_uncapped={got == baseline}",
        flush=True,
    )

# pathological cell: residue >> tail cap and peel rounds exhausted
spark.conf.set(D.BAND_BUCKET_CAP_CONF, "64")
spark.conf.set(D.STAR_REPAIR_ALLPAIRS_CAP_CONF, "2")
spark.conf.set(D.STAR_REPAIR_MAX_ROUNDS_CONF, "2")
try:
    D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).count()
    print("PATHOLOGICAL CELL DID NOT RAISE — BUG", flush=True)
except ValueError as ex:
    print(f"loud ceiling fired: {str(ex)[:160]}", flush=True)
finally:
    spark.conf.unset(D.BAND_BUCKET_CAP_CONF)
    spark.conf.unset(D.STAR_REPAIR_ALLPAIRS_CAP_CONF)
    spark.conf.unset(D.STAR_REPAIR_MAX_ROUNDS_CONF)
spark.stop()
