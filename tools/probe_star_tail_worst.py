"""VERDICT r11 #7 (part 2): the star-repair all-pairs tail's DOCUMENTED
worst case, measured — a synthetic stranger pile (mutually-dissimilar
docs sharing one band bucket) at the default tail cap: residue 4095 →
C(4095,2) ≈ 8.4M int-id tail pairs into the exact verify. Also the
loud ValueError on a residue the cap cannot absorb within max_rounds.

Usage: python tools/probe_star_tail_worst.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

from pyspark.sql import functions as F

from mediaplaycounts_spark.session import get_spark
from mediaplaycounts_spark.operators import dedup as D

spark = get_spark("probe-star-tail-worst")
keys = ["band_idx", "band_hash"]
ids = list(range(1, n + 1))
bands = spark.createDataFrame(
    [(d, 0, 7) for d in ids], "doc_id long, band_idx int, band_hash long"
)
buckets = spark.createDataFrame(
    [(0, 7, 1)], "band_idx int, band_hash long, _rep long"
)
# mutually-dissimilar 5-shingle sets: Jaccard 0 between any two docs
sets = spark.createDataFrame(
    [(d, [1000 * d + k for k in range(5)]) for d in ids],
    "doc_id long, s array<long>",
)

t0 = time.perf_counter()
cand = D._star_candidates_with_repair(bands, buckets, keys, sets, 0.5)
n_cand = cand.count()
t1 = time.perf_counter()
print(
    f"stranger pile n={n}: candidates={n_cand} "
    f"(star {n-1} + tail C({n-1},2)={(n-1)*(n-2)//2}) "
    f"candidate-gen wall={t1-t0:.2f}s",
    flush=True,
)

# the caller's exact verify over the tail (the real downstream cost):
# the same distinct + double fetch-join + verify shape minhash_lsh_pairs
# runs over star candidates
t0 = time.perf_counter()
fetched = (
    cand.distinct()
    .join(sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa")), "id_a")
    .join(sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb")), "id_b")
)
verified = D._jaccard_verify(fetched, "sa", "sb", 0.5)
n_pass = verified.count()
print(
    f"exact verify over {n_cand} candidates: pass={n_pass} "
    f"wall={time.perf_counter()-t0:.2f}s",
    flush=True,
)

# over-cap residue + exhausted rounds must raise loudly
try:
    D._star_candidates_with_repair(
        bands, buckets, keys, sets, 0.5, max_rounds=2, allpairs_cap=n // 4
    ).count()
    print("OVER-CAP CELL DID NOT RAISE — BUG", flush=True)
except ValueError as ex:
    print(f"loud ceiling fired: {str(ex)[:140]}", flush=True)
spark.stop()
