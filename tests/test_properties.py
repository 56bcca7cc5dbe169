"""Property tests on seeded random frames (SURVEY.md §5.2).

Each property asserts that a distributed formulation is EQUIVALENT to an
independent brute-force computation of the same semantics, over several
seeded random inputs — catching frame-boundary, tie, and empty-group
bugs that fixed fixtures miss. Seeds are fixed (no flaky runs, driver
hash checks stay stable).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SEEDS = (0, 1, 2)


def _random_counts(rng, n_files=4, n_days=50, density=0.6):
    rows = []
    for f in range(n_files):
        for d in range(n_days):
            if rng.random() < density:
                rows.append((f"file_{f}", d, int(rng.integers(0, 100))))
    return rows


def test_rolling_window_equals_bruteforce_selfjoin(spark):
    """RANGE-frame rolling 30-day sum == per-row brute-force sum over
    the same file's rows with day in [d-29, d] (gap days must NOT
    stretch the frame — the ROWS-vs-RANGE trap)."""
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        rows = _random_counts(rng)
        df = spark.createDataFrame(rows, "file string, day long, count long")
        w = Window.partitionBy("file").orderBy("day").rangeBetween(-29, 0)
        got = {
            (r.file, r.day): r.roll
        for r in df.select("file", "day", F.sum("count").over(w).alias("roll")).collect()
        }
        for f, d, _ in rows:
            expect = sum(c for f2, d2, c in rows if f2 == f and d - 29 <= d2 <= d)
            assert got[(f, d)] == expect, (seed, f, d)


def test_salted_join_equals_plain_join(spark):
    """Salting must be a pure physical rewrite: for any salt count and
    any (skewed!) key distribution, (key, salt)-join == key-join."""
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        # Zipfian-ish facts: key 0 is hot.
        fact_rows = [
            (int(k), int(v))
            for k, v in zip(rng.zipf(1.5, 200) % 10, rng.integers(0, 1000, 200))
        ]
        dim_rows = [(k, f"dim_{k}") for k in range(10)]
        facts = spark.createDataFrame(fact_rows, "k long, v long")
        dim = spark.createDataFrame(dim_rows, "k long, name string")
        plain = facts.join(dim, "k").groupBy("name").agg(F.sum("v").alias("s"))
        n_salt = 2 + seed * 3  # 2, 5, 8
        f_s = facts.withColumn("salt", F.pmod(F.xxhash64("v"), F.lit(n_salt)))
        d_s = dim.withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
        salted = (
            f_s.join(d_s, ["k", "salt"]).groupBy("name").agg(F.sum("v").alias("s"))
        )
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_minhash_identical_docs_always_collide_and_jaccard_exact(spark):
    """LSH banding guarantees: identical shingle sets agree on every
    band, so exact duplicates MUST appear as candidates; and the
    reported jaccard equals brute-force set Jaccard for every pair."""
    from mediaplaycounts_spark.operators.dedup import minhash_lsh_pairs, shingles

    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        texts = [
            " ".join(rng.choice(vocab, size=int(rng.integers(2, 7))))
            for _ in range(12)
        ]
        texts.append(texts[0])  # guaranteed exact duplicate pair (0, 12)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        pairs = {
            (r.id_a, r.id_b): r.jaccard
            for r in minhash_lsh_pairs(df, "doc_id", "text", threshold=0.0).collect()
        }
        assert (0, 12) in pairs and pairs[(0, 12)] == 1.0
        # brute-force shingle sets for verification
        sets = {
            r.doc_id: set(r.s)
            for r in df.select("doc_id", shingles("text").alias("s")).collect()
        }
        for (a, b), j in pairs.items():
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            assert j == inter / union, (seed, a, b)


def test_exact_dedup_partitions_ids_and_keeps_min(spark):
    """Every doc lands in exactly one hash group; keeper is min id;
    group sizes sum to n."""
    from mediaplaycounts_spark.operators.dedup import exact_dedup_by_hash

    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        base = [f"text {i}" for i in range(6)]
        docs = [(i, base[int(rng.integers(0, 6))]) for i in range(30)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = exact_dedup_by_hash(df, "doc_id", "text").collect()
        assert sum(r.n_copies for r in out) == 30
        by_text = {}
        for i, t in docs:
            by_text.setdefault(t, []).append(i)
        keepers = sorted(r.keeper_id for r in out)
        assert keepers == sorted(min(v) for v in by_text.values())


def test_asof_enrichment_equals_bruteforce(spark):
    """union+window as-of formulation == per-row max(signup_ts <= ts)."""
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        events = [
            (int(i), int(u), int(t))
            for i, (u, t) in enumerate(
                zip(rng.integers(0, 4, 40), rng.integers(0, 1000, 40))
            )
        ]
        signups = [
            (int(u), int(t)) for u, t in zip(range(4), rng.integers(0, 1000, 4))
        ]
        ev = spark.createDataFrame(events, "event_id long, user_id long, ts long")
        su = spark.createDataFrame(signups, "user_id long, signup_ts long")
        left = ev.withColumn("s_ts", F.lit(None).cast("long")).withColumn(
            "is_left", F.lit(1)
        )
        right = su.select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            F.col("signup_ts").alias("ts"),
            F.col("signup_ts").alias("s_ts"),
            F.lit(0).alias("is_left"),
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "is_left")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = left.unionByName(right).withColumn(
            "asof", F.last("s_ts", ignorenulls=True).over(w)
        )
        got = {
            r.event_id: r.asof
            for r in merged.filter(F.col("is_left") == 1).collect()
        }
        su_map = dict(signups)
        for eid, u, t in events:
            cands = [s for s in [su_map[u]] if s <= t]
            assert got[eid] == (max(cands) if cands else None), (seed, eid)


def test_connected_components_equals_union_find(spark):
    """Min-label propagation + pointer jumping == classic union-find on
    random graphs (including isolated nodes and chains)."""
    from mediaplaycounts_spark.operators.dedup import connected_components

    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        n = 30
        edges = [
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, 25), rng.integers(0, n, 25))
            if a != b
        ]
        edges += [(i, i + 1) for i in range(20, 28)]  # long chain
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {i: find(i) for i in range(n)}
        nodes_df = spark.createDataFrame([(i,) for i in range(n)], "node long")
        edges_df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.label
            for r in connected_components(nodes_df, edges_df).collect()
        }
        assert got == expect, seed


def test_gapfill_equals_bruteforce_lerp(spark, tmp_path):
    """Distributed gap-fill == per-series brute-force integer lerp, for
    random sparse daily series (edges carry nearest neighbor)."""
    import datetime as dt

    import __spark_entry__ as entrymod

    q = entrymod.queries()["ts_gapfill_interpolate"]
    t0 = dt.datetime(2024, 1, 1)
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        rows, series = [], {}
        eid = 0
        for ti, typ in enumerate(["view", "click"]):
            for d in range(20):
                if rng.random() < 0.5:
                    v = round(float(rng.integers(1, 10000)) / 100, 2)
                    rows.append((eid, t0 + dt.timedelta(days=d), 1, typ, v))
                    series.setdefault(typ, {})[d] = round(v * 100)
                    eid += 1
        if not rows:
            continue
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string, value double",
        )
        sf = str(tmp_path / f"gf{seed}")
        df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
        got = {
            (r.event_type, r.d.date()): r.filled_value
            for r in q(spark, sf).collect()
        }
        all_days = sorted({d for s in series.values() for d in s})
        lo, hi = all_days[0], all_days[-1]
        for typ, obs in series.items():
            days = sorted(obs)
            for d in range(lo, hi + 1):
                if d in obs:
                    expect = obs[d]
                else:
                    prevs = [x for x in days if x < d]
                    nexts = [x for x in days if x > d]
                    if prevs and nexts:
                        pd_, nd = prevs[-1], nexts[0]
                        pc, nc = obs[pd_], obs[nd]
                        expect = (pc * (nd - d) + nc * (d - pd_)) // (nd - pd_)
                    elif prevs:
                        expect = obs[prevs[-1]]
                    else:
                        expect = obs[nexts[0]]
                key = (typ, (t0 + dt.timedelta(days=d)).date())
                assert got[key] == expect / 100, (seed, typ, d)


def test_streaks_equal_bruteforce_runs(spark, tmp_path):
    """Gaps-and-islands streak detection == brute-force run-length scan
    over random per-user day sets."""
    import datetime as dt

    import __spark_entry__ as entrymod

    q = entrymod.queries()["win_streak_runs"]
    t0 = dt.datetime(2024, 1, 1)
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        rows, days_by_user = [], {}
        eid = 0
        for u in range(1, 5):
            for d in range(25):
                if rng.random() < 0.4:
                    rows.append((eid, t0 + dt.timedelta(days=d), u, "view", 1.0))
                    days_by_user.setdefault(u, set()).add(d)
                    eid += 1
        if not rows:
            continue
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string, value double",
        )
        sf = str(tmp_path / f"st{seed}")
        df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
        got = {r.user_id: r for r in q(spark, sf).collect()}
        for u, days in days_by_user.items():
            ds = sorted(days)
            runs, cur = [], 1
            for a, b in zip(ds, ds[1:]):
                if b == a + 1:
                    cur += 1
                else:
                    runs.append(cur)
                    cur = 1
            runs.append(cur)
            assert got[u].longest_streak == max(runs), (seed, u)
            assert got[u].n_streaks == len(runs), (seed, u)


def test_pack_sequences_equals_reference_packer(spark):
    """Arrow grouped-map packing == an independent Python reference
    packer on seeded random token lengths (boundary and oversize-doc
    cases included by construction)."""
    from mediaplaycounts_spark.registry import get
    import __spark_entry__  # noqa: F401  (registry load)

    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        n = 120
        toks = rng.integers(1, 200, size=n)  # some docs exceed window 128
        rows = [(int(i), " ".join("w" for _ in range(int(t)))) for i, t in enumerate(toks)]
        df = spark.createDataFrame(rows, "doc_id long, text string")

        # run the same kernel the registered key uses, on this frame
        from pyspark.sql import functions as F2
        import pandas as pd

        docs = df.select(
            "doc_id",
            (F2.col("doc_id") % 8).alias("shard"),
            F2.size(F2.split("text", " ")).cast("long").alias("n_tokens"),
        )

        def pack(pdf):
            pdf = pdf.sort_values("doc_id").reset_index(drop=True)
            window, bin_idx, fill = 128, 0, 0
            bins = []
            for i, t in enumerate(pdf["n_tokens"]):
                if i > 0 and fill + t > window:
                    bin_idx, fill = bin_idx + 1, t
                else:
                    fill += t
                bins.append(bin_idx)
            return pdf.assign(bin_idx=pd.Series(bins, dtype="int64"))

        got = {
            r.doc_id: (r.shard, r.bin_idx)
            for r in docs.groupBy("shard")
            .applyInPandas(pack, "doc_id long, shard long, n_tokens long, bin_idx long")
            .collect()
        }

        # independent reference packer
        want = {}
        for shard in range(8):
            ids = [i for i in range(n) if i % 8 == shard]
            bin_idx, fill = 0, 0
            for j, i in enumerate(sorted(ids)):
                t = int(toks[i])
                if j > 0 and fill + t > 128:
                    bin_idx, fill = bin_idx + 1, t
                else:
                    fill += t
                want[i] = (shard, bin_idx)
        assert got == want, f"seed {seed}"


def test_quantize_roundtrip_bound_random_vectors(spark):
    """Int8 quantization on seeded random vectors: q in [-127,127],
    per-component reconstruction error <= scale/2 + fp eps."""
    from pyspark.sql import functions as F2

    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        vecs = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(50)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        scale = F2.array_max(F2.transform("embedding", F2.abs)) / F2.lit(127.0)
        q = F2.transform(
            "embedding", lambda x: F2.floor(x / F2.col("scale") + F2.lit(0.5))
        )
        out = df.withColumn("scale", scale).select(
            "vec_id", "embedding", "scale", q.alias("q")
        )
        for r in out.collect():
            assert all(-127 <= int(v) <= 127 for v in r.q)
            for x, qi in zip(r.embedding, r.q):
                assert abs(x - qi * r.scale) <= r.scale / 2 + 1e-12


def test_bfs_hops_equal_networkx_style_reference(spark):
    """Layered-frontier BFS == a dict-based reference BFS on a seeded
    random bipartite graph."""
    from pyspark.sql import functions as F2

    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        edges = set()
        for _ in range(300):
            c, s = int(rng.integers(0, 40)), int(rng.integers(0, 15))
            edges.add((2 * c, 2 * s + 1))
        und = list(edges) + [(b, a) for a, b in edges]
        e = spark.createDataFrame(und, "src long, dst long").localCheckpoint()
        seeds_nodes = [2 * c for c in range(5)]
        settled = spark.createDataFrame(
            [(n, 0) for n in seeds_nodes], "node long, hops long"
        )
        frontier = settled
        for h in range(1, 4):
            nxt = (
                frontier.join(e, frontier.node == e.src)
                .select(F2.col("dst").alias("node"))
                .distinct()
                .join(settled, "node", "left_anti")
                .select("node", F2.lit(h).cast("long").alias("hops"))
                .localCheckpoint()
            )
            settled = settled.unionAll(nxt).localCheckpoint()
            frontier = nxt
        got = {r.node: r.hops for r in settled.collect()}

        # reference BFS
        adj: dict = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
        want = {n: 0 for n in seeds_nodes}
        cur = set(seeds_nodes)
        for h in range(1, 4):
            nxt_set = set()
            for n in cur:
                nxt_set |= adj.get(n, set())
            nxt_set -= set(want)
            for n in nxt_set:
                want[n] = h
            cur = nxt_set
        assert got == want, f"seed {seed}"
