"""§2.J training-pipeline extensions: semantics + plan-shape tests.

Value parity with DuckDB is covered by the registry shape test and
tools/check_correctness.py; these pin the semantic invariants that the
oracle can't express (split stability under re-partitioning, top-k
cardinality bounds) and the physical plans the 100 TB posture requires
(zero-shuffle split assignment, broadcast-probe kNN).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.test_plans import nodes, plan_of, shuffles


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


# ---------------------------------------------------- sample_hash_bucket


def test_hash_split_is_stable_and_exhaustive(spark, queries):
    df = queries["sample_hash_bucket"](spark, SF_SMOKE)
    rows = {r.doc_id: r.split for r in df.collect()}
    # Exhaustive: every doc gets exactly one split label.
    assert set(rows.values()) <= {"train", "valid", "test"}
    # Stable: re-running (fresh plan, different partitioning) assigns the
    # identical split to every doc — the property Spark's seed-based
    # df.sample does NOT have.
    again = {
        r.doc_id: r.split
        for r in queries["sample_hash_bucket"](spark, SF_SMOKE)
        .repartition(7)
        .collect()
    }
    assert rows == again
    # Rough proportions: each holdout ~5.1% (13/256); tolerate small-n noise.
    n = len(rows)
    for label in ("test", "valid"):
        frac = sum(1 for s in rows.values() if s == label) / n
        assert 0.005 < frac < 0.15, (label, frac)


def test_hash_split_plan_has_no_shuffle(spark, queries):
    plan = plan_of(queries["sample_hash_bucket"](spark, SF_SMOKE))
    assert shuffles(plan) == 0


# --------------------------------------------------------- text ngrams


def test_ngram_counts_topk_bounds(spark, queries):
    from pyspark.sql import functions as F

    df = queries["text_ngram_counts"](spark, SF_SMOKE)
    per_lang = {
        r.lang: r.n_rows
        for r in df.groupBy("lang").agg(F.count("*").alias("n_rows")).collect()
    }
    assert per_lang, "no languages produced"
    assert all(1 <= v <= 15 for v in per_lang.values()), per_lang


# ----------------------------------------------------------- kNN join


def test_knn_join_cardinality_and_bounds(spark, queries):
    rows = queries["sim_knn_join"](spark, SF_SMOKE).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    assert set(by_probe) == {0, 1, 2, 3, 4}
    for pid, nbrs in by_probe.items():
        assert len(nbrs) == 3, (pid, len(nbrs))
        assert all(-1.000001 <= r.cos_sim <= 1.000001 for r in nbrs)
        # Neighbors exclude the probe pool itself.
        assert all(r.vec_id >= 5 for r in nbrs)


# ------------------------------------------- bucketized interval join


def test_bucketized_interval_join_is_hash_not_bnlj(spark, queries):
    plan = plan_of(queries["join_range_bucketized"](spark, SF_SMOKE))
    # The whole point of the bucketization: the theta join becomes an
    # equi-join on the bucket key (broadcast hash here; shuffle hash at
    # scale) — never a nested loop over |events| x |intervals|.
    assert nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert "HashJoin" in plan


def test_bucketized_interval_join_matches_naive_theta(spark, queries):
    from pyspark.sql import functions as F

    from mediaplaycounts_spark.tables import load_table

    bucketized = {
        (r.label, r.event_type): r.n_events
        for r in queries["join_range_bucketized"](spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    iv = spark.range(58).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("label"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 43200)
        .cast("timestamp_ntz")
        .alias("s"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 43200 + 172800)
        .cast("timestamp_ntz")
        .alias("e"),
    )
    naive = {
        (r.label, r.event_type): r.n_events
        for r in ev.join(iv, (ev.ts >= iv.s) & (ev.ts < iv.e))
        .groupBy("label", "event_type")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert bucketized == naive


def test_knn_join_probe_side_is_broadcast(spark, queries):
    plan = plan_of(queries["sim_knn_join"](spark, SF_SMOKE))
    # Scoring is a broadcast nested-loop over the 5-row probe side: the
    # corpus scan itself never shuffles (the only exchange is the tiny
    # per-probe ranking window).
    assert nodes(plan, "BroadcastNestedLoopJoin") == 1
    assert shuffles(plan) <= 1


def test_heavy_hitters_equals_bruteforce(spark, queries):
    from pyspark.sql import functions as F

    from mediaplaycounts_spark.tables import load_table

    got = {(r.word, r.n) for r in queries["agg_heavy_hitters"](spark, SF_SMOKE).collect()}
    toks = (
        load_table(spark, SF_SMOKE, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
    )
    n_total = toks.count()
    exact = {
        (r.word, r.n)
        for r in toks.groupBy("word").agg(F.count("*").alias("n")).collect()
        if r.n * 200 >= n_total
    }
    assert got == exact
    assert len(got) > 0


def test_heavy_hitters_prune_path_stays_exact(spark, queries, tmp_path):
    """Adversarial corpus for the vectorized Misra-Gries prune (r11).

    SF_SMOKE's vocabulary (31 words) never exceeds k=200, so the
    brute-force test above exercises only the merge half of the
    kernel. Here the vocabulary is ~2500 words and the Arrow batch
    size is forced down so the (k+1)-th-largest subtract-and-drop
    prune fires many times inside one partition — the mergeable-
    summaries superset guarantee is what keeps the exact recount
    (and thus the output) identical to brute force.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    rng_words = [f"tail{i:04d}" for i in range(2500)]
    docs = []
    # 3 genuine heavy hitters woven through every doc, plus a long
    # distinct tail so the counter dict repeatedly overflows k=200.
    for d in range(50):
        words = ["alpha", "beta", "alpha"] + rng_words[d * 50 : (d + 1) * 50]
        if d % 2 == 0:
            words += ["gamma"] * 3
        docs.append((d, " ".join(words)))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["lang"], pdf["source"], pdf["n_chars"] = "en", "t", pdf.text.str.len()
    pdf.to_parquet(tmp_path / "documents.parquet")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    try:
        got = {
            (r.word, r.n)
            for r in queries["agg_heavy_hitters"](spark, str(tmp_path)).collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    toks = [w for _, t in docs for w in t.split(" ")]
    n_total = len(toks)
    counts = pd.Series(toks).value_counts()
    exact = {(w, int(c)) for w, c in counts.items() if c * 200 >= n_total}
    assert got == exact
    # The heavy words must actually be heavy AND the tail must be big
    # enough that the prune fired (vocab >> k).
    assert {w for w, _ in exact} == {"alpha", "beta", "gamma"}
    assert len(counts) > 2000


def test_pagerank_structure(spark, queries):
    rows = queries["graph_pagerank_int"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert {r.is_supplier for r in rows} == {0, 1}
    # Damping floor: every node holds at least the 0.15 teleport mass.
    assert all(r.rank_ppm >= 150000 for r in rows)
    # Suppliers serve many customers -> highest-rank node is a supplier.
    top = max(rows, key=lambda r: r.rank_ppm)
    assert top.is_supplier == 1


def test_sample_k_per_group_exact_and_stable(spark, queries):
    rows = queries["sample_k_per_group"](spark, SF_SMOKE).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert all(len(ids) == 20 for ids in by_lang.values())
    again = queries["sample_k_per_group"](spark, SF_SMOKE).collect()
    assert {(r.lang, r.doc_id) for r in again} == {
        (r.lang, r.doc_id) for r in rows
    }


def test_pack_sequences_greedy_boundaries(spark):
    """Hand-checked packing: window 128, docs sorted by id within shard;
    a doc that would overflow opens a new bin; oversized doc sits alone."""
    import __spark_entry__ as e

    rows = e.queries()["pipeline_pack_sequences"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_shard: dict = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, docs in by_shard.items():
        fill, bin_idx = 0, 0
        for i, r in enumerate(docs):
            if i > 0 and fill + r.n_tokens > 128:
                bin_idx, fill = bin_idx + 1, r.n_tokens
            else:
                fill += r.n_tokens
            assert r.bin_idx == bin_idx, (shard, r.doc_id)
        # bins are dense 0..max
        assert {r.bin_idx for r in docs} == set(range(bin_idx + 1))


def test_embedding_quantize_roundtrip_error_bounded(spark):
    """Dequantized values stay within scale/2 of the original per
    component (the int8 quantization guarantee)."""
    import __spark_entry__ as e

    rows = e.queries()["multimodal_embedding_quantize"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows[:50]:
        q = [int(x) for x in r.q_csv.split(",")]
        assert all(-127 <= v <= 127 for v in q)
        # SSE bound: dim * (scale/2)^2 in pico units
        dim = len(q)
        assert r.sse_pico <= dim * (r.scale_r / 2) ** 2 * 1e12 * 1.01


def test_perplexity_rare_tokens_score_higher(spark):
    """A doc made of corpus-rare tokens must out-score (higher avg NLL)
    a doc of corpus-common tokens — the filtering property we buy."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    out = e.queries()["text_perplexity_unigram"](spark, "/root/testdata/sf0.001")
    from mediaplaycounts_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # common = most frequent token overall; build per-doc rarity rank corr
    joined = out.join(docs, "doc_id").select("doc_id", "avg_nll_nats", "n_tokens")
    rows = joined.collect()
    assert all(r.avg_nll_nats > 0 for r in rows)
    # extremes differ: the corpus is not degenerate
    vals = sorted(r.avg_nll_nats for r in rows)
    assert vals[-1] > vals[0]


def test_multiprobe_superset_of_single_probe(spark):
    """Multi-probe searches a strict superset of buckets, so its result
    set must contain every single-probe hit (same k, same planes)."""
    from mediaplaycounts_spark.queries.llm import (
        _ann_lsh_raw,
        _ann_multiprobe_raw,
    )

    sf = "/root/testdata/sf0.001"
    single = {r.vec_id for r in _ann_lsh_raw(spark, sf).collect()}
    multi = {r.vec_id for r in _ann_multiprobe_raw(spark, sf).collect()}
    assert single <= multi or len(multi) == 20  # k-cap may evict tail
