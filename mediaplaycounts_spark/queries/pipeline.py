"""Training-data-pipeline operators beyond the §2.I core.

Four ops a 100 TB corpus pipeline runs constantly (SURVEY.md §2.J
extensions; north-star mandate `BASELINE.json:6`):

- `sample_hash_bucket` — deterministic train/valid/test split by md5
  prefix of the stable doc key. The ONLY sane split at 100 TB: no RNG
  state, no shuffle, embarrassingly parallel, stable under re-runs and
  late-arriving data (a doc's split never changes). Spark's native
  `df.sample`/TABLESAMPLE is seed-dependent per-partition and NOT stable
  across repartitioning — a correctness trap for train/test hygiene.
- `agg_cube` — CUBE over order status x priority (the reporting twin of
  `agg_rollup`; completes the GROUPING SETS family).
- `text_ngram_counts` — per-language top-15 bigrams: the n-gram LM /
  contamination-check primitive. explode -> hash agg -> per-group top-k.
- `sim_knn_join` — batch k-NN join (5 probe vectors x corpus, top-3
  each): the retrieval-eval primitive. Broadcast the probe side so the
  corpus scan stays shuffle-free; per-probe top-k via window.

All four are SQL-oracled (driver value-hash, not rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mediaplaycounts_spark.operators import dedup as D
from mediaplaycounts_spark.operators import similarity as S
from mediaplaycounts_spark.queries._helpers import dsum, dsum_sql
from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table

# ------------------------------------------------- deterministic split

#: First-2-hex-chars thresholds: md5 prefix is uniform on [00, ff], so
#: '0d' keeps 13/256 ~ 5.1% for test, ['0d','1a') another 13/256 for
#: valid, rest train. Both engines emit lowercase hex; plain ASCII
#: string comparison is identical on both.
_TEST_HI = "0d"
_VALID_HI = "1a"


@register(
    "sample_hash_bucket",
    oracle=f"""
        SELECT doc_id, lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TEST_HI}'
                    THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VALID_HI}'
                    THEN 'valid'
                    ELSE 'train' END AS split
        FROM documents
    """,
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable hash split: narrow-only plan (scan -> project), no shuffle,
    no RNG — the split assignment of a doc_id is a pure function."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(prefix < _TEST_HI, "test")
        .when(prefix < _VALID_HI, "valid")
        .otherwise("train")
    )
    return docs.select("doc_id", "lang", split.alias("split"))


# ----------------------------------------------------------------- cube


@register(
    "agg_cube",
    oracle=f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               {dsum_sql('o_totalprice', 'revenue')}
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE subtotals over status x priority; 'ALL' sentinels keep the
    subtotal rows string-typed on both engines (same rule as agg_rollup)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


# --------------------------------------------------------------- ngrams


@register(
    "text_ngram_counts",
    oracle="""
        WITH w AS (SELECT lang, string_split(text, ' ') AS toks
                   FROM documents WHERE len(string_split(text, ' ')) >= 2),
             bg AS (SELECT lang,
                           unnest(list_transform(range(1, len(toks)),
                                                 i -> toks[i] || ' ' || toks[i + 1]))
                             AS bigram
                    FROM w),
             counted AS (SELECT lang, bigram, COUNT(*) AS n
                         FROM bg GROUP BY lang, bigram),
             ranked AS (SELECT lang, bigram, n,
                               row_number() OVER (PARTITION BY lang
                                                  ORDER BY n DESC, bigram) AS rn
                        FROM counted)
        SELECT lang, bigram, n FROM ranked WHERE rn <= 15
    """,
)
def text_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 bigrams per language: the n-gram LM / eval-contamination
    primitive. Bigram generation stays in codegen (transform over
    sequence — no UDF); one shuffle for the count, one for the top-k
    window, both on (lang, bigram) keys that are near-uniform."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("lang", D.tokens("text").alias("toks"))
        # sequence(1, 0) would DESCEND in Spark, so guard short docs out
        # (DuckDB's range(1, 1) is empty — same final semantics).
        .filter(F.size("toks") >= 2)
    )
    bigrams = toks.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("bigram"),
    )
    counted = bigrams.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.col("bigram"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .select("lang", "bigram", "n")
    )


# ------------------------------------------------- stopword/repetition

#: Function-word list; the synthetic corpus vocabulary includes 'a' and
#: 'the', the rest guard generality (ratio 0 contributions are fine).
_STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "it")


@register(
    "text_stopword_repetition",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
                   FROM documents)
        SELECT doc_id, lang,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(len(list_filter(toks, w -> list_contains({list(_STOPWORDS)}, w)))
                    AS DOUBLE) / len(toks) AS stop_ratio,
               CAST(list_max(list_transform(list_distinct(toks),
                                            w -> len(list_filter(toks, t -> t = w))))
                    AS DOUBLE) / len(toks) AS top_frac
        FROM t
    """,
)
def text_stopword_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality signals the corpus filters key on: stopword ratio
    (too low => boilerplate/code, too high => filler) and top-token
    fraction (repetition detector). Pure higher-order array functions —
    narrow plan, zero shuffle, whole-stage codegen; the per-doc mode is
    O(v^2) in DISTINCT tokens, bounded by doc vocabulary, not length."""
    docs = load_table(spark, sf_dir, "documents")
    stoplist = F.array(*[F.lit(w) for w in _STOPWORDS])
    toks = D.tokens("text")
    n_words = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda w: F.array_contains(stoplist, w))).cast("double")
        / n_words
    )
    top_frac = (
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda w: F.size(F.filter(toks, lambda t: t == w)),
            )
        ).cast("double")
        / n_words
    )
    return docs.select(
        "doc_id",
        "lang",
        n_words.cast("long").alias("n_words"),
        stop_ratio.alias("stop_ratio"),
        top_frac.alias("top_frac"),
    )


# ------------------------------------------------------------- kNN join

_COS_KNN = S.COSINE_SQL.format(a="p.pe", b="c.embedding")


@register(
    "sim_knn_join",
    oracle=f"""
        WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
                   FROM embeddings WHERE vec_id < 5),
             c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
             scored AS (SELECT p.probe_id, c.vec_id,
                               round({_COS_KNN}, 6) AS cos_sim
                        FROM p, c),
             ranked AS (SELECT probe_id, vec_id, cos_sim,
                               row_number() OVER (PARTITION BY probe_id
                                                  ORDER BY cos_sim DESC, vec_id)
                                 AS rn
                        FROM scored)
        SELECT probe_id, vec_id, cos_sim FROM ranked WHERE rn <= 3
    """,
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN join: each of 5 probe vectors gets its exact top-3
    corpus neighbors by cosine. The probe side is broadcast (BNLJ over a
    5-row build side — the corpus never shuffles for scoring); ranking
    orders by the ROUNDED cosine so the window tie-break is identical on
    both engines. At 100 TB the same plan holds with probe batches up to
    the broadcast threshold; beyond that, switch to sim_ann_lsh/_ivf."""
    em = load_table(spark, sf_dir, "embeddings")
    probes = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    corpus = em.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        "probe_id",
        "vec_id",
        F.round(S.cosine(S.as_double("pe"), S.as_double("embedding")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("probe_id", "vec_id", "cos_sim")
    )


# ------------------------------------------------------- heavy hitters

#: Support threshold: a word is a heavy hitter if it is >= 1/200th
#: (0.5%) of all tokens. The Misra-Gries stage uses the same k, so its
#: per-partition survivors are a guaranteed superset of the global
#: heavy hitters (pigeonhole: an item with global share >= 1/k must
#: exceed the local 1/k floor in at least one partition).
_MG_K = 200


@register(
    "agg_heavy_hitters",
    oracle=f"""
        WITH toks AS (SELECT unnest(string_split(text, ' ')) AS word
                      FROM documents),
        tot AS (SELECT COUNT(*) AS n_total FROM toks),
        c AS (SELECT word, COUNT(*) AS n FROM toks GROUP BY word)
        SELECT c.word, c.n,
               (c.n * 1000000) // tot.n_total AS share_ppm
        FROM c, tot
        WHERE c.n * {_MG_K} >= tot.n_total
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-item detection with bounded memory: per-partition
    Misra-Gries (k=200 counters) proposes candidates, then ONE
    exact recount over the candidate semi-join confirms them — the
    output is exactly the words with share >= 1/k, so the oracle is
    plain SQL despite the sketchy middle.

    This is the 100 TB shape for top-k frequent items: the full
    (word, count) vocabulary never shuffles — only <= k survivors per
    partition (tiny, broadcastable) and the recount of that candidate
    subset. A plain groupBy-all-words works at sf0.1 but ships the
    entire Zipf tail through the exchange for no reason.
    """
    from collections.abc import Iterator

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("word"))

    def misra_gries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized Misra-Gries (r11 optimization round; guide §4.2):
        # the old form looped over every TOKEN in Python — the one
        # row-at-a-time Python loop left in a production path, and
        # invisible to the executor-CPU gates because Python worker
        # time is not JVM CPU. Each batch is now counted with
        # pandas.value_counts (C speed), merged into the counter dict
        # at VOCABULARY cardinality, and pruned with the mergeable-
        # summaries rule: subtract the (k+1)-th largest count from
        # all, drop non-positives. Each prune subtracts its threshold
        # from > k positive counters, so the total decrement any word
        # can accumulate is < n/(k+1) — any word with true count
        # > n/k still ends positive, i.e. the candidate set remains a
        # SUPERSET of the true heavy hitters (the exact recount below
        # makes the final output identical regardless of which extra
        # candidates survive).
        counters: dict[str, int] = {}
        for pdf in batches:
            for w, c in pdf["word"].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > _MG_K:
                thr = sorted(counters.values(), reverse=True)[_MG_K]
                counters = {
                    w: c - thr for w, c in counters.items() if c > thr
                }
        yield pd.DataFrame({"word": list(counters)})

    # No .distinct() on the candidates (r12, VERDICT r11 #5): the
    # worker already emits each partition's counter dict KEYS — ≤ k
    # distinct words per partition — and a left-semi join has set
    # semantics regardless of duplicate build-side keys, so the
    # distinct's exchange + extra stage bought nothing. The broadcast
    # build side is ≤ k × n_partitions tiny strings either way.
    cands = toks.mapInPandas(misra_gries, "word string")
    counts = (
        toks.join(F.broadcast(cands), "word", "leftsemi")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    tot = toks.agg(F.count("*").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("n") * _MG_K >= F.col("n_total"))
        .select(
            "word",
            "n",
            F.expr("(n * 1000000) div n_total").alias("share_ppm"),
        )
    )


# ------------------------------------------------- exact k-per-group sample


_K_PER_GROUP = 20


@register(
    "sample_k_per_group",
    oracle=f"""
        WITH r AS (SELECT doc_id, lang,
                          row_number() OVER (
                              PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS STRING)), doc_id)
                            AS rn
                   FROM documents)
        SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank
        FROM r WHERE rn <= {_K_PER_GROUP}
    """,
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-language sample, deterministically: rank docs
    inside each language by the md5 of their key (a fixed pseudo-random
    order) and keep the first k. Unlike rate-based sampling
    (`sample_stratified`), the output size is exact — the eval-set
    construction primitive — and unlike seeded `df.sample` it is
    stable under re-runs, repartitioning, and data relayout.

    One lang-keyed window; at 100 TB pre-filter with a generous
    md5-threshold pass first (shuffle-free) so the window only ranks a
    small superset of k per group."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _K_PER_GROUP)
        .select("doc_id", "lang", F.col("rn").cast("long").alias("sample_rank"))
    )


@register(
    "pipeline_pack_sequences",
    oracle="""
        WITH RECURSIVE d AS (
            SELECT doc_id, doc_id % 8 AS shard,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY doc_id % 8
                                      ORDER BY doc_id) AS rn
            FROM documents
        ),
        pack(shard, rn, doc_id, n_tokens, bin_idx, fill) AS (
            SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
                   CASE WHEN pack.fill + d.n_tokens > 128
                        THEN pack.bin_idx + 1 ELSE pack.bin_idx END,
                   CASE WHEN pack.fill + d.n_tokens > 128
                        THEN d.n_tokens ELSE pack.fill + d.n_tokens END
            FROM d JOIN pack
              ON d.shard = pack.shard AND d.rn = pack.rn + 1
        )
        SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
               bin_idx
        FROM pack
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing — the step that turns a deduped
    corpus into fixed-size training sequences: docs are greedily packed
    in doc_id order into 128-token bins (a doc that would overflow the
    current bin starts the next one; an oversized doc gets a bin alone).

    Packing is a sequential recurrence (current-bin fill) no window
    function expresses, so it runs as an Arrow grouped-map kernel
    (applyInPandas) per SHARD — doc_id % 8 here, a hash bucket at scale
    — which is exactly how a 1000-executor packer works: shards pack
    independently and in parallel, bin ids are local to a shard, and
    no cross-shard coordination exists. One shuffle (by shard); the
    token counting stays JVM-side. The DuckDB twin replays the same
    recurrence as a recursive CTE, making this sequential-stateful
    kernel fully value-oracled.
    """
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        window, bin_idx, fill = 128, 0, 0
        bins = []
        for i, n in enumerate(pdf["n_tokens"]):
            if i > 0 and fill + n > window:
                bin_idx, fill = bin_idx + 1, n
            else:
                fill += n
            bins.append(bin_idx)
        return pdf.assign(bin_idx=pd.Series(bins, dtype="int64"))

    return docs.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard long, n_tokens long, bin_idx long"
    )


@register(
    "pipeline_domain_mixture",
    oracle="""
        WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        k AS (SELECT MIN(n) AS n_min FROM c),
        r AS (SELECT lang, n,
                     CAST(n_min * 1000000 // n AS BIGINT) AS rate_ppm
              FROM c CROSS JOIN k)
        SELECT d.doc_id, d.lang, r.rate_ppm,
               CAST(CASE WHEN r.rate_ppm >= 1000000 THEN 1
                         WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                              < lower(lpad(hex(CAST(r.rate_ppm * 4294967296
                                                    // 1000000 AS BIGINT)),
                                           8, '0'))
                         THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM documents d JOIN r USING (lang)
    """,
)
def pipeline_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture rebalancing — downsample every language to the
    smallest language's count (uniform target mixture), the domain-
    weighting step every pretraining corpus runs. Rates are exact
    integer ppm (n_min·1e6 div n_lang); the keep decision is the same
    deterministic md5-prefix threshold as sample_hash_bucket, so the
    sampled set is stable under re-runs, repartitioning, and late data.

    Plan: one tiny per-lang count agg + 1-row min crossed in, broadcast
    back onto the corpus — the fact-volume path is scan -> hash join ->
    project, no RNG, no shuffle of the corpus itself."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n"))
    k = c.agg(F.min("n").alias("n_min"))
    r = c.crossJoin(F.broadcast(k)).select(
        "lang",
        "n",
        F.expr("cast(n_min * 1000000 div n as bigint)").alias("rate_ppm"),
    )
    thr = F.lower(
        F.lpad(
            F.hex(F.expr("cast(rate_ppm * 4294967296 div 1000000 as bigint)")),
            8,
            "0",
        )
    )
    return (
        docs.join(F.broadcast(r), "lang")
        .select(
            "doc_id",
            "lang",
            "rate_ppm",
            F.when(F.col("rate_ppm") >= 1_000_000, F.lit(1))
            .when(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < thr,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("kept"),
        )
    )


@register(
    "pipeline_token_budget_trim",
    oracle="""
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                       OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM documents)
        SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
               CAST(CASE WHEN cum_tokens <= 2000 THEN 1 ELSE 0 END AS BIGINT)
                 AS kept
        FROM t
    """,
)
def pipeline_token_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation: keep docs per language (in stable doc_id
    order) until a 2000-token budget is exhausted — how a fixed training
    budget is portioned across domains. One window per lang partition
    (running token sum), integer arithmetic only.

    At 100 TB the cumulative sum stays a single shuffle keyed by the
    budget dimension; budgets per (lang, source) shard the window
    further, never widening it."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select(
        "doc_id", "lang", n_tok.alias("n_tokens")
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        "cum_tokens",
        (F.col("cum_tokens") <= 2000).cast("long").alias("kept"),
    )


@register(
    "pipeline_shard_manifest",
    oracle="""
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(length(text) AS BIGINT) AS n_bytes,
                   SUM(CAST(length(text) AS BIGINT))
                       OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_bytes
            FROM documents)
        SELECT doc_id, lang, n_bytes,
               CAST((cum_bytes - n_bytes) // 8192 AS BIGINT) AS shard_idx
        FROM t
    """,
)
def pipeline_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced output-shard planning: docs are assigned (in stable
    doc_id order, per lang) to ~8 KB shards by the cumulative byte
    offset at which each doc STARTS — floor(start_offset/shard_size)
    yields contiguous, size-balanced shards without a sequential
    packer. This is the manifest a training-data writer consumes to
    emit fixed-size .tar/.parquet shards; contrast
    pipeline_pack_sequences, whose bins must never split a doc (that
    needs the sequential kernel — shard files may split at doc
    boundaries only, which start-offset assignment guarantees).

    One running-sum window per lang; integer arithmetic only."""
    docs = load_table(spark, sf_dir, "documents")
    n_bytes = F.length("text").cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select("doc_id", "lang", n_bytes.alias("n_bytes")).withColumn(
        "cum_bytes", F.sum("n_bytes").over(w)
    )
    return t.select(
        "doc_id",
        "lang",
        "n_bytes",
        F.expr("cast((cum_bytes - n_bytes) div 8192 as bigint)").alias("shard_idx"),
    )


# -------------------------------------------- preference-pair builder


@register(
    "pipeline_preference_pairs",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang, source,
                   len(string_split(text, ' ')) AS n_words
            FROM documents),
        ranked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY lang, source
                                      ORDER BY n_words DESC, doc_id) AS rb,
                   row_number() OVER (PARTITION BY lang, source
                                      ORDER BY n_words ASC, doc_id) AS rw
            FROM scored),
        best AS (SELECT lang, source, doc_id AS chosen_id,
                        n_words AS chosen_words
                 FROM ranked WHERE rb = 1),
        worst AS (SELECT lang, source, doc_id AS rejected_id,
                         n_words AS rejected_words
                  FROM ranked WHERE rw = 1)
        SELECT b.lang, b.source, b.chosen_id, w.rejected_id,
               b.chosen_words - w.rejected_words AS score_gap
        FROM best b JOIN worst w
          ON b.lang = w.lang AND b.source = w.source
        WHERE b.chosen_id <> w.rejected_id
    """,
)
def pipeline_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-PAIR construction (the DPO/RLHF data shape): within
    each (lang, source) response group, pair the highest-scoring
    candidate (chosen) with the lowest-scoring one (rejected), with
    deterministic doc_id tiebreaks and degenerate single-candidate
    groups dropped. Score here is token count (the graded stand-in for
    a reward-model score column — the plan is identical when the score
    arrives from a model-inference stage upstream).

    Plan: one scan, two window ranks over the same (lang, source)
    partitioning (ONE shuffle — both windows share the exchange), tiny
    self-join on the group key. At 100 TB the group key is the prompt
    hash and the same plan emits one pair per prompt."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split("text", " ")).alias("n_words"),
    )
    wb = Window.partitionBy("lang", "source").orderBy(
        F.desc("n_words"), "doc_id"
    )
    ww = Window.partitionBy("lang", "source").orderBy("n_words", "doc_id")
    ranked = scored.select(
        "*",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
    )
    best = ranked.filter(F.col("rb") == 1).select(
        "lang",
        "source",
        F.col("doc_id").alias("chosen_id"),
        F.col("n_words").alias("chosen_words"),
    )
    worst = ranked.filter(F.col("rw") == 1).select(
        "lang",
        "source",
        F.col("doc_id").alias("rejected_id"),
        F.col("n_words").alias("rejected_words"),
    )
    return (
        best.join(worst, ["lang", "source"])
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .select(
            "lang",
            "source",
            "chosen_id",
            "rejected_id",
            (F.col("chosen_words") - F.col("rejected_words")).alias("score_gap"),
        )
    )


# ----------------------------------------- annotator reconciliation


@register(
    "pipeline_annotation_vote",
    oracle="""
        WITH ann AS (
            SELECT doc_id, a.annotator,
                   md5(CAST(doc_id AS VARCHAR) || ':'
                       || CAST(a.annotator AS VARCHAR)) AS h
            FROM documents
            CROSS JOIN (SELECT unnest([1, 2, 3]) AS annotator) a),
        lab AS (
            SELECT doc_id, annotator,
                   CASE WHEN substring(h, 1, 1) < '8'
                        THEN 'keep' ELSE 'drop' END AS label,
                   ascii(substring(h, 2, 1)) * 256
                     + ascii(substring(h, 3, 1)) AS conf_i
            FROM ann),
        votes AS (
            SELECT doc_id, label,
                   COUNT(*) AS n_votes,
                   MAX(conf_i) AS max_conf
            FROM lab GROUP BY doc_id, label),
        ranked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY n_votes DESC, max_conf DESC,
                                               label) AS rn
            FROM votes)
        SELECT doc_id, label AS final_label,
               CAST(n_votes AS BIGINT) AS n_votes,
               CAST(max_conf AS BIGINT) AS conf_i
        FROM ranked WHERE rn = 1
    """,
)
def pipeline_annotation_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-annotator RECONCILIATION (the labeling-pipeline merge step):
    three model/human annotators each emit (label, confidence) per doc
    — derived deterministically from md5 of (doc_id, annotator), the
    engines' shared hash, standing in for three model-inference outputs
    — and the final label is majority vote with (max-confidence,
    lexical) tiebreaks. This is the dataset-merging op every
    annotation/RLHF pipeline runs before training; at 100 TB it is one
    bounded explode (|annotators|×) + two keyed aggregations, shuffled
    on doc_id — never on the payload."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ann = docs.select(
        "doc_id",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("annotator"),
    ).select(
        "doc_id",
        "annotator",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("annotator").cast("string"),
            )
        ).alias("h"),
    )
    lab = ann.select(
        "doc_id",
        "annotator",
        F.when(F.substring("h", 1, 1) < "8", F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
        (
            F.ascii(F.substring("h", 2, 1)) * 256 + F.ascii(F.substring("h", 3, 1))
        ).alias("conf_i"),
    )
    votes = lab.groupBy("doc_id", "label").agg(
        F.count("*").alias("n_votes"), F.max("conf_i").alias("max_conf")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("n_votes"), F.desc("max_conf"), "label"
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("label").alias("final_label"),
            "n_votes",
            F.col("max_conf").cast("bigint").alias("conf_i"),
        )
    )


# --------------------------------------- deterministic weighted sampling


@register(
    "sample_weighted_topk",
    oracle="""
        WITH w AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS weight,
                   CAST(ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                        * 65536
                        + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))
                          * 256
                        + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 3, 1))
                        AS DOUBLE) AS h
            FROM documents)
        SELECT doc_id, CAST(weight AS BIGINT) AS weight,
               CAST(round(h / weight, 6) AS DOUBLE) AS priority
        FROM w
        ORDER BY h / weight ASC, doc_id LIMIT 50
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without RNG (the A-Res reservoir scheme with
    the random draw pinned to a content-stable hash): each doc gets
    priority = h/weight (heavier docs draw smaller priorities more
    often) and the k smallest priorities are the weighted sample —
    deterministic, repartition-proof, replayable, the same
    train/test-hygiene reasoning as `sample_hash_bucket`. Priority is
    ONE double division (bit-exact in both engines); selection is
    TakeOrderedAndProject — per-partition heaps, no global sort.

    At 100 TB this is how you take a 1% length-weighted corpus sample
    in one pass with zero coordination."""
    docs = load_table(spark, sf_dir, "documents")
    md = F.md5(F.col("doc_id").cast("string"))
    h = (
        F.ascii(F.substring(md, 1, 1)) * 65536
        + F.ascii(F.substring(md, 2, 1)) * 256
        + F.ascii(F.substring(md, 3, 1))
    ).cast("double")
    weight = F.size(F.split("text", " ")).cast("double")
    w = docs.select(
        "doc_id",
        weight.alias("weight"),
        (h / weight).alias("priority"),
    )
    return (
        w.orderBy("priority", "doc_id")
        .limit(50)
        .select(
            "doc_id",
            F.col("weight").cast("long").alias("weight"),
            F.round("priority", 6).alias("priority"),
        )
    )


# --------------------------------------- length-bucketed batch packing


@register(
    "pipeline_length_bucket_batches",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                   CAST(len(string_split(text, ' ')) // 16 AS BIGINT)
                     AS bucket
            FROM documents),
        b AS (
            SELECT doc_id, n_words, bucket,
                   (row_number() OVER (PARTITION BY bucket
                                       ORDER BY doc_id) - 1) // 8
                     AS batch_idx
            FROM d),
        agg AS (
            SELECT bucket, batch_idx,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_words) AS BIGINT) AS total_words,
                   CAST(MAX(n_words) AS BIGINT) AS max_words
            FROM b GROUP BY bucket, batch_idx)
        SELECT bucket, batch_idx, n_docs, total_words, max_words,
               CAST((max_words * n_docs - total_words) * 1000000
                    // (max_words * n_docs) AS BIGINT) AS pad_waste_ppm
        FROM agg
    """,
)
def pipeline_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LENGTH-BUCKETED batching — the padding-waste killer for
    non-packed training: docs are bucketed by length (16-word bands),
    numbered into fixed-size batches of 8 WITHIN their bucket
    (deterministic doc_id order), and each batch reports its padding
    waste (pad-to-max overhead, ppm). Complements
    `pipeline_pack_sequences` (greedy concat packing): bucketing keeps
    examples intact — the right choice for SFT/eval where sequence
    boundaries matter — and similar lengths make the residual padding
    small. One shuffle (the per-bucket window); at 100 TB buckets are
    uniform-ish by construction and batches never cross executors."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
    ).withColumn("bucket", F.expr("n_words div 16"))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    b = d.withColumn(
        "batch_idx", F.expr(f"cast((row_number() over (partition by bucket order by doc_id) - 1) div 8 as bigint)")
    )
    agg = b.groupBy("bucket", "batch_idx").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.max("n_words").cast("long").alias("max_words"),
    )
    return agg.select(
        "bucket",
        "batch_idx",
        "n_docs",
        "total_words",
        "max_words",
        F.expr(
            "cast((max_words * n_docs - total_words) * 1000000"
            " div (max_words * n_docs) as bigint)"
        ).alias("pad_waste_ppm"),
    )


@register(
    "pipeline_dataset_card",
    oracle="""
        WITH base AS (
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                   COUNT(DISTINCT sha256(text)) AS n_uniq
            FROM documents GROUP BY source),
        lc AS (SELECT source, lang, COUNT(*) AS c
               FROM documents GROUP BY source, lang),
        mj AS (SELECT source, lang AS majority_lang FROM (
                   SELECT source, lang,
                          ROW_NUMBER() OVER (PARTITION BY source
                                             ORDER BY c DESC, lang) AS rn
                   FROM lc) WHERE rn = 1)
        SELECT b.source, b.n_docs, b.total_chars, b.n_langs,
               mj.majority_lang,
               CAST((b.n_docs - b.n_uniq) * 1000000 // b.n_docs AS BIGINT)
                 AS dup_ppm,
               CAST(b.total_chars * 100 // b.n_docs AS BIGINT)
                 AS mean_chars_e2
        FROM base b JOIN mj ON b.source = mj.source
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass DATASET CARD per corpus source: doc count, char volume,
    language spread, majority language, exact-duplicate rate, mean doc
    length — the summary table a training-data release ships alongside
    the shards (HF dataset-card / Dolma-style corpus stats).

    Two scans of documents total, both hash aggs keyed on low-
    cardinality columns: (source) for the moment/distinct stats and
    (source, lang) for the majority vote — the vote is a window over
    the TINY (source x lang) table, never over raw docs. Rates are
    fraction-free integer ppm/centi-chars (floored division on both
    engines), so the card hash-matches DuckDB exactly. At 100 TB both
    aggs partial-aggregate map-side; distinct hashes shuffle at most
    one row per unique (source, hash).
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct(F.sha2("text", 256)).alias("n_uniq"),
    )
    lc = docs.groupBy("source", "lang").agg(F.count("*").alias("c"))
    mj = (
        lc.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("c").desc(), F.col("lang")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("majority_lang"))
    )
    return base.join(F.broadcast(mj), "source").select(
        "source",
        "n_docs",
        "total_chars",
        "n_langs",
        "majority_lang",
        F.expr(
            "cast((n_docs - n_uniq) * 1000000 div n_docs as bigint)"
        ).alias("dup_ppm"),
        F.expr("cast(total_chars * 100 div n_docs as bigint)").alias(
            "mean_chars_e2"
        ),
    )


@register(
    "pipeline_vocab_coverage",
    oracle="""
        WITH tok AS (
            SELECT lang, unnest(string_split(text, ' ')) AS tok
            FROM documents),
        cnt AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
        vocab AS (SELECT tok FROM cnt ORDER BY n DESC, tok LIMIT 100),
        j AS (SELECT t.lang,
                     CAST(v.tok IS NOT NULL AS BIGINT) AS in_vocab
              FROM tok t LEFT JOIN vocab v ON t.tok = v.tok)
        SELECT lang, COUNT(*) AS total_tokens,
               CAST(SUM(in_vocab) AS BIGINT) AS vocab_tokens,
               CAST(SUM(in_vocab) * 1000000 // COUNT(*) AS BIGINT)
                 AS coverage_ppm
        FROM j GROUP BY lang
    """,
)
def pipeline_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER VOCAB COVERAGE: build the top-100 corpus vocabulary
    (frequency desc, token asc tiebreak) and measure what fraction of
    each language's token stream it covers (exact ppm) — the
    OOV-rate check run before freezing a tokenizer on multilingual
    data.

    Plan: one explode + (tok) hash agg builds the frequency table;
    top-k is a sort-limit on the AGGREGATED vocab table (TakeOrdered,
    never a sort of the token stream); the 100-row vocab broadcasts
    into a left join against the exploded stream, and one (lang) agg
    emits coverage. Two scans of documents, no token-stream shuffle
    except the frequency agg (map-side combinable).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    cnt = tok.groupBy("tok").agg(F.count("*").alias("n"))
    vocab = cnt.orderBy(F.desc("n"), F.col("tok")).limit(100).select("tok")
    j = tok.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "tok", "left"
    ).select("lang", F.coalesce("in_vocab", F.lit(0)).cast("long").alias("in_vocab"))
    return j.groupBy("lang").agg(
        F.count("*").alias("total_tokens"),
        F.sum("in_vocab").alias("vocab_tokens"),
        F.expr(
            "CAST(SUM(in_vocab) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("coverage_ppm"),
    )


@register(
    "pipeline_feature_vector_assemble",
    oracle="""
        WITH p AS (
            SELECT user_id,
                   COUNT(*) FILTER (event_type = 'click') AS n_click,
                   COUNT(*) FILTER (event_type = 'error') AS n_error,
                   COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
                   COUNT(*) FILTER (event_type = 'signup') AS n_signup,
                   COUNT(*) FILTER (event_type = 'view') AS n_view,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                     AS value_cents
            FROM events GROUP BY user_id)
        SELECT user_id,
               [n_click, n_error, n_purchase, n_signup, n_view, value_cents]
                 AS feature_vec,
               n_click + n_error + n_purchase + n_signup + n_view AS n_events
        FROM p
    """,
)
def pipeline_feature_vector_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEATURE-STORE EXPORT: assemble one fixed-order integer feature
    vector per user (per-type event counts + total spend cents) as an
    ``array<bigint>`` column — the handoff shape ML training jobs
    consume (VectorAssembler semantics, done in pure SQL expressions).

    One hash agg on user_id with FILTER-clause conditional counts (no
    pivot shuffle, no second scan), then a codegen ``array()`` pack.
    Feature order is the explicit documented contract (alphabetical
    event types, then spend) — never derived from data order, so the
    vector layout is stable across runs and engines. Scale: single
    map-side-combinable agg keyed on user_id; the array pack is free.
    """
    ev = load_table(spark, sf_dir, "events")
    cnt = lambda t: F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
    p = ev.groupBy("user_id").agg(
        cnt("click"),
        cnt("error"),
        cnt("purchase"),
        cnt("signup"),
        cnt("view"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "value_cents"
        ),
    )
    return p.select(
        "user_id",
        F.array(
            "n_click", "n_error", "n_purchase", "n_signup", "n_view",
            "value_cents",
        ).alias("feature_vec"),
        (
            F.col("n_click") + F.col("n_error") + F.col("n_purchase")
            + F.col("n_signup") + F.col("n_view")
        ).alias("n_events"),
    )


@register(
    "pipeline_epoch_shuffle_plan",
    oracle="""
        SELECT doc_id,
               substr(md5('e1:' || CAST(doc_id AS VARCHAR)), 1, 2)
                 AS epoch1_shard,
               substr(md5('e2:' || CAST(doc_id AS VARCHAR)), 1, 2)
                 AS epoch2_shard,
               substr(md5('e1:' || CAST(doc_id AS VARCHAR)), 1, 2)
                 <> substr(md5('e2:' || CAST(doc_id AS VARCHAR)), 1, 2)
                 AS moved
        FROM documents
    """,
)
def pipeline_epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-EPOCH RESHUFFLE PLAN: every document gets a deterministic
    shard assignment per training epoch from a salted content-free hash
    (``md5(epoch:doc_id)``) — different epochs visit data in different
    order (the `moved` flag proves reassignment), yet any worker can
    recompute any epoch's plan with zero coordination, zero RNG state,
    and zero shuffle. This is the same no-`df.sample` discipline as
    `sample_hash_bucket`, extended from a one-time split to the
    epoch-indexed orderings a multi-epoch training run needs (resume a
    crashed epoch 7 mid-way: just re-derive its plan).

    Pure projection — embarrassingly parallel at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    shard = lambda e: F.substring(
        F.md5(F.concat(F.lit(f"{e}:"), F.col("doc_id").cast("string"))), 1, 2
    )
    return docs.select(
        "doc_id",
        shard("e1").alias("epoch1_shard"),
        shard("e2").alias("epoch2_shard"),
        (shard("e1") != shard("e2")).alias("moved"),
    )


@register(
    "pipeline_chat_format",
    oracle="""
        WITH split_doc AS (
            SELECT doc_id,
                   substr(text, 1, 120) AS prompt,
                   substr(text, 121) AS response
            FROM documents),
        r AS (
            SELECT doc_id,
                   '<|system|>' || chr(10) || 'You are a helpful assistant.'
                   || chr(10) || '<|user|>' || chr(10) || prompt || chr(10)
                   || '<|assistant|>' || chr(10) || response AS rendered
            FROM split_doc)
        SELECT doc_id, md5(rendered) AS rendered_md5,
               CAST(length(rendered) AS BIGINT) AS n_chars,
               CAST(len(string_split(rendered, ' ')) AS BIGINT) AS n_ws_tokens
        FROM r
    """,
)
def pipeline_chat_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAT-TEMPLATE RENDERING: split each document into a prompt
    (first 120 chars) and response, render the SFT conversation string
    (system / user / assistant role markers, newline-joined — the
    apply_chat_template step every instruction-tuning pipeline runs
    before tokenization), and emit content digest + length stats. The
    md5 makes the oracle grade the rendered BYTES, not just the shape —
    any drift in role markers, separators, or slicing is a hash
    mismatch.

    Pure codegen string projection, zero shuffle, embarrassingly
    parallel; newlines built with chr(10) on both engines so no
    escape-sequence parsing ambiguity exists.
    """
    docs = load_table(spark, sf_dir, "documents")
    nl = F.expr("char(10)")
    rendered = F.concat(
        F.lit("<|system|>"), nl, F.lit("You are a helpful assistant."),
        nl, F.lit("<|user|>"), nl, F.expr("substr(text, 1, 120)"),
        nl, F.lit("<|assistant|>"), nl, F.expr("substr(text, 121)"),
    )
    r = docs.select("doc_id", rendered.alias("rendered"))
    return r.select(
        "doc_id",
        F.md5("rendered").alias("rendered_md5"),
        F.length("rendered").cast("long").alias("n_chars"),
        F.size(F.split("rendered", " ")).cast("long").alias("n_ws_tokens"),
    )


@register(
    "pipeline_rag_chunking",
    oracle="""
        WITH c AS (
            SELECT doc_id, n_chars,
                   unnest(generate_series(
                       0,
                       greatest((n_chars - 51) // 150, 0))) AS chunk_idx
            FROM documents),
        s AS (
            SELECT c.doc_id, c.chunk_idx,
                   substr(d.text, CAST(c.chunk_idx * 150 + 1 AS INT), 200)
                     AS chunk
            FROM c JOIN documents d ON c.doc_id = d.doc_id)
        SELECT doc_id, chunk_idx,
               CAST(length(chunk) AS BIGINT) AS n_chars,
               md5(chunk) AS chunk_md5
        FROM s
    """,
)
def pipeline_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG CHUNKING: overlapping character windows (size 200, stride
    150 => 50-char overlap) per document with content digests — the
    retrieval-ingestion primitive between corpus and embedding model.
    Chunk count is ``1 + max((n_chars - overlap - 1) div stride, 0)``
    so the tail is always covered and a short doc yields exactly one
    chunk; md5 grades the chunk BYTES so an off-by-one in offsets is a
    driver-visible hash mismatch (the overlap region appearing in two
    chunks is exactly what makes offset bugs otherwise silent).

    One row in -> many out via sequence+explode, substring in codegen —
    zero shuffle, embarrassingly parallel, same family as
    `multimodal_frame_sample` (non-overlapping stride) but with the
    overlap semantics retrieval actually uses.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.expr("(n_chars - 51) div 150"), F.lit(0)
                ).cast("int"),
            )
        ).alias("chunk_idx"),
    )
    s = c.select(
        "doc_id",
        "chunk_idx",
        F.expr("substr(text, chunk_idx * 150 + 1, 200)").alias("chunk"),
    )
    return s.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.length("chunk").cast("long").alias("n_chars"),
        F.md5("chunk").alias("chunk_md5"),
    )


@register(
    "pipeline_mixture_temperature",
    oracle="""
        WITH s AS (SELECT source, COUNT(*) AS n FROM documents
                   GROUP BY source),
        t AS (SELECT source, n,
                     CAST(SUM(n) OVER () AS BIGINT) AS total,
                     CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
              FROM s)
        SELECT source, CAST(n AS BIGINT) AS n_docs,
               CAST(n * 1000000 // total AS BIGINT) AS natural_ppm,
               CAST(w * 1000000 // (SELECT CAST(SUM(w) AS BIGINT) FROM t)
                    AS BIGINT) AS tempered_ppm
        FROM t
    """,
)
def pipeline_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SCALED DATA MIXTURE (alpha = 0.5): reweight each
    source's natural sampling share by p^alpha and renormalize — the
    multilingual/multi-domain rebalancing trick (raise rare sources,
    damp dominant ones) every pretraining mixture uses. sqrt(integer)
    is IEEE-correctly-rounded on both engines (same convention as the
    Wilson-interval key), floored to integer weights before the exact
    ppm renormalization, so the tempered shares hash-match.

    One (source) hash agg; everything after runs on the O(sources)
    table (window total + 1-row weight sum).
    """
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count("*").alias("n"))
    wall = Window.partitionBy()
    t = s.select(
        "source",
        "n",
        F.sum("n").over(wall).cast("long").alias("total"),
        F.floor(F.sqrt(F.col("n").cast("double"))).cast("long").alias("w"),
    )
    return t.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.expr("CAST(n * 1000000 div total AS BIGINT)").alias("natural_ppm"),
        F.expr(
            "CAST(w * 1000000 div (SUM(w) OVER ()) AS BIGINT)"
        ).alias("tempered_ppm"),
    )


@register(
    "pipeline_interleave_sources",
    oracle="""
        WITH two AS (
            SELECT DISTINCT source FROM documents
            ORDER BY source LIMIT 2),
        d AS (
            SELECT doc_id, source,
                   CASE WHEN source = (SELECT MIN(source) FROM two)
                        THEN 0 ELSE 1 END AS stream_idx
            FROM documents WHERE source IN (SELECT source FROM two)),
        r AS (
            SELECT doc_id, source, stream_idx,
                   ROW_NUMBER() OVER (PARTITION BY stream_idx
                                      ORDER BY doc_id) AS rn
            FROM d)
        SELECT doc_id, source, CAST(stream_idx AS BIGINT) AS stream_idx,
               CAST((rn - 1) * 2 + stream_idx AS BIGINT) AS interleave_pos
        FROM r
    """,
)
def pipeline_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET INTERLEAVING: produce the deterministic round-robin
    training order over two corpus streams (the two lexicographically
    first sources) — stream A at even positions, stream B at odd —
    the `interleave_datasets` step that keeps a mixed-corpus training
    run from seeing sources in blocks. Positions are pure arithmetic
    on per-stream ranks ((rn-1)*2 + stream), so any worker can compute
    its slice of the order with no coordination and the order is
    stable under re-runs.

    One rank window per stream (both share the stream_idx partition
    key); the 2-row source pick broadcasts. At scale the per-stream
    rank is the only sort — same cost as writing the stream out.
    """
    docs = load_table(spark, sf_dir, "documents")
    two = (
        docs.select("source")
        .distinct()
        .orderBy("source")
        .limit(2)
        .withColumn(
            "stream_idx",
            (
                F.row_number().over(Window.orderBy("source")) - 1
            ).cast("long"),
        )
    )
    d = docs.join(F.broadcast(two), "source")
    r = d.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("stream_idx").orderBy("doc_id")
        ),
    )
    return r.select(
        "doc_id",
        "source",
        "stream_idx",
        ((F.col("rn") - 1) * 2 + F.col("stream_idx"))
        .cast("long")
        .alias("interleave_pos"),
    )


# ---------------------------------------- dataset version diff (round 4)


@register(
    "pipeline_dataset_diff",
    oracle="""
        WITH v2 AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 11 = 0 THEN text || ' rev2'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 13 != 0
            UNION ALL
            SELECT doc_id + 200000 AS doc_id, text
            FROM documents WHERE doc_id % 17 = 0
        ),
        j AS (
            SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN b.doc_id IS NULL THEN 'removed'
                        WHEN a.doc_id IS NULL THEN 'added'
                        WHEN md5(a.text) = md5(b.text) THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   COALESCE(length(b.text), 0)
                     - COALESCE(length(a.text), 0) AS char_delta
            FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
        )
        SELECT status, COUNT(*) AS n_docs,
               CAST(SUM(char_delta) AS BIGINT) AS char_delta,
               MIN(doc_id) AS first_doc_id
        FROM j GROUP BY status
    """,
)
def pipeline_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET VERSION DIFF — the data-version-control audit every
    corpus release runs: compare v1 and v2 of the corpus by stable key
    and content hash and classify every doc added / removed / changed /
    unchanged, with the aggregate character drift. v2 is derived
    deterministically in-plan (every 13th doc dropped, every 11th
    revised, every 17th re-added under a new id) so both engines diff
    identical inputs.

    Plan: one full outer join on the id (both sides id-partitioned —
    the exchange is reused), content equality via md5 so the compare
    shuffles 32-byte digests, never the text; one 4-row status rollup.
    At 100 TB this runs as the release gate between dataset snapshots
    — the full outer join is the only exchange, and on
    id-bucketed/Iceberg tables it degrades to a zipper merge with no
    shuffle at all.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v2 = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat("text", F.lit(" rev2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionAll(
        docs.filter(F.col("doc_id") % 17 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"), "text"
        )
    )
    a = docs.select(
        F.col("doc_id").alias("id_a"), F.md5("text").alias("h_a"),
        F.length("text").alias("len_a"),
    )
    b = v2.select(
        F.col("doc_id").alias("id_b"), F.md5("text").alias("h_b"),
        F.length("text").alias("len_b"),
    )
    j = a.join(b, a.id_a == b.id_b, "full_outer").select(
        F.coalesce("id_a", "id_b").alias("doc_id"),
        F.when(F.col("id_b").isNull(), F.lit("removed"))
        .when(F.col("id_a").isNull(), F.lit("added"))
        .when(F.col("h_a") == F.col("h_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        (
            F.coalesce("len_b", F.lit(0)) - F.coalesce("len_a", F.lit(0))
        ).alias("char_delta"),
    )
    return j.groupBy("status").agg(
        F.count("*").alias("n_docs"),
        F.sum("char_delta").cast("long").alias("char_delta"),
        F.min("doc_id").alias("first_doc_id"),
    )


# -------------------------------------------- curriculum phases (round 4)


@register(
    "pipeline_curriculum_phases",
    oracle="""
        WITH d AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))
                     AS n_words,
                   length(replace(text, ' ', '')) AS n_letters
            FROM documents),
        s AS (SELECT *,
                     CAST(n_letters * 1000000 // n_words AS BIGINT)
                       AS difficulty_ppm
              FROM d WHERE n_words > 0),
        p AS (SELECT *,
                     ntile(3) OVER (ORDER BY difficulty_ppm, doc_id)
                       AS phase
              FROM s)
        SELECT CAST(phase AS BIGINT) AS phase,
               COUNT(*) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS n_tokens,
               MIN(difficulty_ppm) AS min_difficulty_ppm,
               MAX(difficulty_ppm) AS max_difficulty_ppm
        FROM p GROUP BY phase
    """,
)
def pipeline_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM-LEARNING PHASES: order the corpus by an integer
    difficulty proxy (mean word length in letters-per-word ppm — short
    words first) and cut it into 3 equal-count training phases with
    per-phase token budgets — the easy→hard schedule curriculum
    training feeds its dataloader.

    The difficulty score is exact integer arithmetic (letters*1e6 div
    words); the phase cut is a deterministic ntile over (score, doc_id)
    — at 100 TB the global ntile becomes a 2-pass quantile cut (sample
    the score distribution, broadcast the 2 cut points, one map-side
    phase label), same output contract. One window + one hash agg.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("n_words"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_letters"),
    ).filter(F.col("n_words") > 0)
    s = d.withColumn(
        "difficulty_ppm",
        F.expr("CAST(n_letters * 1000000 div n_words AS BIGINT)"),
    )
    p = s.withColumn(
        "phase",
        F.ntile(3).over(Window.orderBy("difficulty_ppm", "doc_id")),
    )
    return p.groupBy(F.col("phase").cast("long").alias("phase")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_tokens"),
        F.min("difficulty_ppm").alias("min_difficulty_ppm"),
        F.max("difficulty_ppm").alias("max_difficulty_ppm"),
    )


# ------------------------------------- T5 span-corruption plan (round 4)


@register(
    "pipeline_span_corruption",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))
                     AS n_tokens
            FROM documents),
        m AS (
            SELECT doc_id, n_tokens,
                   n_tokens // 10 AS q, n_tokens % 10 AS r
            FROM d WHERE n_tokens > 0)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(q + CASE WHEN r > 0 THEN 1 ELSE 0 END AS BIGINT)
                 AS n_spans,
               CAST(q * 3 + CASE WHEN r > 0 THEN least(r, 3) ELSE 0 END
                    AS BIGINT) AS n_masked,
               CAST((q * 3 + CASE WHEN r > 0 THEN least(r, 3) ELSE 0 END)
                    * 1000000 // n_tokens AS BIGINT) AS mask_ppm
        FROM m
    """,
)
def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-CORRUPTION masking plan (the T5/UL2 denoising objective):
    every 10-token block masks its first 3 tokens (span length 3,
    ~30% corruption), computed CLOSED-FORM per doc — n_spans, masked
    token count, and the exact realized mask rate in ppm. The
    dataloader contract a span-corruption trainer consumes; emitting
    the plan (not the masked text) keeps the row narrow and the
    numbers integer-exact.

    Pure codegen projection — token count once per doc, then integer
    div/mod arithmetic; zero shuffle, trivially linear at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias(
            "n_tokens"
        ),
    ).filter(F.col("n_tokens") > 0)
    return d.selectExpr(
        "doc_id",
        "CAST(n_tokens AS BIGINT) AS n_tokens",
        "CAST(n_tokens div 10 + CASE WHEN n_tokens % 10 > 0 THEN 1 ELSE 0 END"
        " AS BIGINT) AS n_spans",
        "CAST((n_tokens div 10) * 3 + CASE WHEN n_tokens % 10 > 0"
        " THEN least(n_tokens % 10, 3) ELSE 0 END AS BIGINT) AS n_masked",
        "CAST(((n_tokens div 10) * 3 + CASE WHEN n_tokens % 10 > 0"
        " THEN least(n_tokens % 10, 3) ELSE 0 END) * 1000000 div n_tokens"
        " AS BIGINT) AS mask_ppm",
    )


# ----------------------------------- dedup rate report (round 4)


@register(
    "pipeline_dedup_rate_report",
    oracle="""
        WITH k AS (
            SELECT source, md5(text) AS h, MIN(doc_id) AS keeper,
                   COUNT(*) AS copies
            FROM documents GROUP BY source, md5(text))
        SELECT source,
               CAST(SUM(copies) AS BIGINT) AS n_docs_in,
               COUNT(*) AS n_docs_out,
               CAST(SUM(copies) - COUNT(*) AS BIGINT) AS n_removed,
               CAST((SUM(copies) - COUNT(*)) * 1000000 // SUM(copies)
                    AS BIGINT) AS removal_ppm,
               CAST(MAX(copies) AS BIGINT) AS worst_copy_count
        FROM k GROUP BY source
    """,
)
def pipeline_dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP RATE REPORT per source: in/out doc counts, removal ppm,
    and the worst single duplicate family — the one-page summary every
    corpus release notes ship ('source X was 31% duplicates, dominated
    by one boilerplate page'). Built ON the exact-hash keeper grain
    (same semantics as `dedup_exact_hash`), rolled up per source, so
    the report and the dedup pass can never disagree.

    One (source, hash) hash agg + one per-source rollup, both map-side
    partial; report size = |sources| rows at any corpus scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    k = docs.groupBy("source", F.md5("text").alias("h")).agg(
        F.count("*").alias("copies")
    )
    return k.groupBy("source").agg(
        F.sum("copies").cast("long").alias("n_docs_in"),
        F.count("*").alias("n_docs_out"),
        (F.sum("copies") - F.count("*")).cast("long").alias("n_removed"),
        F.expr(
            "CAST((SUM(copies) - COUNT(*)) * 1000000 div SUM(copies)"
            " AS BIGINT)"
        ).alias("removal_ppm"),
        F.max("copies").cast("long").alias("worst_copy_count"),
    )
