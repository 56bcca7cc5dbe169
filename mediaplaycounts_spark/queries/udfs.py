"""§2.H UDF / UDAF / UDTF surface.

The reference is 100% arbitrary Python (REF LogProcessor / GetData), so
the engine needs an escape hatch — but a disciplined one:

- `udf_scalar_py` demonstrates the row-at-a-time Python UDF and is
  deliberately the ONLY one in the repo: it breaks codegen and pays a
  per-row Python round-trip (documented last resort).
- Everything else is Arrow-vectorized: pandas_udf scalar (SIMD over
  batches), pandas_udf grouped-agg, and applyInPandas grouped-map.

Determinism for oracle hashing: grouped results use exact integer
arithmetic where sums are involved (cents-quantized norms; integer
sums for moments) so values match DuckDB bit-for-bit; see docstrings.
"""

from __future__ import annotations

import pandas as pd
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as STypes

from mediaplaycounts_spark.operators import similarity as S
from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table


@register(
    "udf_scalar_py",
    oracle="""
        SELECT event_id, event_type,
               CASE WHEN event_type IN ('view', 'click') THEN 'engagement'
                    WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                    ELSE 'ops' END AS category
        FROM events
    """,
)
def udf_scalar_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (media-type-classifier analog).

    LAST RESORT by policy: breaks whole-stage codegen and serializes
    every row through Py4J-adjacent pickling. Kept as the surface's
    existence proof; the same logic belongs in F.when (see oracle).
    """

    @F.udf(returnType=STypes.StringType())
    def classify(event_type: str) -> str:
        if event_type in ("view", "click"):
            return "engagement"
        if event_type in ("purchase", "signup"):
            return "conversion"
        return "ops"

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "event_type", classify("event_type").alias("category"))


_COS_PROBE = S.COSINE_SQL.format(a="e.embedding", b="p.embedding")


@register(
    "udf_pandas_scalar",
    oracle=f"""
        WITH p AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, round({_COS_PROBE}, 6) AS cos_sim
        FROM embeddings e, p
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF: cosine vs a broadcast probe vector.

    Computes in float64 with a sequential accumulation (matching the
    oracle's fold order) over numpy column stacks — one Arrow batch per
    invocation, ~100x a row-at-a-time UDF.
    """
    em = load_table(spark, sf_dir, "embeddings")
    probe = S.probe_vector(em, "vec_id", "embedding", 0)

    @F.pandas_udf("double")
    def cos_probe(vecs: pd.Series) -> pd.Series:
        import numpy as np

        p = np.asarray(probe, dtype="float64")
        pn = np.sqrt(np.add.reduce(p * p))
        mat = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        # np.add.reduce along axis 0 of the transposed products keeps
        # sequential left-to-right accumulation (bit-matches list_reduce)
        dots = np.add.reduce(mat * p, axis=1)
        norms = np.sqrt(np.add.reduce(mat * mat, axis=1))
        return pd.Series(np.round(dots / (norms * pn), 6))

    return em.select("vec_id", cos_probe("embedding").alias("cos_sim"))


@register(
    "udaf_pandas_grouped",
    oracle="""
        SELECT CAST(label AS BIGINT) AS label,
               CAST(SUM(CAST(floor(sqrt(list_reduce(list_prepend(0.0,
                        list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                        (a, b) -> a + b)) * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                 / (100 * COUNT(*)) AS mean_norm
        FROM embeddings GROUP BY label
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregate (pandas_udf GROUPED_AGG): mean L2 norm.

    Norms are quantized to cents (round(norm*100) as int64) before the
    group sum, making the aggregation order-independent integer math —
    the float mean then divides two exact values, so it hash-matches the
    oracle regardless of partitioning.
    """

    @F.pandas_udf("double")
    def mean_norm_cents(vecs: pd.Series) -> float:
        import numpy as np

        mat = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        norms = np.sqrt(np.add.reduce(mat * mat, axis=1))
        # floor(x+0.5): half-away-from-zero for positive norms, matching
        # the oracle's floor(x*100+0.5) exactly (np.round is half-to-even)
        cents = np.floor(norms * 100 + 0.5).astype("int64")
        return float(cents.sum()) / (100 * len(cents))

    em = load_table(spark, sf_dir, "embeddings")
    # NB: a GROUPED_AGG pandas UDF cannot be mixed with JVM aggregates
    # in the same .agg() — keep the aggregation pandas-only.
    return em.groupBy(F.col("label").cast("long").alias("label")).agg(
        mean_norm_cents("embedding").alias("mean_norm")
    )


@register(
    "udtf_grouped_map",
    oracle="""
        WITH stats AS (
            SELECT lang,
                   CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mu,
                   CAST(SUM(n_chars * n_chars) AS DOUBLE) / COUNT(*) AS m2
            FROM documents GROUP BY lang
        )
        SELECT d.doc_id, d.lang, d.n_chars,
               round((d.n_chars - s.mu) / sqrt(s.m2 - s.mu * s.mu), 4) AS z
        FROM documents d JOIN stats s ON d.lang = s.lang
    """,
)
def udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map transform (applyInPandas): per-lang z-score normalize.

    Moments come from exact integer sums (int64), then identical double
    operations to the oracle (mu = sx/n, sd = sqrt(m2 - mu^2)) — so z
    values are bit-equal before the final rounding.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        x = pdf["n_chars"]
        n = len(x)
        sx = int(x.sum())
        sxx = int((x * x).sum())
        mu = float(sx) / n
        m2 = float(sxx) / n
        sd = math.sqrt(m2 - mu * mu)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "n_chars": x,
                "z": [round((float(v) - mu) / sd, 4) for v in x],
            }
        )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", "n_chars").groupBy("lang").applyInPandas(
        zscore, "doc_id bigint, lang string, n_chars bigint, z double"
    )


# ------------------------------------------------ Python UDTF (Spark 3.5+)


@register(
    "udtf_lateral_split",
    oracle="""
        WITH toks AS (SELECT doc_id,
                             string_split(text, ' ') AS t
                      FROM documents),
        idx AS (SELECT doc_id, t,
                       unnest(range(0, (len(t) + 19) // 20)) AS span_idx
                FROM toks)
        SELECT doc_id, span_idx,
               array_to_string(
                   list_slice(t, span_idx * 20 + 1, span_idx * 20 + 20), ' ')
                 AS span_text,
               CAST(least(20, len(t) - span_idx * 20) AS BIGINT) AS n_words
        FROM idx
    """,
)
def udtf_lateral_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+ `@udtf`) applied LATERALLY: each document
    row expands into 20-word spans through a real Python table function
    — the arbitrary-fanout escape hatch (parsers, segmenters) that
    `explode` can't express when the expansion logic is imperative.
    Registered and invoked through SQL `LATERAL`, so it composes with
    the relational layer like any table.

    One row-wise Python process per executor core; at 100 TB prefer the
    codegen'd higher-order chunking (`dedup_paragraphs`) when the
    expansion IS expressible — this key exists for when it isn't."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="span_idx bigint, span_text string, n_words bigint")
    class SpanSplitter:
        def eval(self, text: str):  # noqa: ANN001
            words = text.split(" ")
            n_spans = (len(words) + 19) // 20
            for i in range(n_spans):
                span = words[i * 20 : (i + 1) * 20]
                yield i, " ".join(span), len(span)

    spark.udtf.register("span_splitter", SpanSplitter)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.span_idx, s.span_text, s.n_words
        FROM docs_udtf d, LATERAL span_splitter(d.text) s
        """
    )


# ------------------------------------------- Arrow-optimized Python UDF


@register(
    "udf_arrow_optimized",
    oracle="""
        SELECT doc_id,
               CAST(length(regexp_replace(text, '[aeiou]', '', 'g'))
                    AS BIGINT) AS n_consonant_chars
        FROM documents
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 `useArrow=True`):
    row-at-a-time author ergonomics, Arrow-batched transfer under the
    hood — the middle ground between the legacy pickled UDF
    (`udf_scalar_py`, ~10-100x slower wire format) and the fully
    vectorized pandas UDF (`udf_pandas_scalar`). Same imperative
    Python body, an order of magnitude less serialization overhead.

    Still Python-side work — the plan shows ArrowEvalPython, not
    codegen; prefer built-ins when expressible (PLAN_AUDIT.md)."""
    docs = load_table(spark, sf_dir, "documents")

    @F.udf(returnType="bigint", useArrow=True)
    def consonant_chars(text: str) -> int:
        return sum(1 for ch in text if ch not in "aeiou")

    return docs.select(
        "doc_id", consonant_chars("text").alias("n_consonant_chars")
    )


@register(
    "udaf_pandas_window",
    oracle="""
        WITH c AS (
            SELECT CAST(label AS BIGINT) AS label, vec_id,
                   CAST(floor(sqrt(list_reduce(list_prepend(0.0,
                        list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                        (a, b) -> a + b)) * 100 + 0.5) AS BIGINT) AS cents
            FROM embeddings)
        SELECT label, vec_id,
               CAST(SUM(cents) OVER w AS DOUBLE)
                 / (100 * COUNT(*) OVER w) AS rolling_mean_norm
        FROM c
        WINDOW w AS (PARTITION BY label ORDER BY vec_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def udaf_pandas_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM aggregate as a WINDOW function (pandas_udf GROUPED_AGG
    over a bounded frame): trailing-5-row mean L2 norm per label — the
    escape hatch when a rolling metric has no built-in aggregate. Each
    frame's vectors arrive as one Arrow batch; norms are cents-quantized
    int64 before summing, so the frame result is order-independent and
    hash-matches the windowed-SQL oracle.

    Scale: same shuffle/sort as any ranking window (one per label
    partition); the Python cost is per-frame Arrow transfer — bounded
    frames only (unbounded ones re-send the whole partition per row;
    use the native cumulative aggregates for those)."""

    @F.pandas_udf("double")
    def mean_norm_cents(vecs: pd.Series) -> float:
        import numpy as np

        mat = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        norms = np.sqrt(np.add.reduce(mat * mat, axis=1))
        # floor(x+0.5): half-away-from-zero for positive norms, matching
        # the oracle's floor(x*100+0.5) exactly (np.round is half-to-even)
        cents = np.floor(norms * 100 + 0.5).astype("int64")
        return float(cents.sum()) / (100 * len(cents))

    em = load_table(spark, sf_dir, "embeddings")
    w = (
        Window.partitionBy(F.col("label").cast("long"))
        .orderBy("vec_id")
        .rowsBetween(-4, 0)
    )
    return em.select(
        F.col("label").cast("long").alias("label"),
        "vec_id",
        mean_norm_cents("embedding").over(w).alias("rolling_mean_norm"),
    )


@register(
    "udf_map_in_arrow",
    oracle="""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT)
                 AS n_upper
        FROM documents
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` kernel: per-batch compute DIRECTLY on pyarrow
    RecordBatches with pyarrow.compute — no pandas materialization at
    all (one conversion fewer than a pandas UDF; strings never become
    Python objects). The kernel is pure columnar: byte length, token
    count via split+list-length, uppercase count via a vectorized
    regex — all exact integers, so the DuckDB oracle hash-matches.

    This is the lowest-overhead Python escape hatch Spark offers: Arrow
    IPC in, Arrow IPC out, zero-copy on the JVM side. Use it when a
    kernel is expressible in pyarrow.compute/numpy-on-buffers; fall
    back to pandas UDFs only when pandas semantics (e.g. groupby state)
    are genuinely needed. Embarrassingly parallel — no shuffle.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def kernel(batches):
        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")),
                        pa.int64(),
                    ),
                    pc.cast(
                        pc.count_substring_regex(text, "[A-Z]"), pa.int64()
                    ),
                ],
                names=["doc_id", "n_bytes", "n_ws_tokens", "n_upper"],
            )

    return docs.mapInArrow(
        kernel, "doc_id long, n_bytes long, n_ws_tokens long, n_upper long"
    )


@register(
    "udf_pandas_iter",
    oracle="""
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS n_tokens_est,
               md5(text) AS content_md5
        FROM documents
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATOR-form pandas UDF (`Iterator[pd.Series] ->
    Iterator[pd.Series]`): the variant for UDFs with EXPENSIVE one-time
    setup (model load, tokenizer init, dictionary mmap) — the setup
    runs once per PARTITION, then streams Arrow batches through,
    instead of re-paying it per batch as a plain pandas UDF would.
    Here the 'model' is a trivial counter + hashlib, so the oracle can
    replay the math; swap in a real tokenizer and the plan shape,
    batch flow, and per-partition amortization are identical.

    Plan: ArrowEvalPython over streamed batches, zero shuffle.
    """
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def token_est(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time "model" setup, amortized across all batches
        sep = " "
        for s in it:
            yield s.str.count(sep).add(1).astype("int64")

    @pandas_udf("string")
    def content_md5(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        h = hashlib.md5  # bound once
        for s in it:
            yield s.map(lambda t: h(t.encode()).hexdigest())

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_est("text").alias("n_tokens_est"),
        content_md5("text").alias("content_md5"),
    )
