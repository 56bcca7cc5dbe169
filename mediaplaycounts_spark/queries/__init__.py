"""Graded operator implementations (SURVEY.md §2 inventory).

Importing this package populates :mod:`mediaplaycounts_spark.registry`.
Modules are grouped by §2 section:

- scans        — §2.A scans / sources / sinks
- expressions  — §2.B projection / filter / scalar expressions
- joins        — §2.C joins
- aggregates   — §2.D aggregation
- windows      — §2.E window functions
- setops       — §2.F sort / limit / set operations
- streaming    — §2.G structured-streaming operators (+ batch twins)
- udfs         — §2.H UDF / UDAF / UDTF surface
- llm          — §2.I LLM-data-pipeline operators (dedup, similarity,
                 multimodal, text analysis)
- pipeline     — §2.J training-pipeline extensions (hash split, cube,
                 n-grams, kNN join)
- analytics    — §2.J log-analytics classics (cohort retention, funnel,
                 exact-moment variance)
- curation     — §2.J corpus curation (PII redaction, Gopher quality,
                 rank-band filter, stratified sample, contamination)
- modern       — §2.J Spark-4 surface (max_by argmax, unpivot melt,
                 VariantType JSON access)
- timeseries   — §2.J time-series repair (integer-exact gap-fill
                 interpolation, 3-sigma anomaly flags)
- storage      — §2.J storage layout (Z-order clustering, ORC scan,
                 dynamic partition pruning)
- graph        — §2.J graph propagation (integer-exact PageRank)
- advanced     — §2.J advanced surface (recursive CTE, XML scan,
                 rolling distinct, sweep-line concurrency, triangles,
                 exact mode/skewness, FILTER-clause aggregates)
- statistics   — §2.J statistical surface (multi-distinct, kurtosis,
                 entropy, rolling median, value RANGE frames, weekly
                 resample, Zipf fit)
"""

from mediaplaycounts_spark.queries import (  # noqa: F401
    advanced,
    aggregates,
    analytics,
    curation,
    expressions,
    graph,
    joins,
    llm,
    modern,
    pipeline,
    scans,
    setops,
    statistics,
    storage,
    streaming,
    timeseries,
    udfs,
    windows,
)
