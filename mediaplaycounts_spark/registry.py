"""Registry of graded operators.

Every operator from SURVEY.md §2 registers here via :func:`register`:
a ``(spark, sf_dir) -> DataFrame`` callable plus, when the semantics are
ANSI-SQL-expressible, a DuckDB oracle SQL string over the pre-registered
views (``region nation customer supplier part orders lineitem events
documents embeddings``). ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry.

Conventions (driver contract, __spark_entry__.py:22-38):

- Alias every computed column identically in the Spark plan and the
  oracle SQL — the driver's compare matches columns by name.
- Stabilize float aggregates on BOTH sides: sums/averages of doubles go
  through DECIMAL(18,2) cents-exact arithmetic, cosine math is done in
  float64 in identical element order, and residual float outputs are
  rounded identically (SURVEY.md §2 FP note).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Quantitative bound check for oracle-less keys: given (spark, sf_dir,
#: result_df), raise AssertionError on violation, else return a short
#: human-readable statement of what was asserted.
BoundFn = Callable[[SparkSession, str, DataFrame], str]

_REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Production:
    """PRODUCTION-PATH metadata for a key whose REGISTERED plan embeds a
    grading harness (exact twin, in-plan recall floor, …) that exists
    only so the driver can value-check it — at 100 TB only the raw
    operator would run (VERDICT r8 next #4: the twin/production split is
    structural since r8, so the registry states it as first-class
    metadata instead of BASELINE.md prose).

    ``key`` is the bench label the production number is recorded under
    (bench_reference.json / BENCH_rN.json "production" section — the
    numbers a 100 TB reader should quote); ``fn`` is the raw
    ``(spark, sf_dir) -> DataFrame`` path (None at register time = "the
    registered fn IS the production shape", resolved by the decorator);
    ``time_build`` marks callables that do eager work (checkpoint_df
    lineage cuts) during CONSTRUCTION, which bench must time fn-call +
    write together."""

    key: str
    fn: QueryFn | None = None
    time_build: bool = False


@dataclass(frozen=True)
class Query:
    key: str
    fn: QueryFn
    oracle: str | None = None
    bound: BoundFn | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    production: Production | None = None


def register(
    key: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bound: BoundFn | None = None,
    production: Production | None = None,
):
    """Decorator: register a graded query under ``key``.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator (the
    driver falls back to a rows-only check); such keys should supply a
    ``bound`` — a quantitative assertion (error tolerance, recall floor,
    separation margin) that tools/check_correctness.py runs in place of
    the value oracle, so "no ANSI twin" never means "unchecked".

    ``production`` tags keys whose registered plan embeds a grading
    harness with the raw production path bench should time separately
    (see :class:`Production`).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in _REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        prod = production
        if prod is not None and prod.fn is None:
            import dataclasses

            prod = dataclasses.replace(prod, fn=fn)
        _REGISTRY[key] = Query(
            key=key, fn=fn, oracle=oracle, bound=bound, tags=tuple(tags),
            production=prod,
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import side effect populates the registry exactly once.
    import mediaplaycounts_spark.queries  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {k: q.fn for k, q in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {k: q.oracle for k, q in sorted(_REGISTRY.items()) if q.oracle is not None}


def get(key: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[key]


def production_paths() -> dict[str, Production]:
    """{bench_label: Production} over every key that declares one —
    the table bench.py times as its "production" section. Labels are
    asserted unique at collection time (two keys must not record under
    one bench label)."""
    _ensure_loaded()
    out: dict[str, Production] = {}
    for q in sorted(_REGISTRY.values(), key=lambda q: q.key):
        if q.production is None:
            continue
        if q.production.key in out:
            raise ValueError(
                f"duplicate production bench label {q.production.key!r} "
                f"(second declarer: {q.key})"
            )
        out[q.production.key] = q.production
    return out
