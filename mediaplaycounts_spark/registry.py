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
class Query:
    key: str
    fn: QueryFn
    oracle: str | None = None
    bound: BoundFn | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    key: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bound: BoundFn | None = None,
):
    """Decorator: register a graded query under ``key``.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator (the
    driver falls back to a rows-only check); such keys should supply a
    ``bound`` — a quantitative assertion (error tolerance, recall floor,
    separation margin) that tools/check_correctness.py runs in place of
    the value oracle, so "no ANSI twin" never means "unchecked".
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in _REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        _REGISTRY[key] = Query(
            key=key, fn=fn, oracle=oracle, bound=bound, tags=tuple(tags)
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
