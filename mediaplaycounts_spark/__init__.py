"""mediaplaycounts_spark — a PySpark-native log-analytics engine.

A brand-new engine with the query and data-processing capabilities of
``harej/mediaplaycounts`` (Wikimedia media playcount analytics: daily
dump ingest -> parse/filter -> per-file-per-day aggregate -> date-range /
rolling-window / category query API), re-expressed Spark-first and
extended with large-scale training-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis).

Design notes (SURVEY.md is the blueprint; the reference mount was empty
at survey time, so reference anchors are cited as ``REF module::symbol``
per SURVEY.md §0):

- Everything is a DataFrame with an explicit schema; the logical plan is
  declared via the DataFrame/SQL API and Catalyst/Tungsten pick the
  physical strategy. No RDDs.
- Python UDFs only where built-ins genuinely cannot express the
  semantics, and then always Arrow-vectorized (pandas_udf /
  applyInPandas / mapInPandas).
- Every graded operator lives in :mod:`mediaplaycounts_spark.queries`
  and registers a ``(spark, sf_dir) -> DataFrame`` callable plus (where
  SQL-expressible) a DuckDB oracle through
  :mod:`mediaplaycounts_spark.registry`.
"""

from mediaplaycounts_spark.session import get_spark, configure
from mediaplaycounts_spark.tables import load_table, load_tables, TABLES

__all__ = ["get_spark", "configure", "load_table", "load_tables", "TABLES"]
__version__ = "0.1.0"
