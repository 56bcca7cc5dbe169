"""Registry contract tests: every graded query runs at sf0.001 with a
stable schema, and every oracle is valid DuckDB SQL producing the same
row count + columns (the full value-hash mirror runs via
tools/check_correctness.py at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


def test_every_query_key_has_callable():
    assert len(QUERIES) >= 70
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_query_runs_and_matches_oracle_shape(spark, duck, key):
    sdf = QUERIES[key](spark, SF_SMOKE)
    spark_rows = sdf.count()
    assert spark_rows >= 0
    if key in ORACLES:
        rel = duck.execute(ORACLES[key])
        duck_df = rel.fetchdf()
        assert sorted(c.lower() for c in sdf.columns) == sorted(
            c.lower() for c in duck_df.columns
        ), f"{key}: column mismatch"
        assert spark_rows == len(duck_df), f"{key}: row count mismatch"
