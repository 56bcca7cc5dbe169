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


def test_production_tags_cover_the_twin_bearing_keys(spark):
    """r9 (VERDICT r8 next #4): the twin/production split is registry
    metadata — every key whose registered plan embeds a grading harness
    declares its raw production path, labels are unique, and each raw
    path builds a DataFrame under a vanilla session (bench consumes
    exactly this table)."""
    from mediaplaycounts_spark import registry

    prods = registry.production_paths()
    assert set(prods) == {
        "prod_minhash_pairs",
        "prod_simhash_pairs",
        "prod_ann_lsh",
        "prod_ann_lsh_multiprobe",
        "prod_ann_ivf",
        "prod_ann_pq",
        "prod_e2e_curation",
    }
    assert prods["prod_e2e_curation"].time_build
    assert prods["prod_e2e_curation"].fn is registry.get(
        "pipeline_e2e_curation"
    ).fn  # fn=None at register time resolves to the registered fn
    # cheap plan-build smoke for the non-eager paths (e2e is eager —
    # covered by bench/test_e2e_curation)
    for label, p in prods.items():
        if not p.time_build:
            df = p.fn(spark, SF_SMOKE)
            assert df.columns, label
