"""Semantics tests for TF-IDF top terms and URL-canonicalization dedup
(value parity vs DuckDB runs via tools/check_correctness.py)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def test_tfidf_topterms_structure(spark, queries):
    rows = queries["text_tfidf_topterms"](spark, SF_SMOKE).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
        # The integer-surrogate score is exactly tf * 1e6 div df.
        assert r.score == (r.tf * 1_000_000) // r.df
        assert r.tf > 0 and r.df > 0
    for lang, rs in by_lang.items():
        assert len(rs) == 10, lang
        scores = sorted((r.score for r in rs), reverse=True)
        assert scores[0] >= scores[-1]


def test_url_canonical_covers_all_docs_and_normalizes(spark, queries):
    from mediaplaycounts_spark.tables import load_table

    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    rows = queries["dedup_url_canonical"](spark, SF_SMOKE).collect()
    assert sum(r.n_dupes for r in rows) == n_docs
    for r in rows:
        u = r.canon_url
        assert u == u.lower()
        assert "#" not in u and "utm_" not in u
        assert not u.endswith("/")
        assert u.startswith("https://")
        assert r.keeper_id >= 0
