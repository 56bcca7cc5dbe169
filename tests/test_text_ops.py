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


def test_paragraph_dedup_strips_boilerplate_except_first_host(spark, queries):
    from mediaplaycounts_spark.queries.curation import _BOILERPLATE_SQL  # noqa: F401

    bps = {
        0: "please subscribe to our daily newsletter and follow us today",
        1: "all rights reserved please contact the publisher for reuse terms",
        2: "click here to read the full article on our site",
    }
    rows = queries["dedup_paragraphs"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for residue, bp in bps.items():
        hosts = [r.doc_id for r in rows if bp in r.clean_text]
        keeper = min(r.doc_id for r in rows if r.doc_id % 3 == residue)
        assert hosts == [keeper], (residue, hosts[:5])
    for r in rows:
        assert r.n_kept <= r.n_paras
        # Every non-keeper loses at least its boilerplate paragraph.
        if r.doc_id not in {min(x.doc_id for x in rows if x.doc_id % 3 == k) for k in bps}:
            assert r.n_kept <= r.n_paras - 1, r.doc_id


def test_audio_chunks_window_hop_arithmetic(spark, queries):
    from mediaplaycounts_spark.tables import load_table

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    rows = queries["multimodal_audio_chunks"](spark, SF_SMOKE).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, chunks in by_doc.items():
        L = len(texts[doc_id])
        assert len(chunks) == (max(L - 64, 0) + 31) // 32 + 1
        chunks.sort(key=lambda r: r.chunk_idx)
        for i, c in enumerate(chunks):
            assert c.start_char == i * 32
            assert c.n_chars == min(64, L - i * 32)


def test_rarity_score_bounds(spark, queries):
    from mediaplaycounts_spark.tables import load_table

    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    rows = queries["text_rarity_score"](spark, SF_SMOKE).collect()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 < r.rarity_score <= r.n_tokens * 1_000_000


def test_mmr_selection_invariants(spark, queries):
    rows = sorted(
        queries["sim_mmr_diversify"](spark, SF_SMOKE).collect(),
        key=lambda r: r.sel_rank,
    )
    assert [r.sel_rank for r in rows] == [1, 2, 3]
    assert len({r.vec_id for r in rows}) == 3
    # Rank 1 is pure relevance (the probe itself, cos=1.0 to vec 0).
    assert rows[0].mmr_score == rows[0].rel == 1.0
    # Later picks pay a similarity penalty: score <= lambda * rel.
    for r in rows[1:]:
        assert r.mmr_score <= 0.7 * r.rel + 1e-9


def test_containment_catches_embedded_doc(spark):
    """A short doc fully embedded in a long one: containment_ab = 1.0
    even though Jaccard is diluted below threshold."""
    from mediaplaycounts_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta"
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short, "en"), (2, long_, "en")], "doc_id long, text string, lang string"
    )
    rows = containment_pairs(df, "doc_id", "text", "lang", threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment_ab == 1.0  # every 2-gram of the short doc is in the long
    assert r.containment_ba < 0.2


def test_dup_ngram_fraction_extremes(spark):
    """dup_ppm is the exact floored-ppm of (n_grams - n_distinct)/n_grams
    for every doc, and stays in [0, 1e6)."""
    import __spark_entry__  # registry import side effect  # noqa: F401
    import tests.conftest as c
    from mediaplaycounts_spark.registry import get

    res = get("text_dup_ngram_fraction").fn(spark, c.SF_SMOKE)
    rows = res.collect()
    assert rows and all(0 <= r.dup_ppm < 1_000_000 for r in rows)
    assert all(
        r.dup_ppm == (r.n_grams - r.n_distinct) * 1_000_000 // r.n_grams
        for r in rows
    )
