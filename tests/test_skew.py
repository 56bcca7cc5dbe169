"""Skew-robustness proofs for the dedup/graph path (VERDICT r2 #4).

The graded sf* fixtures are benign; real corpora are Zipfian. These
tests run the REGISTERED keys (not reimplementations) against a
deliberately skewed corpus written to a scratch sf-dir:

- one lang ('en') holds 80% of documents;
- one hot paragraph is planted verbatim in 1,000 documents (the
  boilerplate-banner pathology paragraph dedup exists for);
- near-dup families concentrated inside the hot lang (the worst case
  for lang-blocked pair generation);
- one hot supplier participates in 80% of lineitem rows (a hub node
  for pagerank, a hot key for the salted join).

Assertions: the keys still produce correct results (the in-plan
within_bound grading and closed-form expectations) AND their physical
plans stay inside the same shuffle ceilings the benign-plan audit
enforces — skew must not change the plan shape, only the data
distribution (salting absorbs it inside a fixed number of exchanges).
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

N_DOCS = 2000
N_HOT = 1000  # docs carrying the hot paragraph
HOT_PARA = "please subscribe to our newsletter for daily updates about everything"
assert len(HOT_PARA.split()) == 10  # one full dedup_paragraphs chunk


def _words(i: int, n: int) -> str:
    # deterministic filler text, unique per doc
    return " ".join(f"w{i}x{j}" for j in range(n))


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("skew_sf")

    docs = []
    for i in range(N_DOCS):
        lang = "en" if i < int(N_DOCS * 0.8) else ("de", "fr", "es", "it")[i % 4]
        if i < N_HOT:
            # hot paragraph (10 words = exactly one paragraph chunk)
            # followed by unique filler
            text = f"{HOT_PARA} {_words(i, 30)}"
        elif i < N_HOT + 50:
            # near-dup family inside the hot lang: 25 pairs that differ
            # by one appended token (high 2-gram Jaccard)
            base = i - ((i - N_HOT) % 2)
            text = f"{_words(base, 40)} tail{i % 2}"
        else:
            text = _words(i, 40)
        docs.append((i, text, lang, "synthetic", len(text)))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(4).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    # hub-skewed trading graph: supplier 1 appears in 80% of lineitem
    orders = [(k, k % 97) for k in range(1500)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).coalesce(4).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    lineitem = [
        (k % 1500, 1 if k % 10 < 8 else (k % 37) + 2) for k in range(6000)
    ]
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_suppkey long"
    ).coalesce(4).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    return str(out)


def _shuffles(df) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return len(
        re.findall(r"Arguments: (?:hash|range)partitioning", buf.getvalue())
    )


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_minhash_clusters_survive_skew(spark, skew_dir):
    """dedup_minhash_clusters on the skewed corpus: the in-plan grading
    (LSH components vs exact-pair components) must agree on EVERY doc,
    and the near-dup families must land in 2-doc clusters."""
    df = entrymod.queries()["dedup_minhash_clusters"](spark, skew_dir)
    rows = df.collect()
    assert len(rows) == N_DOCS
    assert all(r.within_bound for r in rows), [
        r for r in rows if not r.within_bound
    ][:5]
    by_rep = {}
    for r in rows:
        by_rep.setdefault(r.cluster_rep, []).append(r.doc_id)
    fam = [m for m in by_rep.values() if len(m) > 1]
    # 25 near-dup pairs planted at doc_ids 1000..1049
    assert len(fam) == 25, len(fam)
    assert all(len(m) == 2 and m[0] + 1 == m[1] for m in map(sorted, fam))


def test_paragraph_dedup_hot_paragraph_kept_once(spark, skew_dir):
    """dedup_paragraphs with a paragraph duplicated 1,000x: kept only in
    its lowest-doc_id host, stripped from the other 999 — and the hot
    key stays inside the same windowed plan (no fallback path)."""
    df = entrymod.queries()["dedup_paragraphs"](spark, skew_dir)
    rows = {r.doc_id: r for r in df.collect()}
    assert len(rows) == N_DOCS
    keepers = [
        i for i in range(N_HOT) if HOT_PARA in rows[i].clean_text
    ]
    assert keepers == [0], keepers[:5]
    # every hot doc lost exactly the one hot paragraph (others keep all)
    assert rows[1].n_paras - rows[1].n_kept == 1
    # boilerplate banner also dedups corpus-wide: exactly one doc keeps it
    total_kept = sum(r.n_kept for r in rows.values())
    total_paras = sum(r.n_paras for r in rows.values())
    assert total_paras - total_kept >= N_HOT - 1


def test_pagerank_hub_node_converges(spark, skew_dir):
    """graph_pagerank_int with a hub supplier touching 80% of rows:
    integer ranks stay positive, the hub holds the max rank, and the
    iteration count / shuffle shape is unchanged by skew."""
    df = entrymod.queries()["graph_pagerank_int"](spark, skew_dir)
    rows = df.collect()
    assert rows and all(r.rank_ppm > 0 for r in rows)
    hub = max(rows, key=lambda r: r.rank_ppm)
    assert hub.node_id == 1 * 2 + 1  # supplier 1 encoded as 2s+1
    suppliers = {r.node_id for r in rows if r.is_supplier == 1}
    # distinct() collapses row-skew into degree-skew: the hub ends up
    # adjacent to all 97 customers while other suppliers see ~40 — its
    # rank should clearly dominate (measured 2.8x the runner-up)
    assert hub.rank_ppm >= 2 * max(
        r.rank_ppm for r in rows if r.node_id != hub.node_id
    ), "hub should dominate a 80%-skew graph"
    assert len(suppliers) >= 30


# the SAME ceilings tools/plan_audit.py enforces on the benign corpus:
# skew must not change the plan shape (imported, not copied, so a
# reviewed ceiling change can never silently diverge from this test).
from tools.plan_audit import MAX_SHUFFLES

SKEW_CEILINGS = {
    k: MAX_SHUFFLES[k]
    for k in (
        "dedup_minhash_clusters",
        "dedup_paragraphs",
        "graph_pagerank_int",
        "dedup_ngram_jaccard",
    )
}


@pytest.mark.parametrize("key", sorted(SKEW_CEILINGS))
def test_skewed_plan_respects_shuffle_ceiling(spark, skew_dir, key):
    df = entrymod.queries()[key](spark, skew_dir)
    n = _shuffles(df)
    assert n <= SKEW_CEILINGS[key], (key, n, SKEW_CEILINGS[key])


def test_salt_fanout_engages_on_skewed_blocks(spark, skew_dir):
    """The lang-blocked exact-pair work must not key an exchange on the
    low-cardinality blk alone — with 80% of docs in one lang that would
    put 80% of the quadratic work in one task. Since r12 the direct
    path is the inverted shingle index: the postings self-join is keyed
    by (blk, shingle-hash), a HIGH-cardinality key, so the fan-out is
    structural. Proven here on the skewed corpus: the plan exchanges on
    (blk, gh) (or legitimately broadcasts the tiny int posting side at
    fixture scale) and never hash-partitions on blk by itself."""
    df = entrymod.queries()["dedup_ngram_jaccard"](spark, skew_dir)
    plan = _plan(df)
    assert re.search(r"hashpartitioning\(blk#\d+, gh#\d+L", plan) or (
        "BroadcastHashJoin" in plan and re.search(r"gh#\d+L", plan)
    ), "postings self-join must be keyed by (blk, shingle-hash)"
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        assert not re.fullmatch(r"blk#\d+, \d+", keys), (
            "exchange keyed on blk alone",
            keys,
        )


def test_block_ceiling_routes_giant_block_through_lsh(spark, skew_dir):
    """VERDICT r3 #6: a block over the pairBlockCeiling must switch to
    MinHash-LSH candidate generation + exact verify, and — on a corpus
    whose matching pairs are well above the banding S-curve knee —
    agree with the direct exact path pair-for-pair.

    The skew fixture's 'en' block holds 1,600 docs (hot paragraph
    x1000 + 25 near-dup families at J≈0.95). At threshold 0.5 the
    banding parameters derive from the threshold (_banding_params:
    r=3, b=23), giving per-pair miss probability (1-j^3)^23 ≈ 1e-19
    at j=0.95 — and the hashes are fixed seeds over fixed fixture
    text, so the comparison is deterministic."""
    from mediaplaycounts_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{skew_dir}/documents.parquet")
    direct = ngram_jaccard_pairs(
        docs, "doc_id", "text", "lang", n=2, threshold=0.5,
        block_ceiling=10**9,
    )
    routed = ngram_jaccard_pairs(
        docs, "doc_id", "text", "lang", n=2, threshold=0.5,
        block_ceiling=500,
    )
    # the LSH branch must actually be IN the routed plan: band explode
    # (posexplode -> band_idx/band_hash join) only exists on that path
    plan = _plan(routed)
    assert "band_hash" in plan, "LSH candidate path did not engage"
    assert "band_hash" not in _plan(direct)
    d = {(r.id_a, r.id_b): r.jaccard for r in direct.collect()}
    r = {(r.id_a, r.id_b): r.jaccard for r in routed.collect()}
    assert len(d) >= 25  # the planted families all match at 0.5
    assert d == r


def test_block_ceiling_cosine_pairs_lsh_agrees(spark, skew_dir):
    """Same routing proof for the embedding-pair operator: a giant
    label block goes through hyperplane-LSH tables + exact-cosine
    verify. Fixture: 600 vectors in one label, 30 planted duplicate
    pairs (identical vectors -> identical buckets in EVERY table, so
    recall for them is exactly 1, deterministically)."""
    import math

    from mediaplaycounts_spark.operators.similarity import cosine_pairs_blocked

    rows = []
    for i in range(600):
        base = [math.sin(1 + i * 7 + k) for k in range(8)]
        rows.append((i, "hot", base))
    for i in range(30):  # exact duplicate of vector i, new id
        rows.append((600 + i, "hot", [math.sin(1 + i * 7 + k) for k in range(8)]))
    em = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    direct = cosine_pairs_blocked(
        em, "vec_id", "embedding", "label", 0.99999, block_ceiling=10**9
    )
    routed = cosine_pairs_blocked(
        em, "vec_id", "embedding", "label", 0.99999, block_ceiling=100
    )
    d = {(r.id_a, r.id_b) for r in direct.collect()}
    r = {(r.id_a, r.id_b) for r in routed.collect()}
    assert {(i, 600 + i) for i in range(30)} <= d
    assert d == r


def test_block_ceiling_containment_prefix_filter_exact(spark, skew_dir):
    """r5: containment_pairs' oversized-block route is the PREFIX-FILTER
    candidate join (recall exactly 1.0, unlike MinHash banding), so the
    routed result must equal the direct exact path PAIR-FOR-PAIR,
    including both containment scores."""
    from mediaplaycounts_spark.operators.dedup import containment_pairs

    docs = spark.read.parquet(f"{skew_dir}/documents.parquet")
    direct = containment_pairs(
        docs, "doc_id", "text", "lang", n=2, threshold=0.4,
        block_ceiling=10**9,
    )
    routed = containment_pairs(
        docs, "doc_id", "text", "lang", n=2, threshold=0.4,
        block_ceiling=500,
    )
    d = {(r.id_a, r.id_b): (r.containment_ab, r.containment_ba)
         for r in direct.collect()}
    r = {(r.id_a, r.id_b): (r.containment_ab, r.containment_ba)
         for r in routed.collect()}
    assert len(d) > 0
    assert d == r
