"""Conf-matrix correctness sweep (VERDICT r8 next #1 — the
generalization of the r8 near-minhash twin defect).

The r8 bug CLASS: a ``spark.mediaplaycounts.*`` conf changes which
physical route a registered key's plan takes, and the routed path is
silently different from the default path — invisible to the driver
because graded SFs under the default conf never trigger the route.
This sweep enumerates every conf-sensitive registered key and runs the
full oracle harness under a matrix of production conf cells AT AN
SF/CONF COMBINATION WHERE EACH ROUTE PROVABLY FIRES, asserting:

1. the ROUTE (optimized-plan difference vs the default-conf build,
   plus a data-level witness: block rows > ceiling, bucket rows > cap,
   BroadcastHashJoin present/absent, checkpoint dir populated,
   df-guard ValueError) — not just the result;
2. the RESULT, against the key's documented routing CONTRACT:
   - exact routes (containment prefix-filter, broadcast gate,
     reliable checkpoints, inverted-index df guard): routed ==
     default == DuckDB oracle, value-exact;
   - approximate routes (MinHash-LSH block fallback, band-bucket star
     cap, random-hyperplane cosine fallback): precision 1.0 HARD
     (routed pairs ⊆ default pairs with identical scores) + the
     route's constructed recall floor HARD + full divergence REPORTED
     (so "approximate" is a measured number, never a shrug).

Cells: `production` (the documented production conf — at sf0.1 the en
lang block, 2059 rows, exceeds pairBlockCeiling=2000, so the LSH
fallback genuinely fires inside dedup_ngram_jaccard / dedup_clusters /
pipeline_e2e_curation); `ceiling_fire` (ceiling=100: every lang AND
label block routes); `bandcap_fire` (cap=64 < measured max bucket 136);
`broadcast_off`/`broadcast_all`; `checkpoint`; `maxdf_guard`.

Usage:
    python tools/conf_matrix.py [--sf /root/testdata/sf0.1] [--cells a,b]
Exit nonzero on any HARD contract violation or unproven route.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402

from tools.check_correctness import compare, duck_con  # noqa: E402

CKPT_DIR = "/root/repo/.scratch/conf_matrix_ckpt"

#: The documented production conf (BASELINE.md / SCALE.md).
PRODUCTION_CONF = {
    "spark.mediaplaycounts.pairBlockCeiling": "2000",
    "spark.mediaplaycounts.bandBucketCap": "256",
    "spark.mediaplaycounts.checkpointDir": CKPT_DIR,
    "spark.mediaplaycounts.invertedIndexMaxDf": "4096",
}

CEILING_KEYS = [
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "text_containment_pairs",
    "sim_cosine_pairs",
    "dedup_embedding_cosine",
    "sim_threshold_sweep",
    "pipeline_e2e_curation",
]
BANDCAP_KEYS = ["dedup_near_minhash", "dedup_minhash_clusters"]
BROADCAST_KEYS = [
    "join_broadcast_dim",
    "join_star_multi_dim",
    "win_rank_movers",
    "agg_price_volume_mix",
    "agg_shipping_sla",
]
CHECKPOINT_KEYS = [
    "graph_pagerank_int",
    "graph_bfs_hops",
    "graph_sssp_weighted",
    "graph_link_prediction",
    "graph_hits_int",
    "graph_kcore_peel",
    "dedup_clusters",
    "dedup_minhash_clusters",
    "pipeline_e2e_curation",
]
MAXDF_KEYS = ["dedup_near_minhash", "dedup_simhash", "pipeline_split_leakage_guard"]


# ------------------------------------------------------------ contracts
# Each contract: (routed_pd, default_pd, oracle_pd|None) -> (hard_ok,
# msg). `exact` is the default for keys whose route is exact by
# construction; the approximate routes get precision/recall contracts
# derived from their banding/hyperplane parameters (floors documented
# at each entry).


def _pair_sets(df: pd.DataFrame, score: str) -> dict:
    return {
        (int(a), int(b)): float(s)
        for a, b, s in zip(df["id_a"], df["id_b"], df[score])
    }


def c_exact(routed, default, oracle):
    ok_d, msg_d = compare(routed, default)
    if not ok_d:
        return False, f"routed != default: {msg_d}"
    if oracle is not None:
        ok_o, msg_o = compare(routed, oracle)
        if not ok_o:
            return False, f"routed != oracle: {msg_o}"
    return True, "exact (== default == oracle)"


def c_pairs(score: str, recall_floor: float, hi_cut: float):
    """Approximate pair route: precision 1.0 HARD (subset + identical
    scores), overall recall >= recall_floor HARD, recall 1.0 HARD on
    pairs with score >= hi_cut (where the route's collision probability
    is ~1 by construction)."""

    def check(routed, default, oracle):
        r, d = _pair_sets(routed, score), _pair_sets(default, score)
        extra = set(r) - set(d)
        if extra:
            return False, f"PRECISION violated: {len(extra)} non-default pairs"
        bad = [k for k in r if abs(r[k] - d[k]) > 1e-9]
        if bad:
            return False, f"score mismatch on {len(bad)} routed pairs"
        rec = len(r) / len(d) if d else 1.0
        if rec < recall_floor:
            return False, f"recall {rec:.4f} < floor {recall_floor}"
        hi = {k for k, v in d.items() if v >= hi_cut}
        hi_missed = hi - set(r)
        if hi_missed:
            return False, (
                f"high-score recall violated: {len(hi_missed)}/{len(hi)} "
                f"pairs with {score}>={hi_cut} missed"
            )
        return True, (
            f"precision 1.0 ({len(r)} pairs); recall {rec:.4f} "
            f"(floor {recall_floor}); hi({score}>={hi_cut}) {len(hi)}/{len(hi)}"
            + ("; EXACT match" if len(r) == len(d) else "")
        )

    return check


def c_cluster(floor: float, id_col: str = "doc_id", label_col: str = "cluster_rep"):
    """Cluster route: per-doc assignment agreement >= floor HARD;
    exactness reported. Columns selected BY NAME (ADVICE r9: the old
    first/last positional pick silently mis-pairs if the key's schema
    is ever reordered or widened) — a missing column fails loudly."""

    def check(routed, default, oracle):
        missing = {id_col, label_col} - set(default.columns)
        if missing:
            return False, (
                f"cluster contract expects columns {sorted(missing)} "
                f"absent from result schema {list(default.columns)}"
            )
        idc, lc = id_col, label_col
        r = dict(zip(routed[idc], routed[lc]))
        d = dict(zip(default[idc], default[lc]))
        if set(r) != set(d):
            return False, f"doc set differs: {len(set(r) ^ set(d))} docs"
        agree = sum(1 for k in d if r[k] == d[k])
        frac = agree / len(d) if d else 1.0
        if frac < floor:
            return False, f"cluster agreement {frac:.4f} < floor {floor}"
        return True, (
            f"cluster agreement {agree}/{len(d)} ({frac:.4f})"
            + ("; EXACT" if agree == len(d) else "")
        )

    return check


def c_dup_assign(routed, default, oracle):
    """dedup_embedding_cosine: (vec_id, dup_of=min close neighbor).
    Routed pair set ⊆ default ⇒ routed vec_ids ⊆ default AND each
    routed dup_of >= the default one (min over a subset). Both HARD."""
    r = dict(zip(routed["vec_id"], routed["dup_of"]))
    d = dict(zip(default["vec_id"], default["dup_of"]))
    extra = set(r) - set(d)
    if extra:
        return False, f"PRECISION violated: {len(extra)} non-default vec_ids"
    bad = [k for k in r if r[k] < d[k]]
    if bad:
        return False, f"{len(bad)} dup_of below default min (phantom pair)"
    return True, (
        f"assignments ⊆ default ({len(r)}/{len(d)} vec_ids, "
        f"{sum(1 for k in r if r[k] == d[k])} identical)"
        + ("; EXACT" if r == d else "")
    )


def c_counts_le(routed, default, oracle):
    """sim_threshold_sweep: (label, thr_ppm, n_pairs) — routed counts
    must be <= default per cell (aggregate precision), HARD."""
    key = ["label", "thr_ppm"]
    m = default.merge(routed, on=key, how="outer", suffixes=("_d", "_r"))
    m["n_pairs_r"] = m["n_pairs_r"].fillna(0)
    if m["n_pairs_d"].isna().any():
        return False, "routed emitted a (label, thr) cell default lacks"
    over = m[m["n_pairs_r"] > m["n_pairs_d"]]
    if len(over):
        return False, f"{len(over)} cells exceed default counts"
    tot_r, tot_d = int(m["n_pairs_r"].sum()), int(m["n_pairs_d"].sum())
    return True, (
        f"counts ⊆ default ({tot_r}/{tot_d} total pairs across cells)"
        + ("; EXACT" if tot_r == tot_d else "")
    )


def c_minhash_summary(routed, default, oracle):
    """dedup_near_minhash: n_exact_pairs_j03 comes from the
    conf-INDEPENDENT inverted twin (the r8 fix) — HARD-equal to the
    DuckDB oracle under every conf. within_bound is the LSH recall
    grade: REPORTED (a firing band cap legitimately sacrifices pairwise
    recall; that trade is documented at the operator)."""
    n_r = int(routed["n_exact_pairs_j03"].iloc[0])
    n_o = int(oracle["n_exact_pairs_j03"].iloc[0])
    if n_r != n_o:
        return False, f"twin drifted under conf: {n_r} != oracle {n_o}"
    wb = bool(routed["within_bound"].iloc[0])
    return True, f"twin exact ({n_r} pairs == oracle); within_bound={wb}"


def c_pairs_precision_cluster(routed, default, oracle):
    """ngram pairs under ceiling+cap BOTH firing. HARD contract:
    precision (subset with identical jaccard) AND zero connectivity
    loss — the star cap has NO pair-recall floor (a pair can live
    entirely inside over-cap buckets), but chain-repair
    (operators/dedup._star_candidates_with_repair) is UNCONDITIONAL as
    of r11 (VERDICT r10 next #2): peel rounds shrink the failed set
    while it is large, then an exact all-pairs tail over the
    per-bucket residue gives every cohesive pair a direct candidate,
    raising loudly only for a residue beyond starRepairAllPairsCap —
    so zero lost nodes is a guarantee the code actually provides for
    ANY bucket composition (the r10 version only covered stacks <= 3
    deep — ADVICE r10 medium; the interim peel-until-empty version
    needed O(bucket) Spark jobs on the stranger piles THIS cell's
    corpus contains). A lost node here is therefore always a
    regression. Label agreement is still reported."""
    r, d = _pair_sets(routed, "jaccard"), _pair_sets(default, "jaccard")
    extra = set(r) - set(d)
    if extra:
        return False, f"PRECISION violated: {len(extra)} non-default pairs"
    bad = [k for k in r if abs(r[k] - d[k]) > 1e-9]
    if bad:
        return False, f"score mismatch on {len(bad)} routed pairs"

    def components(pairs):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    cr, cd = components(set(r)), components(set(d))
    lost_nodes = len(set(cd) - set(cr))
    agree = sum(1 for x in cd if cr.get(x) == cd[x])
    rec = len(r) / len(d) if d else 1.0
    if lost_nodes:
        return False, (
            f"CONNECTIVITY violated: {lost_nodes} of {len(cd)} paired "
            "docs lost all links under the cap — chain-repair should "
            "have re-starred them"
        )
    return True, (
        f"precision 1.0 ({len(r)} pairs); recall {rec:.4f} (no floor "
        f"under cap); connectivity 0 lost of {len(cd)} paired docs, "
        f"label agreement {agree}/{len(cd)}"
    )


CONTRACTS = {
    # ngram LSH fallback: banding derived at threshold 0.05 -> r=1/b=59,
    # recall >= 1-(0.95)^59 ~ 0.952 at J=0.05 by construction and
    # ~1-1e-9 at J>=0.3 (hi_cut).
    "dedup_ngram_jaccard": c_pairs("jaccard", 0.95, 0.3),
    # clusters inherit the same pair recall; components can only merge
    # identically or split when a pair is missed — 0.99 floor, exactness
    # reported.
    "dedup_clusters": c_cluster(0.99),
    "text_containment_pairs": c_exact,  # prefix-filter route is EXACT
    # RH-LSH fallback (8 tables x 8 planes, Hamming<=2 MULTI-PROBE as
    # of r11 — VERDICT r10 next #1): per-table collision at cos c with
    # q = 1-acos(c)/pi is sum_{k<=2} C(8,k) q^(8-k) (1-q)^k; recall =
    # 1-(1-that)^8 = 0.95 theoretical at the 0.3 threshold (the r10
    # H=1 route measured 0.62 vs 0.58 theory, so measured tracks
    # theory from above on this corpus), ~1 at cos ~= 1 (identical
    # vectors share every bucket -> hi_cut). Floor 0.85 = theory minus
    # margin for the at-threshold mass this corpus concentrates there
    # (raised 0.5 -> 0.85 per the r10 done-criterion).
    "sim_cosine_pairs": c_pairs("cos_sim", 0.85, 0.999999),
    "dedup_embedding_cosine": c_dup_assign,
    "sim_threshold_sweep": c_counts_le,
    # e2e near-dedup runs at threshold 0.6 -> banding (88, 4): recall
    # 0.95 at J=0.6, ~1 at J>=0.8; corpus near-dups are exact-ish
    # (J ~ 1), so the end-to-end manifest is expected EXACT — asserted
    # exact, and if a legit sub-0.8 near-dup ever enters the corpus
    # this line is the documented relaxation point.
    "pipeline_e2e_curation": c_exact,
    "dedup_near_minhash": c_minhash_summary,
    # star cap preserves cluster connectivity by construction
    "dedup_minhash_clusters": c_exact,
    "dedup_simhash": c_exact,
    "pipeline_split_leakage_guard": c_exact,
}


# ----------------------------------------------------------- route proofs


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _sparkplan(df) -> str:
    return df._jdf.queryExecution().sparkPlan().toString()


def _with_conf(spark, confs: dict):
    class _Ctx:
        def __enter__(self):
            for k, v in confs.items():
                spark.conf.set(k, v)

        def __exit__(self, *a):
            for k in confs:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass

    return _Ctx()


def prove_ceiling(spark, sf, qs, confs) -> tuple[bool, str]:
    from pyspark.sql import functions as F

    ceiling = int(confs["spark.mediaplaycounts.pairBlockCeiling"])
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    em = spark.read.parquet(f"{sf}/embeddings.parquet")
    dmax = docs.groupBy("lang").count().agg(F.max("count")).head()[0]
    emax = em.groupBy("label").count().agg(F.max("count")).head()[0]
    doc_fires, emb_fires = dmax > ceiling, emax > ceiling
    if not doc_fires:
        return False, f"no doc block over ceiling {ceiling} (max {dmax})"
    p_def = _plan(qs["dedup_ngram_jaccard"](spark, sf))
    c_routed = None
    with _with_conf(spark, confs):
        p_rt = _plan(qs["dedup_ngram_jaccard"](spark, sf))
        if emb_fires:
            c_routed = _plan(qs["sim_cosine_pairs"](spark, sf))
    if p_rt == p_def:
        return False, "ngram optimized plan UNCHANGED under ceiling conf"
    msg = f"doc max block {dmax} > {ceiling}, ngram plan diverged"
    if emb_fires:
        c_def = _plan(qs["sim_cosine_pairs"](spark, sf))
        if c_routed == c_def:
            return False, "cosine plan UNCHANGED though label block fires"
        msg += f"; emb max block {emax} > {ceiling}, cosine plan diverged"
    else:
        msg += f"; emb max block {emax} <= {ceiling} (cosine route idle)"
    return True, msg


def prove_bandcap(spark, sf, qs, confs) -> tuple[bool, str]:
    from pyspark.sql import functions as F

    from mediaplaycounts_spark.operators import dedup as D
    from mediaplaycounts_spark.queries import llm as L
    from mediaplaycounts_spark.tables import load_table

    cap = int(confs["spark.mediaplaycounts.bandBucketCap"])
    docs = load_table(spark, sf, "documents")
    nh, r = D._banding_params(0.3)
    sigs = D.minhash_signatures(docs, "doc_id", "text", nh, 2)
    nb = nh // r
    bh = F.array(
        *[
            F.xxhash64(
                *[F.element_at("sig", b * r + k + 1) for k in range(r)], F.lit(b)
            )
            for b in range(nb)
        ]
    )
    bmax = (
        sigs.select(F.posexplode(bh).alias("i", "h"))
        .groupBy("i", "h")
        .count()
        .agg(F.max("count"))
        .head()[0]
    )
    if bmax <= cap:
        return False, f"no band bucket over cap {cap} (max {bmax})"
    p_def = _plan(L._minhash_pairs_raw(spark, sf))
    with _with_conf(spark, confs):
        p_rt = _plan(L._minhash_pairs_raw(spark, sf))
    if p_rt == p_def:
        return False, "minhash plan UNCHANGED under cap conf"
    return True, f"max band bucket {bmax} > cap {cap}, minhash plan diverged"


def prove_broadcast(spark, sf, qs, confs) -> tuple[bool, str]:
    off = {
        "spark.mediaplaycounts.maybeBroadcastThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    on = {"spark.mediaplaycounts.maybeBroadcastThreshold": "1g"}
    # Differential, not absence: the key also joins truly-tiny dims with
    # UNCONDITIONAL F.broadcast (correct at any SF — see maybe_broadcast
    # docstring), so some BroadcastHashJoin survives a closed gate. The
    # proof is that the GATED join flips strategy: strictly more BHJs
    # with the gate open than closed(+auto off).
    with _with_conf(spark, off):
        p_off = _sparkplan(qs["join_broadcast_dim"](spark, sf))
    with _with_conf(spark, on):
        p_on = _sparkplan(qs["join_broadcast_dim"](spark, sf))
    n_on = p_on.count("BroadcastHashJoin")
    n_off = p_off.count("BroadcastHashJoin")
    if n_on <= n_off:
        return False, (
            f"gate open did not add a BroadcastHashJoin "
            f"(open={n_on}, closed+auto-off={n_off})"
        )
    return True, (
        f"gated join flips: {n_on} BHJs open vs {n_off} closed+auto-off "
        "(residual BHJs are the unconditional tiny-dim hints)"
    )


def prove_checkpoint(spark, sf, qs, confs) -> tuple[bool, str]:
    import os
    import shutil

    shutil.rmtree(CKPT_DIR, ignore_errors=True)
    with _with_conf(spark, confs):
        qs["graph_pagerank_int"](spark, sf).count()
    n = sum(len(fs) for _, _, fs in os.walk(CKPT_DIR))
    if n == 0:
        return False, "checkpoint dir EMPTY after an iterative key ran"
    return True, f"reliable checkpoint dir populated ({n} files)"


def prove_maxdf(spark, sf, qs, confs) -> tuple[bool, str]:
    # The guard consumes the conf at plan-build: a 1-shingle ceiling must
    # raise on this corpus (max df 338) — proves the conf is LIVE, then
    # the cell's real value (4096) must be a no-op.
    with _with_conf(
        spark, {"spark.mediaplaycounts.invertedIndexMaxDf": "1"}
    ):
        try:
            qs["dedup_near_minhash"](spark, sf)
            return False, "maxDf=1 did not raise — guard conf not consumed"
        except ValueError as ex:
            if "df ceiling violated" not in str(ex):
                return False, f"unexpected error under maxDf=1: {ex}"
    return True, "maxDf=1 raises the df guard (conf live); cell value 4096 no-op"


def prove_ceiling_cap(spark, sf, qs, confs) -> tuple[bool, str]:
    """Both knobs must fire INSIDE the routed LSH path: blocks over the
    ceiling route through _lsh_candidate_pairs, and within that path at
    least one (blk, band_idx, band_hash) bucket of the r=1/b=59 banding
    (derived at the 0.05 ngram threshold) exceeds the cap, so star
    routing engages. Witnesses: both data-level maxima + the plan under
    {ceiling} differing from the plan under {ceiling, cap}."""
    from pyspark.sql import functions as F

    from mediaplaycounts_spark.operators import dedup as D
    from mediaplaycounts_spark.tables import load_table

    ceiling = int(confs["spark.mediaplaycounts.pairBlockCeiling"])
    cap = int(confs["spark.mediaplaycounts.bandBucketCap"])
    docs = load_table(spark, sf, "documents")
    dmax = docs.groupBy("lang").count().agg(F.max("count")).head()[0]
    if dmax <= ceiling:
        return False, f"no doc block over ceiling {ceiling} (max {dmax})"
    nh, r = D._banding_params(0.05)
    sh = docs.select(
        "doc_id", F.col("lang").alias("blk"), D.shingles("text", 2).alias("s")
    )
    sig = F.array(
        *[
            F.array_min(F.transform("s", lambda x, k=k: F.xxhash64(x, F.lit(k))))
            for k in range(nh)
        ]
    )
    bmax = (
        sh.select("blk", F.posexplode(sig).alias("i", "h"))
        .groupBy("blk", "i", "h")
        .count()
        .agg(F.max("count"))
        .head()[0]
    )
    if bmax <= cap:
        return False, f"no r=1 band bucket over cap {cap} (max {bmax})"
    with _with_conf(
        spark,
        {"spark.mediaplaycounts.pairBlockCeiling": str(ceiling)},
    ):
        p_ceiling_only = _plan(qs["dedup_ngram_jaccard"](spark, sf))
    with _with_conf(spark, confs):
        p_both = _plan(qs["dedup_ngram_jaccard"](spark, sf))
    if p_both == p_ceiling_only:
        return False, "cap conf did not change the ROUTED plan"
    return True, (
        f"doc max block {dmax} > {ceiling} AND max r=1 bucket {bmax} > "
        f"{cap}; routed plan diverges ceiling-only vs ceiling+cap"
    )


def prove_production(spark, sf, qs, confs) -> tuple[bool, str]:
    from pyspark.sql import functions as F

    ceiling = int(confs["spark.mediaplaycounts.pairBlockCeiling"])
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    over = (
        docs.groupBy("lang").count().filter(F.col("count") > ceiling).count()
    )
    if over == 0:
        return False, (
            f"production ceiling {ceiling} fires on NO block at this SF — "
            "run at an SF where it does (sf0.1: en=2059)"
        )
    p_def = _plan(qs["dedup_ngram_jaccard"](spark, sf))
    with _with_conf(spark, confs):
        p_rt = _plan(qs["dedup_ngram_jaccard"](spark, sf))
    if p_rt == p_def:
        return False, "ngram plan UNCHANGED under production conf"
    return True, (
        f"{over} lang block(s) over production ceiling {ceiling}; "
        "ngram plan diverged (cap/cosine/maxdf routes idle at this SF — "
        "covered by their fire cells)"
    )


# ----------------------------------------------------------------- cells

CELLS = {
    "production": (PRODUCTION_CONF, sorted(set(
        CEILING_KEYS + BANDCAP_KEYS + BROADCAST_KEYS + CHECKPOINT_KEYS + MAXDF_KEYS
    )), prove_production),
    "ceiling_fire": (
        {"spark.mediaplaycounts.pairBlockCeiling": "100"},
        CEILING_KEYS,
        prove_ceiling,
    ),
    "bandcap_fire": (
        {"spark.mediaplaycounts.bandBucketCap": "64"},
        BANDCAP_KEYS,
        prove_bandcap,
    ),
    # ceiling AND cap firing TOGETHER — the ngram keys' routed-LSH path
    # with star routing engaged inside it. Under the cap no pair-recall
    # floor exists (star drops member-member pairs of over-cap buckets,
    # at any J), so these keys swap to the precision+cluster contract.
    # cap=4: the r=1 banding's over-cap buckets on this corpus are the
    # exact-dup families (max bucket 6 at sf0.1 — unlike the (64,2)
    # banding's 136, an r=1 bucket needs the doc's MINIMUM hash to
    # collide, which for non-near-dup docs happens at ~their Jaccard).
    "ceiling_cap_fire": (
        {
            "spark.mediaplaycounts.pairBlockCeiling": "100",
            "spark.mediaplaycounts.bandBucketCap": "4",
        },
        ["dedup_ngram_jaccard", "dedup_clusters"],
        prove_ceiling_cap,
        {"dedup_ngram_jaccard": c_pairs_precision_cluster},
    ),
    "broadcast_off": (
        {
            "spark.mediaplaycounts.maybeBroadcastThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
        BROADCAST_KEYS,
        prove_broadcast,
    ),
    "broadcast_all": (
        {"spark.mediaplaycounts.maybeBroadcastThreshold": "1g"},
        BROADCAST_KEYS,
        prove_broadcast,
    ),
    "checkpoint": (
        {"spark.mediaplaycounts.checkpointDir": CKPT_DIR},
        CHECKPOINT_KEYS,
        prove_checkpoint,
    ),
    "maxdf_guard": (
        {"spark.mediaplaycounts.invertedIndexMaxDf": "4096"},
        MAXDF_KEYS,
        prove_maxdf,
    ),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cells", default=",".join(CELLS))
    args = ap.parse_args()

    import __spark_entry__ as e
    from mediaplaycounts_spark.session import get_spark

    qs, oracles = e.queries(), e.oracle_sql()
    spark = get_spark("conf-matrix")
    con = duck_con(args.sf)

    default_cache: dict[str, pd.DataFrame] = {}
    oracle_cache: dict[str, pd.DataFrame] = {}

    def default_of(k):
        if k not in default_cache:
            default_cache[k] = qs[k](spark, args.sf).toPandas()
        return default_cache[k]

    def oracle_of(k):
        if k not in oracle_cache:
            oracle_cache[k] = (
                con.execute(oracles[k]).fetchdf() if k in oracles else None
            )
        return oracle_cache[k]

    n_pass = n_fail = 0
    for cell in args.cells.split(","):
        confs, keys, prove, *rest = CELLS[cell]
        overrides = rest[0] if rest else {}
        print(f"\n=== cell {cell}: {confs}")
        ok, msg = prove(spark, args.sf, qs, confs)
        print(f"{'✓' if ok else '✗'} route-proof: {msg}")
        if not ok:
            n_fail += 1
            continue
        for k in keys:
            t0 = time.time()
            try:
                with _with_conf(spark, confs):
                    routed = qs[k](spark, args.sf).toPandas()
                d = default_of(k)
                o = oracle_of(k)
                contract = overrides.get(k) or CONTRACTS.get(k, c_exact)
                ok, msg = contract(routed, d, o)
            except Exception as ex:
                ok, msg = False, f"ERROR {type(ex).__name__}: {str(ex)[:300]}"
            mark = "✓" if ok else "✗"
            print(
                f"{mark} {cell}/{k}: {msg} ({time.time() - t0:.1f}s)",
                flush=True,
            )
            n_pass += ok
            n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
