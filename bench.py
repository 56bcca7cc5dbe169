"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method (BASELINE.md): one warm-up execution per query, then best-of-3
timed runs. Queries execute end-to-end into the `noop` sink (full plan
runs, no collect/serialization cost measured). Baseline reference
numbers in BASELINE.md were measured the same way.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Per-query drift gate (VERDICT r2 #7): recorded reference timings for
#: BOTH the headline and extended sets live in bench_reference.json;
#: any query slower than DRIFT_FACTOR x its recorded time is reported
#: in the output JSON's "drift_alerts" (and on stderr) — pagerank's r1
#: regression was caught by eyeball, this makes it a gate. Refresh the
#: recording after an intentional change: python bench.py --record.
REFERENCE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_reference.json"
)
DRIFT_FACTOR = 1.5

#: CPU drift gate (VERDICT r7 #2/#7): wall time on this box mode-flips
#: 1.4-3.6x for identical plans under machine load (measured r7, the
#: three r7 driver drift alerts were exactly this), so a wall-only gate
#: cannot tell load bands from plan regressions. Executor-CPU floors
#: measure WORK: a key now alerts only when BOTH its wall exceeds
#: DRIFT_FACTOR x recorded wall AND its CPU floor exceeds
#: CPU_DRIFT_FACTOR x the recorded CPU floor (when a CPU recording
#: exists — wall-only for pre-r8 references). CPU_ABS_SLACK_S guards
#: the sub-second keys: the REST stage metrics carry tens-of-ms
#: per-stage jitter (task launch, GC attribution), so a 60 ms floor vs
#: a 40 ms recording is measurement noise, not 1.5x more work — a key
#: must exceed the factor AND the recording by the absolute slack.
CPU_DRIFT_FACTOR = 1.4
#: Documented jitter guard (ADVICE r8 accepted trade): on sub-100 ms
#: keys the absolute slack dominates the 1.4x factor (a 0.04 s recording
#: tolerates up to 0.14 s), which can mute a real plan regression on the
#: smallest keys. Deliberate: REST stage-metric jitter (task launch, GC
#: attribution) on this box is tens of ms per stage — a factor-only gate
#: on 40 ms keys alerted on pure noise every epoch. A regression big
#: enough to matter on a 40 ms key either shows up at decade SFs
#: (SCALE.md gates) or grows the key past the slack's reach.
CPU_ABS_SLACK_S = 0.1

#: Headline set: the reference-shaped core (daily rollup, date-range,
#: rolling windows, category semi-join), the relational workhorses, and
#: the LLM-pipeline ops that dominate at 100 TB.
HEADLINE = [
    "agg_multi",            # TPC-H Q1-style scan+agg (q1_pricing twin)
    "agg_daily_playcount",  # the reference's core op (daily_counts twin)
    "join_shuffle_equi",    # big-big SMJ (join_topk twin)
    "join_broadcast_dim",   # star-schema broadcast path
    "win_rolling_30d",      # reference flagship rolling totals
    "agg_pivot",            # wide pivot aggregate
    "dedup_exact_hash",     # content-hash dedup
    "text_tokenize_wordcount",
    "sim_topk_probe",       # brute-force ANN baseline
    "join_asof",            # union+window as-of
]

#: Timed and reported alongside, but NOT part of the headline total —
#: the headline composition stays fixed so `value` is comparable across
#: rounds against BASELINE.md.
EXTENDED = [
    "dedup_paragraphs",     # corpus-wide paragraph dedup + reassembly
    "text_tfidf_topterms",  # explode -> two aggs -> vocab join + window
    "agg_heavy_hitters",    # Misra-Gries candidates + exact recount
    "graph_pagerank_int",   # 3 iterative shuffles
    "ts_gapfill_interpolate",
    # r2 additions (new ops; not in any prior round's numbers)
    "text_perplexity_unigram",   # unigram LM scoring, 6-shuffle ladder
    "pipeline_pack_sequences",   # Arrow grouped-map packing kernel
    "multimodal_embedding_quantize",  # zero-shuffle array lambdas
    # r3 additions
    "agg_kll_quantile_merge",    # sketch-blob quantile rollup + exact twin
    "dedup_substring_spans",     # cross-doc span dedup signal
    # r3 continuation additions
    "join_star_multi_dim",       # 5-dim broadcast star cube, one exchange
    "graph_hits_int",            # 2-round HITS, checkpoint at the fork
    "join_geo_grid",             # grid-blocked spatial pairs
    "text_bpe_merge_rounds",     # BPE merge training rounds
    "sim_rerank_rrf",            # hybrid RRF fusion
]


def _production_paths():
    """PRODUCTION entry points for keys whose REGISTERED plan embeds an
    exact grading twin (VERDICT r4 next #3): the registry numbers for
    dedup_near_minhash / dedup_simhash / sim_ann_* include the cost of
    the exact-verification harness that exists only so the driver can
    value-check recall; at 100 TB only the approximate path would run.
    These closures bench the raw operators from `operators/` — the
    number a reader should quote for "MinHash dedup" etc. BASELINE.md
    documents the split.
    """
    from mediaplaycounts_spark.operators import dedup as D
    from mediaplaycounts_spark.operators import similarity as S
    from mediaplaycounts_spark.tables import load_table

    def docs(spark):
        return load_table(spark, SF_DIR, "documents")

    def em(spark):
        return load_table(spark, SF_DIR, "embeddings")

    def _probe(spark):
        return S.probe_vector(em(spark), "vec_id", "embedding", 0)

    return {
        # Same shape as the registered key's production path
        # (_minhash_pairs_raw): banding derived from the J=0.3 graded
        # recall point -> 64 hashes/r=2/b=32 (r6 re-baseline; the old
        # hardcoded 16-hash signature was ~4x cheaper but guaranteed
        # only ~0.53 recall at J=0.3).
        "prod_minhash_pairs": lambda spark, _sf: D.minhash_lsh_pairs(
            docs(spark), "doc_id", "text", threshold=0.05, recall_point=0.3
        ),
        "prod_simhash_pairs": lambda spark, _sf: D.simhash_near_dups(
            docs(spark), "doc_id", "text"
        ),
        "prod_ann_lsh": lambda spark, _sf: S.topk_lsh(
            em(spark), "vec_id", "embedding", _probe(spark)
        ),
        "prod_ann_lsh_multiprobe": lambda spark, _sf: S.topk_lsh_multiprobe(
            em(spark), "vec_id", "embedding", _probe(spark)
        ),
        "prod_ann_ivf": lambda spark, _sf: S.topk_ivf(
            em(spark), "vec_id", "embedding", _probe(spark)
        ),
        "prod_ann_pq": lambda spark, _sf: S.topk_pq(
            em(spark), "vec_id", "embedding", _probe(spark)
        ),
        # The registered key IS the production shape (no grading harness
        # inside); timed build-INCLUSIVE (see _TIME_BUILD) because its
        # eager lineage-fork checkpoints do ~95% of the work at
        # fn-call time, before the noop write a write-only timer sees.
        "prod_e2e_curation": _e2e_curation,
    }


def _e2e_curation(spark, _sf):
    from mediaplaycounts_spark.queries.curation import pipeline_e2e_curation

    return pipeline_e2e_curation(spark, SF_DIR)


#: Keys whose callable performs eager work (checkpoint_df lineage cuts)
#: during CONSTRUCTION: best-of-3 must time fn-call + write together or
#: the recorded number is only the final join's write (measured 0.45 s
#: of an 8.9 s run at sf0.1).
_TIME_BUILD = {"prod_e2e_curation"}


def _cpu_totals(sc) -> float:
    """Cumulative executor CPU seconds over COMPLETE stages (REST).
    Returns 0.0 when the UI is off (driver-provided vanilla session)."""
    import urllib.request

    base = sc.uiWebUrl
    if base is None:
        return 0.0
    try:
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{sc.applicationId}"
                "/stages?status=complete"
            )
        )
        return sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
    except Exception:
        return 0.0


def main() -> None:
    from mediaplaycounts_spark.session import get_spark
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    production = _production_paths()
    # The UI is the only source of executor-CPU stage metrics; bounded
    # retention so long runs don't evict stages mid-diff (ADVICE r7).
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    def run(key: str, table=None) -> tuple[float, float]:
        """(best wall, best cpu) over 3 runs — floors taken independently
        (identical plans mode-flip 1.4-3.6x in CPU under memory
        pressure; each metric's floor is its closest true-cost
        observable, same rule as tools/paired_decade.py)."""
        table = table or qs
        time_build = key in _TIME_BUILD
        df = table[key](spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()  # warm-up
        best = best_cpu = float("inf")
        for _ in range(3):
            c0 = _cpu_totals(sc)
            t0 = time.perf_counter()
            df = table[key](spark, SF_DIR)
            if not time_build:
                t0 = time.perf_counter()
                c0 = _cpu_totals(sc)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
            best_cpu = min(best_cpu, _cpu_totals(sc) - c0)
        return round(best, 4), round(max(best_cpu, 0.0), 4)

    timings, cpu = {}, {}
    for k in HEADLINE:
        if k in qs:
            timings[k], cpu[k] = run(k)
    extended = {}
    for k in EXTENDED:
        if k in qs:
            extended[k], cpu[k] = run(k)
    prod = {}
    for k in sorted(production):
        prod[k], cpu[k] = run(k, production)
    total = round(sum(timings.values()), 4)

    record = "--record" in sys.argv
    if record:
        with open(REFERENCE_PATH, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "queries": {**timings, **extended, **prod},
                    "cpu": cpu,
                },
                f,
                indent=2,
                sort_keys=True,
            )
    drift_alerts = {}
    if not record and os.path.exists(REFERENCE_PATH):
        with open(REFERENCE_PATH) as f:
            ref = json.load(f)
        if ref.get("sf_dir") == SF_DIR:  # only compare like-for-like
            ref_cpu = ref.get("cpu", {})
            for k, t in {**timings, **extended, **prod}.items():
                r = ref["queries"].get(k)
                if not (r and t > DRIFT_FACTOR * r):
                    continue
                rc, c = ref_cpu.get(k), cpu.get(k)
                # `is not None`, not truthiness (ADVICE r8): a measured
                # CPU of 0.0 is the STRONGEST no-extra-work evidence a
                # trivially-cheap key can give — truthiness would treat
                # it as "no CPU data" and fall back to wall-only
                # alerting exactly where wall is noisiest.
                if rc is not None and c is not None and c <= max(
                    CPU_DRIFT_FACTOR * rc, rc + CPU_ABS_SLACK_S
                ):
                    # wall over gate but WORK within gate: load band,
                    # not a plan regression — record, don't alert
                    continue
                drift_alerts[k] = {"now": t, "recorded": r}
                if rc and c:
                    drift_alerts[k].update(
                        {"now_cpu": c, "recorded_cpu": rc}
                    )
    if drift_alerts:
        print(
            f"DRIFT >%{int((DRIFT_FACTOR-1)*100)}: {drift_alerts}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "headline_total_warm_best3",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extended": extended,
                "production": prod,
                "cpu": cpu,
                "drift_alerts": drift_alerts,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
