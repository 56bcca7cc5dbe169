"""Physical-plan audit across the whole registry.

For every `queries()` key, explain("formatted") the plan and grep for
the patterns that do not survive a 100x scale-up:

- CartesianProduct / BroadcastNestedLoopJoin — quadratic joins. Allowed
  only where a tiny side is intentional (guarded crossJoin, probe
  broadcasts); everything else must be a hash/SMJ or a bucketized
  rewrite.
- BatchEvalPython — row-at-a-time Python UDF in the plan. Allowed only
  for the explicitly-registered escape hatches (`udf_scalar_py`,
  `udtf_lateral_split`); Arrow paths (ArrowEvalPython / mapInPandas /
  FlatMapGroupsInPandas) are fine.
- Exchange count — informational; flags queries whose shuffle count
  jumped since the last audit.

Usage:
    python tools/plan_audit.py [--sf /root/testdata/sf0.001] > PLAN_AUDIT.md
"""

from __future__ import annotations

import argparse
import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")

#: Keys whose quadratic or Python-row-wise node is the documented point
#: of the operator (tiny side / escape hatch), with the reason.
ALLOWED = {
    "join_cross_small": "guarded crossJoin, small side only",
    "join_range_interval": "theta join kept as the naive baseline; scale path is join_range_bucketized",
    "sim_knn_join": "broadcast probe BNLJ: probe side is a 5-row batch",
    "sim_topk_probe": "probe vector broadcast, corpus never moves",
    "agg_funnel_steps": "three 1-row aggregates crossed together",
    "graph_triangle_count": "two 1-row count aggregates crossed for the summary row",
    "udf_scalar_py": "the documented row-wise UDF escape hatch",
    "udtf_lateral_split": "the documented Python table-function escape hatch",
    "agg_variance_exact": "single-row moment tables crossed",
    "agg_heavy_hitters": "candidate set crossJoin with 1-row total",
    "scan_tsv_log": "tiny fixture union",
    "ts_gapfill_interpolate": "calendar spine x type list: both sides tiny by construction (O(types x days) grid)",
    "sim_mmr_diversify": "greedy argmax stages crossJoin 1-row broadcast selected sets over the k-candidate table",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from mediaplaycounts_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("plan-audit")
    qs = entrymod.queries()

    print("# PLAN AUDIT — quadratic joins / Python-row-wise nodes / shuffles")
    print()
    print(f"Audited at `{args.sf}`; regenerate with `python tools/plan_audit.py`.")
    print()
    print("| key | shuffles | quadratic join | row-wise Python | verdict |")
    print("| --- | --- | --- | --- | --- |")
    flagged = 0
    for key in sorted(qs):
        try:
            df = qs[key](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # streaming-only or env-gated keys
            print(f"| `{key}` | - | - | - | not explainable: {type(exc).__name__} |")
            continue
        shuffles = len(re.findall(r"Arguments: (?:hash|range)partitioning", plan))
        quad = bool(re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan))
        pyrow = "BatchEvalPython" in plan
        if (quad or pyrow) and key not in ALLOWED:
            verdict = "**FLAG**"
            flagged += 1
        elif quad or pyrow:
            verdict = f"ok — {ALLOWED[key]}"
        else:
            verdict = "ok"
        print(
            f"| `{key}` | {shuffles} | {'yes' if quad else '-'} |"
            f" {'yes' if pyrow else '-'} | {verdict} |"
        )
    print()
    print(f"Flagged: {flagged}")
    if flagged:
        sys.exit(1)


if __name__ == "__main__":
    main()
