"""Per-key scale ratios from two correctness-sweep logs (VERDICT r3 #2).

Parses the `spark=<t>s` timings that tools/check_correctness.py writes
per key at two scale factors and emits a markdown table of sf-to-sf
time ratios, flagging keys whose engine time grew super-linearly in the
data (ratio > the SF ratio, e.g. >10x for sf0.01->sf0.1).

Timings at sub-second scale are dominated by fixed task-scheduling
overhead, so tiny keys are EXCLUDED from the flag (a 0.2s->0.5s move is
noise, not a scaling law); the flag threshold applies to keys whose
larger-SF time exceeds --min-sec.

Usage:
    python tools/scale_ratios.py CORRECTNESS_full_r04.txt \
        CORRECTNESS_sf01_r4.txt --factor 10 --min-sec 2 [--top 25]
"""

from __future__ import annotations

import argparse
import re
import sys

LINE = re.compile(r"^[✓✗~] (\w+):.*?\((\d+) rows, spark=([0-9.]+)s")

#: Documented per-key complexity bounds for the sf0.1->sf1 decade
#: (VERDICT r4 next #1): allowed time-growth factor per 10x data, as a
#: multiple of the data factor. 1.0 = linear (the default for every
#: key not listed). Keys listed here have a documented superlinear term
#: and get slack = factor x bound; the bound is the CLAIM being gated,
#: so raising one is a reviewed act — justify it in the commit.
COMPLEXITY_BOUNDS = {
    # O(n log n) component rounds: label propagation + pointer jumping
    # adds ~log10 growth in rounds on top of linear per-round work.
    "dedup_minhash_clusters": 1.4,
    "dedup_clusters": 1.4,
    # pair-join keys: candidate pairs grow ~linearly by construction
    # (intra-replica dup families), but the exact-verify twin embedded
    # for grading re-verifies every pair -> allow modest slack for the
    # verify fan-in skew.
    "dedup_ngram_jaccard": 1.3,
    "text_containment_pairs": 1.3,
    "dedup_near_minhash": 1.3,
    # r8: dedup_simhash's registered plan embeds the EXACT J>=0.5
    # ground-truth twin (inverted-index pairs) since the grading-twin
    # fix — the r1-r7 bound of 1.0 priced the old LSH-routed twin,
    # which was cheap because it was silently recall<1 under the prod
    # conf. The production simhash operator (prod_simhash_pairs:
    # fingerprints + chunk equi-join) remains plain linear and is
    # benched separately; the registered key now carries the same
    # pair-twin slack as dedup_near_minhash.
    "dedup_simhash": 1.3,
    # triangle counting: sum over nodes of deg^2 within replicas stays
    # linear under replica-disjoint scaling, but the heaviest block's
    # skew grows with block size.
    "graph_triangle_count": 1.3,
    # link prediction (r7): the degree cap (_LP_DEGREE_CAP) bounds the
    # co-pair stream at n_supp·d² — linear in suppliers BY CONSTRUCTION.
    # The r5-era 1.4 bound priced an uncapped Σdeg² spill boundary
    # (re-measured r7: 16.5x per 10x with 252 GB memory-spill at sf1);
    # capped, the paired decade is 2.3x per 10x with ZERO spill
    # (evidence/sf1_paired_linkpred_r7.jsonl), so the claim is plain
    # linear again.
    "graph_link_prediction": 1.0,
    # emitted-pair-bound ops: runtime tracks qualifying pairs (the
    # out-rows growth term), plus verify work on sub-threshold
    # candidates that never reach the output.
    "dedup_embedding_cosine": 1.2,
    "sim_cosine_pairs": 1.2,
}


def parse(path: str) -> dict[str, tuple[float, int]]:
    """key -> (spark seconds, output rows)."""
    out: dict[str, tuple[float, int]] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            m = LINE.match(line.strip())
            if m:
                out[m.group(1)] = (float(m.group(3)), int(m.group(2)))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("small_log")
    ap.add_argument("big_log")
    ap.add_argument("--factor", type=float, default=10.0,
                    help="data-size ratio between the two logs")
    ap.add_argument("--min-sec", type=float, default=2.0,
                    help="flag only keys at least this slow at the big SF")
    ap.add_argument("--top", type=int, default=25,
                    help="rows to print (slowest at big SF first)")
    args = ap.parse_args()

    small, big = parse(args.small_log), parse(args.big_log)
    keys = sorted(set(small) & set(big), key=lambda k: -big[k][0])
    flagged = []
    print(
        "| key | spark@small | spark@big | ratio | out-rows growth "
        "| allowed | note |"
    )
    print("| --- | --- | --- | --- | --- | --- | --- |")
    for k in keys[: args.top]:
        (s, sr), (b, br) = small[k], big[k]
        ratio = b / s if s > 0 else float("inf")
        # An operator whose OUTPUT grows faster than the input (more
        # qualifying pairs per row at the bigger SF) is charged for its
        # output, not flagged for it: linear-in-work means runtime
        # tracks max(input growth, output growth).
        out_growth = (br / sr) if sr > 0 else 1.0
        allowed = COMPLEXITY_BOUNDS.get(k, 1.0) * max(args.factor, out_growth)
        note = ""
        if b >= args.min_sec and ratio > allowed:
            note = f"**exceeds complexity bound** (> {allowed:.0f}x)"
            flagged.append(k)
        elif b >= args.min_sec and ratio <= 1.5:
            note = "overhead-bound (flat)"
        print(
            f"| `{k}` | {s:.1f}s | {b:.1f}s | {ratio:.1f}x | "
            f"{out_growth:.1f}x | {allowed:.0f}x | {note} |"
        )
    n_sub = sum(
        1 for k in set(small) & set(big)
        if big[k][0] < args.min_sec
    )
    print(
        f"\n{len(set(small) & set(big))} keys compared; {n_sub} finish "
        f"under {args.min_sec:.0f}s at the big SF (overhead-dominated, "
        f"not flaggable); complexity-bound flags: {flagged or 'none'}"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
