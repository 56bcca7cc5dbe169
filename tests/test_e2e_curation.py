"""pipeline_e2e_curation (VERDICT r5 #5 / r6 next #4): the one-lineage
raw-corpus -> training-manifest composition. The exact value oracle runs
via tools/check_correctness.py; these tests pin the PLAN properties the
docstring claims (lineage fork cuts, Arrow packer in-plan) and the
cross-stage invariants the oracle's value hash can't articulate.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def e2e(spark):
    return entrymod.queries()["pipeline_e2e_curation"](spark, SF_SMOKE)


def test_final_plan_is_cut_at_the_last_fork(spark, e2e):
    """The final kept set is checkpointed before the pack/manifest fork,
    so the RETURNED plan must be join(window(RDD), applyInPandas(RDD)) —
    zero parquet scans (no upstream re-derivation per consumer) and the
    Arrow grouped-map packer present."""
    plan = e2e._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan, "final fork checkpoint missing"
    assert "parquet" not in plan.lower(), (
        "upstream pipeline re-derived past the fork checkpoint:\n" + plan
    )
    assert "FlatMapGroupsInPandas" in plan, "Arrow packing kernel not in plan"


def test_bin_fill_invariant(e2e):
    """Greedy 128-token packing: every (pack_shard, bin_idx) bin's token
    sum is <= 128 unless it holds a single oversized doc."""
    rows = e2e.collect()
    assert len(rows) > 0
    bins: dict[tuple, list[int]] = {}
    for r in rows:
        bins.setdefault((r.pack_shard, r.bin_idx), []).append(r.n_tokens)
    for (shard, b), toks in bins.items():
        assert sum(toks) <= 128 or len(toks) == 1, (
            f"bin ({shard},{b}) overfilled: {toks}"
        )


def test_shard_idx_monotone_per_lang(e2e):
    """Start-offset shard assignment: shard_idx is non-decreasing in
    doc_id within a lang, and consecutive docs never skip a shard by
    more than their own size allows (offsets are cumulative)."""
    rows = sorted(e2e.collect(), key=lambda r: (r.lang, r.doc_id))
    prev: dict[str, int] = {}
    for r in rows:
        assert r.shard_idx >= prev.get(r.lang, 0)
        prev[r.lang] = r.shard_idx


def test_survivors_are_gate_keepers_and_decontaminated(spark, e2e):
    """Composition consistency against the per-stage keys: every e2e
    survivor passed the Gopher gate (text_gopher_quality keep=1), is not
    an eval-set doc (doc_id % 97 != 0), and is not flagged contaminated
    by text_contamination_overlap."""
    qs = entrymod.queries()
    out_ids = {r.doc_id for r in e2e.select("doc_id").collect()}
    keepers = {
        r.doc_id
        for r in qs["text_gopher_quality"](spark, SF_SMOKE)
        .filter("keep = 1")
        .select("doc_id")
        .collect()
    }
    assert out_ids <= keepers
    assert all(i % 97 != 0 for i in out_ids)
    contaminated = {
        r.doc_id
        for r in qs["text_contamination_overlap"](spark, SF_SMOKE)
        .filter("contaminated = 1")
        .select("doc_id")
        .collect()
    }
    # per-stage key computes trigrams on RAW text; the e2e stage on
    # redacted text — identical on this PII-free corpus by construction
    assert out_ids.isdisjoint(contaminated)


def test_anchor_guarded_redaction_equals_unguarded(spark):
    """The r11 scalar rewrite gates each redaction regex behind a
    contains() check for its literal anchor ('@' for _EMAIL_RE,
    '+1-555-' for _PHONE_RE, the latter checked on the RAW text even
    though the regex runs on the email-redacted text). Pin the
    equivalence argument on adversarial strings: anchors adjacent to
    matches, anchors without full matches, digits inside email local
    parts, replacement boundaries — guarded and unguarded forms must
    agree on every row."""
    from pyspark.sql import functions as F

    from mediaplaycounts_spark.queries.curation import _EMAIL_RE, _PHONE_RE

    texts = [
        "plain prose with no pii at all",
        "user@example.com",
        "+1-555-0123",
        "both x9@y.z and +1-555-0000 here",
        "adjacent abc@def.ghi+1-555-9999 no space",
        "anchor only @ floating",
        "anchor only +1-555- truncated",
        "+1-555-12 too short to match",
        "digits in local part a123@bb.cc",
        "phone then email +1-555-4321 tail z@q.r",
        "email-ish a@b (no tld dot) plus +1-555-7777",
        "uppercase USER@EXAMPLE.COM stays (case-sensitive pattern)",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")

    unguarded = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    # the ACTUAL production expression (ADVICE r11: the test used to
    # re-declare it inline, so pipeline drift could not fail here)
    from mediaplaycounts_spark.queries.curation import guarded_redact

    guarded = guarded_redact(F.col("text"))

    rows = df.select("id", "text", unguarded.alias("u"), guarded.alias("g")).collect()
    mismatches = [(r.text, r.u, r.g) for r in rows if r.u != r.g]
    assert mismatches == []
    # sanity: the corpus actually exercises both replacement paths
    assert any("<EMAIL>" in r.u for r in rows)
    assert any("<PHONE>" in r.u for r in rows)
