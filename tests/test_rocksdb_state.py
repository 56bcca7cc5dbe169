"""RocksDB state store for the stateful streaming keys (VERDICT r3 #4).

The default HDFSBackedStateStoreProvider keeps all streaming state on
the JVM heap — the 100-TB state killer for per-user dedup horizons and
merging session windows. The stateful keys now run inside the
`rocksdb_state_store` scope; these tests prove (a) the provider is
genuinely ACTIVE during the run (checkpoint layout inspection, not just
conf reading), (b) the conf is restored afterwards, (c) the
`statestore` reader still reads a RocksDB-written checkpoint, and
(d) the registered keys stay value-correct under the swap (their
oracles run in the 303-key sweep; here we assert batch-twin equality
in-process).
"""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from mediaplaycounts_spark.streaming.jobs import (
    ROCKSDB_PROVIDER,
    _PROVIDER_CONF,
    rocksdb_state_store,
)

SF = "/root/testdata/sf0.001"
SCRATCH = pathlib.Path(__file__).resolve().parents[1] / ".scratch"


def test_scope_sets_and_restores_conf(spark):
    try:
        before = spark.conf.get(_PROVIDER_CONF, None)
    except Exception:
        before = None
    with rocksdb_state_store(spark):
        assert spark.conf.get(_PROVIDER_CONF) == ROCKSDB_PROVIDER
    try:
        after = spark.conf.get(_PROVIDER_CONF, None)
    except Exception:
        after = None
    assert after == before


def test_statestore_reader_reads_rocksdb_checkpoint(spark):
    """Run the key (which checkpoints under .scratch/ssreader_*), then
    verify the NEWEST checkpoint was written by RocksDB: its state
    directory holds .changelog/.zip files, never the HDFS provider's
    .delta files. The key returning correct rows proves the
    `statestore` reader parses that RocksDB state."""
    before = set(SCRATCH.glob("ssreader_*"))
    df = entrymod.queries()["stream_statestore_reader"](spark, SF)
    rows = df.collect()
    assert len(rows) > 0
    new = set(SCRATCH.glob("ssreader_*")) - before
    assert len(new) == 1
    state_files = [
        p for p in (next(iter(new)) / "ckpt" / "state").rglob("*") if p.is_file()
    ]
    suffixes = {p.suffix for p in state_files}
    assert ".delta" not in suffixes, (
        "HDFS-provider delta files found — RocksDB scope was not active"
    )
    assert {".zip", ".changelog"} & suffixes or any(
        "rocksdb" in str(p).lower() for p in state_files
    ), f"no RocksDB artifacts in checkpoint: {sorted(suffixes)}"
    # values: state contents equal the batch aggregation
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.expr("timestamp_micros(ts div 1000)").alias("ts"), "event_type")
        if dict(spark.read.parquet(f"{SF}/events.parquet").dtypes).get("ts")
        == "bigint"
        else spark.read.parquet(f"{SF}/events.parquet")
    )
    expected = (
        batch.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("ws"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {tuple(r) for r in rows} == {tuple(r) for r in expected}


@pytest.mark.parametrize(
    "key",
    [
        "stream_session_window",
        "stream_dedup_stateful",
        "stream_stateful_running_totals",
    ],
)
def test_stateful_keys_exact_under_rocksdb(spark, key):
    """The three stateful keys run under RocksDB unconditionally now;
    assert they still match their batch twins computed in-process."""
    got = {tuple(r) for r in entrymod.queries()[key](spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if key == "stream_dedup_stateful":
        want = (
            ev.groupBy("user_id")
            .agg(F.count_distinct(F.date_trunc("day", "ts")).alias("n"))
            .collect()
        )
    elif key == "stream_stateful_running_totals":
        want = (
            ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
            .collect()
        )
    else:  # session window: count of sessions == distinct (user, session)
        from pyspark.sql.window import Window as W

        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        lagged = ev.select(
            "user_id", "ts", F.lag("ts").over(w).alias("pts")
        ).withColumn(
            "brk",
            (
                F.col("pts").isNull()
                | F.expr("ts - pts >= INTERVAL 30 MINUTES")
            ).cast("int"),
        )
        sess = lagged.withColumn(
            "sid",
            F.sum("brk").over(
                W.partitionBy("user_id").orderBy("ts").rowsBetween(
                    W.unboundedPreceding, 0
                )
            ),
        )
        want = (
            sess.groupBy("user_id", "sid")
            .agg(
                F.min("ts").cast("timestamp_ntz").alias("session_start"),
                F.count("*").alias("n_events"),
            )
            .select("user_id", "session_start", "n_events")
            .collect()
        )
    assert got == {tuple(r) for r in want}
