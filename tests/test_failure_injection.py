"""Streaming failure injection (VERDICT r4 next #4).

`stream_restart_idempotent` proves two CLEAN AvailableNow runs; these
tests kill a run MID-STREAM and prove the checkpoint + idempotent-sink
contract actually holds under failure:

1. The foreachBatch body raises AFTER batch 0 committed but DURING
   batch 1 — after the staging table was written, BEFORE the MERGE ran
   (the nastiest point: partial side effects of an uncommitted batch
   are already in the store).
2. The query dies with StreamingQueryException; a restart on the SAME
   checkpoint replays batch 1 from the source (its offset never
   committed) and re-runs the stage + MERGE.
3. The final Derby table must equal the exact batch aggregate — which
   is only true if (a) batch 0 was NOT replayed (checkpoint offset
   held) or its replay was idempotent, and (b) batch 1's partial
   first attempt left nothing the MERGE double-counted.

This is the recovery semantics a 100 TB cron->JDBC serving load relies
on: Structured Streaming replays uncommitted batches at-least-once,
and the seq-guarded MERGE turns that into exactly-once TABLE STATE.
"""

from __future__ import annotations

import pathlib
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

from mediaplaycounts_spark.queries.streaming import (
    _DERBY_DRIVER,
    _UPSERT_MERGE_SQL,
)

SF = "/root/testdata/sf0.001"
SCRATCH = pathlib.Path(".scratch")


def _derby(spark, url: str, sql: str) -> None:
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(sql)
    st.close()
    conn.close()


def test_midbatch_kill_then_restart_holds_exactly_once_counts(spark):
    run_dir = SCRATCH / f"failinj_{uuid.uuid4().hex[:12]}"
    stage_in = str(run_dir / "in")
    ckpt_dir = str(run_dir / "ckpt")
    db = run_dir / "derby"
    url = f"jdbc:derby:{db};create=true"
    poison = run_dir / "poison"  # present => batch 1 dies mid-flight

    from mediaplaycounts_spark.tables import load_table

    ev = load_table(spark, SF, "events").select(
        "event_type",
        F.date_format(F.date_trunc("DAY", "ts"), "yyyy-MM-dd").alias("day_s"),
    )
    # two single-file deliveries -> two micro-batches under
    # maxFilesPerTrigger=1 (same staging shape as stream_jdbc_upsert)
    half = ev.withColumn("h", F.crc32("event_type") % 2)
    half.filter("h = 0").drop("h").coalesce(1).write.mode("append").parquet(stage_in)
    half.filter("h = 1").drop("h").coalesce(1).write.mode("append").parquet(stage_in)

    _derby(
        spark,
        url,
        'CREATE TABLE playcounts ("event_type" VARCHAR(32), '
        '"day_s" VARCHAR(10), "n" BIGINT, "seq" INT)',
    )

    def upsert(batch_df, batch_id: int) -> None:
        agg = (
            batch_df.groupBy("event_type", "day_s")
            .agg(F.count("*").alias("n"))
            .withColumn("seq", F.lit(int(batch_id)))
        )
        (
            agg.write.format("jdbc")
            .option("url", url)
            .option("dbtable", "staging")
            .option("driver", _DERBY_DRIVER)
            .option(
                "createTableColumnTypes",
                "event_type VARCHAR(32), day_s VARCHAR(10)",
            )
            .mode("overwrite")
            .save()
        )
        if batch_id >= 1 and poison.exists():
            # staging written, MERGE not yet run: the partial-batch
            # failure point. The batch's offset never commits, so the
            # restart must replay it and redo stage + MERGE.
            raise RuntimeError("injected failure before MERGE")
        c = batch_df.sparkSession._jvm.java.sql.DriverManager.getConnection(url)
        s = c.createStatement()
        s.executeUpdate(_UPSERT_MERGE_SQL)
        s.close()
        c.close()

    def start():
        return (
            spark.readStream.schema("event_type string, day_s string")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_in)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )

    poison.parent.mkdir(parents=True, exist_ok=True)
    poison.touch()
    q = start()
    with pytest.raises(StreamingQueryException, match="injected failure"):
        q.awaitTermination()

    # batch 0 committed before the kill; batch 1 must NOT have merged
    back_cols = '"event_type", "day_s", "n"'
    mid = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"(SELECT {back_cols} FROM playcounts) t")
        .option("driver", _DERBY_DRIVER)
        .load()
    )
    mid_rows = {tuple(r) for r in mid.collect()}
    batch0_expected = {
        tuple(r)
        for r in half.filter("h = 0")
        .groupBy("event_type", "day_s")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert mid_rows == batch0_expected, "mid-crash state must be exactly batch 0"

    # restart on the SAME checkpoint without the poison: batch 1 replays
    poison.unlink()
    q2 = start()
    q2.awaitTermination()

    final = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"(SELECT {back_cols} FROM playcounts) t")
        .option("driver", _DERBY_DRIVER)
        .load()
    )
    final_rows = {tuple(r) for r in final.collect()}
    expected = {
        tuple(r)
        for r in ev.groupBy("event_type", "day_s")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert final_rows == expected, (
        "post-restart table must equal the exact batch aggregate "
        "(exactly-once TABLE STATE from at-least-once replay + MERGE)"
    )
