"""Streaming batch-equivalence and watermark semantics (SURVEY.md §5.3)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from iot_data_pipeline_spark.operators._util import table
from iot_data_pipeline_spark.streaming import streams


def test_tumbling_equals_batch(spark, sf_dir):
    streamed = streams.stream_tumbling_agg(spark, sf_dir)
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_dedup_equals_distinct(spark, sf_dir):
    deduped = streams.stream_dedup(spark, sf_dir)
    n = table(spark, sf_dir, "events").count()
    assert deduped.count() == n
    ids = [r["event_id"] for r in deduped.select("event_id").collect()]
    assert len(set(ids)) == n


def test_watermark_drops_late_rows(spark, tmp_path):
    """Controlled late-data fixture pinning Spark's exact watermark
    semantics: a late row arriving AFTER its window was finalized+evicted is
    dropped (a late row arriving while the window state is still live is
    merged — the watermark bounds finalization, not arrival)."""
    sdir = tempfile.mkdtemp(prefix="wm_fixture_")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(path, rows, mtime):
        df = spark.createDataFrame(rows, streams.EVENTS_SCHEMA)
        stage = path + "_stage"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(os.path.join(stage, part), path)
        os.utime(path, (mtime, mtime))

    def ev(i, minutes):
        return Row(
            event_id=i,
            ts=base + dt.timedelta(minutes=minutes),
            user_id=1,
            event_type="a",
            value=1.0,
            props="{}",
        )

    # batch 0: window 00:00 gets one row; max event time 02:00.
    mk(os.path.join(sdir, "00000.parquet"), [ev(1, 0), ev(2, 120)], 1_700_000_000)
    # batch 1: watermark → 01:50, finalizes + evicts window 00:00 (cnt=1).
    mk(os.path.join(sdir, "00001.parquet"), [ev(4, 150)], 1_700_000_001)
    # batch 2: event 3 @00:01 is now LATE (window already finalized) → drop.
    mk(os.path.join(sdir, "00002.parquet"), [ev(3, 1)], 1_700_000_002)
    # batch 3: advance so earlier windows flush; 05:00 stays unemitted.
    mk(os.path.join(sdir, "00003.parquet"), [ev(5, 300)], 1_700_000_003)

    stream = streams._read_stream(spark, sdir, max_files=1)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("window.start").alias("ws"), "cnt")
    )
    out = streams._run_to_memory(agg, "append")
    got = {(r["ws"], r["cnt"]) for r in out.collect()}
    assert got == {
        (base, 1),  # late event 3 NOT merged — dropped after eviction
        (base + dt.timedelta(minutes=120), 1),
        (base + dt.timedelta(minutes=150), 1),
    }


def test_stateful_count_equals_batch(spark, sf_dir):
    out = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in streams.stream_stateful_count(spark, sf_dir).collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["cents"])
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    assert out == batch
