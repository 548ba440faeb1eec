"""Structured Streaming operators vs their batch twins.

Each stream runs to completion with trigger(availableNow) into a memory
sink, then is diffed against a batch computation with identical event-time
semantics over the same parquet — batch-as-oracle.
"""

import pytest
from pyspark.sql import functions as F

from datafusion_parallelism_spark.session import load
from datafusion_parallelism_spark.streaming.events import (
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
    session_windows_stream,
    user_running_totals_stream,
)


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_hourly_counts_matches_batch(spark, sf_dir):
    stream = hourly_counts_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "hourly_mem", output_mode="complete")
    got = _rows(spark.table("hourly_mem"), "hour_start", "event_type")

    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "value_sum")
    )
    assert got == _rows(batch, "hour_start", "event_type")


def test_session_windows_matches_batch(spark, sf_dir):
    stream = session_windows_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "sessions_mem", output_mode="complete")
    got = _rows(spark.table("sessions_mem"), "user_id", "session_start")

    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )
    assert got == _rows(batch, "user_id", "session_start")


def test_stateful_running_totals_matches_batch(spark, sf_dir):
    stream = user_running_totals_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "totals_mem", output_mode="update")
    # update mode may emit a row per key per micro-batch; the LAST emission
    # per user is the final running total.
    mem = spark.table("totals_mem")
    got = {
        r.user_id: (r.n_events, r.value_total)
        for r in mem.collect()  # memory sink appends in batch order; last wins
    }

    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    expected = {r.user_id: (r.n, r.total) for r in batch.collect()}
    assert set(got) == set(expected)
    for uid, (n, total) in expected.items():
        assert got[uid][0] == n
        assert got[uid][1] == pytest.approx(total, abs=0.02)


def test_watermark_present_in_plan(spark, sf_dir):
    stream = hourly_counts_stream(read_events_stream(spark, sf_dir))
    assert "watermark" in stream._jdf.queryExecution().analyzed().toString().lower()
