"""Structured Streaming: bounded-stream results equal their batch analogues."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stream_hourly_equals_batch(spark):
    from duckdb_delta_spark.queries import load
    from duckdb_delta_spark.streaming import (
        hourly_event_counts_stream,
        run_stream_to_memory,
        stream_events,
    )

    got = run_stream_to_memory(
        hourly_event_counts_stream(stream_events(spark, SF)),
        output_mode="complete",
    ).select("hour", "event_type", "n")

    want = (
        load(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_sessionize_stream_emits_closed_sessions(spark):
    from duckdb_delta_spark.streaming import (
        run_stream_to_memory,
        sessionize_stream,
        stream_events,
    )

    out = run_stream_to_memory(
        sessionize_stream(stream_events(spark, SF), gap_min=30,
                          watermark="36500 days"),
        output_mode="append",
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
