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


def test_delta_py_streaming_source(spark, tmp_path):
    """readStream.format('delta_py'): offsets are log versions; each
    restart resumes from the checkpoint and sees only NEW commits."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from duckdb_delta_spark import DeltaTable, DeltaWriter
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    spark.dataSource.register(DeltaPySource)
    tdir = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    schema = T.StructType([T.StructField("i", T.LongType()),
                           T.StructField("g", T.LongType())])
    w = DeltaWriter.create(spark, tdir, schema, partition_by=["g"])
    w.append(spark.range(20).select(F.col("id").alias("i"),
                                    (F.col("id") % 2).alias("g")))

    def run_batch():
        q = (
            spark.readStream.format("delta_py")
            .option("path", tdir)
            .option("startingVersion", "0")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    got = spark.read.schema(schema).parquet(out)
    assert got.count() == 20
    assert got.agg(F.sum("i")).collect()[0][0] == sum(range(20))
    assert {r["g"] for r in got.select("g").distinct().collect()} == {0, 1}

    # second commit; a resumed stream picks up ONLY the delta
    DeltaWriter(tdir, spark).append(
        spark.range(20, 30).select(F.col("id").alias("i"),
                                   (F.col("id") % 2).alias("g")))
    run_batch()
    got2 = spark.read.schema(schema).parquet(out)
    assert got2.count() == 30
    assert got2.agg(F.sum("i")).collect()[0][0] == sum(range(30))

    # OPTIMIZE is invisible to the stream; a DELETE fails it by default
    assert DeltaWriter(tdir, spark).compact(target_file_bytes=64 << 20) is not None
    run_batch()
    assert spark.read.schema(schema).parquet(out).count() == 30
    DeltaWriter(tdir, spark).delete("i < 2")
    import pyspark.errors

    try:
        run_batch()
        raised = False
    except Exception:
        raised = True
    assert raised, "stream over a DELETE commit must fail without ignoreChanges"


def test_delta_py_streaming_sink_roundtrip(spark, tmp_path):
    """Delta -> stream -> Delta: the sink commits one Delta version per
    micro-batch with txn(appId, batchId) idempotency; a second availableNow
    run with the same checkpoint adds nothing."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from duckdb_delta_spark import DeltaTable, DeltaWriter
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    spark.dataSource.register(DeltaPySource)
    src_dir = str(tmp_path / "src")
    dst_dir = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ck")

    schema = T.StructType([T.StructField("i", T.LongType()),
                           T.StructField("x", T.DoubleType())])
    w = DeltaWriter.create(spark, src_dir, schema)
    w.append(spark.range(25).select(F.col("id").alias("i"),
                                    (F.col("id") * 0.5).alias("x")))
    DeltaWriter.create(spark, dst_dir, schema)

    def run():
        q = (
            spark.readStream.format("delta_py")
            .option("path", src_dir)
            .option("startingVersion", "0")
            .load()
            .writeStream.format("delta_py")
            .option("path", dst_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    t = DeltaTable(dst_dir)
    assert t.to_df(spark).count() == 25
    assert t.to_df(spark).agg(F.sum("i")).collect()[0][0] == sum(range(25))
    # add actions carry footer stats; commit carries the txn action
    (last_v,) = [t.version]
    import json as _json
    import os as _os

    actions = [
        _json.loads(line)
        for line in open(_os.path.join(
            dst_dir, "_delta_log", f"{last_v:020d}.json"))
    ]
    assert any("txn" in a for a in actions)
    add = next(a["add"] for a in actions if "add" in a)
    assert _json.loads(add["stats"])["numRecords"] > 0

    # re-running with the same checkpoint must not duplicate anything
    run()
    assert DeltaTable(dst_dir).to_df(spark).count() == 25
    # a new source commit flows through as exactly one new version
    DeltaWriter(src_dir, spark).append(
        spark.range(25, 30).select(F.col("id").alias("i"),
                                   (F.col("id") * 0.5).alias("x")))
    run()
    assert DeltaTable(dst_dir).to_df(spark).count() == 30
