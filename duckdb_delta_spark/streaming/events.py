"""Structured Streaming operators over the events table.

The reference has **no** streaming surface (SURVEY.md §2E: CDF is
recognized-but-unsupported, src/delta_utils.cpp:805-806); this module is a
beyond-reference extension point: the same event analytics the batch suite
answers (hourly windows, sessionization), expressed as incremental streams.

Design for scale:

* Source is a file stream (``readStream.parquet``) — swap for Kafka/Delta
  CDF by changing one line; ``maxFilesPerTrigger`` bounds batch size.
* Watermarks bound state: late events beyond the watermark are dropped, so
  state size is O(active windows / active sessions), not O(history).
* Sessionization uses ``applyInPandasWithState`` — the Spark-native custom
  stateful operator (Arrow-batched per group), with explicit state schema
  and event-time timeout, the scalable shape for per-key streaming logic.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from duckdb_delta_spark.queries import dsum
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

SESSION_GAP_MIN = 30


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """events.parquet as a bounded file stream with proper event-time ts."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    static = spark.read.parquet(path)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isdir(path):
        # Spark-written DIRECTORY layout (e.g. .benchdata/sf1): stream
        # the directory itself — a pathGlobFilter on the dir name would
        # match no leaf part-files and silently stream nothing
        df = reader.parquet(path)
    else:
        # single-file layout (driver testdata): file streams take a
        # directory, so stream the sf dir globbed to this one file
        df = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        # watermarks require TIMESTAMP (tz-adjusted); session tz is UTC so
        # wall-clock values are preserved exactly
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def hourly_event_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1h windows per event_type with a watermark bounding state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour"), "event_type", "n", "total_value"
        )
    )


_SESSION_STATE = T.StructType(
    [
        T.StructField("session_start", T.LongType()),  # epoch micros
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN, watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based sessions per user via ``applyInPandasWithState``.

    State = (session_start, last_ts, n_events) per user; a session closes
    when the event-time timeout fires (no events within the gap past the
    watermark). Emits one row per closed session.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_min * 60 * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                }
            )
            return

        ts_all = []
        for pdf in pdf_iter:
            ts_all.extend(pdf["ts"].astype("int64") // 1000)  # ns → µs
        ts_all.sort()
        if not ts_all:
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_all[0], ts_all[0], 0
        closed = []
        for t in ts_all:
            if t - last > gap_us:
                closed.append((start, last, n))
                start, n = t, 0
            last = max(last, t)
            n += 1
        state.update((start, last, n))
        state.setTimeoutTimestamp((last + gap_us) // 1000)  # ms
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def view_purchase_join_stream(
    events: DataFrame, window_min: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each ``view`` paired with the same
    user's ``purchase`` events landing within ``window_min`` minutes —
    the incremental attribution join every event pipeline runs.

    Both sides carry a watermark and the join condition bounds the time
    range, so Spark's symmetric hash join can EVICT state older than
    watermark + window on each side (state is O(events in the horizon),
    not O(stream)); without the range bound the state store would grow
    forever — the canonical stream-stream join scale trap. JVM state
    store, no Python."""
    views = (
        events.where(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"),
                F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", watermark)
    )
    buys = (
        events.where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("b_user"),
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    cond = F.expr(
        "v_user = b_user AND purchase_ts >= view_ts AND "
        f"purchase_ts <= view_ts + interval {int(window_min)} minutes"
    )
    return views.join(buys, cond, "inner").select(
        F.col("v_user").alias("user_id"), "view_ts", "purchase_ts"
    )


def view_purchase_left_join_stream(
    events: DataFrame, window_min: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every ``view`` emits —
    with its in-window ``purchase`` rows when they exist, and exactly
    once with a NULL purchase when the WATERMARK has passed far enough
    to prove no match can still arrive (view_ts + window < global
    watermark). That null-side gating is the semantic difference from
    batch: a view newer than (final watermark − window) is withheld
    forever when the stream ends — consumers of bounded runs must
    restrict to the watermark-safe region (the registered query and its
    oracle both do). State/eviction is the same symmetric hash join as
    the inner variant — O(horizon), JVM-side."""
    views = (
        events.where(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"),
                F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", watermark)
    )
    buys = (
        events.where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("b_user"),
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    cond = F.expr(
        "v_user = b_user AND purchase_ts >= view_ts AND "
        f"purchase_ts <= view_ts + interval {int(window_min)} minutes"
    )
    return views.join(buys, cond, "leftOuter").select(
        F.col("v_user").alias("user_id"), "view_ts", "purchase_ts"
    )


def run_stream_to_memory(
    streaming_df: DataFrame, name: str | None = None, output_mode: str = "complete"
) -> DataFrame:
    """Run a bounded stream to completion (availableNow) into a memory sink
    and return the materialized result as a batch DataFrame."""
    name = name or f"s_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{name}")
    spark = streaming_df.sparkSession
    # stateful operators keep one state-store shard per shuffle partition
    # (init + per-batch commit each); for bounded local runs a handful of
    # shards beats one per core. On a real cluster this is sized once at
    # the first run (it is baked into the checkpoint).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def dedup_stream(
    docs: DataFrame, fingerprint_col: str = "fingerprint",
    id_col: str = "doc_id", within_watermark: str | None = None,
) -> DataFrame:
    """Streaming exact dedup: emit the FIRST document seen per fingerprint
    and suppress every later arrival — the incremental form of a
    training-pipeline exact-dedup stage, for corpora ingested continuously.

    JVM-native: ``dropDuplicates`` on the fingerprint runs entirely inside
    Spark's streaming state store (one row of state per distinct
    fingerprint, managed by the JVM — HDFS-backed or RocksDB provider),
    with ZERO per-key Python crossings. An earlier revision used
    ``applyInPandasWithState``, which invokes a Python state function once
    per distinct key per batch (~2.5 ms of Arrow serialize/cross/
    deserialize each) — at billions of fingerprints that is days of pure
    Python overhead regardless of cluster size. Exact dedup needs no
    custom state, so the built-in operator is strictly better; the
    pandas-state path is reserved for operators with genuinely custom
    state (``sessionize_stream``).

    ``within_watermark``: when the dedup horizon can be bounded (e.g. only
    suppress re-crawls within 30 days), pass a watermark delay string and
    ensure ``docs`` carries an event-time column with ``withWatermark``
    already applied upstream; ``dropDuplicatesWithinWatermark`` then lets
    the state store EVICT fingerprints older than the horizon, capping
    state at O(distinct keys per window) instead of O(all history).

    Duplicate COUNTS (how many arrivals each fingerprint had) are a
    separate concern from suppression — derive them with
    ``dedup_stream_counts`` (a plain JVM streaming aggregation) rather
    than threading counters through the dedup operator itself.
    """
    cols = [fingerprint_col, id_col]
    if within_watermark is not None:
        return docs.select(*cols, *[
            c for c in docs.columns if c not in cols
        ]).dropDuplicatesWithinWatermark([fingerprint_col]).select(*cols)
    return docs.dropDuplicates([fingerprint_col]).select(*cols)


def dedup_stream_counts(
    docs: DataFrame, fingerprint_col: str = "fingerprint"
) -> DataFrame:
    """Arrival counts per fingerprint as a JVM streaming aggregation
    (update/complete mode): the companion to ``dedup_stream`` when the
    pipeline needs duplicate-frequency stats (e.g. boilerplate detection,
    crawl-frequency analysis). One hash-agg row of state per distinct
    fingerprint, map-side partial aggregation before the shuffle."""
    return docs.groupBy(fingerprint_col).agg(
        F.count(F.lit(1)).alias("n_arrivals")
    )


def session_window_stream(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN
) -> DataFrame:
    """Gap-based sessions via the BUILT-IN ``session_window`` aggregation —
    the JVM-native sibling of :func:`sessionize_stream`. Where the
    pandas-state operator pays one Python crossing per user per batch,
    this one runs entirely in the JVM state store (merging session windows
    on update), so it is the right default for plain gap sessionization;
    keep ``applyInPandasWithState`` for logic session_window cannot
    express (per-session custom payloads, mid-session emission).

    Complete output mode emits every session including the still-open
    tail ones, which makes the bounded-run answer equal the batch
    sessionization exactly (full oracle, no open-session subtraction)."""
    return (
        events.groupBy(
            F.session_window("ts", f"{int(gap_min)} minutes").alias("sw"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    static dimension snapshot — the canonical "attach customer/geo
    attributes to a clickstream" step.

    The static side is small (a dimension), so it is explicitly
    ``broadcast()``: each micro-batch is then a map-side hash join — no
    shuffle of the stream, no state store at all (stream-static inner
    joins are stateless by definition: only the current batch joins).
    At 100 TB/day of events this is the only shape that keeps up."""
    return events.join(
        F.broadcast(dim), events["user_id"] == dim["c_custkey"], "inner"
    )


def sliding_error_rate_stream(
    events: DataFrame,
    window_min: int = 30,
    slide_min: int = 10,
    watermark: str = "2 hours",
) -> DataFrame:
    """SLIDING-window error-rate monitor: each event lands in
    window/slide overlapping windows (3 here), and the per-window error
    fraction is the alerting signal. State is bounded by the watermark ×
    overlap factor; everything runs in the JVM windowed-agg operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{window_min} minutes", f"{slide_min} minutes")
            .alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("n_errors"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_errors").cast("long").alias("n_errors"),
            F.round(F.col("n_errors") / F.col("n_events"), 4)
            .alias("error_rate"),
        )
    )
