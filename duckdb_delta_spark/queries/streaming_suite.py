"""Structured Streaming suite: incremental analytics with batch oracles.

Streams here are *bounded* (availableNow over the events parquet), so their
final output is deterministic and — for the windowed aggregation — equals
the batch answer, giving a full DuckDB oracle for a streaming pipeline.
Sessionization closes sessions by in-batch gap detection (the per-user last
session stays open in state when the stream ends), so its oracle is the
batch sessionization minus each user's final session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_delta_spark.queries import dsum, local_df, register
from duckdb_delta_spark.testing import fixtures as FX
from duckdb_delta_spark.streaming import (
    hourly_event_counts_stream,
    run_stream_to_memory,
    sessionize_stream,
    stream_events,
    view_purchase_join_stream,
)

GAP_MIN = 30


@register(
    "stream_hourly",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    group="streaming",
)
def stream_hourly(spark, sf_dir):
    """Watermarked tumbling-window aggregation, run as a bounded stream;
    complete-mode output over all data equals the batch answer."""
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(
        hourly_event_counts_stream(ev), output_mode="complete"
    ).select("hour", "event_type", "n", "total_value")


@register(
    "stream_sessionize",
    oracle=f"""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > {GAP_MIN * 60}
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    agg AS (
      SELECT user_id, sid, min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events,
             max(sid) OVER (PARTITION BY user_id) AS last_sid
      FROM sess GROUP BY user_id, sid)
    SELECT CAST(user_id AS BIGINT) AS user_id, session_start, session_end,
           n_events
    FROM agg WHERE sid < last_sid
    """,
    group="streaming",
)
def stream_sessionize(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): emits
    sessions closed by gap detection; each user's final session remains
    open in state at end-of-stream, hence the oracle's `sid < last_sid`."""
    ev = stream_events(spark, sf_dir)
    # watermark beyond the data horizon: the end-of-stream watermark batch
    # then fires no event-time timeouts, so the emitted set is exactly the
    # gap-closed sessions (deterministic; the oracle's `sid < last_sid`)
    out = run_stream_to_memory(
        sessionize_stream(ev, gap_min=GAP_MIN, watermark="36500 days"),
        output_mode="append",
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
    )


@register(
    "stream_delta_source",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE) AS qty
    FROM lineitem GROUP BY l_returnflag
    """,
    group="streaming",
)
def stream_delta_source(spark, sf_dir):
    """The Delta STREAMING source end-to-end: follow the 3-commit
    lineitem_multi fixture through readStream.format('delta_py') from
    version 0 (offsets = log versions, per-file partitions, executor-side
    pyarrow reads), aggregate in complete mode — equals the batch answer."""
    import os

    from duckdb_delta_spark.streaming.delta_source import DeltaPySource
    from duckdb_delta_spark.testing import fixtures as FX

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - already registered on this session
        pass
    root = FX.ensure_fixtures(spark, sf_dir)
    stream = (
        spark.readStream.format("delta_py")
        .option("path", os.path.join(root, "lineitem_multi"))
        .option("startingVersion", "0")
        # projection pushdown (guide §4.1: pass only the columns the
        # consumer needs across the Python boundary): the Arrow read
        # ships 2 of 16 lineitem columns; result unchanged
        .option("select", "l_returnflag,l_quantity")
        .load()
    )
    agg = stream.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity")
        .alias("qty"),
    )
    return run_stream_to_memory(agg, output_mode="complete").select(
        "l_returnflag", "n", "qty"
    )


@register(
    "stream_where_pushdown",
    oracle=f"""
    SELECT l_linestatus, count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE (l_orderkey < {FX.SPLITS[1]} OR l_orderkey >= {FX.SPLITS[2]})
      AND l_returnflag LIKE 'N%'
    GROUP BY l_linestatus
    """,
    group="streaming",
)
def stream_where_pushdown(spark, sf_dir):
    """The streaming source's .option('where', ...) end-to-end: the
    middle commit's files are disproved by their l_orderkey stats and
    never planned into a micro-batch; survivors are row-filtered
    executor-side — the streamed aggregate equals the batch answer."""
    import os

    from duckdb_delta_spark.streaming.delta_source import DeltaPySource
    from duckdb_delta_spark.testing import fixtures as FX

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - already registered on this session
        pass
    root = FX.ensure_fixtures(spark, sf_dir)
    stream = (
        spark.readStream.format("delta_py")
        .option("path", os.path.join(root, "lineitem_multi"))
        .option("startingVersion", "0")
        .option("where",
                f"(l_orderkey < {FX.SPLITS[1]} OR l_orderkey >= {FX.SPLITS[2]})"
                f" AND l_returnflag LIKE 'N%'")
        # projection pushdown composes with the where option: the reader
        # still READS the where-only columns for the row filter, then
        # drops them before shipping (see DeltaStreamReader.read)
        .option("select", "l_linestatus,l_extendedprice")
        .load()
    )
    agg = stream.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice")
        .alias("revenue"),
    )
    return run_stream_to_memory(agg, output_mode="complete").select(
        "l_linestatus", "n", "revenue"
    )


@register(
    "stream_foreach_sink",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_discount AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS disc
    FROM lineitem GROUP BY l_returnflag
    """,
    group="streaming",
)
def stream_foreach_sink(spark, sf_dir):
    """Delta → Delta streaming roundtrip over the PRODUCTION write path:
    readStream from the 3-commit fixture, foreachBatch writing each
    micro-batch through the batch DeltaWriter (JVM parquet encode, no
    Python write fleet) with txn(appId,batchId) exactly-once, then a
    batch scan of the destination — equal to the batch answer over
    lineitem iff every row survived exactly once. See
    streaming/foreach_sink.py for why this beats the DataSource sink at
    scale."""
    import os
    import shutil

    from duckdb_delta_spark.delta.table import DeltaTable
    from duckdb_delta_spark.delta.writer import DeltaWriter
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource
    from duckdb_delta_spark.streaming.foreach_sink import delta_foreach_batch
    from duckdb_delta_spark.testing import fixtures as FX

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - already registered on this session
        pass
    root = FX.ensure_fixtures(spark, sf_dir)
    src = os.path.join(root, "lineitem_multi")
    rt_root = os.path.join(root, "_foreach_roundtrip")
    shutil.rmtree(rt_root, ignore_errors=True)
    dst = os.path.join(rt_root, "dst")
    DeltaWriter.create(spark, dst, DeltaTable(src).schema())
    q = (
        spark.readStream.format("delta_py")
        .option("path", src)
        .option("startingVersion", "0")
        .load()
        .writeStream.foreachBatch(delta_foreach_batch(dst))
        .option("checkpointLocation", os.path.join(rt_root, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        DeltaTable(dst)
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_discount")
            .alias("disc"),
        )
    )


@register(
    "stream_delta_sink",
    oracle="""
    SELECT l_linestatus, count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem GROUP BY l_linestatus
    """,
    group="streaming",
)
def stream_delta_sink(spark, sf_dir):
    """Delta → Delta streaming roundtrip: readStream over the 3-commit
    lineitem_multi fixture, writeStream through the exactly-once Delta
    sink (one commit per micro-batch, txn(appId,batchId) idempotency,
    Arrow batches end-to-end), then a plain DeltaTable scan of the
    DESTINATION — equal to the batch answer over lineitem iff every row
    survived the roundtrip exactly once."""
    import os
    import shutil

    from duckdb_delta_spark.delta.table import DeltaTable
    from duckdb_delta_spark.delta.writer import DeltaWriter
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource
    from duckdb_delta_spark.testing import fixtures as FX

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - already registered on this session
        pass
    root = FX.ensure_fixtures(spark, sf_dir)
    src = os.path.join(root, "lineitem_multi")
    rt_root = os.path.join(root, "_sink_roundtrip")
    shutil.rmtree(rt_root, ignore_errors=True)
    dst = os.path.join(rt_root, "dst")
    DeltaWriter.create(spark, dst, DeltaTable(src).schema())
    q = (
        spark.readStream.format("delta_py")
        .option("path", src)
        .option("startingVersion", "0")
        .load()
        .writeStream.format("delta_py")
        .option("path", dst)
        .option("checkpointLocation", os.path.join(rt_root, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        DeltaTable(dst)
        .to_df(spark)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice")
            .alias("revenue"),
        )
    )


@register(
    "stream_cdf_source",
    oracle=f"""
    SELECT _change_type, count(*) AS n,
           CAST(round(sum(CAST(p AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM (SELECT 'delete' AS _change_type, o_totalprice AS p
          FROM orders WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT 'insert' AS _change_type, o_totalprice * 2 AS p
          FROM orders WHERE o_orderpriority = '1-URGENT') t
    GROUP BY _change_type
    """,
    group="streaming",
)
def stream_cdf_source(spark, sf_dir):
    """CDF as a STREAM (.option('readChangeFeed','true'), delta-spark
    parity): the orders_upd UPDATE commit arrives as delete+insert pairs
    with _change_type/_commit_version columns — same answer as the batch
    change feed (delta_changes_scan)."""
    import os

    from duckdb_delta_spark.streaming.delta_source import DeltaPySource
    from duckdb_delta_spark.testing import fixtures as FX

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - already registered on this session
        pass
    root = FX.ensure_fixtures(spark, sf_dir)
    stream = (
        spark.readStream.format("delta_py")
        .option("path", os.path.join(root, "orders_upd"))
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")  # the UPDATE commit only
        # projection pushdown on a CDF stream: o_totalprice + the feed's
        # meta columns ship; the other order columns never leave pyarrow
        .option("select", "o_totalprice")
        .load()
    )
    agg = stream.groupBy("_change_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice")
        .alias("total"),
    )
    return run_stream_to_memory(agg, output_mode="complete").select(
        "_change_type", "n", "total"
    )


@register(
    "stream_join",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT v.user_id) AS BIGINT) AS n_users,
           CAST(round(sum(date_part('epoch', b.ts - v.ts)), 0) AS BIGINT)
               AS total_delay_s
    FROM events v JOIN events b
      ON v.user_id = b.user_id
     AND v.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    group="streaming",
)
def stream_join(spark, sf_dir):
    """Stream-stream interval join (view → purchase attribution within
    30 min, watermark-bounded symmetric hash join state) run as a bounded
    stream; the appended pairs aggregate to the batch join answer."""
    ev = stream_events(spark, sf_dir)
    pairs = run_stream_to_memory(
        view_purchase_join_stream(ev, window_min=30,
                                  watermark="36500 days"),
        output_mode="append",
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("user_id").alias("n_users"),
        F.round(
            F.sum(F.col("purchase_ts").cast("double")
                  - F.col("view_ts").cast("double")), 0
        ).cast("long").alias("total_delay_s"),
    )


@register(
    "stream_upsert",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(round(o_totalprice * 3, 2)
                          AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM orders WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    UNION ALL
    SELECT o_orderpriority, CAST(count(*) AS BIGINT),
           CAST(round(sum(CAST(round(o_totalprice * 2, 2)
                          AS DECIMAL(25,6))), 2) AS DOUBLE)
    FROM orders WHERE o_orderpriority = '2-HIGH'
    GROUP BY o_orderpriority
    """,
    group="streaming",
)
def stream_upsert(spark, sf_dir):
    """Streaming UPSERT (delta-spark's documented foreachBatch + MERGE
    pattern): the target starts as the URGENT orders; batch 1 inserts
    the HIGH orders at 2x price, batch 2 updates every URGENT order to
    3x price. Exactly-once via txn(appId, batchId) on the MERGE commit;
    the final table equals the oracle's union."""
    import os
    import shutil

    from duckdb_delta_spark.delta.table import DeltaTable
    from duckdb_delta_spark.delta.writer import DeltaWriter
    from duckdb_delta_spark.streaming.foreach_sink import delta_foreach_merge
    from duckdb_delta_spark.testing import fixtures as FX

    root = FX.tmp_dir("streamupsert_")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        tdir = os.path.join(root, "target")
        w = DeltaWriter.create(spark, tdir, orders.schema)
        w.append(orders.where("o_orderpriority = '1-URGENT'"))

        wave1 = orders.where("o_orderpriority = '2-HIGH'").withColumn(
            "o_totalprice", F.round(F.col("o_totalprice") * 2, 2))
        wave2 = orders.where("o_orderpriority = '1-URGENT'").withColumn(
            "o_totalprice", F.round(F.col("o_totalprice") * 3, 2))
        stage = os.path.join(root, "stream")
        os.makedirs(stage)
        for i, wv in enumerate((wave1, wave2)):
            d = os.path.join(root, f"w{i}")
            wv.coalesce(1).write.parquet(d)
            (part,) = [f for f in os.listdir(d) if f.endswith(".parquet")]
            dest = os.path.join(stage, f"wave{i}.parquet")
            shutil.copyfile(os.path.join(d, part), dest)
            os.utime(dest, (1000 + i, 1000 + i))

        ckpt = os.path.join(root, "ckpt")
        q = (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .writeStream.foreachBatch(delta_foreach_merge(
                tdir, "t.o_orderkey = s.o_orderkey",
                when_matched_update={"o_totalprice": "s.o_totalprice"},
            ))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        out = (
            DeltaTable(tdir).to_df(spark)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("o_totalprice").alias("total"))
        )
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_dedup",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           doc_id
    FROM documents
    """,
    group="streaming",
)
def stream_dedup(spark, sf_dir):
    """Streaming exact dedup across BATCHES: batch 1 is the corpus, batch 2
    a whitespace-perturbed duplicate of every document (same normalized
    fingerprint, shifted ids). JVM state-store ``dropDuplicates`` suppresses
    the entire second wave, so the final output is exactly the originals —
    the oracle is the plain documents table."""
    import os
    import shutil

    from duckdb_delta_spark.operators.text import with_fingerprint
    from duckdb_delta_spark.streaming import dedup_stream, run_stream_to_memory
    from duckdb_delta_spark.testing import fixtures as FX

    root = FX.tmp_dir("streamdedup_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text")
        docs.coalesce(1).write.parquet(os.path.join(root, "wave1"))
        (docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                     F.concat(F.col("text"), F.lit("  ")).alias("text"))
         .coalesce(1).write.parquet(os.path.join(root, "wave2")))
        # one data file per wave, mtime-ordered so the original corpus is
        # batch 1 (FileStreamSource orders by modification time)
        stage = os.path.join(root, "stream")
        os.makedirs(stage)
        waves = []
        for i, d in enumerate(("wave1", "wave2")):
            (part,) = [f for f in os.listdir(os.path.join(root, d))
                       if f.endswith(".parquet")]
            dest = os.path.join(stage, f"wave{i}.parquet")
            shutil.copyfile(os.path.join(root, d, part), dest)
            os.utime(dest, (1000 + i, 1000 + i))
            waves.append(dest)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        out = run_stream_to_memory(
            dedup_stream(with_fingerprint(stream).select(
                "fingerprint", "doc_id")),
            output_mode="append",
        )
        rows = out.select("fingerprint", "doc_id").collect()
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("fingerprint", T.StringType()),
            T.StructField("doc_id", T.LongType()),
        ])
        return local_df(spark, rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_session_builtin",
    oracle=f"""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > {GAP_MIN * 60}
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    group="streaming",
)
def stream_session_builtin(spark, sf_dir):
    """JVM-native session windows (built-in ``session_window`` agg, zero
    Python crossings); complete mode emits open tail sessions too, so the
    oracle is the FULL batch sessionization — no subtraction."""
    from duckdb_delta_spark.streaming import (
        session_window_stream,
        stream_events,
    )

    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(
        session_window_stream(ev), output_mode="complete"
    )


@register(
    "stream_static_join",
    oracle="""
    SELECT n.n_name AS nation, e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(e.value AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, e.event_type
    """,
    group="streaming",
)
def stream_static_join(spark, sf_dir):
    """Stream-static broadcast enrichment: events stream joined per
    micro-batch against the customer->nation dimension snapshot
    (stateless, map-side); the materialized enriched stream then
    aggregates to the batch answer."""
    from duckdb_delta_spark.queries import load
    from duckdb_delta_spark.streaming import enrich_stream, stream_events

    dim = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("nation"))
    )
    ev = stream_events(spark, sf_dir)
    enriched = run_stream_to_memory(
        enrich_stream(ev, dim).select("nation", "event_type", "value"),
        output_mode="append",
    )
    return enriched.groupBy("nation", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum("value")
        .alias("total_value"),
    )


@register(
    "stream_trending",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
             count(*) AS n
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT hour, event_type, n,
             row_number() OVER (PARTITION BY hour
                                ORDER BY n DESC, event_type) AS rnk
      FROM hourly)
    SELECT hour, event_type, CAST(n AS BIGINT) AS n, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
    group="streaming",
)
def stream_trending(spark, sf_dir):
    """Trending top-k per window: the INCREMENTAL half (watermarked
    hourly counts) runs as a stream; the rank-within-window runs on the
    materialized complete-mode result — ranking is not incrementally
    maintainable in Spark streaming, so this split (stream the agg, rank
    the sink table) IS the production pattern."""
    from pyspark.sql.window import Window

    from duckdb_delta_spark.streaming import (
        hourly_event_counts_stream,
        stream_events,
    )

    ev = stream_events(spark, sf_dir)
    hourly = run_stream_to_memory(
        hourly_event_counts_stream(ev), output_mode="complete"
    ).select("hour", "event_type", "n")
    w = Window.partitionBy("hour").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        hourly.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("hour", "event_type", F.col("n").cast("long").alias("n"), "rnk")
    )


@register(
    "stream_sliding_error_rate",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    wins AS (
      SELECT to_timestamp(CAST(floor(epoch(ts) / 600) AS BIGINT) * 600
                          - k.k * 600) AS win_start,
             event_type
      FROM e, (SELECT unnest(range(0, 3)) AS k) k),
    agg AS (
      SELECT win_start, count(*) AS n_events,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
      FROM wins GROUP BY win_start)
    SELECT win_start, CAST(n_events AS BIGINT) AS n_events,
           CAST(n_errors AS BIGINT) AS n_errors,
           round(n_errors / CAST(n_events AS DOUBLE), 4) AS error_rate
    FROM agg
    """,
    group="streaming",
)
def stream_sliding_error_rate(spark, sf_dir):
    """Sliding windows (window 30m, slide 10m): each event contributes to
    exactly 3 windows; the oracle materializes the same 3 window starts
    per event relationally."""
    from duckdb_delta_spark.streaming import stream_events
    from duckdb_delta_spark.streaming.events import (
        sliding_error_rate_stream,
    )

    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(
        sliding_error_rate_stream(ev), output_mode="complete"
    )


@register(
    "stream_backfill_drain",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS qty
    FROM lineitem GROUP BY l_returnflag
    """,
    group="streaming",
)
def stream_backfill_drain(spark, sf_dir):
    """Trigger.AvailableNow backfill, drained to completion: the Python-
    source bridge lacks prepareForTriggerAvailableNow (one availableNow
    run = one rate-limited batch), so drain_available_now loops runs on
    ONE checkpoint until caught up — the production catch-up-then-stop
    mode. maxFilesPerTrigger=1 forces one commit per run; the drained
    parquet sink must equal the batch answer exactly (exactly-once
    across runs via checkpoint replay). This query INTENTIONALLY keeps
    the multi-lifecycle loop to exercise that machinery — production
    backfills should pass .option('drainAll','true') instead (one
    lifecycle spans the backlog; measured 2-3x faster in
    docs/bench_environment_notes.md)."""
    import os
    import tempfile
    import uuid

    from duckdb_delta_spark.streaming.delta_source import (
        DeltaPySource, drain_available_now,
    )
    from duckdb_delta_spark.testing import fixtures as FX

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - already registered on this session
        pass
    root = FX.ensure_fixtures(spark, sf_dir)
    src = os.path.join(root, "lineitem_multi")
    base = os.path.join(tempfile.gettempdir(),
                        f"drain_{uuid.uuid4().hex[:12]}")
    out, ck = os.path.join(base, "out"), os.path.join(base, "ck")

    def start():
        return (
            spark.readStream.format("delta_py")
            .option("path", src)
            .option("startingVersion", "0")
            .option("maxFilesPerTrigger", "1").load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )

    from duckdb_delta_spark.delta.log import DeltaLog

    # HEAD version known up front → the drain stops the moment a run's
    # committed endOffset reaches it, skipping the final empty-run
    # lifecycle (~1-2s of pure stream startup on the Python bridge)
    runs = drain_available_now(
        start, end_version=DeltaLog(src).resolve_version(None))
    assert len(runs) >= 2, "backlog should need multiple drained batches"
    return (
        spark.read.parquet(out)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity").alias("qty"),
        )
    )


@register(
    "stream_join_outer",
    oracle="""
    WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts
               FROM events WHERE event_type = 'view'),
    b AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS purchase_ts
          FROM events WHERE event_type = 'purchase'),
    bound AS (
      SELECT least((SELECT max(view_ts) FROM v),
                   (SELECT max(purchase_ts) FROM b))
             - INTERVAL 90 MINUTE - INTERVAL 60 SECOND AS cut)
    SELECT CAST(v.user_id AS BIGINT) AS user_id, v.view_ts, b.purchase_ts
    FROM v LEFT JOIN b
      ON v.user_id = b.user_id
     AND b.purchase_ts >= v.view_ts
     AND b.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE, bound
    WHERE v.view_ts < bound.cut
    """,
    group="streaming",
)
def stream_join_outer(spark, sf_dir):
    """LEFT OUTER stream-stream interval join, compared against the
    batch LEFT JOIN on the WATERMARK-SAFE region: null-side rows only
    emit once the global watermark (min of both sides' max ts − 1h)
    passes view_ts + 30min, so both engines restrict to
    view_ts < min(max_view, max_purchase) − 90min − 60s margin (the
    margin keeps boundary-exact events out of the compare)."""
    from duckdb_delta_spark.streaming import (
        run_stream_to_memory, stream_events, view_purchase_left_join_stream,
    )

    ev = stream_events(spark, sf_dir)
    joined = view_purchase_left_join_stream(ev)
    out = run_stream_to_memory(joined, output_mode="append")

    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import types as T
    if isinstance(static.schema["ts"].dataType, T.LongType):
        static = static.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(static.schema["ts"].dataType, T.TimestampNTZType):
        static = static.withColumn("ts", F.col("ts").cast("timestamp"))
    # ONE scan for both bounds (two .first() actions cost two scheduler
    # jobs + two scans of events for two scalars)
    mv, mb = static.agg(
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
    ).first()
    import datetime as _dt
    cut = min(mv, mb) - _dt.timedelta(minutes=90, seconds=60)
    return out.where(F.col("view_ts") < F.lit(cut)).select(
        F.col("user_id").cast("long"), "view_ts", "purchase_ts",
    )


@register(
    "stream_cm_sink",
    oracle="""
    SELECT CAST(n_regionkey AS BIGINT) AS g, count(*) AS n,
           CAST(sum(CAST(n_nationkey AS BIGINT)) AS BIGINT) AS key_sum,
           min(n_name) AS first_name
    FROM nation GROUP BY n_regionkey
    """,
    group="streaming",
)
def stream_cm_sink(spark, sf_dir):
    """Streaming INTO a nested column-mapped partitioned table (r14, the
    last CM gate in the streaming surface): executor tasks rename Arrow
    batches to physical names positionally and write field-id'd files
    with physically-keyed stats/partitionValues; the batch scan of the
    DESTINATION must equal the plain batch answer over nation — proving
    the physical rename round-trips values at every nesting level."""
    import os
    import shutil

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.table import DeltaTable
    from duckdb_delta_spark.delta.writer import DeltaWriter
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource
    from duckdb_delta_spark.testing import fixtures as FX

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - already registered on this session
        pass
    root = FX.ensure_fixtures(spark, sf_dir)
    rt_root = os.path.join(root, "_cm_sink_roundtrip")
    shutil.rmtree(rt_root, ignore_errors=True)
    src, dst = os.path.join(rt_root, "src"), os.path.join(rt_root, "dst")

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("info", T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("key", T.LongType()),
        ])),
        T.StructField("g", T.LongType()),
    ])
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("k"),
        F.struct(F.col("n_name").alias("name"),
                 F.col("n_nationkey").cast("long").alias("key"))
        .alias("info"),
        F.col("n_regionkey").cast("long").alias("g"),
    )
    DeltaWriter.create(spark, src, schema).append(nat.coalesce(1))
    DeltaWriter.create(spark, dst, schema, partition_by=["g"],
                       configuration={"delta.columnMapping.mode": "name"})
    q = (
        spark.readStream.format("delta_py")
        .option("path", src)
        .option("startingVersion", "0")
        .load()
        .writeStream.format("delta_py")
        .option("path", dst)
        .option("checkpointLocation", os.path.join(rt_root, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        DeltaTable(dst)
        .to_df(spark)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("info.key")).alias("key_sum"),
            F.min(F.col("info.name")).alias("first_name"),
        )
    )


@register(
    "stream_replace_sink",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_discount AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS disc
    FROM lineitem GROUP BY l_returnflag
    """,
    group="streaming",
)
def stream_replace_sink(spark, sf_dir):
    """Streaming region-backfill over the PRODUCTION write path:
    the destination is pre-seeded with STALE rows (discount doubled),
    then one availableNow run streams the source and REPLACES exactly
    the key region each micro-batch covers — foreachBatch +
    delta_foreach_replace_where with a per-batch min/max predicate
    callable, txn(appId,batchId) exactly-once. Equal to the batch
    answer over lineitem iff the stale region was fully replaced and
    nothing double-applied."""
    import os
    import shutil

    from duckdb_delta_spark.delta.table import DeltaTable
    from duckdb_delta_spark.delta.writer import DeltaWriter
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource
    from duckdb_delta_spark.streaming.foreach_sink import (
        delta_foreach_replace_where,
    )
    from duckdb_delta_spark.testing import fixtures as FX

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - already registered on this session
        pass
    root = FX.ensure_fixtures(spark, sf_dir)
    src = os.path.join(root, "lineitem_multi")
    rt_root = os.path.join(root, "_replace_roundtrip")
    shutil.rmtree(rt_root, ignore_errors=True)
    dst = os.path.join(rt_root, "dst")
    w = DeltaWriter.create(spark, dst, DeltaTable(src).schema())
    stale = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .withColumn("l_discount", F.col("l_discount") * 2)
    )
    # no repartition: the parquet scan's natural splits feed the append
    # directly (the r19 repartition(4) paid a full 600k-row exchange just
    # to pick a file count; the replace predicate spans every seed file
    # either way, so layout is immaterial to the result)
    w.append(stale)

    def key_range_pred(batch_df):
        r = batch_df.agg(F.min("l_orderkey").alias("lo"),
                         F.max("l_orderkey").alias("hi")).first()
        if r["lo"] is None:
            return "1 = 0"  # empty batch replaces nothing
        return f"l_orderkey >= {r['lo']} AND l_orderkey <= {r['hi']}"

    q = (
        spark.readStream.format("delta_py")
        .option("path", src)
        .option("startingVersion", "0")
        .load()
        .writeStream.foreachBatch(
            delta_foreach_replace_where(dst, key_range_pred))
        .option("checkpointLocation", os.path.join(rt_root, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()
    return (
        DeltaTable(dst)
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_discount")
            .alias("disc"),
        )
    )


@register(
    "stream_schema_track",
    oracle="""
    SELECT 'insert' AS change_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    UNION ALL
    SELECT 'delete', CAST(count(*) AS BIGINT),
           CAST(sum(n_nationkey) AS BIGINT)
    FROM nation WHERE n_nationkey < 5
    """,
    group="streaming",
)
def stream_schema_track(spark, sf_dir):
    """Auto-advancing CDF stream restart across a RENAME boundary
    (delta-spark ``schemaTrackingLocation`` analogue, r20): era 1 of a
    column-mapped CDF table drains, a rename + more commits land, the
    next run FAILS LOUDLY at the boundary (recording it in
    ``schemaTrackingDir``), and ONE restart drains the remaining
    commits from the checkpointed offset under the new schema — exactly
    once, old-era reads relabeled by columnMapping id. The drained feed
    folds to the batch answer over nation iff no era was skipped,
    duplicated, or served under the wrong column."""
    import os
    import shutil

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.writer import DeltaWriter
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - already registered on this session
        pass
    root = FX.ensure_fixtures(spark, sf_dir)
    rt_root = os.path.join(root, "_schema_track")
    shutil.rmtree(rt_root, ignore_errors=True)
    tbl = os.path.join(rt_root, "tbl")

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("k"),
        F.col("n_name").alias("name"),
    )
    w = DeltaWriter.create(spark, tbl, schema, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })
    w.append(nat.where("k < 13").coalesce(1))       # v1: era-1 inserts

    got: list = []

    def run():
        q = (
            spark.readStream.format("delta_py")
            .option("path", tbl)
            .option("readChangeFeed", "true")
            .option("startingVersion", "0")
            .option("schemaTrackingDir", os.path.join(rt_root, "track"))
            .load()
            .writeStream.foreachBatch(
                lambda df, bid: got.extend(
                    (r["k"], r["_change_type"]) for r in df.collect()))
            .option("checkpointLocation", os.path.join(rt_root, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        except Exception as e:  # noqa: BLE001 - the failing leg IS the test
            return e
        return q.exception()

    assert run() is None                            # era 1 drains
    w.rename_column("name", "nm")                   # v2: boundary
    w.append(nat.where("k >= 13").coalesce(1)
             .withColumnRenamed("name", "nm"))      # v3: era-2 inserts
    w.delete("k < 5")                               # v4: deletes
    exc = run()                                     # fails AT the boundary
    assert exc is not None and "schemaTrackingDir" in str(exc), exc
    assert run() is None                            # ONE restart: drains rest

    return (
        local_df(spark, [(k, ct) for k, ct in got],
                 T.StructType([T.StructField("k", T.LongType()),
                               T.StructField("change_type",
                                             T.StringType())]))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("k").alias("key_sum"))
    )
