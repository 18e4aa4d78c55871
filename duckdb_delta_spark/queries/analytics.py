"""Window / grouping / set-op / event-stream analytics suite.

Covers the rest of the §2E host-engine inventory the reference's TPC-DS
surface needs: ranking and frame windows, ROLLUP/CUBE/GROUPING SETS,
INTERSECT/EXCEPT, pivoted conditional aggregation, JSON extraction, and
gap-based sessionization (lag + windowed running sum) on the events table.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_delta_spark.queries import dsum, load, register

SESSION_GAP_MIN = 30


# win: top-3 orders per customer by totalprice (ranking window, tie-broken)
@register(
    "win_top_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT c_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY c_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM customer JOIN orders ON c_custkey = o_custkey) t
    WHERE rn <= 3
    """,
    group="window",
)
def win_top_orders(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("long"))
    )


# win: running revenue per supplier (frame window over deterministic order)
@register(
    "win_running_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                 OVER (PARTITION BY l_suppkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS running_revenue
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
    group="window",
)
def win_running_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # running sums of doubles are summation-order-sensitive (duckdb's
    # windowed SUM uses a segment tree) — accumulate exactly in decimal,
    # round, then surface as double on both sides
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round(F.sum(rev).over(w), 2).cast("double").alias("running_revenue"),
    )


# win: dense_rank of parts by retail price within brand + lead/lag delta
@register(
    "win_price_rank",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           dense_rank() OVER (PARTITION BY p_brand
                              ORDER BY p_retailprice DESC, p_partkey) AS price_rank,
           round(p_retailprice -
                 coalesce(lag(p_retailprice) OVER (PARTITION BY p_brand
                          ORDER BY p_retailprice DESC, p_partkey), p_retailprice), 2)
             AS gap_to_prev
    FROM part
    """,
    group="window",
)
def win_price_rank(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return p.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.dense_rank().over(w).cast("long").alias("price_rank"),
        F.round(
            F.col("p_retailprice")
            - F.coalesce(F.lag("p_retailprice").over(w), F.col("p_retailprice")),
            2,
        ).alias("gap_to_prev"),
    )


# rollup over lineitem flags
@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    group="grouping",
)
def agg_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# cube over events
@register(
    "agg_cube",
    oracle="""
    SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY CUBE (event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE))
    """,
    group="grouping",
)
def agg_cube(spark, sf_dir):
    ev = load(spark, sf_dir, "events").withColumn("day", F.col("ts").cast("date"))
    return ev.cube("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("total_value"),
    )


# explicit GROUPING SETS with grouping() disambiguation
@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(grouping(o_orderstatus) AS BIGINT)   AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
    group="grouping",
)
def agg_grouping_sets(spark, sf_dir):
    from duckdb_delta_spark.queries import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(grouping(o_orderstatus) AS BIGINT)   AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


# set ops: INTERSECT / EXCEPT on user activity
@register(
    "setop_click_and_buy",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    group="setop",
)
def setop_click_and_buy(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "setop_view_no_buy",
    # per-day grain: every user both views and purchases at some point in the
    # synthetic data, so the all-time set difference was provably empty —
    # (day, user) keeps the EXCEPT non-vacuous at every SF
    oracle="""
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
    FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
    FROM events WHERE event_type = 'purchase'
    """,
    group="setop",
)
def setop_view_no_buy(spark, sf_dir):
    ev = load(spark, sf_dir, "events").withColumn("day", F.col("ts").cast("date"))
    views = ev.where(F.col("event_type") == "view").select("day", "user_id")
    buys = ev.where(F.col("event_type") == "purchase").select("day", "user_id")
    # EXCEPT is set-difference (a viewer who also purchased that day is
    # excluded entirely) — subtract(), not exceptAll().distinct()
    return views.subtract(buys)


# events: hourly tumbling aggregation (the batch analogue of a stream window)
@register(
    "ev_hourly",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
           count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
    """,
    group="events",
)
def ev_hourly(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total_value"),
        )
    )


# events: daily top spender (rank over aggregated values)
@register(
    "ev_daily_top_user",
    oracle="""
    SELECT day, user_id, spent, rnk FROM (
      SELECT day, user_id, spent,
             row_number() OVER (PARTITION BY day
                                ORDER BY spent DESC, user_id) AS rnk
      FROM (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id,
                   CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE) AS spent
            FROM events WHERE event_type = 'purchase'
            GROUP BY CAST(CAST(ts AS TIMESTAMP) AS DATE), user_id) t) r
    WHERE rnk <= 3
    """,
    group="events",
)
def ev_daily_top_user(spark, sf_dir):
    ev = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("day"), "user_id")
        .agg(dsum("value").alias("spent"))
    )
    w = Window.partitionBy("day").orderBy(F.col("spent").desc(), F.col("user_id"))
    return (
        daily.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
    )


# events: JSON property extraction
@register(
    "ev_json_props",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
    group="events",
)
def ev_json_props(spark, sf_dir):
    # Project the JSON extraction once pre-aggregation: Catalyst does not
    # guarantee CSE across aggregate expressions, so referencing the parse
    # in both avg() and max() parsed every row twice.
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    return ev.groupBy("event_type").agg(
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


# events: pivoted conditional aggregation (pivot per event type)
@register(
    "ev_pivot_daily",
    oracle="""
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY CAST(CAST(ts AS TIMESTAMP) AS DATE)
    """,
    group="events",
)
def ev_pivot_daily(spark, sf_dir):
    ev = load(spark, sf_dir, "events").withColumn("day", F.col("ts").cast("date"))
    piv = (
        ev.groupBy("day")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
    )
    cols = [F.col("day")] + [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
        for t in ["click", "error", "purchase", "signup", "view"]
    ]
    return piv.select(*cols)


# events: gap-based sessionization (lag + running sum of session starts)
@register(
    "ev_sessionize",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(prev_ts) > {SESSION_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered),
    sessions AS (
      SELECT user_id, event_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    per_session AS (
      SELECT user_id, session_id, count(*) AS n_events,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
      FROM sessions GROUP BY user_id, session_id)
    SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(avg(dur_us / 1000000.0), 3) AS avg_session_secs
    FROM per_session GROUP BY user_id
    """,
    group="events",
)
def ev_sessionize(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = ev.withColumn("session_id", F.sum(is_new).over(wrun))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.round(F.avg(F.col("dur_us") / 1_000_000.0), 3).alias("avg_session_secs"),
    )


# as-of join: Spark has no native ASOF JOIN (DuckDB does — the oracle IS
# the native operator, making this a true cross-engine semantics check).
# Each view event picks up the same user's most recent prior purchase,
# voided when older than the 3-day tolerance.
_ASOF_TOL_S = 3 * 86400


@register(
    "ev_asof_purchase",
    oracle=f"""
    SELECT l.event_id, CAST(l.user_id AS BIGINT) AS user_id, l.ts,
           CASE WHEN date_diff('second', r.ts, l.ts) > {_ASOF_TOL_S}
                THEN NULL ELSE r.ts END AS asof_ts,
           CASE WHEN date_diff('second', r.ts, l.ts) > {_ASOF_TOL_S}
                THEN NULL ELSE round(r.value, 2) END AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'view') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    group="events",
)
def ev_asof_purchase(spark, sf_dir):
    from duckdb_delta_spark.operators.joins import asof_join

    ev = load(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    buys = ev.where(F.col("event_type") == "purchase")
    out = asof_join(
        views, buys, on="ts", by=("user_id",), right_cols=("value",),
        tolerance_seconds=_ASOF_TOL_S,
    )
    return out.select(
        "event_id", F.col("user_id").cast("long").alias("user_id"), "ts",
        "asof_ts", F.round("asof_value", 2).alias("asof_value"),
    )


# range join: error events landing inside the 2-hour window after a
# purchase by the same user. The oracle is DuckDB's native inequality
# join (IEJoin); the Spark side MUST NOT be a nested-loop join — it runs
# as the bucket-exploded equi-join (plan-asserted in tests/test_plans.py).
@register(
    "ev_range_errors",
    oracle="""
    SELECT p.event_id AS error_id, i.event_id AS purchase_id,
           CAST(p.user_id AS BIGINT) AS user_id,
           CAST((epoch_us(p.ts) - epoch_us(i.ts)) // 1000000 AS BIGINT)
             AS secs_after
    FROM (SELECT * FROM events WHERE event_type = 'error') p
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') i
      ON p.user_id = i.user_id
     AND p.ts >= i.ts AND p.ts < i.ts + INTERVAL 2 HOUR
    """,
    group="events",
)
def ev_range_errors(spark, sf_dir):
    from duckdb_delta_spark.operators.joins import range_join

    ev = load(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    windows = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    out = range_join(errors, windows, point_ts="ts", by=("user_id",))
    return out.select(
        "error_id", "purchase_id",
        F.col("user_id").cast("long").alias("user_id"),
        (F.unix_micros("ts") - F.unix_micros("start_ts"))
        .cast("double").__div__(1_000_000).cast("long").alias("secs_after"),
    )


# SCD2 dimension history from the purchase change stream: every purchase
# versions the user's "value" attribute; lead() closes each interval
@register(
    "ev_scd2_history",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id, round(value, 2) AS value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current,
           CAST(row_number() OVER w AS BIGINT) AS version_n
    FROM events WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """,
    group="events",
)
def ev_scd2_history(spark, sf_dir):
    from duckdb_delta_spark.operators.joins import scd2_history

    ev = load(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", F.round("value", 2).alias("value"))
    out = scd2_history(ev)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"), "value",
        "valid_from", "valid_to", "is_current", "version_n",
    )


# point-in-time feature join: every view event reads the user's purchase
# "value" attribute AS OF the event time from the SCD2 history — the
# leakage-free training-feature join (an open interval [valid_from,
# valid_to) guarantees no future information). Runs on the bucketized
# range join, never a nested loop.
@register(
    "ev_point_in_time_features",
    oracle="""
    WITH h AS (
      SELECT user_id, round(value, 2) AS value, ts AS valid_from,
             coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts),
                      (SELECT max(ts) FROM events) + INTERVAL 1 DAY)
               AS valid_to
      FROM events WHERE event_type = 'purchase')
    SELECT v.event_id, CAST(v.user_id AS BIGINT) AS user_id, v.ts,
           h.value AS feature_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN h ON v.user_id = h.user_id
          AND v.ts >= h.valid_from AND v.ts < h.valid_to
    """,
    group="events",
)
def ev_point_in_time_features(spark, sf_dir):
    from duckdb_delta_spark.operators.joins import range_join, scd2_history

    ev = load(spark, sf_dir, "events")
    # open intervals are clamped to the DATA horizon, not some far-future
    # sentinel: the bucketized range join explodes each interval into the
    # buckets it spans, so a year-9999 valid_to would fan every current
    # row into millions of buckets. max(ts)+1day is one scalar agg.
    horizon = ev.agg(F.max("ts")).first()[0]
    hist = scd2_history(
        ev.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.round("value", 2).alias("value"))
    ).withColumn(
        "valid_to",
        F.coalesce(
            "valid_to",
            F.lit(horizon).cast("timestamp") + F.expr("INTERVAL 1 DAY"),
        ),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts")
    out = range_join(
        views, hist, point_ts="ts", start="valid_from", end="valid_to",
        by=("user_id",),
        bucket_seconds=86400,
    )
    return out.select(
        "event_id", F.col("user_id").cast("long").alias("user_id"), "ts",
        F.col("value").alias("feature_value"),
    )


# distribution window functions: ntile / percent_rank / cume_dist over a
# deterministic total order (r9 window-coverage widening)
@register(
    "win_price_distribution",
    oracle="""
    SELECT p_partkey, p_brand,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
    group="windows",
)
def win_price_distribution(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_partkey", "p_brand",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# RANGE-framed moving aggregate: sums over a VALUE range (all orders
# within 30 total-price units), not a row count — the frame kind the
# ROWS-based suite didn't cover
@register(
    "win_range_frame_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_близ
    FROM orders WHERE o_custkey < 200
    """.replace("n_близ", "n_near"),
    group="windows",
)
def win_range_frame_sum(spark, sf_dir):
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.count(F.lit(1)).over(w).cast("long").alias("n_near"),
    )


# bag-semantics set ops (INTERSECT ALL / EXCEPT ALL keep multiplicity)
@register(
    "setop_brand_sizes_all",
    oracle="""
    SELECT p_size FROM part WHERE p_brand = 'Brand#1'
    INTERSECT ALL
    SELECT p_size FROM part WHERE p_brand = 'Brand#2'
    """,
    group="setops",
)
def setop_brand_sizes_all(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    a = p.where(F.col("p_brand") == "Brand#1").select("p_size")
    b = p.where(F.col("p_brand") == "Brand#2").select("p_size")
    return a.intersectAll(b)


@register(
    "setop_sizes_except_all",
    oracle="""
    SELECT p_size FROM part WHERE p_brand = 'Brand#1'
    EXCEPT ALL
    SELECT p_size FROM part WHERE p_brand = 'Brand#2'
    """,
    group="setops",
)
def setop_sizes_except_all(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    a = p.where(F.col("p_brand") == "Brand#1").select("p_size")
    b = p.where(F.col("p_brand") == "Brand#2").select("p_size")
    return a.exceptAll(b)


# funnel: users' first view -> purchase within 1 hour, conversion by day
@register(
    "ev_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT v.user_id, v.first_view, min(e.ts) AS conv_ts
      FROM v LEFT JOIN events e
        ON e.user_id = v.user_id AND e.event_type = 'purchase'
       AND e.ts >= v.first_view AND e.ts < v.first_view + INTERVAL 1 HOUR
      GROUP BY v.user_id, v.first_view)
    SELECT CAST(date_trunc('day', first_view) AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_viewers,
           CAST(count(conv_ts) AS BIGINT) AS n_converted,
           round(count(conv_ts) / CAST(count(*) AS DOUBLE), 4) AS cvr
    FROM p GROUP BY 1
    """,
    group="events",
)
def ev_funnel_conversion(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    cond = (
        (F.col("b_user") == F.col("user_id"))
        & (F.col("b_ts") >= F.col("first_view"))
        & (F.col("b_ts") < F.col("first_view") + F.expr("INTERVAL 1 HOUR"))
    )
    p = (
        v.join(buys, cond, "left")
        .groupBy("user_id", "first_view")
        .agg(F.min("b_ts").alias("conv_ts"))
    )
    return p.groupBy(
        F.date_trunc("day", "first_view").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_viewers"),
        F.count("conv_ts").cast("long").alias("n_converted"),
        F.round(F.count("conv_ts") / F.count(F.lit(1)), 4).alias("cvr"),
    )


# weekly cohort retention: cohort = week of first activity; matrix of
# (cohort_week, weeks_since) -> active users
@register(
    "ev_retention_cohorts",
    oracle="""
    WITH f AS (
      SELECT user_id,
             CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE)
               AS cohort_week
      FROM events GROUP BY user_id),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST((CAST(date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS DATE)
                   - f.cohort_week) // 7 AS BIGINT) AS weeks_since
      FROM events e JOIN f USING (user_id))
    SELECT cohort_week, weeks_since,
           CAST(count(*) AS BIGINT) AS n_users
    FROM act GROUP BY cohort_week, weeks_since
    """,
    group="events",
)
def ev_retention_cohorts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    act = (
        ev.join(f, "user_id")
        .select(
            "user_id", "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"),
                           F.col("cohort_week")) / 7
            ).cast("long").alias("weeks_since"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "weeks_since").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# CUBE with DISTINCT aggregate: distinct customers per (priority, status)
# cell including all rollup margins — the distinct-agg × grouping-sets
# combination the agg suite didn't cover
@register(
    "agg_distinct_cube",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    group="agg",
)
def agg_distinct_cube(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


# per-user error-burst detection: max errors inside any trailing 5-minute
# window (time-RANGE frame over event time, not a row frame)
@register(
    "ev_error_bursts",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'error'),
    w AS (
      SELECT user_id,
             count(*) OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL 5 MINUTES PRECEDING
                                      AND CURRENT ROW) AS burst
      FROM e)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(max(burst) AS BIGINT) AS max_burst,
           CAST(count(*) AS BIGINT) AS n_errors
    FROM w GROUP BY user_id
    """,
    group="events",
)
def ev_error_bursts(spark, sf_dir):
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type") == "error"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-5 * 60 * 1_000_000, Window.currentRow)
    )
    per = ev.select(
        "user_id", F.count(F.lit(1)).over(w).alias("burst")
    )
    return per.groupBy("user_id").agg(
        F.max("burst").cast("long").alias("max_burst"),
        F.count(F.lit(1)).cast("long").alias("n_errors"),
    ).select(
        F.col("user_id").cast("long").alias("user_id"), "max_burst",
        "n_errors",
    )


# DAU/WAU stickiness: daily actives joined to their week's actives
@register(
    "ev_dau_wau",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1),
    w AS (
      SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week,
             count(DISTINCT user_id) AS wau
      FROM events GROUP BY 1)
    SELECT d.day, CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           round(d.dau / CAST(w.wau AS DOUBLE), 4) AS stickiness
    FROM d JOIN w
      ON CAST(date_trunc('week', CAST(d.day AS TIMESTAMP)) AS DATE) = w.week
    """,
    group="events",
)
def ev_dau_wau(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count_distinct("user_id").alias("dau"))
    w = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week")
    ).agg(F.count_distinct("user_id").alias("wau"))
    return (
        d.join(
            w,
            F.date_trunc("week", F.col("day").cast("timestamp")).cast("date")
            == F.col("week"),
        )
        .select(
            "day", F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau") / F.col("wau").cast("double"), 4)
            .alias("stickiness"),
        )
    )


# per-user daily anomaly flags: |z| > 2 on daily event counts, evaluated
# as a PURE INTEGER inequality — (n-1)·(n·x − s)² > 4·n·(n·ssq − s²) is
# z² > 4 cleared of divisions, so both engines decide every boundary
# identically (float variance would diverge in the last ulp)
@register(
    "ev_daily_anomalies",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS ssq
      FROM daily GROUP BY user_id)
    SELECT d.user_id, d.day, d.x AS n_events,
           (st.n > 1 AND
            (st.n - 1) * (st.n * d.x - st.s) * (st.n * d.x - st.s)
              > 4 * st.n * (st.n * st.ssq - st.s * st.s)) AS is_anomaly
    FROM daily d JOIN stats st USING (user_id)
    """,
    group="events",
)
def ev_daily_anomalies(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    stats = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ssq"),
    )
    j = daily.join(stats, "user_id")
    dev = F.col("n") * F.col("x") - F.col("s")
    anomaly = (F.col("n") > 1) & (
        (F.col("n") - 1) * dev * dev
        > 4 * F.col("n") * (F.col("n") * F.col("ssq") - F.col("s") * F.col("s"))
    )
    return j.select(
        F.col("user_id").cast("long").alias("user_id"), "day",
        F.col("x").alias("n_events"), anomaly.alias("is_anomaly"),
    )


# events: Markov transition matrix of per-user event-type journeys —
# one keyed window (lag/lead within user, tie-broken by event_id) then
# a tiny (from,to) hash-agg; probabilities are exact-integer ratios.
@register(
    "ev_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS to_type
      FROM events),
    pairs AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
    SELECT from_type, to_type, n,
           round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE),
                 4) AS p
    FROM pairs
    """,
    group="events",
)
def ev_transition_matrix(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        "user_id", F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wp = Window.partitionBy("from_type")
    return pairs.select(
        "from_type", "to_type", "n",
        F.round(F.col("n") / F.sum("n").over(wp), 4).alias("p"),
    )


# the SALTED as-of path against the same native-ASOF oracle: proves the
# hot-key splitter (left salted by event_id into 8 sub-partitions, right
# stream replicated per salt) is semantics-preserving cross-engine, not
# just self-consistent with the unsalted plan.
@register(
    "ev_asof_salted",
    oracle=f"""
    SELECT l.event_id, CAST(l.user_id AS BIGINT) AS user_id, l.ts,
           CASE WHEN date_diff('second', r.ts, l.ts) > {_ASOF_TOL_S}
                THEN NULL ELSE r.ts END AS asof_ts,
           CASE WHEN date_diff('second', r.ts, l.ts) > {_ASOF_TOL_S}
                THEN NULL ELSE round(r.value, 2) END AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'view') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    group="events",
)
def ev_asof_salted(spark, sf_dir):
    from duckdb_delta_spark.operators.joins import asof_join

    ev = load(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    buys = ev.where(F.col("event_type") == "purchase")
    out = asof_join(
        views, buys, on="ts", by=("user_id",), right_cols=("value",),
        tolerance_seconds=_ASOF_TOL_S, salt=("event_id", 8),
    )
    return out.select(
        "event_id", F.col("user_id").cast("long").alias("user_id"), "ts",
        "asof_ts", F.round("asof_value", 2).alias("asof_value"),
    )
