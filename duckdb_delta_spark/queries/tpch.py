"""Relational query suite (TPC-H shapes adapted to the driver's testdata).

The reference's declared query capability is full TPC-H/TPC-DS over Delta
scans with all relational operators supplied by the host engine
(reference: benchmark/tpch/sf1/local/delta/q01.benchmark:1-8, SURVEY.md §2E);
in this rebuild those operators come from Catalyst. This module exercises
that §2E inventory — scans, equi/theta joins (broadcast + shuffle),
hash aggregation, DISTINCT, correlated subqueries, EXISTS/NOT-EXISTS
(semi/anti joins), CASE, date arithmetic, set semantics — each entry
hash-verified against DuckDB.

The testdata has no partsupp table and narrower columns than stock TPC-H
(TESTDATA.md), so q2/q9/q11/q16/q20-22 are adapted to the available schema
while keeping their operator shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_delta_spark.queries import (
    DEC, dsum, dsum_dec, fast_decimal_sums, load, osum, register,
    register_views,
)


def _sql_fast(spark, text):
    # SPARK side of SQL-expressed queries runs the fixed-point twin of
    # every decimal sum (queries.fast_decimal_sums) — value-identical,
    # ~3.7x faster; the oracle string stays canonical decimal.
    return spark.sql(fast_decimal_sums(text))


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _davg(col, ndp: int = 4):
    # exact decimal sum → double, / count: both engines divide identical
    # doubles, so the quotient (and its rounding) is deterministic.
    # dsum_dec reconstructs the identical DECIMAL group sum from two LONG
    # accumulators (see queries.dsum_dec) — the double cast then sees the
    # same value the decimal path produced.
    return F.round(dsum_dec(col).cast("double") / F.count(F.lit(1)), ndp)


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# q01 — pricing summary: full-scan hash aggregate with 8 aggregates
@register(
    "tpch_q01",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_quantity')}                                             AS sum_qty,
           {osum('l_extendedprice')}                                        AS sum_base_price,
           {osum('l_extendedprice * (1 - l_discount)')}                     AS sum_disc_price,
           {osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}       AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS {DEC})) AS DOUBLE) / count(*), 4)      AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS {DEC})) AS DOUBLE) / count(*), 4)      AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    group="tpch",
)
def q01(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= _ts("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(_rev()).alias("sum_disc_price"),
            dsum(_rev() * (1 + F.col("l_tax"))).alias("sum_charge"),
            _davg("l_quantity").alias("avg_qty"),
            _davg("l_extendedprice").alias("avg_price"),
            _davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# q02 (adapted: no partsupp) — correlated scalar subquery on raw values
@register(
    "tpch_q02_min_balance",
    oracle="""
    SELECT r_name, s_name, s_acctbal
    FROM supplier, nation, region
    WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND s_acctbal = (SELECT min(s2.s_acctbal)
                       FROM supplier s2, nation n2
                       WHERE s2.s_nationkey = n2.n_nationkey
                         AND n2.n_regionkey = r_regionkey)
    """,
    group="tpch",
)
def q02(spark, sf_dir):
    register_views(spark, sf_dir, ["supplier", "nation", "region"])
    return _sql_fast(spark, 
        """
        SELECT r_name, s_name, s_acctbal
        FROM supplier, nation, region
        WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND s_acctbal = (SELECT min(s2.s_acctbal)
                           FROM supplier s2, nation n2
                           WHERE s2.s_nationkey = n2.n_nationkey
                             AND n2.n_regionkey = r_regionkey)
        """
    )


# q03 — shipping priority: 3-way join + grouped revenue
@register(
    "tpch_q03",
    oracle=f"""
    SELECT l_orderkey,
           {osum('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    """,
    group="tpch",
)
def q03(spark, sf_dir):
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < _ts("1998-06-30"))
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > _ts("1998-06-30"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_rev()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
    )


# q04 (adapted) — EXISTS semi-join with date arithmetic
@register(
    "tpch_q04",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND date_diff('day', CAST(o_orderdate AS DATE),
                                  CAST(l_shipdate AS DATE)) > 60)
    GROUP BY o_orderpriority
    """,
    group="tpch",
)
def q04(spark, sf_dir):
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return _sql_fast(spark, 
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND datediff(CAST(l_shipdate AS DATE),
                                     CAST(o_orderdate AS DATE)) > 60)
        GROUP BY o_orderpriority
        """
    )


# q05 — local supplier volume: 6-way join through region
@register(
    "tpch_q05",
    oracle=f"""
    SELECT n_name, {osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    group="tpch",
)
def q05(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev()).alias("revenue"))
    )


# q06 — forecast revenue: pure scan-filter-aggregate (pushdown showcase)
@register(
    "tpch_q06",
    oracle=f"""
    SELECT {osum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    group="tpch",
)
def q06(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
        )
    )


# q07 — volume shipping between two nations (join + CASE pairs + year)
@register(
    "tpch_q07",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {osum('volume')} AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                               AND TIMESTAMP '1997-12-31 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    group="tpch",
)
def q07(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(_rev()).alias("revenue"))
    )


# q08 — market share: CASE-in-aggregate ratio
@register(
    "tpch_q08",
    oracle=f"""
    SELECT o_year,
           round(CAST(sum(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                               AS {DEC})) AS DOUBLE)
                 / CAST(sum(CAST(volume AS {DEC})) AS DOUBLE), 4) AS mkt_share
    FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part, lineitem, orders, customer, supplier, nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
            AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
            AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
            AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
            AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                AND TIMESTAMP '1997-12-31 00:00:00'
            AND p_type = 'STANDARD') all_nations
    GROUP BY o_year
    """,
    group="tpch",
)
def q08(spark, sf_dir):
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    vol = _rev()
    return (
        joined.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume", vol)
        .groupBy("o_year")
        .agg(
            F.round(
                dsum_dec(
                    F.when(F.col("nation") == "NATION_3", F.col("volume"))
                    .otherwise(0.0)
                ).cast("double")
                / dsum_dec(F.col("volume")).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


# q09 (adapted: profit without ps_supplycost) — by nation and year
@register(
    "tpch_q09",
    oracle=f"""
    SELECT nation, o_year, {osum('amount')} AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS amount
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_type = 'PROMO') profit
    GROUP BY nation, o_year
    """,
    group="tpch",
)
def q09(spark, sf_dir):
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
    )


# q10 — returned items: join + group on customer attributes
@register(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           {osum('l_extendedprice * (1 - l_discount)')} AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    """,
    group="tpch",
)
def q10(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev()).alias("revenue"))
    )


# q11 (adapted) — HAVING against a scalar-subquery threshold
@register(
    "tpch_q11_nation_value",
    oracle=f"""
    SELECT n_name, {osum('l_extendedprice * l_quantity')} AS value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    GROUP BY n_name
    HAVING sum(CAST(l_extendedprice * l_quantity AS {DEC})) >
           (SELECT sum(CAST(l_extendedprice * l_quantity AS {DEC})) * 0.04
            FROM lineitem, supplier WHERE l_suppkey = s_suppkey)
    """,
    group="tpch",
)
def q11(spark, sf_dir):
    register_views(spark, sf_dir, ["lineitem", "supplier", "nation"])
    return _sql_fast(spark, 
        f"""
        SELECT n_name, {osum('l_extendedprice * l_quantity')} AS value
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        GROUP BY n_name
        HAVING sum(CAST(l_extendedprice * l_quantity AS {DEC})) >
               (SELECT sum(CAST(l_extendedprice * l_quantity AS {DEC})) * 0.04
                FROM lineitem, supplier WHERE l_suppkey = s_suppkey)
        """
    )


# q12 (adapted) — late-shipment counts by priority (CASE aggregation)
@register(
    "tpch_q12",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                        CAST(l_shipdate AS DATE)) > 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           count(*) AS line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
    group="tpch",
)
def q12(spark, sf_dir):
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    ) > 90
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("late_count"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


# q13 — customer order-count distribution (left outer join + double group)
@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
    group="tpch",
)
def q13(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    inner = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return inner.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# q14 — promotion effect: conditional ratio over one month
@register(
    "tpch_q14",
    oracle=f"""
    SELECT round(100.00 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END AS {DEC})) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                        AS DOUBLE), 4) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    group="tpch",
)
def q14(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * dsum_dec(
                    F.when(F.col("p_type") == "PROMO", _rev())
                    .otherwise(0.0)
                ).cast("double")
                / dsum_dec(_rev()).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


# q15 — top supplier via CTE + scalar-subquery max
@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(CAST(l_extendedprice * (1 - l_discount) AS {DEC})), 2)
               AS total_revenue_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue_dec AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue_dec = (SELECT max(total_revenue_dec) FROM revenue)
    """,
    group="tpch",
)
def q15(spark, sf_dir):
    register_views(spark, sf_dir, ["lineitem", "supplier"])
    return _sql_fast(spark, 
        f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(CAST(l_extendedprice * (1 - l_discount) AS {DEC})), 2)
                   AS total_revenue_dec
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-07-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_revenue_dec AS DOUBLE) AS total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue_dec = (SELECT max(total_revenue_dec) FROM revenue)
        """
    )


# q16 (adapted) — COUNT(DISTINCT) per part attributes with IN-list
@register(
    "tpch_q16",
    oracle="""
    SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20)
    GROUP BY p_brand, p_size
    """,
    group="tpch",
)
def q16(spark, sf_dir):
    p = load(spark, sf_dir, "part").where(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 5, 10, 15, 20)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# q17 — correlated average-quantity subquery
@register(
    "tpch_q17",
    oracle=f"""
    SELECT round(CAST(sum(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
    group="tpch",
)
def q17(spark, sf_dir):
    register_views(spark, sf_dir, ["lineitem", "part"])
    return _sql_fast(spark, 
        f"""
        SELECT round(CAST(sum(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)
        """
    )


# q18 — large-volume customers: HAVING on join + re-join detail
@register(
    "tpch_q18",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
           {osum('l_quantity')} AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    group="tpch",
)
def q18(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(dsum("l_quantity").alias("sum_qty"))
    )


# q19 — discounted revenue: disjunction of conjunctive ranges
@register(
    "tpch_q19",
    oracle=f"""
    SELECT {osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
            AND p_size BETWEEN 1 AND 5)
        OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
            AND p_size BETWEEN 1 AND 10)
        OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
            AND p_size BETWEEN 1 AND 15))
    """,
    group="tpch",
)
def q19(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(dsum(_rev()).alias("revenue"))
    )


# q20 (adapted) — chained semi-joins
@register(
    "tpch_q20",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem, part
        WHERE l_partkey = p_partkey AND p_type = 'SMALL'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey HAVING sum(l_quantity) > 100)
    """,
    group="tpch",
)
def q20(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    qual = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 100)
        .select("l_suppkey")
    )
    return s.join(
        qual, s.s_suppkey == qual.l_suppkey, "left_semi"
    ).select("s_name", "s_acctbal")


# q21 (adapted) — EXISTS + NOT EXISTS (last shipper of multi-supplier orders)
@register(
    "tpch_q21",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
    group="tpch",
)
def q21(spark, sf_dir):
    register_views(spark, sf_dir, ["supplier", "lineitem", "orders"])
    return _sql_fast(spark, 
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        """
    )


# q22 (adapted) — anti-join + global-average threshold. The anti-join is
# against URGENT orders (not all orders): the synthetic testdata gives every
# customer at least one order, which made the original form return 0 rows at
# every SF — a vacuous proof.
@register(
    "tpch_q22",
    oracle=f"""
    SELECT cntrycode, count(*) AS numcust, {osum('c_acctbal')} AS totacctbal
    FROM (SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal
          FROM customer
          WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                             WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')) custsale
    GROUP BY cntrycode
    """,
    group="tpch",
)
def q22(spark, sf_dir):
    register_views(spark, sf_dir, ["customer", "orders"])
    return _sql_fast(spark, 
        f"""
        SELECT cntrycode, count(*) AS numcust, {osum('c_acctbal')} AS totacctbal
        FROM (SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal
              FROM customer
              WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                                 WHERE c_acctbal > 0.0)
                AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')) custsale
        GROUP BY cntrycode
        """
    )
