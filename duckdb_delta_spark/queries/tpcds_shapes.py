"""TPC-DS-shaped long-tail queries: stacked operator compositions.

The reference ships the full ~99-query TPC-DS surface
(reference: benchmark/tpcds/sf1/local/delta/*.benchmark); the operator
CLASSES are covered elsewhere in this suite, and these queries exercise the
long-tail *compositions* those benchmarks stress: window functions stacked
over ROLLUP (q67), multi-CTE INTERSECT chains (q14), correlated
EXISTS-over-aggregate (q23/q10), ratio-of-total windows (q30), scalar
subqueries in HAVING (q23), and decile segmentation (ntile).

Each query is one SQL text in ANSI-compatible form run through
``spark.sql`` with the identical string as the DuckDB oracle — dialect
divergences (NULLS ordering, decimal summation order) are pinned
explicitly in the SQL itself.
"""

from __future__ import annotations

from duckdb_delta_spark.queries import register, register_views

#: exact decimal accumulation, surfaced as rounded double (both dialects)
_DSUM = "CAST(round(sum(CAST({x} AS DECIMAL(25,6))), 2) AS DOUBLE)"


def _sql(spark, sf_dir, tables, text):
    register_views(spark, sf_dir, tables)
    return spark.sql(text)


# q67 class: rank window stacked over a ROLLUP aggregate
_ROLLUP_WINDOW = f"""
WITH agg AS (
  SELECT n_name, o_orderpriority,
         {_DSUM.format(x='o_totalprice')} AS total,
         count(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY ROLLUP(n_name, o_orderpriority))
SELECT n_name, o_orderpriority, total, n, rk FROM (
  SELECT n_name, o_orderpriority, total, n,
         rank() OVER (PARTITION BY n_name
                      ORDER BY total DESC, o_orderpriority ASC NULLS FIRST) AS rk
  FROM agg) t
WHERE rk <= 3
"""


@register("ds_rollup_window", oracle=_ROLLUP_WINDOW, group="tpcds")
def ds_rollup_window(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer", "nation"], _ROLLUP_WINDOW)


# q14 class: INTERSECT chain across multiple CTEs
_MULTI_CTE_INTERSECT = """
WITH urgent AS (
  SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
finished AS (
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
solvent AS (
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0)
SELECT CAST(k AS BIGINT) AS custkey
FROM (SELECT k FROM urgent INTERSECT SELECT k FROM finished
      INTERSECT SELECT k FROM solvent) t
"""


@register("ds_multi_cte_intersect", oracle=_MULTI_CTE_INTERSECT, group="tpcds")
def ds_multi_cte_intersect(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer"], _MULTI_CTE_INTERSECT)


# q23/q10 class: correlated EXISTS over an aggregate subquery
_EXISTS_OVER_AGG = f"""
SELECT n_name, count(*) AS n_customers,
       {_DSUM.format(x='c_acctbal')} AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
  GROUP BY o_custkey
  HAVING count(*) >= 12)
GROUP BY n_name
"""


@register("ds_exists_over_agg", oracle=_EXISTS_OVER_AGG, group="tpcds")
def ds_exists_over_agg(spark, sf_dir):
    return _sql(spark, sf_dir, ["customer", "nation", "orders"], _EXISTS_OVER_AGG)


# q30 class: ratio-of-total window over a UNION ALL of channels
_CHANNEL_SHARE = f"""
WITH sales AS (
  SELECT 'web' AS channel, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, value AS v
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT 'store' AS channel, CAST(o_orderdate AS DATE) AS d, o_totalprice AS v
  FROM orders),
by_channel AS (
  SELECT channel, {_DSUM.format(x='v')} AS revenue, count(*) AS n
  FROM sales GROUP BY channel)
SELECT channel, revenue, n,
       round(revenue / sum(revenue) OVER (), 6) AS share
FROM by_channel
"""


@register("ds_channel_share", oracle=_CHANNEL_SHARE, group="tpcds")
def ds_channel_share(spark, sf_dir):
    return _sql(spark, sf_dir, ["events", "orders"], _CHANNEL_SHARE)


# q23 class: scalar subquery inside HAVING (groups above the global mean)
_HAVING_SUBQUERY = f"""
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n_orders,
         {_DSUM.format(x='o_totalprice')} AS spend
  FROM orders GROUP BY o_custkey)
SELECT CAST(o_custkey AS BIGINT) AS custkey, n_orders, spend
FROM per_cust
WHERE spend > (SELECT 1.5 * avg(spend) FROM per_cust)
"""


@register("ds_having_subquery", oracle=_HAVING_SUBQUERY, group="tpcds")
def ds_having_subquery(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _HAVING_SUBQUERY)


# decile segmentation: ntile window feeding a re-aggregation
_DECILE_STATS = f"""
WITH ranked AS (
  SELECT c_acctbal,
         ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
  FROM customer)
SELECT decile, count(*) AS n,
       {_DSUM.format(x='c_acctbal')} AS total,
       CAST(round(min(c_acctbal), 2) AS DOUBLE) AS lo,
       CAST(round(max(c_acctbal), 2) AS DOUBLE) AS hi
FROM ranked GROUP BY decile
"""


@register("ds_decile_stats", oracle=_DECILE_STATS, group="tpcds")
def ds_decile_stats(spark, sf_dir):
    return _sql(spark, sf_dir, ["customer"], _DECILE_STATS)


# q33/q56 class: EXCEPT between aggregated CTEs + join back for detail.
# Per-(day, user) grain — all-time sets fully overlap in the synthetic
# data, which would make the proof vacuous (0 = 0).
_EXCEPT_AGG_JOIN = f"""
WITH errors_only AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, user_id
  FROM events WHERE event_type = 'error'
  EXCEPT
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, user_id
  FROM events WHERE event_type = 'purchase')
SELECT x.d, count(*) AS n_errors,
       {_DSUM.format(x='e.value')} AS err_value
FROM events e JOIN errors_only x
  ON e.user_id = x.user_id AND CAST(CAST(e.ts AS TIMESTAMP) AS DATE) = x.d
WHERE e.event_type = 'error'
GROUP BY x.d
"""


@register("ds_except_agg_join", oracle=_EXCEPT_AGG_JOIN, group="tpcds")
def ds_except_agg_join(spark, sf_dir):
    return _sql(spark, sf_dir, ["events"], _EXCEPT_AGG_JOIN)


# q51 class: two windowed CTEs full-outer-joined, running-max comparison
_DUAL_WINDOW_JOIN = f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         {_DSUM.format(x='value')} AS web_rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
cume AS (
  SELECT d, web_rev,
         max(web_rev) OVER (ORDER BY d ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak_so_far
  FROM daily)
SELECT d, web_rev, peak_so_far,
       CAST(web_rev >= peak_so_far AS BOOLEAN) AS is_record_day
FROM cume
"""


@register("ds_dual_window_join", oracle=_DUAL_WINDOW_JOIN, group="tpcds")
def ds_dual_window_join(spark, sf_dir):
    return _sql(spark, sf_dir, ["events"], _DUAL_WINDOW_JOIN)
