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

from duckdb_delta_spark.plans import physical_plan_text
from duckdb_delta_spark.queries import fast_decimal_sums, register, register_views

#: exact decimal accumulation, surfaced as rounded double (both dialects)
_DSUM = "CAST(round(sum(CAST({x} AS DECIMAL(25,6))), 2) AS DOUBLE)"


def _sql(spark, sf_dir, tables, text):
    # the SPARK side runs the fixed-point twin of every decimal-sum —
    # value-identical on the suite's ≤6dp measures, ~3.7x faster (see
    # queries.fast_decimal_sums / dsum_dec); the ORACLE keeps the
    # canonical decimal spelling, so the driver's hash-compare verifies
    # the rewrite on every run
    register_views(spark, sf_dir, tables)
    return spark.sql(fast_decimal_sums(text))


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


# ---------------------------------------------------------------------------
# Round-5 widening: the grouping-sets/window-heavy TPC-DS classes the
# reference benchmarks (benchmark/tpcds/sf1/**) that were not yet
# represented: q5 (channel roll-up report), q22 (rollup averages),
# q36/q86 (lochierarchy rank over ROLLUP), q70 (in-hierarchy rank),
# q11/q74 (year-over-year ratio), q47/q57 (neighbor-window outliers),
# q88 (time-band conditional counts), q34/q73 (order-size buckets),
# q49 (null-safe return-ratio rank), q93 (returns effect).
# ---------------------------------------------------------------------------


# q36/q86 class: lochierarchy (grouping-depth) rank over ROLLUP
_LOCHIERARCHY_RANK = f"""
WITH agg AS (
  SELECT n_name, o_orderstatus,
         CAST(grouping(n_name) + grouping(o_orderstatus) AS INT) AS lochierarchy,
         {_DSUM.format(x='o_totalprice')} AS total
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY ROLLUP(n_name, o_orderstatus))
SELECT n_name, o_orderstatus, lochierarchy, total,
       rank() OVER (
         PARTITION BY lochierarchy,
                      CASE WHEN lochierarchy = 0 THEN n_name END
         ORDER BY total DESC, n_name ASC NULLS FIRST,
                  o_orderstatus ASC NULLS FIRST) AS rk
FROM agg
"""


@register("ds_lochierarchy_rank", oracle=_LOCHIERARCHY_RANK, group="tpcds")
def ds_lochierarchy_rank(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer", "nation"],
                _LOCHIERARCHY_RANK)


# q70 class: rank nations inside regions, top-5 via subquery (no QUALIFY
# in Spark), region grand totals carried alongside
_REGION_NATION_RANK = f"""
WITH s AS (
  SELECT r_name, n_name, {_DSUM.format(x='o_totalprice')} AS rev,
         count(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name)
SELECT r_name, n_name, rev, n, rk,
       round(rev / sum(rev) OVER (PARTITION BY r_name), 6) AS region_share
FROM (SELECT r_name, n_name, rev, n,
             rank() OVER (PARTITION BY r_name
                          ORDER BY rev DESC, n_name ASC) AS rk
      FROM s) t
WHERE rk <= 5
"""


@register("ds_region_nation_rank", oracle=_REGION_NATION_RANK, group="tpcds")
def ds_region_nation_rank(spark, sf_dir):
    df = _sql(spark, sf_dir,
              ["orders", "customer", "nation", "region"],
              _REGION_NATION_RANK)
    # all three dim joins must plan as broadcasts (no shuffle join on
    # customer/nation/region at any scale — orders is the only big side)
    plan = physical_plan_text(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    return df


# q11/q74 class: year-over-year spend ratio per customer (self-join of
# per-period aggregates), growth filter
_YOY_RATIO = f"""
WITH per_year AS (
  SELECT o_custkey, CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         {_DSUM.format(x='o_totalprice')} AS spend
  FROM orders GROUP BY o_custkey, year(CAST(o_orderdate AS DATE)))
SELECT CAST(a.o_custkey AS BIGINT) AS custkey, a.yr AS yr,
       a.spend AS spend_prev, b.spend AS spend_next,
       round(b.spend / a.spend, 6) AS growth
FROM per_year a JOIN per_year b
  ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
WHERE a.spend > 1000 AND b.spend / a.spend > 1.5
"""


@register("ds_yoy_ratio", oracle=_YOY_RATIO, group="tpcds")
def ds_yoy_ratio(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _YOY_RATIO)


# q47/q57 class: monthly series vs centered neighbor window, outliers
_NEIGHBOR_OUTLIER = f"""
WITH monthly AS (
  SELECT n_name,
         CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS m,
         {_DSUM.format(x='o_totalprice')} AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, date_trunc('month', CAST(o_orderdate AS DATE))),
neigh AS (
  SELECT n_name, m, rev,
         avg(rev) OVER (PARTITION BY n_name ORDER BY m ASC
                        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS nb
  FROM monthly)
SELECT n_name, m, rev,
       round(rev / nb, 4) AS ratio
FROM neigh WHERE rev / nb > 1.6 OR rev / nb < 0.4
"""


@register("ds_neighbor_outlier", oracle=_NEIGHBOR_OUTLIER, group="tpcds")
def ds_neighbor_outlier(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer", "nation"],
                _NEIGHBOR_OUTLIER)


# q88 class: one row of conditional time-band counts
_TIME_BANDS = """
SELECT
  count(CASE WHEN h BETWEEN 0 AND 5 THEN 1 END)   AS night,
  count(CASE WHEN h BETWEEN 6 AND 11 THEN 1 END)  AS morning,
  count(CASE WHEN h BETWEEN 12 AND 17 THEN 1 END) AS afternoon,
  count(CASE WHEN h BETWEEN 18 AND 23 THEN 1 END) AS evening,
  count(*) AS total
FROM (SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS h FROM events) t
"""


@register("ds_time_bands", oracle=_TIME_BANDS, group="tpcds")
def ds_time_bands(spark, sf_dir):
    return _sql(spark, sf_dir, ["events"], _TIME_BANDS)


# q34/q73 class: order-size buckets joined back to order attributes
_ORDER_SIZE_BUCKETS = """
WITH per_order AS (
  SELECT l_orderkey, count(*) AS items
  FROM lineitem GROUP BY l_orderkey)
SELECT o_orderstatus, items, count(*) AS n_orders
FROM orders JOIN per_order ON o_orderkey = l_orderkey
WHERE items BETWEEN 2 AND 6
GROUP BY o_orderstatus, items
"""


@register("ds_order_size_buckets", oracle=_ORDER_SIZE_BUCKETS, group="tpcds")
def ds_order_size_buckets(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem"], _ORDER_SIZE_BUCKETS)


# q49 class: null-safe return-ratio ranking across a 4-way join
_RETURN_RATIO_RANK = f"""
WITH per_nation AS (
  SELECT n_name,
         {_DSUM.format(x="CASE WHEN l_returnflag = 'R' THEN l_extendedprice END")} AS returned,
         {_DSUM.format(x='l_extendedprice')} AS total
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name)
SELECT n_name, returned, total,
       round(coalesce(returned, 0) / NULLIF(total, 0), 6) AS ratio,
       rank() OVER (ORDER BY coalesce(returned, 0) / NULLIF(total, 0) DESC,
                    n_name ASC) AS rk
FROM per_nation
"""


@register("ds_return_ratio_rank", oracle=_RETURN_RATIO_RANK, group="tpcds")
def ds_return_ratio_rank(spark, sf_dir):
    df = _sql(spark, sf_dir,
              ["lineitem", "orders", "customer", "nation"],
              _RETURN_RATIO_RANK)
    plan = physical_plan_text(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    return df


# q93 class: returns' effect on kept revenue per priority class
_RETURNS_EFFECT = f"""
WITH per_order AS (
  SELECT l_orderkey,
         {_DSUM.format(x="CASE WHEN l_returnflag <> 'R' THEN l_extendedprice END")} AS kept,
         {_DSUM.format(x='l_extendedprice')} AS gross
  FROM lineitem GROUP BY l_orderkey)
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(round(sum(coalesce(kept, 0)), 2) AS DOUBLE) AS kept_rev,
       CAST(round(sum(gross), 2) AS DOUBLE) AS gross_rev,
       round(sum(coalesce(kept, 0)) / sum(gross), 6) AS kept_share
FROM orders JOIN per_order ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@register("ds_returns_effect", oracle=_RETURNS_EFFECT, group="tpcds")
def ds_returns_effect(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem"], _RETURNS_EFFECT)


# q5 class: multi-channel UNION ALL report rolled up over (channel, class)
_CHANNEL_ROLLUP_REPORT = f"""
WITH sales AS (
  SELECT 'store' AS channel, o_orderpriority AS cls, o_totalprice AS amt
  FROM orders
  UNION ALL
  SELECT 'web' AS channel, event_type AS cls, value AS amt
  FROM events WHERE event_type IN ('purchase', 'refund'))
SELECT channel, cls, count(*) AS n,
       {_DSUM.format(x='amt')} AS total
FROM sales GROUP BY ROLLUP(channel, cls)
"""


@register("ds_channel_rollup_report", oracle=_CHANNEL_ROLLUP_REPORT,
          group="tpcds")
def ds_channel_rollup_report(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "events"], _CHANNEL_ROLLUP_REPORT)


# q22 class: catalog averages over a two-level ROLLUP of part attributes
_PART_ROLLUP_AVG = f"""
SELECT p_brand, p_type, count(*) AS n,
       CAST(round(avg(p_retailprice), 4) AS DOUBLE) AS avg_price,
       CAST(round(avg(p_size), 4) AS DOUBLE) AS avg_size
FROM part
GROUP BY ROLLUP(p_brand, p_type)
"""


@register("ds_part_rollup_avg", oracle=_PART_ROLLUP_AVG, group="tpcds")
def ds_part_rollup_avg(spark, sf_dir):
    return _sql(spark, sf_dir, ["part"], _PART_ROLLUP_AVG)


# q15 class: keep groups whose aggregate equals a scalar-subquery max
_SCALAR_MAX_TOPK = f"""
WITH per_region AS (
  SELECT r_name, {_DSUM.format(x='o_totalprice')} AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name)
SELECT r_name, rev FROM per_region
WHERE rev = (SELECT max(rev) FROM per_region)
"""


@register("ds_scalar_max_topk", oracle=_SCALAR_MAX_TOPK, group="tpcds")
def ds_scalar_max_topk(spark, sf_dir):
    return _sql(spark, sf_dir,
                ["orders", "customer", "nation", "region"],
                _SCALAR_MAX_TOPK)


# q65 class: groups under a fraction of the global per-group average
_MIN_AVG_JOIN = f"""
WITH per_part AS (
  SELECT l_partkey, {_DSUM.format(x='l_extendedprice')} AS rev,
         count(*) AS n
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(l_partkey AS BIGINT) AS partkey, rev, n
FROM per_part
WHERE rev <= (SELECT 0.5 * avg(rev) FROM per_part)
"""


@register("ds_min_avg_join", oracle=_MIN_AVG_JOIN, group="tpcds")
def ds_min_avg_join(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem"], _MIN_AVG_JOIN)


# q38 class: COUNT over a multi-way INTERSECT of keys
_INTERSECT_COUNT = """
SELECT count(*) AS n FROM (
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 50000
  INTERSECT
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0) t
"""


@register("ds_intersect_count", oracle=_INTERSECT_COUNT, group="tpcds")
def ds_intersect_count(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer"], _INTERSECT_COUNT)


# q92 class: correlated scalar average (excess discount per part)
_EXCESS_DISCOUNT = f"""
SELECT CAST(count(*) AS BIGINT) AS n_excess,
       {_DSUM.format(x='l.l_extendedprice')} AS excess_rev
FROM lineitem l
WHERE l.l_discount > (
  SELECT 1.3 * avg(l2.l_discount) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey)
"""


@register("ds_excess_discount", oracle=_EXCESS_DISCOUNT, group="tpcds")
def ds_excess_discount(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem"], _EXCESS_DISCOUNT)


# q95 class: EXISTS + NOT EXISTS against the same fact at different grains
_MULTI_EXISTS = f"""
SELECT o_orderpriority, count(*) AS n,
       {_DSUM.format(x='o_totalprice')} AS total
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey
    AND l_returnflag = 'N')
  AND NOT EXISTS (
    SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey
    AND l_discount > 0.09)
GROUP BY o_orderpriority
"""


@register("ds_multi_exists", oracle=_MULTI_EXISTS, group="tpcds")
def ds_multi_exists(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem"], _MULTI_EXISTS)


# q75 class: UNION ALL of casted channel slices, self-joined year-over-year
_UNION_YOY = f"""
WITH unioned AS (
  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         o_orderstatus AS grp, o_totalprice AS amt
  FROM orders
  UNION ALL
  SELECT CAST(year(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS INT) AS yr,
         event_type AS grp, CAST(value AS DOUBLE) AS amt
  FROM events WHERE event_type = 'purchase'),
yearly AS (
  SELECT yr, grp, {_DSUM.format(x='amt')} AS rev, count(*) AS n
  FROM unioned GROUP BY yr, grp)
SELECT a.grp AS grp, a.yr AS prev_yr, a.rev AS prev_rev, b.rev AS next_rev,
       round(b.rev / a.rev, 6) AS ratio
FROM yearly a JOIN yearly b ON a.grp = b.grp AND b.yr = a.yr + 1
"""


@register("ds_union_yoy", oracle=_UNION_YOY, group="tpcds")
def ds_union_yoy(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "events"], _UNION_YOY)


# q1 class: within-group value vs the group's average (correlated on the
# aggregate of the same CTE)
_ABOVE_GROUP_AVG = f"""
WITH per_cust AS (
  SELECT o_custkey, o_orderstatus,
         {_DSUM.format(x='o_totalprice')} AS spend
  FROM orders GROUP BY o_custkey, o_orderstatus)
SELECT CAST(a.o_custkey AS BIGINT) AS custkey, a.o_orderstatus, a.spend
FROM per_cust a
WHERE a.spend > (
  SELECT 1.8 * avg(b.spend) FROM per_cust b
  WHERE b.o_orderstatus = a.o_orderstatus)
"""


@register("ds_above_group_avg", oracle=_ABOVE_GROUP_AVG, group="tpcds")
def ds_above_group_avg(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _ABOVE_GROUP_AVG)


# q2 class: period-over-period share via lead() over an aggregated series
_WEEK_SHARE_LEAD = f"""
WITH weekly AS (
  SELECT CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS wk,
         {_DSUM.format(x='o_totalprice')} AS rev
  FROM orders GROUP BY date_trunc('week', CAST(o_orderdate AS DATE)))
SELECT wk, rev,
       lead(rev) OVER (ORDER BY wk ASC) AS next_rev,
       round(lead(rev) OVER (ORDER BY wk ASC) / rev, 6) AS wow
FROM weekly
"""


@register("ds_week_share_lead", oracle=_WEEK_SHARE_LEAD, group="tpcds")
def ds_week_share_lead(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _WEEK_SHARE_LEAD)


# q31 class: compare two groups' period-over-period growth ratios
_TWO_RATIO_JOIN = f"""
WITH qly AS (
  SELECT n_name, CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS q,
         CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         {_DSUM.format(x='o_totalprice')} AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, quarter(CAST(o_orderdate AS DATE)),
           year(CAST(o_orderdate AS DATE)))
SELECT a.n_name, a.yr AS yr, a.q AS q,
       round(b.rev / a.rev, 6) AS growth
FROM qly a JOIN qly b
  ON a.n_name = b.n_name AND a.yr = b.yr AND b.q = a.q + 1
WHERE b.rev / a.rev > 1.1
"""


@register("ds_two_ratio_join", oracle=_TWO_RATIO_JOIN, group="tpcds")
def ds_two_ratio_join(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer", "nation"],
                _TWO_RATIO_JOIN)


# q59 class: day-band matrix via conditional aggregation, self-joined
# YoY (day-of-month bands — portable across dialects, unlike dayofweek
# whose numbering differs between engines)
_WEEKDAY_MATRIX = f"""
WITH wd AS (
  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         {_DSUM.format(x="CASE WHEN day(CAST(o_orderdate AS DATE)) <= 10 THEN o_totalprice END")} AS early,
         {_DSUM.format(x="CASE WHEN day(CAST(o_orderdate AS DATE)) BETWEEN 11 AND 20 THEN o_totalprice END")} AS mid,
         {_DSUM.format(x="CASE WHEN day(CAST(o_orderdate AS DATE)) > 20 THEN o_totalprice END")} AS late
  FROM orders GROUP BY year(CAST(o_orderdate AS DATE)))
SELECT a.yr AS yr, round(b.early / a.early, 6) AS early_yoy,
       round(b.mid / a.mid, 6) AS mid_yoy,
       round(b.late / a.late, 6) AS late_yoy
FROM wd a JOIN wd b ON b.yr = a.yr + 1
"""


@register("ds_weekday_matrix", oracle=_WEEKDAY_MATRIX, group="tpcds")
def ds_weekday_matrix(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _WEEKDAY_MATRIX)


# q66 class: wide monthly pivot row via conditional aggregation
_MONTHLY_PIVOT = f"""
SELECT n_name,
       {_DSUM.format(x="CASE WHEN month(CAST(o_orderdate AS DATE)) <= 3 THEN o_totalprice END")} AS q1_rev,
       {_DSUM.format(x="CASE WHEN month(CAST(o_orderdate AS DATE)) BETWEEN 4 AND 6 THEN o_totalprice END")} AS q2_rev,
       {_DSUM.format(x="CASE WHEN month(CAST(o_orderdate AS DATE)) BETWEEN 7 AND 9 THEN o_totalprice END")} AS q3_rev,
       {_DSUM.format(x="CASE WHEN month(CAST(o_orderdate AS DATE)) >= 10 THEN o_totalprice END")} AS q4_rev,
       count(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("ds_monthly_pivot", oracle=_MONTHLY_PIVOT, group="tpcds")
def ds_monthly_pivot(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer", "nation"],
                _MONTHLY_PIVOT)


# q89 class: deviation from the partition average (window avg filter —
# ratio computed in a subquery; Spark disallows windows in WHERE)
_WINDOW_AVG_DEVIATION = f"""
WITH monthly AS (
  SELECT o_orderpriority,
         CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS m,
         {_DSUM.format(x='o_totalprice')} AS rev
  FROM orders GROUP BY o_orderpriority, month(CAST(o_orderdate AS DATE))),
with_avg AS (
  SELECT o_orderpriority, m, rev,
         avg(rev) OVER (PARTITION BY o_orderpriority) AS prio_avg
  FROM monthly)
SELECT o_orderpriority, m, rev,
       round(rev / prio_avg, 4) AS ratio
FROM with_avg
WHERE rev / prio_avg NOT BETWEEN 0.9 AND 1.1
"""


@register("ds_window_avg_deviation", oracle=_WINDOW_AVG_DEVIATION,
          group="tpcds")
def ds_window_avg_deviation(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _WINDOW_AVG_DEVIATION)


# q98 class: share of the class total (sum over partition)
_CLASS_SHARE = f"""
WITH by_type AS (
  SELECT p_type, p_brand, {_DSUM.format(x='p_retailprice')} AS rev
  FROM part GROUP BY p_type, p_brand)
SELECT p_type, p_brand, rev,
       round(rev / sum(rev) OVER (PARTITION BY p_type), 6) AS class_share
FROM by_type
"""


@register("ds_class_share", oracle=_CLASS_SHARE, group="tpcds")
def ds_class_share(spark, sf_dir):
    return _sql(spark, sf_dir, ["part"], _CLASS_SHARE)


# q54 class: first-touch cohort (window min) + follow-on activity join
_FIRST_PURCHASE_COHORT = f"""
WITH firsts AS (
  SELECT o_custkey,
         min(CAST(o_orderdate AS DATE)) AS first_d
  FROM orders GROUP BY o_custkey),
next_orders AS (
  SELECT o.o_custkey, count(*) AS n_next,
         {_DSUM.format(x='o.o_totalprice')} AS next_rev
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
  WHERE CAST(o.o_orderdate AS DATE) > f.first_d
    AND CAST(o.o_orderdate AS DATE) <= f.first_d + INTERVAL 90 DAY
  GROUP BY o.o_custkey)
SELECT CAST(year(f.first_d) AS INT) AS cohort_year,
       count(*) AS n_customers,
       CAST(round(sum(coalesce(n.n_next, 0)), 0) AS BIGINT) AS follow_orders,
       {_DSUM.format(x='coalesce(n.next_rev, 0)')} AS follow_rev
FROM firsts f LEFT JOIN next_orders n ON f.o_custkey = n.o_custkey
GROUP BY year(f.first_d)
"""


@register("ds_first_purchase_cohort", oracle=_FIRST_PURCHASE_COHORT,
          group="tpcds")
def ds_first_purchase_cohort(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _FIRST_PURCHASE_COHORT)


# q35 class: per-group COUNT DISTINCT + EXISTS gate
_DISTINCT_EXISTS = f"""
SELECT n_name,
       count(*) AS n_customers,
       count(DISTINCT c_acctbal > 5000) AS n_balance_bands,
       {_DSUM.format(x='c_acctbal')} AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""


@register("ds_distinct_exists", oracle=_DISTINCT_EXISTS, group="tpcds")
def ds_distinct_exists(spark, sf_dir):
    return _sql(spark, sf_dir, ["customer", "nation", "orders"],
                _DISTINCT_EXISTS)


# q64 class: long multi-fact join chain (6 tables) with a compact group
_JOIN_CHAIN = f"""
SELECT r_name, s_name_band, count(*) AS n,
       {_DSUM.format(x='l_extendedprice')} AS rev
FROM (
  SELECT r_name,
         CASE WHEN s_acctbal >= 5000 THEN 'high' ELSE 'low' END AS s_name_band,
         l_extendedprice
  FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
  WHERE o_orderstatus = 'F') t
GROUP BY r_name, s_name_band
"""


@register("ds_join_chain", oracle=_JOIN_CHAIN, group="tpcds")
def ds_join_chain(spark, sf_dir):
    df = _sql(spark, sf_dir,
              ["lineitem", "orders", "customer", "nation", "region",
               "supplier"], _JOIN_CHAIN)
    plan = physical_plan_text(df)
    # dims (customer/nation/region/supplier) broadcast; the two facts shuffle
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    return df


# q72 class: NOT EXISTS with a date-offset correlation (late shipping)
_ANTI_JOIN_OFFSET = f"""
SELECT o_orderpriority, count(*) AS n,
       {_DSUM.format(x='o_totalprice')} AS total
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o.o_orderkey
    AND CAST(l_shipdate AS DATE)
        <= CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


@register("ds_anti_join_offset", oracle=_ANTI_JOIN_OFFSET, group="tpcds")
def ds_anti_join_offset(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem"], _ANTI_JOIN_OFFSET)


# q62/q99 class: shipping-delay buckets via interval comparisons
# (portable — datediff() signatures differ between the two dialects)
_SHIP_DELAY_BUCKETS = """
SELECT o_orderpriority,
  count(CASE WHEN CAST(l_shipdate AS DATE)
                  <= CAST(o_orderdate AS DATE) + INTERVAL 30 DAY
             THEN 1 END) AS d30,
  count(CASE WHEN CAST(l_shipdate AS DATE)
                  >  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY
              AND CAST(l_shipdate AS DATE)
                  <= CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
             THEN 1 END) AS d60,
  count(CASE WHEN CAST(l_shipdate AS DATE)
                  >  CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
             THEN 1 END) AS d_more,
  count(*) AS total
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@register("ds_ship_delay_buckets", oracle=_SHIP_DELAY_BUCKETS, group="tpcds")
def ds_ship_delay_buckets(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "orders"], _SHIP_DELAY_BUCKETS)


# q6 class: correlated average on a joined dimension
_CORRELATED_DIM_AVG = f"""
SELECT n_name, count(*) AS n_rich,
       {_DSUM.format(x='c_acctbal')} AS rich_bal
FROM customer c JOIN nation ON c.c_nationkey = n_nationkey
WHERE c.c_acctbal > (
  SELECT 1.2 * avg(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY n_name
"""


@register("ds_correlated_dim_avg", oracle=_CORRELATED_DIM_AVG, group="tpcds")
def ds_correlated_dim_avg(spark, sf_dir):
    return _sql(spark, sf_dir, ["customer", "nation"], _CORRELATED_DIM_AVG)
