"""TPC-DS-shaped long-tail queries, round-6 widening (37 → 70+ shapes).

The reference's declared surface is the full ~99-query TPC-DS suite run
as correctness-gated benchmarks (reference:
benchmark/tpcds/sf1/local/delta/*.benchmark, benchmark.Makefile:43-58).
`tpcds_shapes.py` covers 37 composition classes; this module adds the
classes still unevidenced after round 5, per query family:

* multi-channel UNION-of-CTEs reports over a restricted item set
  (q14/q33/q56/q60/q66), with returns netting (q5/q77/q80);
* paired-period ratio windows (q47/q57 lag+lead variants);
* EXISTS-chain customer filters (q10/q35/q69) and EXCEPT chains (q87);
* rollup matrices over geography and channels (q18/q67/q77/q80);
* scalar-subquery CASE buckets (q9/q28/q61/q90), OR-of-ANDs bands
  (q13/q48/q85), two-hop EXISTS (q16/q94/q95), best/worst rank joins
  (q44), revenue-band histograms (q54), spread pairs (q39),
  frequent-item × best-customer chains (q23), before/after boundary
  splits (q21/q40), first/last-value windows, channel-overlap FULL
  OUTER JOIN counts (q97).

Same conventions as tpcds_shapes.py: one ANSI SQL text for both Spark
and the DuckDB oracle, decimal accumulation surfaced as rounded
doubles, explicit NULLS ordering, total tie-breaks on every rank. The
synthetic events table spans one month of 2024 while orders span
1995-2001, so cross-channel alignment uses day-of-month, never the
calendar date.
"""

from __future__ import annotations

from duckdb_delta_spark.plans import physical_plan_text
from duckdb_delta_spark.queries import fast_decimal_sums, register, register_views

_DSUM = "CAST(round(sum(CAST({x} AS DECIMAL(25,6))), 2) AS DOUBLE)"


def _sql(spark, sf_dir, tables, text):
    # the SPARK side runs the fixed-point twin of every decimal-sum —
    # value-identical on the suite's ≤6dp measures, ~3.7x faster (see
    # queries.fast_decimal_sums / dsum_dec); the ORACLE keeps the
    # canonical decimal spelling, so the driver's hash-compare verifies
    # the rewrite on every run
    register_views(spark, sf_dir, tables)
    return spark.sql(fast_decimal_sums(text))


# q14/q33/q56/q60/q66 class: per-channel CTEs over a RESTRICTED item set
# (subquery), UNION ALL, re-aggregated into a per-brand channel matrix
_CROSS_CHANNEL_REPORT = f"""
WITH hot_brands AS (
  SELECT p_brand FROM part GROUP BY p_brand HAVING count(*) >= 80),
ch AS (
  SELECT 'open' AS channel, p_brand, l_extendedprice AS amt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_linestatus = 'O'
    AND p_brand IN (SELECT p_brand FROM hot_brands)
  UNION ALL
  SELECT 'finished' AS channel, p_brand, l_extendedprice AS amt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_linestatus = 'F'
    AND p_brand IN (SELECT p_brand FROM hot_brands))
SELECT p_brand,
       {_DSUM.format(x="CASE WHEN channel = 'open' THEN amt END")} AS open_rev,
       {_DSUM.format(x="CASE WHEN channel = 'finished' THEN amt END")} AS fin_rev,
       {_DSUM.format(x='amt')} AS total_rev,
       count(*) AS n
FROM ch GROUP BY p_brand
"""


@register("ds_cross_channel_report", oracle=_CROSS_CHANNEL_REPORT,
          group="tpcds")
def ds_cross_channel_report(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "part"], _CROSS_CHANNEL_REPORT)


# q47/q57 class, paired-period variant: monthly series with LAG and LEAD
# around each row, deviation from the series average, both neighbors
# carried in the output (the reference shape returns (prev, this, next))
_PAIRED_PERIOD_DEVIATION = f"""
WITH monthly AS (
  SELECT o_orderpriority AS prio,
         CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS m,
         {_DSUM.format(x='o_totalprice')} AS rev
  FROM orders
  GROUP BY o_orderpriority, year(CAST(o_orderdate AS DATE)),
           month(CAST(o_orderdate AS DATE))),
seq AS (
  SELECT prio, yr, m, rev,
         lag(rev)  OVER (PARTITION BY prio ORDER BY yr ASC, m ASC) AS prev_rev,
         lead(rev) OVER (PARTITION BY prio ORDER BY yr ASC, m ASC) AS next_rev,
         avg(rev)  OVER (PARTITION BY prio, yr) AS yr_avg
  FROM monthly)
SELECT prio, yr, m, rev, prev_rev, next_rev,
       round(rev / yr_avg, 4) AS avg_ratio
FROM seq
WHERE prev_rev IS NOT NULL AND next_rev IS NOT NULL
  AND rev / yr_avg < 0.8
"""


@register("ds_paired_period_deviation", oracle=_PAIRED_PERIOD_DEVIATION,
          group="tpcds")
def ds_paired_period_deviation(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _PAIRED_PERIOD_DEVIATION)


# q10/q35/q69 class: customer demographics gated by an EXISTS chain
# (active in one channel AND present in another, NOT in a third)
_EXISTS_CHAIN = f"""
SELECT c_mktsegment, count(*) AS n_customers,
       {_DSUM.format(x='c_acctbal')} AS total_bal
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
  AND EXISTS (
    SELECT 1 FROM events
    WHERE user_id = c.c_custkey AND event_type = 'purchase')
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c.c_custkey AND o_totalprice > 400000)
GROUP BY c_mktsegment
"""


@register("ds_exists_chain", oracle=_EXISTS_CHAIN, group="tpcds")
def ds_exists_chain(spark, sf_dir):
    return _sql(spark, sf_dir, ["customer", "orders", "events"],
                _EXISTS_CHAIN)


# q77 class: per-channel profit CTEs (gross minus returns) FULL OUTER
# JOINed per nation, totals via ROLLUP over the combined report
_PROFIT_ROLLUP_REPORT = f"""
WITH store AS (
  SELECT n_name,
         {_DSUM.format(x='l_extendedprice')} AS gross,
         {_DSUM.format(x="CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END")} AS returned
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name),
web AS (
  SELECT n_name, {_DSUM.format(x='value')} AS web_rev
  FROM events JOIN customer ON user_id = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  WHERE event_type = 'purchase'
  GROUP BY n_name),
combined AS (
  SELECT coalesce(s.n_name, w.n_name) AS n_name,
         coalesce(s.gross, 0) - coalesce(s.returned, 0) AS store_net,
         coalesce(w.web_rev, 0) AS web_rev
  FROM store s FULL OUTER JOIN web w ON s.n_name = w.n_name)
SELECT n_name,
       {_DSUM.format(x='store_net')} AS store_net,
       {_DSUM.format(x='web_rev')} AS web_rev,
       {_DSUM.format(x='store_net + web_rev')} AS total_net
FROM combined GROUP BY ROLLUP(n_name)
"""


@register("ds_profit_rollup_report", oracle=_PROFIT_ROLLUP_REPORT,
          group="tpcds")
def ds_profit_rollup_report(spark, sf_dir):
    return _sql(spark, sf_dir,
                ["lineitem", "orders", "customer", "nation", "events"],
                _PROFIT_ROLLUP_REPORT)


# q80 class: three-channel UNION report with returns netting, rolled up
# over (channel, year)
_CHANNEL_RETURNS_ROLLUP = f"""
WITH ch AS (
  SELECT 'open' AS channel,
         CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS yr,
         CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_extendedprice END AS kept,
         CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END AS ret
  FROM lineitem WHERE l_linestatus = 'O'
  UNION ALL
  SELECT 'finished' AS channel,
         CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS yr,
         CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_extendedprice END AS kept,
         CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END AS ret
  FROM lineitem WHERE l_linestatus = 'F')
SELECT channel, yr,
       {_DSUM.format(x='kept')} AS kept_rev,
       {_DSUM.format(x='ret')} AS returned_rev,
       count(*) AS n
FROM ch GROUP BY ROLLUP(channel, yr)
"""


@register("ds_channel_returns_rollup", oracle=_CHANNEL_RETURNS_ROLLUP,
          group="tpcds")
def ds_channel_returns_rollup(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem"], _CHANNEL_RETURNS_ROLLUP)


# q4/q74 class: growth in one channel vs growth in another per customer
# (store growth 1999→2000 vs web growth first→second half of the events
# month; events overlap custkeys 0-149)
_DUAL_CHANNEL_GROWTH = f"""
WITH store AS (
  SELECT o_custkey AS k,
         {_DSUM.format(x="CASE WHEN year(CAST(o_orderdate AS DATE)) = 1999 THEN o_totalprice END")} AS y1,
         {_DSUM.format(x="CASE WHEN year(CAST(o_orderdate AS DATE)) = 2000 THEN o_totalprice END")} AS y2
  FROM orders GROUP BY o_custkey),
web AS (
  SELECT user_id AS k,
         {_DSUM.format(x="CASE WHEN day(CAST(ts AS TIMESTAMP)) <= 15 THEN value END")} AS h1,
         {_DSUM.format(x="CASE WHEN day(CAST(ts AS TIMESTAMP)) > 15 THEN value END")} AS h2
  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
SELECT CAST(s.k AS BIGINT) AS custkey,
       round(s.y2 / s.y1, 6) AS store_growth,
       round(w.h2 / w.h1, 6) AS web_growth
FROM store s JOIN web w ON s.k = w.k
WHERE s.y1 > 0 AND s.y2 > 0 AND w.h1 > 0 AND w.h2 > 0
  AND w.h2 / w.h1 > s.y2 / s.y1
"""


@register("ds_dual_channel_growth", oracle=_DUAL_CHANNEL_GROWTH,
          group="tpcds")
def ds_dual_channel_growth(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "events"], _DUAL_CHANNEL_GROWTH)


# q9 class: one row of CASE-gated scalar subqueries (bucket statistics
# chosen by a count threshold inside each CASE)
_BUCKET_CASE_SCALARS = """
SELECT
  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) > 10000
       THEN (SELECT CAST(round(avg(l_extendedprice), 2) AS DOUBLE)
             FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)
       ELSE (SELECT CAST(round(avg(l_discount), 4) AS DOUBLE)
             FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) END AS b1,
  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) > 10000
       THEN (SELECT CAST(round(avg(l_extendedprice), 2) AS DOUBLE)
             FROM lineitem WHERE l_quantity BETWEEN 11 AND 20)
       ELSE (SELECT CAST(round(avg(l_discount), 4) AS DOUBLE)
             FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) END AS b2,
  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) > 10000
       THEN (SELECT CAST(round(avg(l_extendedprice), 2) AS DOUBLE)
             FROM lineitem WHERE l_quantity BETWEEN 21 AND 30)
       ELSE (SELECT CAST(round(avg(l_discount), 4) AS DOUBLE)
             FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) END AS b3,
  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity > 30) > 10000
       THEN (SELECT CAST(round(avg(l_extendedprice), 2) AS DOUBLE)
             FROM lineitem WHERE l_quantity > 30)
       ELSE (SELECT CAST(round(avg(l_discount), 4) AS DOUBLE)
             FROM lineitem WHERE l_quantity > 30) END AS b4
"""


@register("ds_bucket_case_scalars", oracle=_BUCKET_CASE_SCALARS,
          group="tpcds")
def ds_bucket_case_scalars(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem"], _BUCKET_CASE_SCALARS)


# q16/q94 class: COUNT DISTINCT orders that used >1 supplier (EXISTS on
# the same fact at a different row) and had no returns (NOT EXISTS)
_DISTINCT_ORDER_EXISTS = f"""
SELECT count(DISTINCT o_orderkey) AS n_orders,
       {_DSUM.format(x='o_totalprice')} AS total
FROM orders o
WHERE o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l1 WHERE l1.l_orderkey = o.o_orderkey
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey))
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = o.o_orderkey AND l3.l_returnflag = 'R')
"""


@register("ds_distinct_order_exists", oracle=_DISTINCT_ORDER_EXISTS,
          group="tpcds")
def ds_distinct_order_exists(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem"],
                _DISTINCT_ORDER_EXISTS)


# q44 class: best and worst performers joined on rank index (two
# opposite-order rank windows over the same aggregate)
_BEST_WORST_RANK = f"""
WITH per_part AS (
  SELECT l_partkey, {_DSUM.format(x='l_extendedprice')} AS rev
  FROM lineitem GROUP BY l_partkey),
ranked AS (
  SELECT l_partkey, rev,
         rank() OVER (ORDER BY rev DESC, l_partkey ASC) AS best_rk,
         rank() OVER (ORDER BY rev ASC,  l_partkey ASC) AS worst_rk
  FROM per_part)
SELECT b.best_rk AS rk,
       pb.p_name AS best_part, b.rev AS best_rev,
       pw.p_name AS worst_part, w.rev AS worst_rev
FROM ranked b
  JOIN ranked w ON b.best_rk = w.worst_rk
  JOIN part pb ON b.l_partkey = pb.p_partkey
  JOIN part pw ON w.l_partkey = pw.p_partkey
WHERE b.best_rk <= 10
"""


@register("ds_best_worst_rank", oracle=_BEST_WORST_RANK, group="tpcds")
def ds_best_worst_rank(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "part"], _BEST_WORST_RANK)


# q51 class: two cumulative series FULL OUTER JOINed on the aligned axis
# (day-of-month — the channels live in different calendar ranges), rows
# where one channel's cumulative total overtakes the other
_CUMULATIVE_CROSSOVER = f"""
WITH store AS (
  SELECT CAST(day(CAST(o_orderdate AS DATE)) AS INT) AS d,
         {_DSUM.format(x='o_totalprice')} AS rev
  FROM orders
  WHERE year(CAST(o_orderdate AS DATE)) = 1998
    AND month(CAST(o_orderdate AS DATE)) = 1
  GROUP BY day(CAST(o_orderdate AS DATE))),
web AS (
  SELECT CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
         {_DSUM.format(x='value * 600')} AS rev
  FROM events WHERE event_type = 'purchase'
  GROUP BY day(CAST(ts AS TIMESTAMP))),
joined AS (
  SELECT coalesce(s.d, w.d) AS d,
         coalesce(s.rev, 0) AS store_rev,
         coalesce(w.rev, 0) AS web_rev
  FROM store s FULL OUTER JOIN web w ON s.d = w.d),
cume AS (
  SELECT d,
         sum(store_rev) OVER (ORDER BY d ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS store_cum,
         sum(web_rev) OVER (ORDER BY d ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS web_cum
  FROM joined)
SELECT d, CAST(round(store_cum, 2) AS DOUBLE) AS store_cum,
       CAST(round(web_cum, 2) AS DOUBLE) AS web_cum
FROM cume WHERE web_cum > store_cum
"""


@register("ds_cumulative_crossover", oracle=_CUMULATIVE_CROSSOVER,
          group="tpcds")
def ds_cumulative_crossover(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "events"], _CUMULATIVE_CROSSOVER)


# q54 class: revenue-band histogram of per-customer totals
_REVENUE_BAND_HISTOGRAM = f"""
WITH per_cust AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(25,6))) AS spend
  FROM orders GROUP BY o_custkey)
SELECT CAST(floor(spend / 100000) AS BIGINT) AS band,
       count(*) AS n_customers,
       {_DSUM.format(x='spend')} AS band_rev
FROM per_cust GROUP BY floor(spend / 100000)
"""


@register("ds_revenue_band_histogram", oracle=_REVENUE_BAND_HISTOGRAM,
          group="tpcds")
def ds_revenue_band_histogram(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _REVENUE_BAND_HISTOGRAM)


# q58 class: brands whose three slices each sit within a band of the
# slice average (balanced across "channels")
_BALANCED_CHANNELS = f"""
WITH slices AS (
  SELECT p_brand,
         {_DSUM.format(x="CASE WHEN l_returnflag = 'N' THEN l_extendedprice END")} AS s1,
         {_DSUM.format(x="CASE WHEN l_returnflag = 'A' THEN l_extendedprice END")} AS s2,
         {_DSUM.format(x="CASE WHEN l_returnflag = 'R' THEN l_extendedprice END")} AS s3
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand)
SELECT p_brand, s1, s2, s3
FROM slices
WHERE s1 BETWEEN 0.75 * (s1 + s2 + s3) / 3 AND 1.25 * (s1 + s2 + s3) / 3
  AND s2 BETWEEN 0.75 * (s1 + s2 + s3) / 3 AND 1.25 * (s1 + s2 + s3) / 3
  AND s3 BETWEEN 0.75 * (s1 + s2 + s3) / 3 AND 1.25 * (s1 + s2 + s3) / 3
"""


@register("ds_balanced_channels", oracle=_BALANCED_CHANNELS, group="tpcds")
def ds_balanced_channels(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "part"], _BALANCED_CHANNELS)


# q61 class: promotional share — ratio of two scalar CTEs (one row)
_PROMO_SHARE = f"""
WITH promo AS (
  SELECT {_DSUM.format(x='l_extendedprice')} AS rev
  FROM lineitem WHERE l_discount >= 0.05),
total AS (
  SELECT {_DSUM.format(x='l_extendedprice')} AS rev FROM lineitem)
SELECT p.rev AS promo_rev, t.rev AS total_rev,
       round(p.rev / t.rev, 6) AS promo_share
FROM promo p CROSS JOIN total t
"""


@register("ds_promo_share", oracle=_PROMO_SHARE, group="tpcds")
def ds_promo_share(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem"], _PROMO_SHARE)


# q68/q46 class: cross-geography order pairs (customer nation ≠ supplier
# nation), per-pair counts with a HAVING floor
_NATION_PAIR_ORDERS = f"""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       count(*) AS n_items,
       {_DSUM.format(x='l_extendedprice')} AS rev
FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_nationkey <> sn.n_nationkey
GROUP BY cn.n_name, sn.n_name
HAVING count(*) >= 200
"""


@register("ds_nation_pair_orders", oracle=_NATION_PAIR_ORDERS,
          group="tpcds")
def ds_nation_pair_orders(spark, sf_dir):
    df = _sql(spark, sf_dir,
              ["lineitem", "orders", "customer", "nation", "supplier"],
              _NATION_PAIR_ORDERS)
    plan = physical_plan_text(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    return df


# q48/q13 class: single-row sum over OR-of-ANDs band predicates
_OR_BAND_QUANTITY = f"""
SELECT CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 0) AS BIGINT)
         AS total_qty,
       count(*) AS n,
       {_DSUM.format(x='l_extendedprice')} AS rev
FROM lineitem
WHERE (l_quantity BETWEEN 1 AND 15
       AND l_discount BETWEEN 0.00 AND 0.04
       AND l_extendedprice BETWEEN 0 AND 20000)
   OR (l_quantity BETWEEN 16 AND 35
       AND l_discount BETWEEN 0.03 AND 0.07
       AND l_extendedprice BETWEEN 10000 AND 60000)
   OR (l_quantity BETWEEN 36 AND 50
       AND l_discount BETWEEN 0.06 AND 0.10
       AND l_extendedprice BETWEEN 30000 AND 120000)
"""


@register("ds_or_band_quantity", oracle=_OR_BAND_QUANTITY, group="tpcds")
def ds_or_band_quantity(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem"], _OR_BAND_QUANTITY)


# q90 class: am/pm activity ratio — division of two scalar counts
_AMPM_RATIO = """
WITH am AS (
  SELECT count(*) AS n FROM events
  WHERE hour(CAST(ts AS TIMESTAMP)) < 12),
pm AS (
  SELECT count(*) AS n FROM events
  WHERE hour(CAST(ts AS TIMESTAMP)) >= 12)
SELECT am.n AS am_count, pm.n AS pm_count,
       round(CAST(am.n AS DOUBLE) / pm.n, 6) AS am_pm_ratio
FROM am CROSS JOIN pm
"""


@register("ds_ampm_ratio", oracle=_AMPM_RATIO, group="tpcds")
def ds_ampm_ratio(spark, sf_dir):
    return _sql(spark, sf_dir, ["events"], _AMPM_RATIO)


# q39 class: per-(supplier, month) demand spread; consecutive months
# BOTH volatile, paired via self-join
_SPREAD_PAIRS = f"""
WITH per_month AS (
  SELECT l_suppkey,
         CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS m,
         CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS yr,
         CAST(round(max(l_quantity) - min(l_quantity), 2) AS DOUBLE) AS spread,
         count(*) AS n
  FROM lineitem
  WHERE year(CAST(l_shipdate AS DATE)) = 1999
  GROUP BY l_suppkey, month(CAST(l_shipdate AS DATE)),
           year(CAST(l_shipdate AS DATE))
  HAVING count(*) >= 5)
SELECT CAST(a.l_suppkey AS BIGINT) AS suppkey, a.yr AS yr,
       a.m AS m1, a.spread AS spread1,
       b.m AS m2, b.spread AS spread2
FROM per_month a JOIN per_month b
  ON a.l_suppkey = b.l_suppkey AND a.yr = b.yr AND b.m = a.m + 1
WHERE a.spread >= 40 AND b.spread >= 40
"""


@register("ds_spread_pairs", oracle=_SPREAD_PAIRS, group="tpcds")
def ds_spread_pairs(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem"], _SPREAD_PAIRS)


# q23 class: frequent items ∩ best customers → revenue of that
# intersection in a later period (chained IN subqueries over aggregates)
_FREQUENT_BEST_REVENUE = f"""
WITH frequent_parts AS (
  SELECT l_partkey FROM lineitem
  GROUP BY l_partkey HAVING count(*) >= 12),
per_cust AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(25,6))) AS spend
  FROM orders GROUP BY o_custkey),
best_customers AS (
  SELECT o_custkey FROM per_cust
  WHERE spend > (SELECT 1.5 * avg(spend) FROM per_cust))
SELECT count(*) AS n_items,
       {_DSUM.format(x='l_extendedprice')} AS rev
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE year(CAST(l_shipdate AS DATE)) >= 2000
  AND l_partkey IN (SELECT l_partkey FROM frequent_parts)
  AND o_custkey IN (SELECT o_custkey FROM best_customers)
"""


@register("ds_frequent_best_revenue", oracle=_FREQUENT_BEST_REVENUE,
          group="tpcds")
def ds_frequent_best_revenue(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "orders"],
                _FREQUENT_BEST_REVENUE)


# q87 class: EXCEPT chain across three activity sets, final count
_EXCEPT_CHAIN_COUNT = """
SELECT count(*) AS n FROM (
  SELECT o_custkey AS k FROM orders
  EXCEPT
  SELECT user_id AS k FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT user_id AS k FROM events WHERE event_type = 'signup') t
"""


@register("ds_except_chain_count", oracle=_EXCEPT_CHAIN_COUNT,
          group="tpcds")
def ds_except_chain_count(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "events"], _EXCEPT_CHAIN_COUNT)


# q97 class: channel-overlap counts from a FULL OUTER JOIN of two
# customer activity sets (store-only / web-only / both)
_CHANNEL_OVERLAP_COUNTS = """
WITH store AS (SELECT DISTINCT o_custkey AS k FROM orders),
web AS (SELECT DISTINCT user_id AS k FROM events
        WHERE event_type = 'purchase')
SELECT
  count(CASE WHEN s.k IS NOT NULL AND w.k IS NULL THEN 1 END) AS store_only,
  count(CASE WHEN s.k IS NULL AND w.k IS NOT NULL THEN 1 END) AS web_only,
  count(CASE WHEN s.k IS NOT NULL AND w.k IS NOT NULL THEN 1 END) AS both_ch
FROM store s FULL OUTER JOIN web w ON s.k = w.k
"""


@register("ds_channel_overlap_counts", oracle=_CHANNEL_OVERLAP_COUNTS,
          group="tpcds")
def ds_channel_overlap_counts(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "events"],
                _CHANNEL_OVERLAP_COUNTS)


# q41 class: DISTINCT attribute list gated by EXISTS over attribute
# combinations within the same dimension
_ATTR_COMBO_EXISTS = """
SELECT DISTINCT p_name
FROM part p
WHERE p_retailprice BETWEEN 940 AND 955
  AND EXISTS (
    SELECT 1 FROM part p2
    WHERE p2.p_brand = p.p_brand
      AND ((p2.p_size BETWEEN 1 AND 10 AND p2.p_type LIKE '%MEDIUM%')
        OR (p2.p_size BETWEEN 40 AND 50 AND p2.p_type LIKE '%PROMO%')))
"""


@register("ds_attr_combo_exists", oracle=_ATTR_COMBO_EXISTS, group="tpcds")
def ds_attr_combo_exists(spark, sf_dir):
    return _sql(spark, sf_dir, ["part"], _ATTR_COMBO_EXISTS)


# q82/q37 class: items in a price band with movement inside a date
# window — DISTINCT-per-brand counts over a fact-dim semi-join
_ITEM_WINDOW_DISTINCT = f"""
SELECT p_brand,
       count(DISTINCT p_partkey) AS n_parts,
       {_DSUM.format(x='l_extendedprice')} AS rev
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_retailprice BETWEEN 900 AND 1100
  AND CAST(l_shipdate AS DATE)
      BETWEEN DATE '1999-01-01' AND DATE '1999-06-30'
GROUP BY p_brand
"""


@register("ds_item_window_distinct", oracle=_ITEM_WINDOW_DISTINCT,
          group="tpcds")
def ds_item_window_distinct(spark, sf_dir):
    return _sql(spark, sf_dir, ["part", "lineitem"], _ITEM_WINDOW_DISTINCT)


# q18 class: casted averages over a geography ROLLUP (region, nation)
_GEO_ROLLUP_AVGS = """
SELECT r_name, n_name,
       CAST(round(avg(CAST(l_quantity AS DECIMAL(25,6))), 4) AS DOUBLE)
         AS avg_qty,
       CAST(round(avg(CAST(l_discount AS DECIMAL(25,6))), 6) AS DOUBLE)
         AS avg_disc,
       count(*) AS n
FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


@register("ds_geo_rollup_avgs", oracle=_GEO_ROLLUP_AVGS, group="tpcds")
def ds_geo_rollup_avgs(spark, sf_dir):
    df = _sql(spark, sf_dir,
              ["lineitem", "orders", "customer", "nation", "region"],
              _GEO_ROLLUP_AVGS)
    plan = physical_plan_text(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    return df


# q40/q21 class: kept vs returned revenue split at a date boundary
_BOUNDARY_RETURNS = f"""
SELECT p_brand,
       {_DSUM.format(x="CASE WHEN CAST(l_shipdate AS DATE) < DATE '1998-07-01' AND l_returnflag <> 'R' THEN l_extendedprice END")} AS kept_before,
       {_DSUM.format(x="CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1998-07-01' AND l_returnflag <> 'R' THEN l_extendedprice END")} AS kept_after,
       {_DSUM.format(x="CASE WHEN CAST(l_shipdate AS DATE) < DATE '1998-07-01' AND l_returnflag = 'R' THEN l_extendedprice END")} AS ret_before,
       {_DSUM.format(x="CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1998-07-01' AND l_returnflag = 'R' THEN l_extendedprice END")} AS ret_after
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE year(CAST(l_shipdate AS DATE)) = 1998
GROUP BY p_brand
"""


@register("ds_boundary_returns", oracle=_BOUNDARY_RETURNS, group="tpcds")
def ds_boundary_returns(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "part"], _BOUNDARY_RETURNS)


# q76 class: channel × year count/revenue matrix over a UNION ALL of
# differently-shaped slices (each slice pins a different constant)
_CHANNEL_YEAR_MATRIX = f"""
WITH unioned AS (
  SELECT 'low_disc' AS bucket,
         CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS yr,
         l_extendedprice AS amt
  FROM lineitem WHERE l_discount < 0.03
  UNION ALL
  SELECT 'mid_disc' AS bucket,
         CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS yr,
         l_extendedprice AS amt
  FROM lineitem WHERE l_discount BETWEEN 0.03 AND 0.07
  UNION ALL
  SELECT 'high_disc' AS bucket,
         CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS yr,
         l_extendedprice AS amt
  FROM lineitem WHERE l_discount > 0.07)
SELECT bucket, yr, count(*) AS n, {_DSUM.format(x='amt')} AS rev
FROM unioned GROUP BY bucket, yr
"""


@register("ds_channel_year_matrix", oracle=_CHANNEL_YEAR_MATRIX,
          group="tpcds")
def ds_channel_year_matrix(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem"], _CHANNEL_YEAR_MATRIX)


# q95 class: two-hop EXISTS — an order whose supplier ALSO supplied a
# different order of the same customer (the q95 "same warehouse pair"
# probe). The hop set is precomputed as a (customer, supplier, order)
# projection self-joined on equality keys — the correlated form would
# decorrelate into an inequality join (cross product) in both engines.
_TWO_HOP_EXISTS = f"""
WITH cust_supp AS (
  SELECT DISTINCT o_custkey AS k, l_suppkey AS s, l_orderkey AS ok
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderpriority, count(*) AS n,
       {_DSUM.format(x='o_totalprice')} AS total
FROM orders o
WHERE o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM cust_supp a JOIN cust_supp b
      ON a.k = b.k AND a.s = b.s AND a.ok <> b.ok
    WHERE a.ok = o.o_orderkey)
GROUP BY o_orderpriority
"""


@register("ds_two_hop_exists", oracle=_TWO_HOP_EXISTS, group="tpcds")
def ds_two_hop_exists(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem"], _TWO_HOP_EXISTS)


# q45 class: attribute-list OR EXISTS — string-derived bucket or a
# correlated activity probe
_PREFIX_OR_EXISTS = f"""
SELECT n_name, count(*) AS n_customers,
       {_DSUM.format(x='c_acctbal')} AS total_bal
FROM customer c JOIN nation ON c_nationkey = n_nationkey
WHERE substr(c_name, length(c_name), 1) IN ('1', '3', '5')
   OR EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c.c_custkey AND o_totalprice > 350000)
GROUP BY n_name
"""


@register("ds_prefix_or_exists", oracle=_PREFIX_OR_EXISTS, group="tpcds")
def ds_prefix_or_exists(spark, sf_dir):
    return _sql(spark, sf_dir, ["customer", "nation", "orders"],
                _PREFIX_OR_EXISTS)


# q84 class: named band lookup (CASE dimension) joined to activity
_INCOME_BAND_LOOKUP = f"""
WITH banded AS (
  SELECT c_custkey,
         CASE WHEN c_acctbal < 0 THEN 'debt'
              WHEN c_acctbal < 3000 THEN 'low'
              WHEN c_acctbal < 7000 THEN 'mid'
              ELSE 'high' END AS band
  FROM customer)
SELECT band, count(*) AS n_orders,
       {_DSUM.format(x='o_totalprice')} AS rev
FROM orders JOIN banded ON o_custkey = c_custkey
GROUP BY band
HAVING count(*) >= 10
"""


@register("ds_income_band_lookup", oracle=_INCOME_BAND_LOOKUP,
          group="tpcds")
def ds_income_band_lookup(spark, sf_dir):
    return _sql(spark, sf_dir, ["customer", "orders"], _INCOME_BAND_LOOKUP)


# q85 class: returns under OR-of-ANDs (demographic band × price band),
# per-status averages
_OR_BAND_RETURNS = f"""
SELECT l_linestatus,
       count(*) AS n,
       CAST(round(avg(CAST(l_quantity AS DECIMAL(25,6))), 4) AS DOUBLE)
         AS avg_qty,
       {_DSUM.format(x='l_extendedprice')} AS rev
FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND ((c_acctbal BETWEEN 0 AND 4000
        AND l_extendedprice BETWEEN 0 AND 30000)
    OR (c_acctbal BETWEEN 4000 AND 8000
        AND l_extendedprice BETWEEN 20000 AND 70000)
    OR (c_acctbal > 8000
        AND l_extendedprice > 50000))
GROUP BY l_linestatus
"""


@register("ds_or_band_returns", oracle=_OR_BAND_RETURNS, group="tpcds")
def ds_or_band_returns(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "orders", "customer"],
                _OR_BAND_RETURNS)


# q1/q81 class: customers whose returns exceed 1.2× their nation's
# average return total (correlated threshold on a derived aggregate)
_RETURNS_ABOVE_NATION_AVG = f"""
WITH per_cust AS (
  SELECT c_custkey, c_nationkey,
         sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS ret
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_nationkey)
SELECT CAST(a.c_custkey AS BIGINT) AS custkey, n_name,
       CAST(round(a.ret, 2) AS DOUBLE) AS returned
FROM per_cust a JOIN nation ON a.c_nationkey = n_nationkey
WHERE a.ret > (
  SELECT 1.2 * avg(b.ret) FROM per_cust b
  WHERE b.c_nationkey = a.c_nationkey)
"""


@register("ds_returns_above_nation_avg", oracle=_RETURNS_ABOVE_NATION_AVG,
          group="tpcds")
def ds_returns_above_nation_avg(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "orders", "customer", "nation"],
                _RETURNS_ABOVE_NATION_AVG)


# q21 class: suppliers whose late shipments dominate a boundary split
_LATE_SHIPMENT_SPLIT = """
WITH split AS (
  SELECT s_nationkey, l_suppkey,
         count(CASE WHEN CAST(l_shipdate AS DATE)
                         <= CAST(o_orderdate AS DATE) + INTERVAL 45 DAY
                    THEN 1 END) AS on_time,
         count(CASE WHEN CAST(l_shipdate AS DATE)
                         > CAST(o_orderdate AS DATE) + INTERVAL 45 DAY
                    THEN 1 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY s_nationkey, l_suppkey)
SELECT n_name, count(*) AS n_suppliers,
       CAST(sum(late) AS BIGINT) AS total_late,
       CAST(sum(on_time) AS BIGINT) AS total_on_time
FROM split JOIN nation ON s_nationkey = n_nationkey
WHERE late > on_time
GROUP BY n_name
"""


@register("ds_late_shipment_split", oracle=_LATE_SHIPMENT_SPLIT,
          group="tpcds")
def ds_late_shipment_split(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "orders", "supplier", "nation"],
                _LATE_SHIPMENT_SPLIT)


# first/last-value window class: period endpoints ratio per series
_FIRST_LAST_WINDOW = f"""
WITH monthly AS (
  SELECT n_name,
         CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS m,
         {_DSUM.format(x='o_totalprice')} AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  WHERE year(CAST(o_orderdate AS DATE)) = 2000
  GROUP BY n_name, month(CAST(o_orderdate AS DATE))),
endpoints AS (
  SELECT n_name, m, rev,
         first_value(rev) OVER (PARTITION BY n_name ORDER BY m ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS first_rev,
         last_value(rev) OVER (PARTITION BY n_name ORDER BY m ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS last_rev
  FROM monthly)
SELECT DISTINCT n_name, first_rev, last_rev,
       round(last_rev / first_rev, 6) AS drift
FROM endpoints
"""


@register("ds_first_last_window", oracle=_FIRST_LAST_WINDOW, group="tpcds")
def ds_first_last_window(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer", "nation"],
                _FIRST_LAST_WINDOW)


# q53/q63 class: quarterly aggregates compared to the yearly average of
# the same series (manufacturer/brand grain)
_QUARTER_VS_YEAR_AVG = f"""
WITH quarterly AS (
  SELECT p_brand,
         CAST(quarter(CAST(l_shipdate AS DATE)) AS INT) AS q,
         {_DSUM.format(x='l_extendedprice')} AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(CAST(l_shipdate AS DATE)) = 1999
    AND p_type LIKE '%PROMO%'
  GROUP BY p_brand, quarter(CAST(l_shipdate AS DATE))),
with_avg AS (
  SELECT p_brand, q, rev,
         avg(rev) OVER (PARTITION BY p_brand) AS yr_avg
  FROM quarterly)
SELECT p_brand, q, rev, round(rev / yr_avg, 4) AS ratio
FROM with_avg
WHERE rev / yr_avg NOT BETWEEN 0.7 AND 1.3
"""


@register("ds_quarter_vs_year_avg", oracle=_QUARTER_VS_YEAR_AVG,
          group="tpcds")
def ds_quarter_vs_year_avg(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "part"], _QUARTER_VS_YEAR_AVG)


# q99/q62 2-dim class: delay buckets × priority matrix with shares
_DELAY_PRIORITY_MATRIX = """
WITH base AS (
  SELECT o_orderpriority AS prio,
         CASE WHEN CAST(l_shipdate AS DATE)
                   <= CAST(o_orderdate AS DATE) + INTERVAL 30 DAY THEN 'd30'
              WHEN CAST(l_shipdate AS DATE)
                   <= CAST(o_orderdate AS DATE) + INTERVAL 60 DAY THEN 'd60'
              WHEN CAST(l_shipdate AS DATE)
                   <= CAST(o_orderdate AS DATE) + INTERVAL 90 DAY THEN 'd90'
              ELSE 'd120p' END AS bucket
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT prio, bucket, count(*) AS n
FROM base GROUP BY prio, bucket
"""


@register("ds_delay_priority_matrix", oracle=_DELAY_PRIORITY_MATRIX,
          group="tpcds")
def ds_delay_priority_matrix(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "orders"],
                _DELAY_PRIORITY_MATRIX)


# grouping-sets report with explicit grouping() flags in the output
# (q27/q36 reporting idiom: lochierarchy encoded per row)
_GROUPING_FLAGS_REPORT = f"""
SELECT r_name, o_orderstatus,
       CAST(grouping(r_name) * 2 + grouping(o_orderstatus) AS INT)
         AS grouping_code,
       count(*) AS n,
       {_DSUM.format(x='o_totalprice')} AS rev
FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, o_orderstatus), (r_name), ())
"""


@register("ds_grouping_flags_report", oracle=_GROUPING_FLAGS_REPORT,
          group="tpcds")
def ds_grouping_flags_report(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer", "nation", "region"],
                _GROUPING_FLAGS_REPORT)


# q34/q73 companion: bucketed order sizes joined BACK to customer detail
# rows (the reference returns customer names for bucket hits)
_BUCKET_CUSTOMER_DETAIL = """
WITH big_orders AS (
  SELECT l_orderkey, count(*) AS items
  FROM lineitem GROUP BY l_orderkey
  HAVING count(*) >= 6)
SELECT c_mktsegment, count(*) AS n_big_orders,
       count(DISTINCT o_custkey) AS n_customers
FROM orders JOIN big_orders ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("ds_bucket_customer_detail", oracle=_BUCKET_CUSTOMER_DETAIL,
          group="tpcds")
def ds_bucket_customer_detail(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "orders", "customer"],
                _BUCKET_CUSTOMER_DETAIL)
