"""TPC-DS-shaped long-tail queries, round-6 second widening (73 → ~99).

`tpcds_shapes.py` + `tpcds_shapes2.py` cover 73 composition classes of
the reference's declared ~99-query TPC-DS surface (reference:
benchmark/tpcds/sf1/local/delta/*.benchmark, benchmark.Makefile:43-58).
This module adds the families still unevidenced, one query per class:

* exact-decimal moment statistics / coefficient of variation (q17/q39);
* cross-joined banded distinct-count buckets (q28);
* cross-year repeat-purchase self-joins (q64) and year-pair max-ratio
  comparisons (q74), chained quarter-over-quarter growth (q31);
* before/after pivot-date splits per supplier/part (q21/q40);
* three-phase fact chains: buy → return → repurchase (q25/q29);
* net-of-returns order recomputation (q93) and kept/returned ratio
  with COALESCE'd missing sides (q78);
* substring-IN + EXISTS geography filters (q8/q15/q45), price-band ×
  supplier-exists listings (q37/q82), geographic-mismatch brand
  revenue (q19);
* UNION-ALL channel matrices with NULL dimensions (q76), two-measure
  shipping matrices (q66), year-over-year day-band ratios (q59);
* returned-revenue loss matrices (q91), triple OR-band buckets (q85),
  demographic profile splits with EXISTS/NOT EXISTS (q69);
* category-average price outliers via correlated scalars (q6),
  brand-by-month ranked revenue (q42/q52/q55), INTERSECT-3 distinct
  membership (q38).

Same conventions: one ANSI SQL text for BOTH Spark and the DuckDB
oracle; all double measures accumulate in DECIMAL(25,6) and surface as
rounded DOUBLE; every division is DOUBLE/DOUBLE; every ranked or
LIMIT'd set carries a total tie-break; NULLS ordering pinned. Moments
(variance-class stats) are computed from exact decimal sums cast to
DOUBLE at the very end so both engines run the identical IEEE
expression tree on identical inputs.
"""

from __future__ import annotations

from duckdb_delta_spark.queries import register
from duckdb_delta_spark.queries.tpcds_shapes import _DSUM, _sql

# exact decimal accumulation of a squared measure (values ≤ ~1e5 with
# ≤2dp: the square fits DECIMAL(24,4); summing at DECIMAL(38,4) is exact)
_DSUMSQ = (
    "CAST(sum(CAST(CAST({x} AS DECIMAL(12,2)) * CAST({x} AS DECIMAL(12,2))"
    " AS DECIMAL(38,4))) AS DOUBLE)"
)


# q17/q39 class: coefficient of variation from exact decimal moments —
# flag (nation, priority) cells whose order-value dispersion is high
_MOMENT_COV = f"""
WITH cells AS (
  SELECT n_name, o_orderpriority,
         count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS s,
         {_DSUMSQ.format(x='o_totalprice')} AS ss
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, o_orderpriority
  HAVING count(*) >= 20)
SELECT n_name, o_orderpriority, CAST(n AS BIGINT) AS n,
       round(s / n, 2) AS mean_price,
       round((ss / n - (s / n) * (s / n)) / ((s / n) * (s / n)), 4) AS cov2
FROM cells
WHERE (ss / n - (s / n) * (s / n)) / ((s / n) * (s / n)) > 0.35
"""


@register("ds_moment_cov", oracle=_MOMENT_COV, group="tpcds")
def ds_moment_cov(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer", "nation"], _MOMENT_COV)


# q28 class: six banded buckets of avg price + distinct counts, one row
# via CROSS JOIN of independent aggregate subqueries
_BANDED_BUCKETS = """
SELECT b1.avg_p AS b1_avg, b1.nd AS b1_nd,
       b2.avg_p AS b2_avg, b2.nd AS b2_nd,
       b3.avg_p AS b3_avg, b3.nd AS b3_nd,
       b4.avg_p AS b4_avg, b4.nd AS b4_nd
FROM
 (SELECT round(CAST(avg(l_extendedprice) AS DOUBLE), 2) AS avg_p,
         count(DISTINCT l_partkey) AS nd
  FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) b1,
 (SELECT round(CAST(avg(l_extendedprice) AS DOUBLE), 2) AS avg_p,
         count(DISTINCT l_partkey) AS nd
  FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) b2,
 (SELECT round(CAST(avg(l_extendedprice) AS DOUBLE), 2) AS avg_p,
         count(DISTINCT l_partkey) AS nd
  FROM lineitem WHERE l_quantity BETWEEN 21 AND 35) b3,
 (SELECT round(CAST(avg(l_extendedprice) AS DOUBLE), 2) AS avg_p,
         count(DISTINCT l_partkey) AS nd
  FROM lineitem WHERE l_quantity > 35) b4
"""


@register("ds_banded_buckets", oracle=_BANDED_BUCKETS, group="tpcds")
def ds_banded_buckets(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem"], _BANDED_BUCKETS)


# q64 class: repeat purchase of the SAME part by the same customer in
# consecutive years (two-period fact self-join through orders)
_REPEAT_PURCHASE = f"""
WITH cp AS (
  SELECT o_custkey AS ck, l_partkey AS pk,
         CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         {_DSUM.format(x='l_extendedprice')} AS rev
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_custkey, l_partkey, year(CAST(o_orderdate AS DATE)))
SELECT CAST(a.ck AS BIGINT) AS custkey, CAST(a.pk AS BIGINT) AS partkey,
       a.yr AS yr1, a.rev AS rev1, b.rev AS rev2
FROM cp a JOIN cp b ON a.ck = b.ck AND a.pk = b.pk AND b.yr = a.yr + 1
WHERE a.rev > 5000 AND b.rev > a.rev
"""


@register("ds_repeat_purchase", oracle=_REPEAT_PURCHASE, group="tpcds")
def ds_repeat_purchase(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem"], _REPEAT_PURCHASE)


# q31 class: chained quarter-over-quarter growth comparison between two
# regions — region A must out-grow region B in BOTH transitions
_QOQ_GROWTH_RACE = f"""
WITH q AS (
  SELECT r_name,
         CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qt,
         {_DSUM.format(x='o_totalprice')} AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
  WHERE year(CAST(o_orderdate AS DATE)) = 1997
  GROUP BY r_name, quarter(CAST(o_orderdate AS DATE)))
SELECT a1.r_name AS winner, b1.r_name AS loser,
       round(CAST(a2.rev AS DOUBLE) / a1.rev, 4) AS w_g12,
       round(CAST(a3.rev AS DOUBLE) / a2.rev, 4) AS w_g23,
       round(CAST(b2.rev AS DOUBLE) / b1.rev, 4) AS l_g12,
       round(CAST(b3.rev AS DOUBLE) / b2.rev, 4) AS l_g23
FROM q a1 JOIN q a2 ON a1.r_name = a2.r_name AND a1.qt = 1 AND a2.qt = 2
          JOIN q a3 ON a1.r_name = a3.r_name AND a3.qt = 3,
     q b1 JOIN q b2 ON b1.r_name = b2.r_name AND b1.qt = 1 AND b2.qt = 2
          JOIN q b3 ON b1.r_name = b3.r_name AND b3.qt = 3
WHERE a1.r_name < b1.r_name
  AND CAST(a2.rev AS DOUBLE) / a1.rev > CAST(b2.rev AS DOUBLE) / b1.rev
  AND CAST(a3.rev AS DOUBLE) / a2.rev > CAST(b3.rev AS DOUBLE) / b2.rev
"""


@register("ds_qoq_growth_race", oracle=_QOQ_GROWTH_RACE, group="tpcds")
def ds_qoq_growth_race(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer", "nation", "region"],
                _QOQ_GROWTH_RACE)


# q21 class: per-supplier before/after split around a pivot ship date,
# keep suppliers whose after-volume is out of band vs before-volume
_PIVOT_DATE_SPLIT = f"""
WITH s AS (
  SELECT s_name,
         {_DSUM.format(x="CASE WHEN l_shipdate < TIMESTAMP '1998-07-01 00:00:00' THEN l_quantity END")} AS before_q,
         {_DSUM.format(x="CASE WHEN l_shipdate >= TIMESTAMP '1998-07-01 00:00:00' THEN l_quantity END")} AS after_q
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01 00:00:00'
                       AND TIMESTAMP '1998-12-31 00:00:00'
  GROUP BY s_name)
SELECT s_name, before_q, after_q,
       round(CAST(after_q AS DOUBLE) / before_q, 4) AS shift
FROM s
WHERE before_q > 0
  AND (CAST(after_q AS DOUBLE) / before_q > 1.5
       OR CAST(after_q AS DOUBLE) / before_q < 0.6667)
"""


@register("ds_pivot_date_split", oracle=_PIVOT_DATE_SPLIT, group="tpcds")
def ds_pivot_date_split(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "supplier"], _PIVOT_DATE_SPLIT)


# q25/q29 class: three-phase fact chain per part — sold, then returned,
# then repurchased in a later month; phase occurrences counted per part
_BUY_RETURN_REBUY = f"""
WITH sold AS (
  SELECT l_partkey AS pk,
         CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS m,
         l_returnflag
  FROM lineitem WHERE year(CAST(l_shipdate AS DATE)) = 1998)
SELECT CAST(p.pk AS BIGINT) AS partkey,
       count(*) AS n_chain,
       CAST(count(r.pk) AS BIGINT) AS n_returned,
       CAST(count(b.pk) AS BIGINT) AS n_rebought
FROM sold p
LEFT JOIN sold r ON r.pk = p.pk AND r.l_returnflag = 'R' AND r.m = p.m + 1
LEFT JOIN sold b ON b.pk = p.pk AND b.l_returnflag = 'N' AND b.m = p.m + 2
WHERE p.l_returnflag = 'N' AND p.m <= 4
GROUP BY p.pk
HAVING count(r.pk) > 0 AND count(b.pk) > 0
"""


@register("ds_buy_return_rebuy", oracle=_BUY_RETURN_REBUY, group="tpcds")
def ds_buy_return_rebuy(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem"], _BUY_RETURN_REBUY)


# q93 class: order value recomputed NET of returned lines, top customers
# by net spend (full tie-break on custkey)
_NET_OF_RETURNS = f"""
WITH net AS (
  SELECT o_custkey AS ck,
         {_DSUM.format(x="CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE l_extendedprice * (1 - l_discount) END")} AS net_rev,
         {_DSUM.format(x="CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS lost_rev
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_custkey)
SELECT CAST(ck AS BIGINT) AS custkey, net_rev, lost_rev FROM net
ORDER BY net_rev DESC, ck ASC
LIMIT 25
"""


@register("ds_net_of_returns", oracle=_NET_OF_RETURNS, group="tpcds")
def ds_net_of_returns(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem"], _NET_OF_RETURNS)


# q78 class: kept vs returned revenue ratio per (customer, year), the
# returned side COALESCE'd when absent (original uses FULL OUTER JOIN)
_KEPT_RETURNED_RATIO = f"""
WITH kept AS (
  SELECT o_custkey AS ck, CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         {_DSUM.format(x='l_extendedprice')} AS rev
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE l_returnflag <> 'R'
  GROUP BY o_custkey, year(CAST(o_orderdate AS DATE))),
ret AS (
  SELECT o_custkey AS ck, CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         {_DSUM.format(x='l_extendedprice')} AS rev
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey, year(CAST(o_orderdate AS DATE)))
SELECT CAST(k.ck AS BIGINT) AS custkey, k.yr AS yr,
       k.rev AS kept_rev, COALESCE(r.rev, 0.0) AS returned_rev,
       round(COALESCE(r.rev, 0.0) / k.rev, 4) AS return_share
FROM kept k LEFT JOIN ret r ON k.ck = r.ck AND k.yr = r.yr
WHERE k.rev > 400000
"""


@register("ds_kept_returned_ratio", oracle=_KEPT_RETURNED_RATIO, group="tpcds")
def ds_kept_returned_ratio(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem"], _KEPT_RETURNED_RATIO)


# q8 class: substring-prefix IN-list on geography + EXISTS solvency
_PREFIX_GEO_EXISTS = f"""
SELECT n_name, count(*) AS n, {_DSUM.format(x='o_totalprice')} AS rev
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
WHERE substring(n_name, 8, 1) IN ('1', '3', '7')
  AND EXISTS (SELECT 1 FROM customer c2
              WHERE c2.c_nationkey = customer.c_nationkey
                AND c2.c_acctbal > 9000)
GROUP BY n_name
"""


@register("ds_prefix_geo_exists", oracle=_PREFIX_GEO_EXISTS, group="tpcds")
def ds_prefix_geo_exists(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "customer", "nation"],
                _PREFIX_GEO_EXISTS)


# q15 class: OR of independent membership conditions on the customer
_OR_MEMBERSHIP = f"""
SELECT c_mktsegment, count(*) AS n,
       {_DSUM.format(x='c_acctbal')} AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 9500
   OR c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
   OR substring(n_name, 8, 2) = '12'
GROUP BY c_mktsegment
"""


@register("ds_or_membership", oracle=_OR_MEMBERSHIP, group="tpcds")
def ds_or_membership(spark, sf_dir):
    return _sql(spark, sf_dir, ["customer", "nation"], _OR_MEMBERSHIP)


# q16/q94 class: distinct-order count where ANOTHER line shares the
# order from a different supplier (EXISTS) and no line was returned
# (NOT EXISTS)
_MULTI_SUPPLIER_CLEAN = """
SELECT count(DISTINCT l1.l_orderkey) AS n_orders
FROM lineitem l1
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_returnflag = 'R')
"""


@register("ds_multi_supplier_clean", oracle=_MULTI_SUPPLIER_CLEAN,
          group="tpcds")
def ds_multi_supplier_clean(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem"], _MULTI_SUPPLIER_CLEAN)


# q76 class: UNION ALL of three "channels" with a NULL dimension column
# in two of them, counted per (channel, status, year)
_NULL_DIM_CHANNELS = f"""
WITH u AS (
  SELECT 'open' AS channel, o_orderpriority AS pri,
         CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr, o_totalprice AS v
  FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT 'finished' AS channel, CAST(NULL AS STRING) AS pri,
         CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr, o_totalprice AS v
  FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT 'pending' AS channel, CAST(NULL AS STRING) AS pri,
         CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr, o_totalprice AS v
  FROM orders WHERE o_orderstatus = 'P')
SELECT channel, pri, yr, count(*) AS n, {_DSUM.format(x='v')} AS rev
FROM u GROUP BY channel, pri, yr
"""


@register("ds_null_dim_channels", oracle=_NULL_DIM_CHANNELS, group="tpcds")
def ds_null_dim_channels(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _NULL_DIM_CHANNELS)


# q66 class: two measure families (quantity and discounted revenue) per
# (supplier-nation, month) assembled from a UNION of measure CTEs
_TWO_MEASURE_MATRIX = f"""
WITH m AS (
  SELECT n_name, CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS m,
         'qty' AS measure, {_DSUM.format(x='l_quantity')} AS val
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
  WHERE year(CAST(l_shipdate AS DATE)) = 1999
  GROUP BY n_name, month(CAST(l_shipdate AS DATE))
  UNION ALL
  SELECT n_name, CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS m,
         'rev' AS measure,
         {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS val
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
  WHERE year(CAST(l_shipdate AS DATE)) = 1999
  GROUP BY n_name, month(CAST(l_shipdate AS DATE)))
SELECT n_name, m, measure, val FROM m WHERE m <= 6
"""


@register("ds_two_measure_matrix", oracle=_TWO_MEASURE_MATRIX, group="tpcds")
def ds_two_measure_matrix(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "supplier", "nation"],
                _TWO_MEASURE_MATRIX)


# q59 class: same day-band revenue compared across consecutive years
# (day-of-month bands stand in for day-of-week: the engines disagree on
# dow numbering, and the composition under test is the self-join ratio)
_DAYBAND_YOY = f"""
WITH bands AS (
  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         CAST(floor((day(CAST(o_orderdate AS DATE)) - 1) / 7.0) AS INT) AS band,
         {_DSUM.format(x='o_totalprice')} AS rev
  FROM orders
  GROUP BY year(CAST(o_orderdate AS DATE)),
           CAST(floor((day(CAST(o_orderdate AS DATE)) - 1) / 7.0) AS INT))
SELECT a.yr AS yr, a.band AS band, a.rev AS rev_this, b.rev AS rev_next,
       round(CAST(b.rev AS DOUBLE) / a.rev, 4) AS yoy
FROM bands a JOIN bands b ON a.band = b.band AND b.yr = a.yr + 1
WHERE a.yr IN (1996, 1997)
"""


@register("ds_dayband_yoy", oracle=_DAYBAND_YOY, group="tpcds")
def ds_dayband_yoy(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _DAYBAND_YOY)


# q91 class: returned-revenue loss matrix by segment × priority
_RETURN_LOSS_MATRIX = f"""
SELECT c_mktsegment, o_orderpriority,
       count(*) AS n_lines,
       {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS lost_rev
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_mktsegment, o_orderpriority
"""


@register("ds_return_loss_matrix", oracle=_RETURN_LOSS_MATRIX, group="tpcds")
def ds_return_loss_matrix(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem", "customer"],
                _RETURN_LOSS_MATRIX)


# q85 class: triple OR-band across two dimensions (quantity band ×
# discount band, each pair tied to a priority), avg'd per reason bucket
_TRIPLE_OR_BANDS = """
SELECT l_returnflag,
       count(*) AS n,
       round(CAST(avg(l_quantity) AS DOUBLE), 4) AS avg_qty,
       round(CAST(avg(l_discount) AS DOUBLE), 6) AS avg_disc
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE (o_orderpriority = '1-URGENT'
       AND l_quantity BETWEEN 1 AND 15 AND l_discount BETWEEN 0.00 AND 0.04)
   OR (o_orderpriority = '3-MEDIUM'
       AND l_quantity BETWEEN 16 AND 35 AND l_discount BETWEEN 0.03 AND 0.07)
   OR (o_orderpriority = '5-LOW'
       AND l_quantity BETWEEN 36 AND 50 AND l_discount BETWEEN 0.06 AND 0.10)
GROUP BY l_returnflag
"""


@register("ds_triple_or_bands", oracle=_TRIPLE_OR_BANDS, group="tpcds")
def ds_triple_or_bands(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem"], _TRIPLE_OR_BANDS)


# q69 class: demographic profile of customers active in one channel but
# NOT the other — EXISTS orders in a window, NOT EXISTS events ever
_PROFILE_EXISTS_SPLIT = """
SELECT c_mktsegment, count(*) AS n,
       CAST(min(c_custkey) AS BIGINT) AS min_ck,
       CAST(max(c_custkey) AS BIGINT) AS max_ck
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND year(CAST(o_orderdate AS DATE)) = 1998)
  AND NOT EXISTS (SELECT 1 FROM events
                  WHERE user_id = c_custkey AND event_type = 'purchase')
GROUP BY c_mktsegment
"""


@register("ds_profile_exists_split", oracle=_PROFILE_EXISTS_SPLIT,
          group="tpcds")
def ds_profile_exists_split(spark, sf_dir):
    return _sql(spark, sf_dir, ["customer", "orders", "events"],
                _PROFILE_EXISTS_SPLIT)


# q6 class: line items priced above 1.2× their part-type average — the
# category average via a correlated scalar subquery
_ABOVE_CATEGORY_AVG = f"""
SELECT p_type, count(*) AS n,
       {_DSUM.format(x='l_extendedprice')} AS rev
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_extendedprice > 1.2 * (
        SELECT CAST(avg(l2.l_extendedprice) AS DOUBLE)
        FROM lineitem l2 JOIN part p2 ON l2.l_partkey = p2.p_partkey
        WHERE p2.p_type = part.p_type)
GROUP BY p_type
"""


@register("ds_above_category_avg", oracle=_ABOVE_CATEGORY_AVG, group="tpcds")
def ds_above_category_avg(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "part"], _ABOVE_CATEGORY_AVG)


# q42/q52/q55 class: brand revenue for one month, dense-ranked with a
# full tie-break
_BRAND_MONTH_RANK = f"""
WITH rev AS (
  SELECT p_brand, {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS r
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(CAST(l_shipdate AS DATE)) = 1998
    AND month(CAST(l_shipdate AS DATE)) = 3
  GROUP BY p_brand)
SELECT p_brand, r AS brand_rev,
       CAST(dense_rank() OVER (ORDER BY r DESC, p_brand ASC) AS BIGINT) AS rk
FROM rev
"""


@register("ds_brand_month_rank", oracle=_BRAND_MONTH_RANK, group="tpcds")
def ds_brand_month_rank(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "part"], _BRAND_MONTH_RANK)


# q38 class: INTERSECT-3 distinct membership — customers ordering in
# each of three consecutive years
_INTERSECT3_MEMBERS = """
SELECT count(*) AS n_loyal FROM (
  SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1998) t
"""


@register("ds_intersect3_members", oracle=_INTERSECT3_MEMBERS, group="tpcds")
def ds_intersect3_members(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders"], _INTERSECT3_MEMBERS)


# q37/q82 class: parts in a price band with an above-median supplier
# and recent-demand EXISTS, distinct listing with tie-broken LIMIT
_PRICEBAND_SUPPLIER_LIST = """
SELECT DISTINCT CAST(p_partkey AS BIGINT) AS partkey, p_name,
       round(CAST(p_retailprice AS DOUBLE), 2) AS price
FROM part JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON l_suppkey = s_suppkey
WHERE p_retailprice BETWEEN 940 AND 960
  AND s_acctbal > 0
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_partkey = p_partkey
                AND l2.l_shipdate >= TIMESTAMP '2000-01-01 00:00:00')
ORDER BY price ASC, partkey ASC
LIMIT 40
"""


@register("ds_priceband_supplier_list", oracle=_PRICEBAND_SUPPLIER_LIST,
          group="tpcds")
def ds_priceband_supplier_list(spark, sf_dir):
    return _sql(spark, sf_dir, ["part", "lineitem", "supplier"],
                _PRICEBAND_SUPPLIER_LIST)


# q19 class: brand revenue restricted to geographically MISMATCHED
# buyer/supplier pairs (customer nation <> supplier nation)
_GEO_MISMATCH_BRANDS = f"""
SELECT p_brand, count(*) AS n,
       {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS rev
FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_nationkey <> s_nationkey
  AND l_quantity >= 30
GROUP BY p_brand
"""


@register("ds_geo_mismatch_brands", oracle=_GEO_MISMATCH_BRANDS,
          group="tpcds")
def ds_geo_mismatch_brands(spark, sf_dir):
    return _sql(spark, sf_dir,
                ["lineitem", "part", "supplier", "orders", "customer"],
                _GEO_MISMATCH_BRANDS)


# q74 class: year-pair spend ratio compared across two measure families
# (order totals vs line revenue) — keep customers whose order-total
# growth beats their line-revenue growth
_DUAL_MEASURE_GROWTH = f"""
WITH o AS (
  SELECT o_custkey AS ck, CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         {_DSUM.format(x='o_totalprice')} AS v
  FROM orders GROUP BY o_custkey, year(CAST(o_orderdate AS DATE))),
l AS (
  SELECT o_custkey AS ck, CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         {_DSUM.format(x='l_extendedprice')} AS v
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_custkey, year(CAST(o_orderdate AS DATE)))
SELECT CAST(o1.ck AS BIGINT) AS custkey,
       round(CAST(o2.v AS DOUBLE) / o1.v, 4) AS order_growth,
       round(CAST(l2.v AS DOUBLE) / l1.v, 4) AS line_growth
FROM o o1 JOIN o o2 ON o1.ck = o2.ck AND o1.yr = 1997 AND o2.yr = 1998
     JOIN l l1 ON l1.ck = o1.ck AND l1.yr = 1997
     JOIN l l2 ON l2.ck = o1.ck AND l2.yr = 1998
WHERE o1.v > 0 AND l1.v > 0
  AND CAST(o2.v AS DOUBLE) / o1.v > CAST(l2.v AS DOUBLE) / l1.v
  AND CAST(o2.v AS DOUBLE) / o1.v > 1.2
"""


@register("ds_dual_measure_growth", oracle=_DUAL_MEASURE_GROWTH,
          group="tpcds")
def ds_dual_measure_growth(spark, sf_dir):
    return _sql(spark, sf_dir, ["orders", "lineitem"], _DUAL_MEASURE_GROWTH)


# q45 class: key-bucket IN-list OR membership-in-subquery (top spenders),
# aggregated per bucket
_BUCKET_OR_SUBQUERY = f"""
WITH top_spenders AS (
  SELECT o_custkey AS ck
  FROM orders GROUP BY o_custkey
  HAVING sum(CAST(o_totalprice AS DECIMAL(25,6))) > 2500000)
SELECT CAST(c_custkey % 10 AS BIGINT) AS bucket, count(*) AS n,
       {_DSUM.format(x='c_acctbal')} AS bal
FROM customer
WHERE c_custkey % 10 IN (1, 3, 5)
   OR c_custkey IN (SELECT ck FROM top_spenders)
GROUP BY c_custkey % 10
"""


@register("ds_bucket_or_subquery", oracle=_BUCKET_OR_SUBQUERY, group="tpcds")
def ds_bucket_or_subquery(spark, sf_dir):
    return _sql(spark, sf_dir, ["customer", "orders"], _BUCKET_OR_SUBQUERY)


# q40 class: per-part quantity shipped just before vs just after a
# price-change pivot date, with the window confined to ±60 days
_BEFORE_AFTER_WINDOW = f"""
SELECT p_brand,
       {_DSUM.format(x="CASE WHEN l_shipdate < TIMESTAMP '1999-06-01 00:00:00' THEN l_quantity END")} AS qty_before,
       {_DSUM.format(x="CASE WHEN l_shipdate >= TIMESTAMP '1999-06-01 00:00:00' THEN l_quantity END")} AS qty_after
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate BETWEEN TIMESTAMP '1999-04-02 00:00:00'
                     AND TIMESTAMP '1999-07-31 00:00:00'
GROUP BY p_brand
"""


@register("ds_before_after_window", oracle=_BEFORE_AFTER_WINDOW,
          group="tpcds")
def ds_before_after_window(spark, sf_dir):
    return _sql(spark, sf_dir, ["lineitem", "part"], _BEFORE_AFTER_WINDOW)


# q33/q56/q60 class: UNION of three channel CTEs restricted to one item
# set (brand prefix), revenue summed per item across channels
_ITEM_CHANNEL_UNION = f"""
WITH items AS (
  SELECT p_partkey AS pk, p_brand FROM part
  WHERE substring(p_brand, 1, 7) = 'Brand#1'),
ch1 AS (
  SELECT i.p_brand AS brand, {_DSUM.format(x='l_extendedprice')} AS rev
  FROM lineitem JOIN items i ON l_partkey = i.pk
  WHERE l_returnflag = 'N' GROUP BY i.p_brand),
ch2 AS (
  SELECT i.p_brand AS brand, {_DSUM.format(x='l_extendedprice')} AS rev
  FROM lineitem JOIN items i ON l_partkey = i.pk
  WHERE l_returnflag = 'A' GROUP BY i.p_brand),
ch3 AS (
  SELECT i.p_brand AS brand, {_DSUM.format(x='l_extendedprice')} AS rev
  FROM lineitem JOIN items i ON l_partkey = i.pk
  WHERE l_returnflag = 'R' GROUP BY i.p_brand)
SELECT brand, CAST(round(sum(CAST(rev AS DECIMAL(25,6))), 2) AS DOUBLE)
         AS total_rev,
       count(*) AS n_channels
FROM (SELECT * FROM ch1 UNION ALL SELECT * FROM ch2
      UNION ALL SELECT * FROM ch3) u
GROUP BY brand
"""


@register("ds_item_channel_union", oracle=_ITEM_CHANNEL_UNION, group="tpcds")
def ds_item_channel_union(spark, sf_dir):
    return _sql(spark, sf_dir, ["part", "lineitem"], _ITEM_CHANNEL_UNION)
