"""Round-20 optimization pins: the fixed-point exact-sum fast path.

``dsum``/``dsum_dec`` (and the ds-family SQL twin ``fast_decimal_sums``)
replaced per-row ``CAST(x AS DECIMAL(25,6))`` accumulation with two LONG
sums + one per-group decimal reconstruction. These tests pin the load-
bearing claim: on ≤6dp-exact double measures the fast path is VALUE-
IDENTICAL to the canonical decimal spelling — including negatives, NULLs,
empty groups, carry at the whole/frac boundary, and large-magnitude sums.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_delta_spark.queries import dsum, dsum_dec, fast_decimal_sums


def _decimal_ref(c, ndp=2):
    col = F.col(c) if isinstance(c, str) else c
    return F.round(F.sum(col.cast("decimal(25,6)")), ndp).cast("double")


def test_dsum_matches_decimal_path_edge_values(spark):
    # exact ≤6dp values chosen to poke the rounding seams: negatives,
    # frac ≈ 1.0 carries (6.999999 → whole 6 + frac 1e6), zero, values
    # whose double repr sits just below the decimal (0.1, 2.675), and a
    # magnitude big enough that the naive single-long accumulator's
    # per-row term is ~1e11
    vals = [0.0, 0.1, -0.1, 2.675, -2.675, 6.999999, -6.999999,
            99999.99, -99999.99, 0.000001, -0.000001, 123.456789,
            None, 1.5, -1.5, 0.005, -0.005, 7.0, 54321.123456]
    df = spark.createDataFrame(
        [(i % 3, v) for i, v in enumerate(vals)], "g int, x double")
    got = df.groupBy("g").agg(
        dsum("x").alias("s2"),
        F.round(dsum_dec("x"), 6).cast("double").alias("s6"),
    ).orderBy("g").collect()
    want = df.groupBy("g").agg(
        _decimal_ref("x").alias("s2"),
        F.round(F.sum(F.col("x").cast("decimal(25,6)")), 6)
        .cast("double").alias("s6"),
    ).orderBy("g").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_dsum_empty_and_all_null_groups(spark):
    df = spark.createDataFrame(
        [(0, None), (1, 2.5)], "g int, x double")
    got = df.groupBy("g").agg(dsum("x").alias("s")).orderBy("g").collect()
    want = df.groupBy("g").agg(_decimal_ref("x").alias("s")) \
             .orderBy("g").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got[0]["s"] is None  # all-NULL group stays NULL, not 0


def test_dsum_matches_on_lineitem_products(spark):
    # the real workload shape: sums of 2dp measures and their 4dp/6dp
    # products over a few thousand rows
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = rev * (1 + F.col("l_tax"))
    got = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("a"), dsum(rev).alias("b"),
        dsum(charge).alias("c")).orderBy("l_returnflag").collect()
    want = li.groupBy("l_returnflag").agg(
        _decimal_ref("l_quantity").alias("a"), _decimal_ref(rev).alias("b"),
        _decimal_ref(charge).alias("c")).orderBy("l_returnflag").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_fast_decimal_sums_sql_twin_matches(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.createOrReplaceTempView("fs_li")
    sql = ("SELECT l_returnflag,"
           " CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)"
           " AS DECIMAL(25,6))), 2) AS DOUBLE) AS s,"
           " round(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)"
           " / count(*), 4) AS a"
           " FROM fs_li GROUP BY l_returnflag ORDER BY l_returnflag")
    fast = fast_decimal_sums(sql)
    assert fast != sql and "BIGINT" in fast  # the rewrite fired
    assert spark.sql(fast).collect() == spark.sql(sql).collect()


def test_fast_decimal_sums_leaves_non_idiom_alone():
    keep = "sum(CAST(a AS DECIMAL(25,6)) * CAST(b AS DECIMAL(25,6)))"
    assert fast_decimal_sums(keep) == keep
    keep2 = "CAST(sum(CAST(CAST(x AS DECIMAL(12,2)) * CAST(x AS " \
            "DECIMAL(12,2)) AS DECIMAL(38,4))) AS DOUBLE)"
    assert fast_decimal_sums(keep2) == keep2


def test_dsum_precondition_divergence_documented(spark):
    """The dsum/dsum_dec ≡ sum(CAST(x AS DECIMAL(25,6))) identity is a
    DATA CONTRACT, not an algebraic identity: it holds for measures that
    are exact ≤6dp decimal values (|x| < 2^52 so the whole/frac split is
    exact). This test pins a concrete input OUTSIDE the contract where
    the two paths genuinely diverge — so a future caller summing
    arbitrary-precision doubles can't silently assume the fast path
    still computes the declared decimal spelling (round-20 verdict #5).

    0.0001245 is a 7dp value: the decimal cast HALF_UPs its shortest
    repr to 0.000125, while the fast path's double product
    x·1e6 = 124.49999999999999 truncates the not-quite-half to 0.000124.
    """
    df = spark.createDataFrame([(0.0001245,)], "x double")
    dec = df.agg(
        F.round(F.sum(F.col("x").cast("decimal(25,6)")), 6)
        .cast("double").alias("s")).collect()[0]["s"]
    fast = df.agg(
        F.round(dsum_dec("x"), 6).cast("double").alias("s")).collect()[0]["s"]
    assert dec == 0.000125
    assert fast == 0.000124
    assert dec != fast  # the divergence the precondition exists to exclude
