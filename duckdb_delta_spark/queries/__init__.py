"""Query registry: every declared capability = (Spark impl, DuckDB oracle).

The reference proves capability with dual-scan equivalence tests
(delta_scan vs parquet_scan, reference: test/sql/dat/all.test:14-27) and
result-checked TPC-H/TPC-DS benchmarks. Here every entry pairs a PySpark
DataFrame implementation with an ANSI-SQL oracle string the driver runs in
DuckDB over the same parquet — the t2 correctness gate.

Conventions (driver hash-compares after sorting columns by name):
* every computed column aliased identically in Spark and SQL;
* integer outputs cast to BIGINT on both sides;
* double aggregates rounded (2-6 dp) on both sides to absorb ulp-level
  summation-order differences;
* no LIMIT without a total tie-break (set selection must be deterministic).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: sums of doubles are summation-order-sensitive (Spark partial aggs vs
#: duckdb sequential/segment-tree) — any round(sum(double)) can flip its
#: last digit between engines. All money/measure sums therefore accumulate
#: exactly in DECIMAL and only surface as DOUBLE at the end. The source
#: measures carry ≤6 decimal places (prices/discounts/taxes 2dp, products
#: of three 2dp values 6dp), so DECIMAL(25,6) is lossless.
DEC = "DECIMAL(25,6)"


def dsum(col, ndp: int = 2):
    """Exact decimal sum of a double measure, rounded and cast to double."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(25,6)")), ndp).cast("double")


def osum(expr: str, ndp: int = 2) -> str:
    """Oracle-side twin of :func:`dsum` (ANSI SQL, valid in DuckDB and Spark)."""
    return f"CAST(round(sum(CAST({expr} AS {DEC})), {ndp}) AS DOUBLE)"


@dataclass
class Q:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    group: str = ""


_REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: str | None = None, group: str = ""):
    def deco(fn):
        _REGISTRY[name] = Q(name, fn, oracle, group)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); Spark has no ns timestamp.
        # Runtime-settable, so also works on a session we didn't build.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ns epoch (via nanosAsLong) → µs timestamp, truncating like the
        # oracle's CAST(TIMESTAMP_NS AS TIMESTAMP)
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # newer testdata writes TIMESTAMP(MICROS) without tz → NTZ in
            # Spark; unix_micros/watermarks need TIMESTAMP. Session tz is
            # UTC, so the cast preserves wall-clock exactly (same values
            # the old ns→µs path produced)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Temp views for SQL-expressed queries (same names the oracle sees)."""
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(n)


def all_queries() -> dict[str, Q]:
    # import side-effect populates the registry
    from duckdb_delta_spark.queries import (  # noqa: F401
        analytics,
        delta_suite,
        pipeline,
        streaming_suite,
        tpcds_shapes,
        tpcds_shapes2,
        tpcds_shapes3,
        tpch,
    )

    return dict(_REGISTRY)


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Collected/literal rows -> DataFrame via the Arrow local-relation
    path (see duckdb_delta_spark.localrel: the createDataFrame(list)
    path costs ~4-6 s PER JOB on local[32]). Use for every
    collected-rows return in the query registry."""
    from duckdb_delta_spark.localrel import local_df as _ld

    return _ld(spark, rows, schema)
