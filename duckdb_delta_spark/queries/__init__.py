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


def dsum_dec(col):
    """Exact decimal sum of a ≤6dp double measure — fixed-point fast path.

    **PRECONDITION (required, not advisory):** every non-NULL value of
    ``col`` must be an exact ≤6-decimal-place value with |x| < 2^52, and
    the expression must be deterministic (it is inlined several times in
    the SQL twin). Outside that contract the result can differ from the
    declared ``sum(CAST(x AS DECIMAL(25,6)))`` semantics by 1e-6 per row
    — ``tests/test_fast_sums.py::test_dsum_precondition_divergence_documented``
    pins a concrete diverging input (0.0001245, a 7dp value). Do NOT
    reuse this helper for averages, quotients, or arbitrary doubles.

    Value-identical to ``sum(CAST(x AS DECIMAL(25,6)))`` but ~3.7× faster
    (measured: the q01 4-sum shape 1.70 s → 0.45 s at sf0.1): the per-row
    ``double → DECIMAL`` cast goes through ``BigDecimal.valueOf`` (a
    ``Double.toString`` + object per row per aggregate); here each row
    contributes two LONG terms instead — ``whole = trunc(x)`` and
    ``frac = round_half_away((x - whole) · 1e6)`` — and the group's exact
    DECIMAL value is reconstructed once per group as
    ``sum(whole) + sum(frac) · 1e-6``.

    Exactness: the suite's measures are exact ≤6-decimal values (see DEC
    above), so x·1e6 sits within ~2e-5 of an integer and the ±0.5-trunc
    rounding recovers exactly the integer that ``CAST(x AS DECIMAL(25,6))``
    (HALF_UP on the shortest double repr) produces; ``x - trunc(x)`` is an
    exact double subtraction for |x| < 2^52. Verified bit-identical against
    the decimal path AND the DuckDB oracle over the full registry (sf0.001,
    sf0.01) + sf0.1 — see OPTIMIZATION_r20.md.

    Scale: two LONG accumulators per group overflow only past ~9e12
    rows·group⁻¹ (whole ≤ 1e5/row, frac ≤ 1e6/row vs LONG's 9.2e18) —
    unlike a single 1e6-scaled accumulator, which would overflow at ~8e7
    max-magnitude rows per group (TPC-H sf100 q01 territory).
    """
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    x = c.cast("double")
    whole = x.cast("long")
    frac = (x - whole.cast("double")) * F.lit(1000000.0)
    frac_l = (frac + F.signum(frac) * F.lit(0.5)).cast("long")
    return (
        F.sum(whole).cast("decimal(25,0)")
        + F.sum(frac_l).cast("decimal(25,0)")
        * F.lit("0.000001").cast("decimal(7,6)")
    )


def dsum(col, ndp: int = 2):
    """Exact decimal sum of a double measure, rounded and cast to double."""
    from pyspark.sql import functions as F

    return F.round(dsum_dec(col), ndp).cast("double")


def osum(expr: str, ndp: int = 2) -> str:
    """Oracle-side twin of :func:`dsum` (ANSI SQL, valid in DuckDB and Spark)."""
    return f"CAST(round(sum(CAST({expr} AS {DEC})), {ndp}) AS DOUBLE)"


#: SQL spelling of dsum_dec's fixed-point fast path; {x} is the measure
#: expression (inserted pre-parenthesized). Literals are CAST(... AS
#: DOUBLE) because bare SQL decimals (0.5) would type as DECIMAL and
#: change the arithmetic domain.
_FAST_SUM_SQL = (
    "(CAST(sum(CAST({x} AS BIGINT)) AS DECIMAL(25,0))"
    " + CAST(sum(CAST(({x} - CAST(CAST({x} AS BIGINT) AS DOUBLE))"
    " * CAST(1000000 AS DOUBLE)"
    " + sign(({x} - CAST(CAST({x} AS BIGINT) AS DOUBLE)))"
    " * CAST(0.5 AS DOUBLE) AS BIGINT)) AS DECIMAL(25,0))"
    " * CAST(0.000001 AS DECIMAL(7,6)))"
)

_DEC_SUM_HEAD = "sum(CAST("
_DEC_SUM_TAIL = f" AS {DEC})"


def fast_decimal_sums(text: str) -> str:
    """Rewrite every ``sum(CAST(<x> AS DECIMAL(25,6)))`` in a SPARK-side
    SQL string into :data:`_FAST_SUM_SQL` (the dsum_dec fixed-point form,
    value-identical on the suite's ≤6dp-exact measures, ~3.7× faster —
    see dsum_dec's docstring for the proof sketch and overflow bound).

    The ORACLE string is never transformed — DuckDB keeps the canonical
    decimal spelling, which is exactly what makes this rewrite safe to
    verify: the driver hash-compares the two engines' results.

    Conservative by construction: only the exact generated idiom (the
    ``_DSUM`` macro shape, where the CAST closes the sum immediately)
    rewrites; anything else — e.g. ``sum(CAST(a AS DECIMAL(25,6)) *
    CAST(b AS DECIMAL(25,6)))`` — is left on the decimal path.
    """
    out = []
    i = 0
    n = len(text)
    while True:
        j = text.find(_DEC_SUM_HEAD, i)
        if j < 0:
            out.append(text[i:])
            break
        # scan the CAST's balanced argument
        k = j + len(_DEC_SUM_HEAD)
        depth = 1  # inside CAST(
        while k < n and depth:
            if text[k] == "(":
                depth += 1
            elif text[k] == ")":
                depth -= 1
            k += 1
        # text[j+len:k-1] is the CAST body; k-1 is CAST's ')'
        body = text[j + len(_DEC_SUM_HEAD):k - 1]
        if depth or not body.endswith(_DEC_SUM_TAIL[:-1]) \
                or k >= n or text[k] != ")":
            # fail-closed, but VISIBLY (round-20 advice): a sum(CAST(
            # prefix that doesn't match the exact _DSUM idiom keeps the
            # canonical decimal path — correct, but silently losing the
            # optimization would be invisible, so log the near-match
            import logging

            logging.getLogger(__name__).debug(
                "fast_decimal_sums: left non-idiom sum on the decimal "
                "path: %r", text[j:min(k + 1, j + 120)])
            out.append(text[i:j + len(_DEC_SUM_HEAD)])
            i = j + len(_DEC_SUM_HEAD)
            continue
        x = "(" + body[: -len(_DEC_SUM_TAIL) + 1].strip() + ")"
        out.append(text[i:j])
        out.append(_FAST_SUM_SQL.format(x=x))
        i = k + 1  # past sum's ')'
    return "".join(out)


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
    """Temp views for SQL-expressed queries (same names the oracle sees).

    Memoized per (session, sf_dir, table): the ~120 SQL-expressed queries
    each re-registered their views — pure py4j/analysis overhead on a view
    that is a deterministic function of the immutable parquet input. A
    different sf_dir on the same session re-registers (the key changes),
    so correctness never depends on the memo.
    """
    seen = getattr(spark, "_graft_views", None)
    if seen is None:
        seen = spark._graft_views = set()
    for n in names:
        # The memo is deliberately BLIND in the hot path: a runtime
        # existence guard was measured at 2.7 ms/table
        # (catalog.tableExists) — ~24 ms per SQL query, several suite
        # seconds, to defend a staleness vector that can only originate
        # inside this repo (dropTempView / shadowing one of the TABLES
        # names). That invariant is enforced statically instead:
        # tests/test_view_memo_invariant.py fails if any package code
        # touches the TABLES view names outside this function. A second
        # Python wrapper over the same JVM session is already safe — it
        # carries a fresh memo and simply re-registers.
        if (sf_dir, n) in seen:
            continue
        load(spark, sf_dir, n).createOrReplaceTempView(n)
        # a later sf_dir wins the view name: drop stale keys for n
        seen.difference_update({k for k in seen if k[1] == n})
        seen.add((sf_dir, n))


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
