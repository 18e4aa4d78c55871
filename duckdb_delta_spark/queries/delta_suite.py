"""Delta-engine queries: our scan vs the DuckDB oracle on the raw parquet.

The dual-scan equivalence pattern of the reference's DAT suite
(reference: test/sql/dat/all.test:14-27 — delta_scan vs parquet_scan of the
expected data): each fixture is a Delta table whose content equals a
SQL-expressible subset of the raw testdata tables, so the oracle runs on the
plain views while the Spark side goes through the full Delta machinery
(log replay → checkpoint → skipping → DV mask → column mapping → scan).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from duckdb_delta_spark.delta.table import DeltaTable
from duckdb_delta_spark.queries import local_df, dsum, osum, register
from duckdb_delta_spark.testing import fixtures as FX


def _fx(spark, sf_dir, name) -> DeltaTable:
    root = FX.ensure_fixtures(spark, sf_dir)
    return DeltaTable(os.path.join(root, name))


# full scan through 3-commit log replay
@register(
    "delta_scan_agg",
    oracle="""
    SELECT l_returnflag, count(*) AS n, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM lineitem GROUP BY l_returnflag
    """,
    group="delta",
)
def delta_scan_agg(spark, sf_dir):
    df = _fx(spark, sf_dir, "lineitem_multi").to_df(spark)
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("total"),
    )


# stats-based file skipping (predicate on the commit-split key)
@register(
    "delta_stats_skip",
    oracle=f"""
    SELECT count(*) AS n, CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE) AS qty
    FROM lineitem WHERE l_orderkey < {FX.SPLITS[1]}
    """,
    group="delta",
)
def delta_stats_skip(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_multi")
    sb = t.scan(spark).filter("l_orderkey", "<", FX.SPLITS[1])
    df = sb.to_df()
    assert sb.skip_report()["files_scanned"] < sb.skip_report()["files_total"]
    return df.agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty")
    )


# OR-disjunction file skipping: a union of branch masks over the stats
# manifest — the middle commit's files (orderkeys between the two ranges)
# must prune, not fall back to scan-everything
@register(
    "delta_or_prune",
    oracle=f"""
    SELECT count(*) AS n, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM lineitem
    WHERE l_orderkey < {FX.SPLITS[1]} OR l_orderkey >= {FX.SPLITS[2]}
    """,
    group="delta",
)
def delta_or_prune(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_multi")
    sb = t.scan(spark).filter_or(
        [("l_orderkey", "<", FX.SPLITS[1])],
        [("l_orderkey", ">=", FX.SPLITS[2])],
    )
    df = sb.to_df()
    rep = sb.skip_report()
    assert rep["files_skipped_by_stats"] >= 4, rep
    return df.agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("total")
    )


# LIKE semantics through the scan path: prefix pattern → equality-range
# companions (startsWith rewrite) + exact row-level like; name sorts into
# the driver's alphabetical first-50 correctness window
@register(
    "delta_like_scan",
    oracle="""
    SELECT p_brand, count(*) AS n,
           CAST(round(sum(CAST(p_retailprice AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS price
    FROM part
    WHERE p_brand LIKE 'Brand#1%' AND p_brand NOT LIKE '%5'
    GROUP BY p_brand
    """,
    group="delta",
)
def delta_like_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "part_cm")
    df = t.to_df(spark,
                 where="p_brand LIKE 'Brand#1%' AND p_brand NOT LIKE '%5'")
    return df.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), dsum("p_retailprice").alias("price")
    )


# SQL-string pushdown: the WHERE clause parses into Pred/OrPred trees
# (predicates.py) and prunes at the manifest before Catalyst ever sees it
@register(
    "delta_where_sql",
    oracle=f"""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE) AS qty
    FROM lineitem
    WHERE (l_orderkey BETWEEN 100 AND 300 AND l_linenumber <= 3)
       OR l_orderkey >= {FX.SPLITS[2]}
    """,
    group="delta",
)
def delta_where_sql(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_multi")
    sb = t.scan(spark).filter_sql(
        f"(l_orderkey BETWEEN 100 AND 300 AND l_linenumber <= 3) "
        f"OR l_orderkey >= {FX.SPLITS[2]}"
    )
    df = sb.to_df()
    rep = sb.skip_report()
    assert rep["files_skipped_by_stats"] > 0, rep
    return df.agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty")
    )


# partition pruning + partition-value injection from the log
@register(
    "delta_partition_prune",
    oracle="""
    SELECT l_linestatus, count(*) AS n, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus
    """,
    group="delta",
)
def delta_partition_prune(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_part")
    sb = t.scan(spark).filter("l_returnflag", "=", "R")
    df = sb.to_df()
    assert sb.skip_report()["files_skipped_by_partition"] > 0
    return df.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("total"),
    )


# deletion vectors: masked rows must vanish from aggregates
@register(
    "delta_dv_scan",
    oracle=f"""
    SELECT l_returnflag, count(*) AS n, CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE) AS qty
    FROM lineitem WHERE l_linenumber <> {FX.DV_DELETE_LINENUMBER}
    GROUP BY l_returnflag
    """,
    group="delta",
)
def delta_dv_scan(spark, sf_dir):
    df = _fx(spark, sf_dir, "lineitem_dv").to_df(spark)
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty")
    )


# time travel: version 1 sees only the first append
@register(
    "delta_time_travel",
    oracle=f"""
    SELECT count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey < {FX.EVO_KEY_SPLIT}
    """,
    group="delta",
)
def delta_time_travel(spark, sf_dir):
    root = FX.ensure_fixtures(spark, sf_dir)
    t = DeltaTable(os.path.join(root, "orders_tt"), version=1)
    return t.to_df(spark).agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# checkpoint read path: scan resolves through N.checkpoint.parquet
@register(
    "delta_checkpoint_scan",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
    group="delta",
)
def delta_checkpoint_scan(spark, sf_dir):
    df = _fx(spark, sf_dir, "orders_ckpt").to_df(spark)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# schema evolution: files written pre-ADD-COLUMN yield typed NULLs
@register(
    "delta_schema_evolution",
    oracle=f"""
    SELECT CASE WHEN o_orderkey < {FX.EVO_KEY_SPLIT} THEN NULL
                ELSE o_orderstatus END AS o_orderstatus,
           count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
    group="delta",
)
def delta_schema_evolution(spark, sf_dir):
    df = _fx(spark, sf_dir, "orders_evo").to_df(spark)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# column mapping (name mode): logical names resolve physical columns
@register(
    "delta_column_mapping",
    oracle="""
    SELECT p_brand, count(*) AS n, CAST(round(sum(CAST(p_retailprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM part GROUP BY p_brand
    """,
    group="delta",
)
def delta_column_mapping(spark, sf_dir):
    df = _fx(spark, sf_dir, "part_cm").to_df(spark)
    return df.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), dsum("p_retailprice").alias("total")
    )


# metadata surface: delta_list_files analogue feeding an aggregate
@register(
    "delta_manifest_rows",
    oracle="SELECT count(*) AS total_rows FROM lineitem",
    group="delta",
)
def delta_manifest_rows(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_multi")
    m = t.file_manifest(spark)
    return m.agg(F.sum("cardinality").cast("long").alias("total_rows"))


# write path end-to-end: append inside the query, scan back through the log
@register(
    "delta_append_scan",
    oracle="""
    SELECT count(*) AS n, CAST(round(sum(CAST(s_acctbal AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM supplier
    """,
    group="delta",
)
def delta_append_scan(spark, sf_dir):
    """Creates a throwaway table, appends supplier in two commits, scans."""
    import shutil
    import uuid

    from duckdb_delta_spark.delta.writer import DeltaWriter

    from pyspark.sql import types as T

    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    path = os.path.join(FX.FIXTURE_ROOT, f"tmp_append_{uuid.uuid4().hex}")
    try:
        w = DeltaWriter.create(spark, path, sup.schema)
        # coalesce: supplier is small — 4 files/commit, not one per core
        w.append(sup.where(F.col("s_suppkey") % 2 == 0).coalesce(4))
        w.append(sup.where(F.col("s_suppkey") % 2 == 1).coalesce(4))
        rows = (
            DeltaTable(path)
            .to_df(spark)
            .agg(
                F.count(F.lit(1)).alias("n"),
                dsum("s_acctbal").alias("total"),
            )
            .collect()
        )
        schema = T.StructType(
            [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
        )
        return local_df(spark, rows, schema)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# variant column through the full Delta path (parse_json on write,
# variant_get on read); reference analogue: variant read support via the
# legacy struct encoding (delta_utils.cpp:707-716, variant/basic.test)
@register(
    "delta_variant_scan",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    group="delta",
)
def delta_variant_scan(spark, sf_dir):
    df = _fx(spark, sf_dir, "events_var").to_df(spark)
    k = F.variant_get("v", "$.k", "long")
    return df.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


# variant_get over NESTED paths (object member, array index, typed leaf)
# with a typed schema_of_variant_agg assertion — the pushdown-shaped read
# the reference gets from its legacy-variant decoding (delta_utils.cpp:
# 707-716); the oracle recomputes from the raw columns the fixture
# serialized into the variant, so no oracle-side variant support is needed
@register(
    "delta_variant_deep_get",
    oracle="""
    SELECT event_type AS t,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_val,
           CAST(max(user_id) AS BIGINT) AS max_u,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k
    FROM events GROUP BY event_type
    """,
    group="delta",
)
def delta_variant_deep_get(spark, sf_dir):
    df = _fx(spark, sf_dir, "events_var_deep").to_df(spark)
    # typed shape check: the variant really holds the nested object/array
    # structure, not a stringified blob
    shape = df.select(F.schema_of_variant_agg("v").alias("s")).first()["s"]
    for token in ("OBJECT", "meta", "ids", "ARRAY"):
        assert token in shape, (token, shape)
    return df.groupBy(
        F.variant_get("v", "$.meta.type", "string").alias("t")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.variant_get("v", "$.meta.val", "double")).alias("sum_val"),
        F.max(F.variant_get("v", "$.ids[0]", "long")).alias("max_u"),
        F.sum(F.variant_get("v", "$.k", "long")).alias("sum_k"),
    )


# SHREDDED variant read (Delta "Variant Shredding" table feature): the
# foreign fixture stores the same logical object under three per-file
# layouts (legacy two-field, object-shredded with field/object residuals,
# and a different shred schema with a typed-only field) — the scan must
# reassemble all of them identically. The oracle recomputes from the raw
# events columns the fixture serialized, incl. u's absence when
# user_id % 7 == 0, so no oracle-side variant support is needed.
@register(
    "delta_variant_shredded_scan",
    oracle="""
    SELECT event_type AS t,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(sum(CASE WHEN user_id % 7 <> 0 THEN user_id END)
                AS BIGINT) AS sum_u,
           CAST(count(CASE WHEN user_id % 7 <> 0 THEN 1 END)
                AS BIGINT) AS n_u
    FROM events GROUP BY event_type
    """,
    group="delta",
)
def delta_variant_shredded_scan(spark, sf_dir):
    df = _fx(spark, sf_dir, "events_var_shred").to_df(spark)
    u = F.variant_get("v", "$.u", "long")
    return df.groupBy(
        F.variant_get("v", "$.t", "string").alias("t")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.variant_get("v", "$.k", "long")).alias("sum_k"),
        F.sum(u).alias("sum_u"),
        F.count(u).alias("n_u"),
    )


# TPC-H ON DELTA (the reference's headline benchmark shape:
# benchmark/tpch/sf1/local/delta/q01.benchmark runs the TPC-H suite over
# delta_scan, not raw parquet): q01 and q06 through the full Delta read
# path on the 3-commit lineitem fixture — the oracle is the same SQL
# over the raw table, so any snapshot/DV/stats bug in the scan breaks it.
@register(
    "delta_tpch_q01",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))
                          * (1 - CAST(l_discount AS DECIMAL(25,6)))), 2) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    group="delta",
)
def delta_tpch_q01(spark, sf_dir):
    df = _fx(spark, sf_dir, "lineitem_multi").to_df(spark)
    # decimal-domain products of 2dp measures are exact 4dp values, so
    # dsum's fixed-point twin (queries.dsum_dec) reproduces the identical
    # group sums ~3.7x cheaper (no per-row BigDecimal)
    return (
        df.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "delta_tpch_q06",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))
                          * CAST(l_discount AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    group="delta",
)
def delta_tpch_q06(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_multi")
    sb = (
        t.scan(spark)
        .filter("l_shipdate", ">=", "1994-01-01")
        .filter("l_shipdate", "<", "1995-01-01")
    )
    df = sb.to_df().where(
        (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    # 2dp x 2dp = exact 4dp: dsum's fixed-point twin is value-identical
    return df.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


# Metadata-only count (DESCRIBE DETAIL numRecords): the stats-derived,
# DV-adjusted row count answers count(*) in O(#files) without touching a
# data file — the cardinality shortcut the reference exposes to DuckDB's
# planner (delta_multi_file_list.cpp Cardinality). Checked on a plain
# multi-commit table AND a DV-masked one.
@register(
    "delta_count_from_stats",
    oracle=f"""
    SELECT 'lineitem_multi' AS tbl, CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_dv', CAST(count(*) AS BIGINT)
    FROM lineitem WHERE l_linenumber <> {FX.DV_DELETE_LINENUMBER}
    ORDER BY tbl
    """,
    group="delta",
)
def delta_count_from_stats(spark, sf_dir):
    rows = [
        (name, int(_fx(spark, sf_dir, name).detail()["numRecords"]))
        for name in ("lineitem_dv", "lineitem_multi")
    ]
    return local_df(spark, rows, "tbl string, n long")


# variant_explode (Spark 4 lateral table function) over the deep-variant
# fixture: every event's top-level object explodes to (pos, key, value)
# rows — the schema-on-read iteration surface of the variant type. The
# oracle recomputes per-key counts + the numeric sum from the raw props.
@register(
    "delta_variant_explode",
    oracle="""
    SELECT 'ids' AS key, count(*) AS n, CAST(NULL AS BIGINT) AS sum_k
    FROM events
    UNION ALL
    SELECT 'k', count(*),
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'meta', count(*), CAST(NULL AS BIGINT) FROM events
    """,
    group="delta",
)
def delta_variant_explode(spark, sf_dir):
    t = _fx(spark, sf_dir, "events_var_deep").to_df(spark)
    t.createOrReplaceTempView("__vx_deep")
    return spark.sql(
        """
        SELECT key, count(*) AS n,
               CAST(sum(CASE WHEN key = 'k'
                        THEN cast(value AS long) END) AS BIGINT) AS sum_k
        FROM __vx_deep, LATERAL variant_explode(v)
        GROUP BY key
        """
    )


# CONVERT TO DELTA: a plain hive-partitioned parquet directory converted
# in place (one metadata commit referencing the existing files, footer
# stats, recovered partition values) must answer exactly like the source
# rows — and the scan must still prune (asserted via the skip report).
@register(
    "delta_convert_scan",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE)
               AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
    group="delta",
)
def delta_convert_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_converted")
    sb = t.scan(spark).filter(
        "o_orderpriority", "in", ["1-URGENT", "2-HIGH"])
    df = sb.to_df().groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total"),
    )
    rows = df.collect()
    rep = sb.skip_report()
    assert rep["files_skipped_by_partition"] >= 1, rep  # prune survived convert
    return local_df(spark, rows, df.schema)


# SHREDDED variant WRITE (this engine's own shredded files, delta/variant
# shred_variant_column): one commit shredded on {k: long, t: string} with
# field residuals for string-typed k rows, one legacy-layout commit — the
# reassembled read must equal the oracle recomputed from raw events
# columns. try_variant_get(long) nulls out the residual string ks exactly
# as the oracle's guarded CAST does.
@register(
    "delta_variant_shredded_write",
    oracle="""
    SELECT event_type AS t,
           count(*) AS n,
           CAST(sum(CASE WHEN event_id % 11 <> 0
                    THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                    END) AS BIGINT) AS sum_k,
           CAST(count(CASE WHEN event_id % 11 = 0 THEN 1 END)
                AS BIGINT) AS n_k_str,
           CAST(sum(CASE WHEN user_id % 7 <> 0 THEN user_id END)
                AS BIGINT) AS sum_u
    FROM events GROUP BY event_type
    """,
    group="delta",
)
def delta_variant_shredded_write(spark, sf_dir):
    df = _fx(spark, sf_dir, "events_var_shredwrite").to_df(spark)
    k_long = F.try_variant_get("v", "$.k", "long")
    return df.groupBy(
        F.variant_get("v", "$.t", "string").alias("t")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k_long).alias("sum_k"),
        F.count(F.when(k_long.isNull(), 1)).alias("n_k_str"),
        F.sum(F.try_variant_get("v", "$.u", "long")).alias("sum_u"),
    )


# domainMetadata reconciliation: latest non-removed entry per domain
# (reference: delta_domain_metadata.cpp:20-77)
@register(
    "delta_domain_metadata",
    oracle="""
    SELECT 'engine.pipeline' AS domain, '{"stage":"bronze"}' AS configuration
    """,
    group="delta",
)
def delta_domain_metadata(spark, sf_dir):
    t = _fx(spark, sf_dir, "events_var")
    return t.domain_metadata(spark)


# type widening: INT/FLOAT files upcast to the widened BIGINT/DOUBLE schema
# (reference: typeWidening reader feature; schema_evolution.test type cases)
@register(
    "delta_type_widening",
    oracle=f"""
    SELECT count(*) AS n,
           CAST(max(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS max_key,
           CAST(round(sum(CAST(CASE WHEN o_orderkey < {FX.EVO_KEY_SPLIT}
                         THEN CAST(CAST(o_totalprice AS REAL) AS DOUBLE)
                         ELSE o_totalprice END AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS total
    FROM orders
    """,
    group="delta",
)
def delta_type_widening(spark, sf_dir):
    df = _fx(spark, sf_dir, "orders_widen").to_df(spark)
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("o_orderkey").alias("max_key"),
        dsum("o_totalprice").alias("total"),
    )


# type widening, WRITE side: the engine itself widens a live table
# in-place (alter_column_type: metadata-only commit + typeWidening
# feature + delta.typeChanges) after narrow data was written, then
# appends wide — the self-written twin of the foreign-widened read above
@register(
    "delta_widen_inplace_scan",
    oracle=f"""
    SELECT count(*) AS n,
           CAST(max(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS max_key,
           CAST(round(sum(CAST(CASE WHEN o_orderkey < {FX.EVO_KEY_SPLIT}
                         THEN CAST(CAST(o_totalprice AS REAL) AS DOUBLE)
                         ELSE o_totalprice END AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS total
    FROM orders
    """,
    group="delta",
)
def delta_widen_inplace_scan(spark, sf_dir):
    import shutil
    import uuid

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.writer import DeltaWriter

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = os.path.join(FX.FIXTURE_ROOT, f"tmp_widen_{uuid.uuid4().hex}")
    narrow = T.StructType([
        T.StructField("o_orderkey", T.IntegerType()),
        T.StructField("o_totalprice", T.FloatType()),
    ])
    try:
        w = DeltaWriter.create(spark, path, narrow)
        w.append(
            o.where(F.col("o_orderkey") < FX.EVO_KEY_SPLIT)
            .select(F.col("o_orderkey").cast("int"),
                    F.col("o_totalprice").cast("float"))
            .coalesce(2)
        )
        w.alter_column_type("o_orderkey", "long")
        w.alter_column_type("o_totalprice", "double")
        w.append(
            o.where(F.col("o_orderkey") >= FX.EVO_KEY_SPLIT)
            .select("o_orderkey", "o_totalprice")
            .coalesce(2)
        )
        rows = (
            DeltaTable(path)
            .to_df(spark)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.max("o_orderkey").alias("max_key"),
                dsum("o_totalprice").alias("total"),
            )
            .collect()
        )
        schema = T.StructType([
            T.StructField("n", T.LongType()),
            T.StructField("max_key", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ])
        return local_df(spark, rows, schema)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# engine-written DELETE: DeltaWriter.delete masks l_linenumber >= 5 with
# deletion vectors (write-side DV path; the read side is delta_dv_scan)
@register(
    "delta_delete_scan",
    oracle="""
    SELECT l_linenumber, count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM lineitem WHERE l_linenumber < 5
    GROUP BY l_linenumber
    """,
    group="delta",
)
def delta_delete_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_del")
    return t.to_df(spark).groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("total"),
    )


# OPTIMIZE then VACUUM LITE (log-tombstone candidates, no directory
# walk — delta-spark 3.3): content stays exactly `orders`, proving the
# lite pass reaped only the compacted-away files; the fixture asserts
# the deleted set equals the log's observed tombstones AND every live
# file survived
@register(
    "delta_vacuum_lite_scan",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS total
    FROM orders GROUP BY o_orderstatus
    """,
    group="delta",
)
def delta_vacuum_lite_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_litevac")
    return t.to_df(spark).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total"),
    )


# partition-drop retention DELETE: every touched file fully covered →
# remove-only commit, NO deletion vector, table stays on the legacy
# (1,2) protocol (asserted in the fixture AND here) — the common
# retention-job shape at scale
@register(
    "delta_retention_delete_scan",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS total
    FROM orders WHERE o_orderpriority <> '5-LOW'
    GROUP BY o_orderpriority
    """,
    group="delta",
)
def delta_retention_delete_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_retention")
    assert t.snapshot.protocol == {
        "minReaderVersion": 1, "minWriterVersion": 2}
    assert not any(f.deletion_vector for f in t.snapshot.add_files())
    return t.to_df(spark).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total"),
    )


# OPTIMIZE bin-packing compaction (+ vacuum): 12 small files rewritten to
# one, content unchanged — beyond the reference (no DML there), core
# maintenance at scale
@register(
    "delta_compacted_scan",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE) AS qty
    FROM lineitem GROUP BY l_returnflag
    """,
    group="delta",
)
def delta_compacted_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_compacted")
    assert len(t.snapshot.add_files()) == 1  # 12 small files became one
    return t.to_df(spark).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("qty"),
    )


# snapshot-resolution micro: COUNT(*) over a 90-commit log, unpinned
# (re-resolves HEAD) — reference: benchmark/micro/snapshot_performance/
# delta_scan.benchmark:12-17
@register(
    "delta_snapshot_90commits",
    oracle="SELECT count(*) AS n FROM lineitem",
    group="delta",
)
def delta_snapshot_90commits(spark, sf_dir):
    root = FX.ensure_fixtures(spark, sf_dir)
    t = DeltaTable(os.path.join(root, "lineitem_90c"))
    return t.to_df(spark).agg(F.count(F.lit(1)).alias("n"))


# same count through a pinned catalog entry: snapshot resolved once and
# cached (reference: snapshot_pin.benchmark:12-21, PIN_SNAPSHOT)
_PIN_CATALOG = {}


# dynamic/runtime filter pushdown: the join build side re-scopes the fact
# file list (reference: DynamicFilterPushdown, delta_multi_file_list.cpp:
# 989-1021; logged as `dynamic` in custom_parameters.test:40-45)
@register(
    "delta_dynamic_prune",
    oracle=f"""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey < {FX.SPLITS[1]} AND o.o_orderpriority = '1-URGENT'
    """,
    group="delta",
)
def delta_dynamic_prune(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_multi")
    dim = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(
            (F.col("o_orderkey") < FX.SPLITS[1])
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select("o_orderkey")
    )
    sb = t.scan(spark).dynamic_filter("l_orderkey", dim, "o_orderkey")
    df = sb.to_df()
    # commits holding l_orderkey >= SPLITS[1] must be skipped at file level
    assert sb.skip_report()["files_skipped_by_dynamic"] > 0
    return df.join(F.broadcast(dim), df.l_orderkey == dim.o_orderkey).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("total"),
    )


@register(
    "delta_snapshot_90commits_pinned",
    oracle="SELECT count(*) AS n FROM lineitem",
    group="delta",
)
def delta_snapshot_90commits_pinned(spark, sf_dir):
    from duckdb_delta_spark.delta.catalog import DeltaCatalog

    root = FX.ensure_fixtures(spark, sf_dir)
    cat = _PIN_CATALOG.get(id(spark)) or DeltaCatalog(spark)
    _PIN_CATALOG[id(spark)] = cat
    if "li90_pinned" not in cat:
        cat.attach("li90_pinned", os.path.join(root, "lineitem_90c"),
                   pin_snapshot=True)
    return cat.to_df("li90_pinned").agg(F.count(F.lit(1)).alias("n"))


# ---- DAT-style dual-scan coverage (reference: test/sql/dat/all.test:14-27)


# every §1.2 primitive type through the full Delta path, value-exact
# (reference DAT table analogue: all_primitive_types)
@register(
    "delta_all_types_scan",
    oracle=f"""
    SELECT l_orderkey AS b_big,
           CAST(l_linenumber AS INTEGER) AS b_int_key,
           l_orderkey % 2 = 0 AS b_bool,
           CAST(CAST(l_linenumber AS TINYINT) AS INTEGER) AS b_tiny,
           CAST(CAST(l_quantity AS SMALLINT) AS INTEGER) AS b_small,
           CAST(l_partkey % 100000 AS INTEGER) AS b_int,
           round(CAST(CAST(l_discount AS REAL) AS DOUBLE), 6) AS b_float,
           l_extendedprice AS b_double,
           CAST(CAST(l_partkey AS DECIMAL(18,3)) AS VARCHAR) AS b_dec,
           l_returnflag || '-' || l_linestatus AS b_str,
           hex(encode(l_returnflag)) AS b_bin_hex,
           CAST(l_shipdate AS DATE) AS b_date,
           strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS b_ts,
           strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS b_ts_ntz
    FROM lineitem WHERE l_orderkey < {FX.ALL_TYPES_KEY_MAX}
    """,
    group="delta",
)
def delta_all_types_scan(spark, sf_dir):
    # The Delta table stores the full §1.2 primitive matrix (tinyint,
    # smallint, decimal(18,3), float, binary, timestamp_tz/ntz — fidelity
    # proven by pytest + this scan), but the driver-visible projection is
    # canonicalized to types with green-row precedent: the r2/r3 red hash
    # came from types NO green query emits (tinyint/smallint/decimal —
    # e.g. DuckDB's pandas bridge renders DECIMAL(18,3) 17.000 as float
    # '17.0' while Spark keeps Decimal('17.000')). Values pass through the
    # typed read path first, then are cast identically on both sides.
    df = _fx(spark, sf_dir, "all_types").to_df(spark)
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    cols = []
    for c in df.columns:
        if c == "b_bin":
            cols.append(F.hex(F.col("b_bin")).alias("b_bin_hex"))
        elif c == "b_float":
            cols.append(F.round(F.col("b_float").cast("double"), 6).alias("b_float"))
        elif c in ("b_ts", "b_ts_ntz"):
            cols.append(F.date_format(F.col(c), ts_fmt).alias(c))
        elif c in ("b_tiny", "b_small"):
            cols.append(F.col(c).cast("int").alias(c))
        elif c == "b_dec":
            cols.append(F.col(c).cast("string").alias(c))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


# nested struct/array/map through scan + NESTED-PATH stats pruning
# (reference: partitioned_with_structs.test; predicate visitor
# delta_utils.cpp:1133-1173)
@register(
    "delta_nested_scan",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n,
           {osum('o_totalprice')} AS total,
           CAST(sum(o_orderkey % 5) AS BIGINT) AS a0_sum,
           CAST(sum(o_custkey) AS BIGINT) AS mk_sum
    FROM orders WHERE o_orderkey < {FX.SPLITS[1]}
    GROUP BY o_orderpriority
    """,
    group="delta",
)
def delta_nested_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "nested_types")
    sb = t.scan(spark).filter("s.k", "<", FX.SPLITS[1])
    df = sb.to_df()
    # the nested-path predicate must skip the commits whose s.k range
    # is disjoint (nested minValues/maxValues consulted)
    assert sb.skip_report()["files_skipped_by_stats"] > 0
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("s.inner.p")).alias("total"),
        F.sum(F.element_at("arr", 1)).cast("long").alias("a0_sum"),
        F.sum(F.element_at(F.col("m"), F.lit("k"))).cast("long").alias("mk_sum"),
    )


# deletion vector spanning multiple roaring containers, decoded
# EXECUTOR-side (forced big-DV path) — reference analogue:
# big_deletion_vectors.test_slow
@register(
    "delta_big_dv_scan",
    oracle=f"""
    SELECT l_returnflag, count(*) AS n, {osum('l_quantity')} AS qty
    FROM lineitem, range(0, {FX.BIGDV_MAX_COPIES}) t(c)
    WHERE c < greatest(2, CAST(ceil({FX.BIGDV_TARGET_ROWS}.0
                                    / (SELECT count(*) FROM lineitem)) AS BIGINT))
      AND NOT (l_partkey % 2 = 1)
    GROUP BY l_returnflag
    """,
    group="delta",
)
def delta_big_dv_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_bigdv")
    (f,) = t.snapshot.add_files()
    assert int(f.deletion_vector["cardinality"]) > 65_536  # multi-container
    sb = t.scan(spark)
    sb.DV_ANTI_JOIN_MAX = 0  # force the executor-decode path
    return sb.to_df().groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty")
    )


# column mapping ID mode: physical columns resolved by parquet.field.id
# from the file footers, across two file generations with different
# physical names (reference: column_mapping_id_mode.test,
# delta_utils.hpp:300-311)
@register(
    "delta_column_mapping_id",
    oracle=f"""
    SELECT p_brand, count(*) AS n,
           CAST(round(sum(CAST(p_retailprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM (SELECT p_brand, p_retailprice FROM part
          UNION ALL
          SELECT p_brand, p_retailprice FROM part
          WHERE p_partkey < {FX.CM_ID_APPEND_KEY_MAX})
    GROUP BY p_brand
    """,
    group="delta",
)
def delta_column_mapping_id(spark, sf_dir):
    df = _fx(spark, sf_dir, "part_cm_id").to_df(spark)
    return df.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), dsum("p_retailprice").alias("total")
    )


# engine-written UPDATE: DV mask + updated images in one commit
# (beyond the reference, which supports no DML)
@register(
    "delta_update_scan",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n,
           {osum('CASE WHEN o_orderpriority = %s THEN o_totalprice * 2 ELSE o_totalprice END' % "'1-URGENT'")} AS total
    FROM orders GROUP BY o_orderpriority
    """,
    group="delta",
)
def delta_update_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_upd")
    return t.to_df(spark).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# engine-written INSERT OVERWRITE: a partition-aligned replaceWhere
# (whole-file removes) then a straddling one (DV masks) — both in the
# same fixture, so the scan crosses removes, DVs and fresh adds
# (beyond the reference, which supports no DML)
@register(
    "delta_overwrite_scan",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n,
           {osum(f"CASE WHEN o_orderkey < {FX.OW_KEY_MAX} THEN o_totalprice * 5 "
                 "WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 3 "
                 "ELSE o_totalprice END")} AS total
    FROM orders GROUP BY o_orderpriority
    """,
    group="delta",
)
def delta_overwrite_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_ow")
    return t.to_df(spark).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# engine-WRITTEN v2 checkpoint: replay crosses the UUID manifest, parquet
# sidecars and a post-checkpoint JSON commit (read side proven in r3;
# this fixture exercises the writer, writer._checkpoint_v2)
@register(
    "delta_v2_checkpoint_scan",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
    group="delta",
)
def delta_v2_checkpoint_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_v2ckpt")
    assert "v2Checkpoint" in (
        t.snapshot.protocol.get("readerFeatures") or []
    )
    return t.to_df(spark).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# in-commit timestamps: timestamp travel resolved from the MONOTONIC
# commitInfo.inCommitTimestamp clocks (v7 inCommitTimestamp feature),
# pinned to version 1 = the first append
@register(
    "delta_ict_travel_scan",
    oracle=f"""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey < {FX.EVO_KEY_SPLIT}
    """,
    group="delta",
)
def delta_ict_travel_scan(spark, sf_dir):
    import os as _os

    from duckdb_delta_spark.delta.log import DeltaLog

    root = FX.ensure_fixtures(spark, sf_dir)
    path = _os.path.join(root, "orders_ict")
    log = DeltaLog(path)
    ict_v1 = log.read_ict(1)
    assert ict_v1 is not None and log.version_at_timestamp(ict_v1) == 1
    t = DeltaTable(path, timestamp=ict_v1)
    return t.to_df(spark).agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# engine-written MERGE: overlap updated via DV+re-append, tail inserted
@register(
    "delta_merge_scan",
    oracle=f"""
    SELECT o_orderstatus, count(*) AS n, {osum('p')} AS total
    FROM (SELECT o_orderstatus,
                 CASE WHEN o_orderkey >= {FX.MERGE_LO}
                      THEN o_totalprice * 2 ELSE o_totalprice END AS p
          FROM orders WHERE o_orderkey < {FX.MERGE_END}) t
    GROUP BY o_orderstatus
    """,
    group="delta",
)
def delta_merge_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_merge")
    return t.to_df(spark).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# MERGE with schema evolution (merge_schema=True, delta-spark
# withSchemaEvolution): the source's NEW src_batch column widened the
# table — matched rows carry the assigned value, inserts carry theirs,
# pre-existing unmatched rows read typed NULL
@register(
    "delta_merge_evolve_scan",
    oracle=f"""
    SELECT src_batch, count(*) AS n, {osum('o_totalprice')} AS total
    FROM (SELECT CASE WHEN o_orderkey >= {FX.MERGE_LO}
                      THEN CAST(7 AS BIGINT) END AS src_batch,
                 o_totalprice
          FROM orders WHERE o_orderkey < {FX.MERGE_END}) t
    GROUP BY src_batch
    """,
    group="delta",
)
def delta_merge_evolve_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_merge_evo")
    return t.to_df(spark).groupBy("src_batch").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# a COMMITTED two-writer race: writer B's UPDATE lost the version race
# to a disjoint append, re-validated (metadata unchanged, its files
# untouched, the appended rows don't match its predicate) and committed
# on retry — the fixture builder asserts B landed ABOVE the racer. The
# oracle derives the serial A-then-B content, so any silently lost or
# double-applied update shows up as a value mismatch.
@register(
    "delta_racing_update_scan",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n, {osum('p')} AS total
    FROM (SELECT o_orderpriority,
                 CASE WHEN o_orderkey < {FX.MERGE_LO}
                           AND o_orderpriority = '1-URGENT'
                      THEN o_totalprice * 3 ELSE o_totalprice END AS p
          FROM orders
          WHERE o_orderkey < {FX.MERGE_LO}
             OR (o_orderkey >= {FX.MERGE_HI}
                 AND o_orderkey < {FX.MERGE_END})) t
    GROUP BY o_orderpriority
    """,
    group="delta",
)
def delta_racing_update_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_racing")
    assert t.version == 3  # create, append, racer append, retried UPDATE
    return t.to_df(spark).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# change feed derived from the log: the UPDATE commit on orders_upd reads
# back as delete+insert pairs for exactly the urgent rows
@register(
    "delta_changes_scan",
    oracle=f"""
    SELECT _change_type, count(*) AS n, {osum('p')} AS total
    FROM (SELECT 'delete' AS _change_type, o_totalprice AS p
          FROM orders WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT 'insert' AS _change_type, o_totalprice * 2 AS p
          FROM orders WHERE o_orderpriority = '1-URGENT') t
    GROUP BY _change_type
    """,
    group="delta",
)
def delta_changes_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_upd")
    ch = t.changes(spark, 1)  # the UPDATE commit only
    return ch.groupBy("_change_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# engine-written RESTORE: HEAD equals version 1's content, as a new commit
@register(
    "delta_restore_scan",
    oracle=f"""
    SELECT o_orderstatus, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey < {FX.EVO_KEY_SPLIT}
    GROUP BY o_orderstatus
    """,
    group="delta",
)
def delta_restore_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_restore")
    assert t.version >= 3  # the restore commit exists
    return t.to_df(spark).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# spec-interop: a table this engine did NOT write — hand-authored
# delta-spark layout (foreign commit JSON, URL-encoded paths under
# hive-escaped partition dirs, string stats, spec-byte DV file with run
# containers, classic map-typed checkpoint parquet; testing/foreign.py).
# The oracle re-derives the semantic content from raw parquet, so any
# self-consistent deviation in DV decode / checkpoint replay / path
# handling shows up as a value mismatch here.
@register(
    "delta_foreign_scan",
    oracle="""
    SELECT p_brand, count(*) AS n,
           CAST(round(sum(CAST(p_retailprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total,
           max(p_size) AS max_size
    FROM part WHERE p_size <= 40 AND p_partkey % 7 <> 0
    GROUP BY p_brand
    """,
    group="delta",
)
def delta_foreign_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "part_foreign")
    return t.to_df(spark).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("p_retailprice").alias("total"),
        F.max("p_size").alias("max_size"),
    )


# OPTIMIZE ZORDER: after multi-dimensional clustering on
# (l_orderkey, l_partkey), stats skipping prunes on the NON-leading
# dimension too — asserted in-query; values must still match the oracle.
@register(
    "delta_zorder_scan",
    oracle=f"""
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM lineitem WHERE l_partkey < 50
    GROUP BY l_returnflag
    """,
    group="delta",
)
def delta_zorder_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_zorder")
    sb = t.scan(spark).filter("l_partkey", "<", 50)
    df = sb.to_df()
    rep = sb.skip_report()
    if rep["files_total"] > 2:
        assert rep["files_skipped_by_stats"] > 0, rep
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("total")
    )


# nested struct/array/map under id-mode column mapping PLUS a deletion
# vector, foreign-authored (delta-spark layout; physical names at every
# nesting level). Content is synthetic-deterministic, so the oracle
# rebuilds it from range(): ids 0..23 minus the DV'd {12,15,18,21},
# info.name='n<id>', info.score=id*1.5, tags=['t','t<id%3>'],
# attrs={'a':id,'b':2id}
@register(
    "delta_nested_cm_scan",
    oracle="""
    SELECT CAST(i AS BIGINT) AS id,
           'n' || CAST(i AS VARCHAR) AS name,
           CAST(i * 1.5 AS DOUBLE) AS score,
           CAST(2 AS BIGINT) AS n_tags,
           CAST(i AS BIGINT) AS a_val,
           CAST(2 * i AS BIGINT) AS b_val
    FROM range(0, 24) t(i)
    WHERE NOT (i >= 12 AND i % 3 = 0)
    """,
    group="delta",
)
def delta_nested_cm_scan(spark, sf_dir):
    df = _fx(spark, sf_dir, "nested_cm_dv").to_df(spark)
    return df.select(
        F.col("id"),
        F.col("info.name").alias("name"),
        F.col("info.score").alias("score"),
        F.size("tags").cast("long").alias("n_tags"),
        F.col("attrs")["a"].alias("a_val"),
        F.col("attrs")["b"].alias("b_val"),
    )


# identity column allocation end-to-end: deterministic with coalesce(1)
# (monotonically_increasing_id is 0..n-1 on one partition), so the oracle
# states the exact arithmetic series and the advanced high-water mark
@register(
    "delta_identity_append",
    oracle="""
    SELECT CAST(25 AS BIGINT) AS n, CAST(25 AS BIGINT) AS n_distinct,
           CAST(100 AS BIGINT) AS min_id, CAST(340 AS BIGINT) AS max_id,
           CAST(590 AS BIGINT) AS hwm2
    """,
    group="delta",
)
def delta_identity_append(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.table import DeltaTable
    from duckdb_delta_spark.delta.writer import DeltaWriter

    path = FX.tmp_dir("identity_") + "/t"
    try:
        schema = T.StructType([
            T.StructField("id", T.LongType(), metadata={
                "delta.identity.start": 100, "delta.identity.step": 10}),
            T.StructField("n_name", T.StringType()),
        ])
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_name")
        w = DeltaWriter.create(spark, path, schema)
        w.append(nat.coalesce(1))  # ids 100,110,...,340
        first = (
            DeltaTable(path).to_df(spark)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("id").alias("n_distinct"),
                 F.min("id").alias("min_id"),
                 F.max("id").alias("max_id"))
        ).first()
        w.append(nat.coalesce(1))  # continues at 350 -> 590
        hwm2 = DeltaTable(path).snapshot.schema["id"].metadata[
            "delta.identity.highWaterMark"]
        schema_out = T.StructType([
            T.StructField("n", T.LongType()),
            T.StructField("n_distinct", T.LongType()),
            T.StructField("min_id", T.LongType()),
            T.StructField("max_id", T.LongType()),
            T.StructField("hwm2", T.LongType()),
        ])
        return local_df(spark, 
            [(first["n"], first["n_distinct"], first["min_id"],
              first["max_id"], int(hwm2))], schema_out)
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


# row tracking end-to-end: sorted single-file write makes _row_id equal
# n_nationkey, the DV delete keeps surviving ids stable, and the second
# file's ids continue past the high-water mark — all deterministic
@register(
    "delta_row_tracking_scan",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS row_id,
           CAST(n_nationkey + 25 AS BIGINT) AS row_id2,
           n_name
    FROM nation WHERE n_nationkey % 5 <> 0
    """,
    group="delta",
)
def delta_row_tracking_scan(spark, sf_dir):
    import shutil
    import tempfile

    from duckdb_delta_spark.delta.table import DeltaTable
    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.tmp_dir("rowtrack_")
    path = os.path.join(root, "t")
    try:
        nat = (
            spark.read.parquet(f"{sf_dir}/nation.parquet")
            .select("n_nationkey", "n_name")
            .orderBy("n_nationkey")
            .coalesce(1)
        )
        w = DeltaWriter.create(
            spark, path, nat.schema,
            configuration={"delta.enableRowTracking": "true"})
        w.append(nat)  # file 1: _row_id == n_nationkey
        w.append(nat)  # file 2: _row_id == n_nationkey + 25
        w.delete("n_nationkey % 5 = 0")  # DVs preserve surviving ids
        df = (
            DeltaTable(path).scan(spark).with_row_ids().to_df()
            .select("n_nationkey", "n_name", "_row_id")
        )
        a = df.where(F.col("_row_id") < 25).select(
            F.col("_row_id").alias("row_id"),
            (F.col("_row_id") + 25).alias("check2"),
            "n_name", F.col("n_nationkey").alias("k"))
        b = df.where(F.col("_row_id") >= 25).select(
            (F.col("_row_id") - 25).alias("row_id"),
            F.col("_row_id").alias("check2"),
            "n_name", F.col("n_nationkey").alias("k"))
        joined = a.join(b, ["row_id", "check2", "n_name"], "inner")
        out = joined.select(
            F.col("row_id").cast("long"),
            F.col("check2").cast("long").alias("row_id2"),
            "n_name",
        ).collect()
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("row_id", T.LongType()),
            T.StructField("row_id2", T.LongType()),
            T.StructField("n_name", T.StringType()),
        ])
        return local_df(spark, out, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# shallow CLONE: zero-copy table referencing the source's files
# absolutely; scanning the clone equals scanning the source
@register(
    "delta_clone_scan",
    oracle=f"""
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS qty
    FROM lineitem WHERE l_linenumber <> {FX.DV_DELETE_LINENUMBER}
    GROUP BY l_returnflag
    """,
    group="delta",
)
def delta_clone_scan(spark, sf_dir):
    import shutil
    import tempfile

    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.ensure_fixtures(spark, sf_dir)
    dest_root = FX.tmp_dir("clone_")
    try:
        dest = os.path.join(dest_root, "t")
        # source carries DVs — the clone must keep masking them (u -> p)
        DeltaWriter.clone(spark, os.path.join(root, "lineitem_dv"), dest)
        df = DeltaTable(dest).to_df(spark)
        rows = df.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty")
        ).collect()
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("qty", T.DoubleType()),
        ])
        return local_df(spark, rows, schema)
    finally:
        shutil.rmtree(dest_root, ignore_errors=True)


# DEEP CLONE: byte-identical file copy, add actions (stats, DV
# descriptors, row ids) carried over unchanged — and the clone stays
# correct after the SOURCE tree is deleted outright (full independence,
# the property shallow clones cannot give)
@register(
    "delta_deep_clone_scan",
    oracle=f"""
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS qty
    FROM lineitem WHERE l_linenumber <> {FX.DV_DELETE_LINENUMBER}
    GROUP BY l_returnflag
    """,
    group="delta",
)
def delta_deep_clone_scan(spark, sf_dir):
    import shutil

    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.ensure_fixtures(spark, sf_dir)
    dest_root = FX.tmp_dir("deepclone_")
    try:
        # shallow first, deep from the shallow: exercises absolute-path
        # adds + 'p' DV descriptors re-materializing under the new root
        mid = os.path.join(dest_root, "mid")
        dest = os.path.join(dest_root, "t")
        DeltaWriter.clone(spark, os.path.join(root, "lineitem_dv"), mid)
        DeltaWriter.clone(spark, mid, dest, shallow=False)
        shutil.rmtree(mid)  # the deep clone must not care
        df = DeltaTable(dest).to_df(spark)
        rows = df.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty")
        ).collect()
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("qty", T.DoubleType()),
        ])
        return local_df(spark, rows, schema)
    finally:
        shutil.rmtree(dest_root, ignore_errors=True)


# ALTER TABLE RENAME/ADD/DROP COLUMN under column mapping: three pure-
# metadata commits, zero file rewrites; old files read typed NULLs for
# the added column
@register(
    "delta_alter_columns_scan",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS key, n_name AS label,
           CAST(NULL AS DOUBLE) AS score
    FROM nation
    """,
    group="delta",
)
def delta_alter_columns_scan(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.table import DeltaTable
    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.tmp_dir("alter_")
    path = os.path.join(root, "t")
    try:
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_nationkey", "n_name", "n_regionkey")
        w = DeltaWriter.create(
            spark, path, nat.schema,
            configuration={"delta.columnMapping.mode": "name"})
        w.append(nat.coalesce(1))
        files0 = {f.path for f in DeltaTable(path).snapshot.add_files()}
        w.rename_column("n_nationkey", "key")
        w.rename_column("n_name", "label")
        w.add_column("score", "double")
        w.drop_column("n_regionkey")
        t = DeltaTable(path)
        # three ALTERs, zero rewrites
        assert {f.path for f in t.snapshot.add_files()} == files0
        rows = t.to_df(spark).select("key", "label", "score").collect()
        schema = T.StructType([
            T.StructField("key", T.LongType()),
            T.StructField("label", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ])
        return local_df(spark, rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# minor log compaction: replay through a <lo>.<hi>.compacted.json segment
# (original commit JSONs deleted) must equal the plain scan
@register(
    "delta_compacted_log_scan",
    oracle="""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(s_acctbal AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS total
    FROM supplier WHERE s_suppkey % 3 <> 0
    """,
    group="delta",
)
def delta_compacted_log_scan(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.table import DeltaTable
    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.tmp_dir("logcompact_")
    path = os.path.join(root, "t")
    try:
        sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        w = DeltaWriter.create(spark, path, sup.schema)
        w.append(sup.where(F.col("s_suppkey") % 2 == 0).coalesce(2))
        w.append(sup.where(F.col("s_suppkey") % 2 == 1).coalesce(2))
        w.delete("s_suppkey % 3 = 0")
        w.compact_log(0, 3)
        for v in range(4):
            os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))
        rows = (
            DeltaTable(path).to_df(spark)
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("s_acctbal").alias("total"))
            .collect()
        )
        schema = T.StructType([
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ])
        return local_df(spark, rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# DESCRIBE HISTORY parity: deterministic projection (version, operation)
# over the orders_upd fixture's known commit sequence
@register(
    "delta_history_scan",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS version, 'CREATE TABLE' AS operation
    UNION ALL SELECT CAST(1 AS BIGINT), 'WRITE'
    UNION ALL SELECT CAST(2 AS BIGINT), 'UPDATE'
    """,
    group="delta",
)
def delta_history_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_upd")
    return t.history(spark).select("version", "operation")


# write-side stats selection (delta.dataSkippingStatsColumns): only the
# configured column is indexed in the add-action stats, the manifest still
# prunes on it, and the un-indexed columns scan correctly (stats are a
# skipping hint, never required for correctness)
@register(
    "delta_stats_columns_scan",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey < 500 GROUP BY o_orderstatus
    """,
    group="delta",
)
def delta_stats_columns_scan(spark, sf_dir):
    import json as _json
    import shutil

    from duckdb_delta_spark.delta.log import DeltaLog
    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.tmp_dir("statscols_")
    path = os.path.join(root, "t")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        w = DeltaWriter.create(
            spark, path, orders.schema,
            configuration={"delta.dataSkippingStatsColumns": "o_orderkey"})
        w.append(orders.where(F.col("o_orderkey") < 500).coalesce(1))
        w.append(orders.where(F.col("o_orderkey") >= 500).coalesce(1))
        # the add stats carry ONLY the configured column
        log = DeltaLog(path)
        for v in (1, 2):
            for a in log.read_commit(v):
                if a.get("add"):
                    st = _json.loads(a["add"]["stats"])
                    assert set(st["minValues"]) == {"o_orderkey"}, st
        t = DeltaTable(path)
        sb = t.scan(spark).filter("o_orderkey", "<", 500)
        df = sb.to_df()
        rep = sb.skip_report()
        assert rep["files_skipped_by_stats"] == 1, rep
        out = df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("total"),
        ).collect()
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ])
        return local_df(spark, out, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# column defaults (allowColumnDefaults writer feature): appends omitting a
# defaulted column fill it from CURRENT_DEFAULT; explicit values win; the
# protocol lists the feature. Deterministic end-to-end on nation.
@register(
    "delta_column_defaults_scan",
    oracle="""
    SELECT n_name, 'api' AS src, CAST(5.0 AS DOUBLE) AS weight FROM nation
    UNION ALL
    SELECT n_name, 'manual' AS src, CAST(1.5 AS DOUBLE) AS weight FROM nation
    WHERE n_regionkey = 0
    """,
    group="delta",
)
def delta_column_defaults_scan(spark, sf_dir):
    import shutil

    from duckdb_delta_spark.delta.writer import DeltaWriter
    from pyspark.sql import types as T

    root = FX.tmp_dir("coldefaults_")
    path = os.path.join(root, "t")
    try:
        schema = T.StructType([
            T.StructField("n_name", T.StringType()),
            T.StructField("src", T.StringType()),
            T.StructField("weight", T.DoubleType()),
        ])
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
        w = DeltaWriter.create(spark, path, schema)
        w.set_default("src", "'api'")
        w.set_default("weight", "2.5 * 2")
        w.append(nat.select("n_name").coalesce(1))  # both filled
        w.append(  # explicit values beat the default
            nat.where(F.col("n_regionkey") == 0)
            .select("n_name", F.lit("manual").alias("src"),
                    F.lit(1.5).alias("weight")).coalesce(1))
        snap = DeltaTable(path).snapshot
        assert "allowColumnDefaults" in snap.protocol["writerFeatures"]
        out = DeltaTable(path).to_df(spark).collect()
        return local_df(spark, out, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# clustered table (liquid clustering): OPTIMIZE picks the declared
# clustering columns by itself; post-cluster stats skipping prunes on BOTH
# dimensions — the property a lexicographic sort can't give
@register(
    "delta_clustered_scan",
    oracle="""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
    FROM orders WHERE o_custkey < 75 AND o_orderkey < 700
    """,
    group="delta",
)
def delta_clustered_scan(spark, sf_dir):
    import shutil

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.tmp_dir("clustered_")
    path = os.path.join(root, "t")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        w = DeltaWriter.create(
            spark, path, orders.schema, cluster_by=["o_custkey", "o_orderkey"])
        # shuffled halves: every pre-OPTIMIZE file spans both key ranges
        # round-robin repartition: every pre-OPTIMIZE file spans the full
        # range of both keys (the worst layout for skipping)
        w.append(orders.where(F.col("o_orderkey") % 2 == 0).repartition(8))
        w.append(orders.where(F.col("o_orderkey") % 2 == 1).repartition(8))
        # size the target from the manifest itself: just above the largest
        # input file, so every file qualifies for the rewrite AND the
        # rewrite still yields enough clustered outputs (~total/target)
        # that the two-dimensional prune below has boundaries to skip —
        # at ANY scale factor
        sizes = [f.size for f in DeltaTable(path).snapshot.add_files()]
        assert w.compact(
            target_file_bytes=max(sizes) + 4096) is not None
        t = DeltaTable(path)
        assert t.snapshot.clustering_columns == ["o_custkey", "o_orderkey"]
        sb = (t.scan(spark)
              .filter("o_custkey", "<", 75)
              .filter("o_orderkey", "<", 700))
        df = sb.to_df()
        out = df.agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("total"),
        ).collect()
        rep = sb.skip_report()
        assert rep["files_skipped_by_stats"] > 0, rep
        schema = T.StructType([
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ])
        return local_df(spark, out, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ALTER TABLE ADD CONSTRAINT end-to-end: existing-data validation passes,
# a violating append is rejected WITHOUT committing (rows + file count
# unchanged), a satisfying append lands, DROP lifts enforcement
@register(
    "delta_add_constraint_scan",
    oracle="""
    SELECT n_name, CAST(n_regionkey AS BIGINT) AS rk FROM nation
    UNION ALL
    SELECT 'extra' AS n_name, CAST(9 AS BIGINT) AS rk
    UNION ALL
    SELECT 'late' AS n_name, CAST(-1 AS BIGINT) AS rk
    """,
    group="delta",
)
def delta_add_constraint_scan(spark, sf_dir):
    import shutil

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.errors import ConstraintViolationError
    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.tmp_dir("addcons_")
    path = os.path.join(root, "t")
    try:
        schema = T.StructType([
            T.StructField("n_name", T.StringType()),
            T.StructField("rk", T.LongType()),
        ])
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_name", F.col("n_regionkey").cast("long").alias("rk"))
        w = DeltaWriter.create(spark, path, schema)
        w.append(nat.coalesce(1))
        w.add_constraint("rk_nonneg", "rk >= 0")

        def one(name, rk):
            return local_df(spark, [(name, rk)], schema).coalesce(1)

        try:
            w.append(one("bad", -1))
            raise AssertionError("violating append must be rejected")
        except ConstraintViolationError:
            pass
        w.append(one("extra", 9))
        w.drop_constraint("rk_nonneg")
        w.append(one("late", -1))  # enforcement lifted
        out = DeltaTable(path).to_df(spark).collect()
        return local_df(spark, out, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# REPLACE TABLE (overwriteSchema): the scan reads the post-replace
# schema/partitioning; the oracle re-derives the summary from raw orders
@register(
    "delta_replace_scan",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             count(*) AS n_orders,
             sum(CAST(o_totalprice AS DECIMAL(25,6))) AS total,
             o_custkey % 4 AS bucket
      FROM orders GROUP BY o_custkey)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(n_orders) AS BIGINT) AS n_orders,
           CAST(round(sum(total), 2) AS DOUBLE) AS total
    FROM s GROUP BY bucket
    """,
    group="delta",
)
def delta_replace_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_replaced")
    assert t.snapshot.partition_columns == ["bucket"]
    assert "o_orderkey" not in t.snapshot.schema.fieldNames()
    return t.to_df(spark).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.round(F.sum("total"), 2).cast("double").alias("total"),
    )


# metadata-only per-partition statistics: answered ENTIRELY from the
# manifest (partitionValues + stats.numRecords) — zero data files read;
# the oracle recomputes the same numbers by scanning the raw rows
@register(
    "delta_partition_stats",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    group="delta",
)
def delta_partition_stats(spark, sf_dir):
    t = _fx(spark, sf_dir, "lineitem_part")
    m = t.file_manifest(spark)
    return (
        m.select(
            F.col("partition_values")["l_returnflag"].alias("l_returnflag"),
            "cardinality",
        )
        .groupBy("l_returnflag")
        .agg(F.sum("cardinality").cast("long").alias("n_rows"))
    )


# nested column mapping on the WRITE path (r14): our writer creates a
# name-mapped table with struct fields mapped at every nesting level,
# appends 3 range files, UPDATE rewrites one row's struct — then a
# nested-path predicate must prune files through the physically-keyed
# nested stats our own writer produced. (Write-side twin of
# delta_nested_cm_scan's foreign-fixture read; reference read analogue:
# generated column_mapping tests, delta_utils.hpp:300-311.)
@register(
    "delta_nested_cm_write_scan",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS n_key,
           CASE WHEN n_nationkey = 20 THEN 'XX' ELSE n_name END AS name,
           CAST(n_nationkey AS BIGINT) AS key_val
    FROM nation WHERE n_nationkey >= 17
    """,
    group="delta",
)
def delta_nested_cm_write_scan(spark, sf_dir):
    import shutil

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.tmp_dir("nestedcmw_")
    path = os.path.join(root, "t")
    try:
        schema = T.StructType([
            T.StructField("n_key", T.LongType()),
            T.StructField("info", T.StructType([
                T.StructField("name", T.StringType()),
                T.StructField("key", T.LongType()),
            ])),
        ])
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            F.col("n_nationkey").cast("long").alias("n_key"),
            F.struct(
                F.col("n_name").alias("name"),
                F.col("n_nationkey").cast("long").alias("key"),
            ).alias("info"),
        )
        w = DeltaWriter.create(
            spark, path, schema,
            configuration={"delta.columnMapping.mode": "name"})
        w.append(nat.repartitionByRange(3, "n_key"))
        DeltaWriter(path, spark).update(
            "n_key = 20", {"info": "named_struct('name', 'XX', 'key', 20L)"})
        sb = DeltaTable(path).scan(spark).filter("info.key", ">=", 17)
        df = sb.to_df().select(
            F.col("n_key"),
            F.col("info.name").alias("name"),
            F.col("info.key").alias("key_val"),
        )
        rows = df.collect()
        assert sb.skip_report()["files_skipped_by_stats"] >= 2, sb.skip_report()
        return local_df(spark, [tuple(r) for r in rows], df.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# nested schema evolution (r14): mergeSchema widens a struct IN PLACE
# (info gains region_key), old files + old-shape merge appends null-fill
# it, and the final scan reads both shapes as one schema. delta-spark
# parity surface; the reference engine reads such tables via kernel
# schema evolution (with_schema_change DAT shape).
@register(
    "delta_nested_evolution_scan",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS n_key,
           n_name AS name,
           CASE WHEN n_nationkey >= 10 THEN CAST(n_regionkey AS BIGINT)
                ELSE NULL END AS region_key
    FROM nation
    """,
    group="delta",
)
def delta_nested_evolution_scan(spark, sf_dir):
    import shutil

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.tmp_dir("nestedevo_")
    path = os.path.join(root, "t")
    try:
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
        schema = T.StructType([
            T.StructField("n_key", T.LongType()),
            T.StructField("info", T.StructType([
                T.StructField("name", T.StringType()),
            ])),
        ])
        w = DeltaWriter.create(spark, path, schema)
        narrow = nat.where("n_nationkey < 10").select(
            F.col("n_nationkey").cast("long").alias("n_key"),
            F.struct(F.col("n_name").alias("name")).alias("info"))
        w.append(narrow.coalesce(1))
        wide = nat.where("n_nationkey >= 10").select(
            F.col("n_nationkey").cast("long").alias("n_key"),
            F.struct(
                F.col("n_name").alias("name"),
                F.col("n_regionkey").cast("long").alias("region_key"),
            ).alias("info"))
        DeltaWriter(path, spark).append(wide.coalesce(1), merge_schema=True)
        df = DeltaTable(path).to_df(spark).select(
            F.col("n_key"),
            F.col("info.name").alias("name"),
            F.col("info.region_key").alias("region_key"),
        )
        rows = [tuple(r) for r in df.collect()]
        return local_df(spark, rows, df.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# map KEY conform on the WRITE path (r15): struct-typed map keys conform
# BY NAME like values do — one append arrives with the key struct's
# fields REORDERED (a positional cast would silently swap the same-typed
# fields), another with int-typed key fields (the trailing cast widens
# them to the table's long). Exploded entries must reproduce the exact
# (x, y, value) triples on a column-mapped table. Write-side surface the
# reference reaches through delta-kernel's expression evaluation
# (src/functions/delta_scan/: nested type handling).
@register(
    "delta_map_key_conform_scan",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS n_key,
           CAST(n_nationkey AS BIGINT) AS kx,
           CAST(2 * n_nationkey AS BIGINT) AS ky,
           CAST(3 * n_nationkey AS BIGINT) AS val
    FROM nation
    """,
    group="delta",
)
def delta_map_key_conform_scan(spark, sf_dir):
    import shutil

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.tmp_dir("mapkeyconf_")
    path = os.path.join(root, "t")
    try:
        schema = T.StructType([
            T.StructField("n_key", T.LongType()),
            T.StructField("m", T.MapType(
                T.StructType([T.StructField("x", T.LongType()),
                              T.StructField("y", T.LongType())]),
                T.LongType())),
        ])
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            F.col("n_nationkey").cast("long").alias("k"))
        w = DeltaWriter.create(
            spark, path, schema,
            configuration={"delta.columnMapping.mode": "name"})
        # append 1: key struct fields REORDERED (y, x) — by-name conform
        w.append(nat.where("k < 13").select(
            F.col("k").alias("n_key"),
            F.create_map(
                F.struct((F.col("k") * 2).alias("y"), F.col("k").alias("x")),
                F.col("k") * 3).alias("m")).coalesce(1))
        # append 2: key fields typed INT (and reordered) — trailing cast
        w.append(nat.where("k >= 13").select(
            F.col("k").alias("n_key"),
            F.create_map(
                F.struct((F.col("k") * 2).cast("int").alias("y"),
                         F.col("k").cast("int").alias("x")),
                F.col("k") * 3).alias("m")).coalesce(1))
        df = (
            DeltaTable(path).to_df(spark)
            .select("n_key", F.explode("m").alias("key", "val"))
            .select(
                "n_key",
                F.col("key.x").alias("kx"),
                F.col("key.y").alias("ky"),
                F.col("val"),
            )
        )
        rows = df.collect()
        return local_df(spark, [tuple(r) for r in rows], df.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# column-mapping UPGRADE (r15): ALTER ... SET delta.columnMapping.mode =
# 'name' on an EXISTING table assigns ids with LOGICAL-named
# physicalNames (pre-upgrade files stay readable by name) and upgrades
# the protocol to (2,5); a metadata-only RENAME then lands, and the scan
# reads pre-upgrade (id-less) and post-upgrade (id-carrying) files as
# one logical schema. delta-spark upgrade semantics; the reference reads
# such tables via kernel column mapping (delta_utils.hpp:300-311).
@register(
    "delta_cm_upgrade_scan",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nation_key,
           n_name AS name,
           CAST(n_regionkey AS BIGINT) AS region_key
    FROM nation
    """,
    group="delta",
)
def delta_cm_upgrade_scan(spark, sf_dir):
    import shutil

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.tmp_dir("cmupgrade_")
    path = os.path.join(root, "t")
    try:
        schema = T.StructType([
            T.StructField("n_key", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("region_key", T.LongType()),
        ])
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            F.col("n_nationkey").cast("long").alias("n_key"),
            F.col("n_name").alias("name"),
            F.col("n_regionkey").cast("long").alias("region_key"))
        w = DeltaWriter.create(spark, path, schema)
        w.append(nat.where("n_key < 13").coalesce(1))     # pre-upgrade file
        v = w.set_properties({"delta.columnMapping.mode": "name"})
        assert v is not None
        w.rename_column("n_key", "nation_key")            # metadata-only
        DeltaWriter(path, spark).append(
            nat.where("n_key >= 13")
            .withColumnRenamed("n_key", "nation_key").coalesce(1))
        df = DeltaTable(path).to_df(spark).select(
            "nation_key", "name", "region_key")
        rows = df.collect()
        return local_df(spark, [tuple(r) for r in rows], df.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# full MERGE clause surface (r15): conditional WHEN MATCHED, conditional
# WHEN NOT MATCHED, and WHEN NOT MATCHED BY SOURCE delete — delta-spark
# DeltaMergeBuilder parity in one atomic commit (reference runs MERGE
# through the host engine; the Delta mechanics are the DV mask + image
# appends, delta_deletes.cpp analogue).
@register(
    "delta_merge_by_source_scan",
    oracle="""
    SELECT key, val FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS key,
               CAST(CASE WHEN n_nationkey >= 10 AND n_nationkey % 2 = 0
                         THEN 99 ELSE n_regionkey END AS BIGINT) AS val
        FROM nation WHERE n_nationkey >= 5
        UNION ALL
        SELECT CAST(n_nationkey + 10 AS BIGINT), CAST(99 AS BIGINT)
        FROM nation WHERE n_nationkey + 10 BETWEEN 25 AND 30
    ) u
    """,
    group="delta",
)
def delta_merge_by_source_scan(spark, sf_dir):
    import shutil

    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.writer import DeltaWriter

    root = FX.tmp_dir("mergebys_")
    path = os.path.join(root, "t")
    try:
        schema = T.StructType([
            T.StructField("key", T.LongType()),
            T.StructField("val", T.LongType()),
        ])
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
        w = DeltaWriter.create(spark, path, schema)
        w.append(nat.select(
            F.col("n_nationkey").cast("long").alias("key"),
            F.col("n_regionkey").cast("long").alias("val")).coalesce(1))
        src = nat.select(
            (F.col("n_nationkey") + 10).cast("long").alias("key"),
            F.lit(99).cast("long").alias("val"))
        DeltaWriter(path, spark).merge(
            src, "t.key = s.key",
            when_matched_update={"val": "s.val"},
            when_matched_condition="t.key % 2 = 0",
            when_not_matched_condition="s.key <= 30",
            when_not_matched_by_source_delete=True,
            when_not_matched_by_source_condition="t.key < 5",
        )
        df = DeltaTable(path).to_df(spark).select("key", "val")
        rows = df.collect()
        return local_df(spark, [tuple(r) for r in rows], df.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# replaceWhere losing a two-writer race (committed into the fixture):
# B's replace re-validates with the replace predicate past A's disjoint
# append and commits on retry — urgent lower-range rows carry price*7
@register(
    "delta_racing_replace_scan",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n, {osum('p')} AS total
    FROM (
      SELECT o_orderpriority,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN o_totalprice * 7 ELSE o_totalprice END AS p
      FROM orders WHERE o_orderkey < {FX.MERGE_LO}
      UNION ALL
      SELECT o_orderpriority, o_totalprice AS p
      FROM orders
      WHERE o_orderkey >= {FX.MERGE_HI} AND o_orderkey < {FX.MERGE_END}
    ) t GROUP BY o_orderpriority
    """,
    group="delta",
)
def delta_racing_replace_scan(spark, sf_dir):
    t = _fx(spark, sf_dir, "orders_racing_rw")
    assert t.version == 3  # create, append, racer append, retried replace
    return t.to_df(spark).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# segmented CDF drain across a rename boundary: one frame per schema
# era, each under its own end schema (the escape hatch for the
# non-additive-range refusal)
@register(
    "delta_cdf_segments_scan",
    oracle=f"""
    SELECT seg, _change_type, count(*) AS n
    FROM (
      SELECT 0 AS seg, 'insert' AS _change_type
      FROM orders WHERE o_orderkey < {FX.MERGE_LO}
      UNION ALL
      SELECT 0, 'delete' FROM orders
      WHERE o_orderkey < {FX.MERGE_LO} AND o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT 1, 'insert' FROM orders
      WHERE o_orderkey >= {FX.MERGE_HI} AND o_orderkey < {FX.MERGE_END}
    ) t GROUP BY seg, _change_type
    """,
    group="delta",
)
def delta_cdf_segments_scan(spark, sf_dir):
    from duckdb_delta_spark.delta.changes import table_changes_segments
    from duckdb_delta_spark.delta.log import DeltaLog

    t = _fx(spark, sf_dir, "orders_cdf_seg")
    segs = table_changes_segments(DeltaLog(t.path), spark, -1)
    assert [(s, e) for s, e, _ in segs] == [(-1, 2), (3, 4)], segs
    parts = [
        df.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(i).cast("int").alias("seg"), "_change_type", "n")
        for i, (_, _, df) in enumerate(segs)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
