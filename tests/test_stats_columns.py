"""Write-side stats selection: delta.dataSkippingStatsColumns /
delta.dataSkippingNumIndexedCols (delta-spark parity knobs — the add-action
stats blob must stay O(configured columns), not O(schema width), or wide
tables drown the manifest at scale)."""
from __future__ import annotations

import json
import os
import sys

import pytest
from pyspark.sql import functions as F, types as T

sys.path.insert(0, "/root/repo")

from duckdb_delta_spark.delta.errors import (  # noqa: E402
    ConstraintViolationError,
    SchemaError,
)
from duckdb_delta_spark.delta.log import DeltaLog  # noqa: E402
from duckdb_delta_spark.delta.table import DeltaTable  # noqa: E402
from duckdb_delta_spark.delta.writer import DeltaWriter  # noqa: E402

WIDE = T.StructType([
    T.StructField("a", T.LongType()),
    T.StructField("b", T.StringType()),
    T.StructField("nest", T.StructType([
        T.StructField("c", T.DoubleType()),
        T.StructField("d", T.LongType()),
    ])),
    T.StructField("e", T.LongType()),
])


def _rows(spark, n=10):
    return spark.range(n).select(
        F.col("id").alias("a"),
        F.concat(F.lit("s"), F.col("id")).alias("b"),
        F.struct(
            (F.col("id") * 1.5).alias("c"), (F.col("id") * 2).alias("d")
        ).alias("nest"),
        (F.col("id") + 100).alias("e"),
    )


def _add_stats(path):
    """stats dicts of every add action across the whole log."""
    out = []
    log = DeltaLog(path)
    for v in range(log.latest_version() + 1):
        for a in log.read_commit(v):
            if "add" in a and a["add"]:
                out.append(json.loads(a["add"]["stats"]))
    return out


def test_stats_columns_restrict(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, WIDE,
        configuration={"delta.dataSkippingStatsColumns": "a, nest.d"})
    w.append(_rows(spark).coalesce(1))
    (stats,) = _add_stats(tdir)
    assert stats["numRecords"] == 10
    assert set(stats["minValues"]) == {"a", "nest"}
    assert set(stats["minValues"]["nest"]) == {"d"}
    assert "b" not in stats["nullCount"] and "e" not in stats["nullCount"]
    # skipping still prunes on an indexed column
    w.append(_rows(spark).withColumn("a", F.col("a") + 1000).coalesce(1))
    sb = DeltaTable(tdir).scan(spark).filter("a", ">=", 1000)
    assert sb.to_df().count() == 10
    rep = sb.skip_report()
    assert rep["files_skipped_by_stats"] == 1, rep


def test_stats_columns_struct_prefix_indexes_all_leaves(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, WIDE,
        configuration={"delta.dataSkippingStatsColumns": "nest"})
    w.append(_rows(spark).coalesce(1))
    (stats,) = _add_stats(tdir)
    assert set(stats["minValues"]) == {"nest"}
    assert set(stats["minValues"]["nest"]) == {"c", "d"}


def test_stats_columns_unknown_name_raises(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, WIDE,
        configuration={"delta.dataSkippingStatsColumns": "zz"})
    with pytest.raises(SchemaError, match="zz"):
        w.append(_rows(spark).coalesce(1))


def test_num_indexed_cols_takes_first_n_leaves(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, WIDE,
        configuration={"delta.dataSkippingNumIndexedCols": "3"})
    w.append(_rows(spark).coalesce(1))
    (stats,) = _add_stats(tdir)
    # depth-first leaf order: a, b, nest.c | nest.d, e cut off
    assert set(stats["minValues"]) == {"a", "b", "nest"}
    assert set(stats["minValues"]["nest"]) == {"c"}
    assert "e" not in stats["minValues"]


def test_num_indexed_cols_minus_one_means_all(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, WIDE,
        configuration={"delta.dataSkippingNumIndexedCols": "-1"})
    w.append(_rows(spark).coalesce(1))
    (stats,) = _add_stats(tdir)
    assert set(stats["minValues"]) == {"a", "b", "nest", "e"}


def test_not_null_column_force_included_and_enforced(spark, tdir):
    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("req", T.LongType(), nullable=False),
    ])
    w = DeltaWriter.create(
        spark, tdir, schema,
        configuration={"delta.dataSkippingNumIndexedCols": "1"})
    w.append(spark.range(5).select(
        F.col("id").alias("a"), F.col("id").alias("req")).coalesce(1))
    (stats,) = _add_stats(tdir)
    # req is beyond the first-1 cut but force-included (NOT NULL needs
    # footer nullCount); enforcement must still fire
    assert "req" in stats["nullCount"]
    with pytest.raises(ConstraintViolationError):
        w.append(spark.range(3).select(
            F.col("id").alias("a"),
            F.when(F.col("id") < 2, F.col("id")).alias("req")).coalesce(1))


def test_identity_hwm_survives_zero_indexed_cols(spark, tdir):
    schema = T.StructType([
        T.StructField("id", T.LongType(), metadata={
            "delta.identity.start": 1, "delta.identity.step": 1}),
        T.StructField("v", T.StringType()),
    ])
    w = DeltaWriter.create(
        spark, tdir, schema,
        configuration={"delta.dataSkippingNumIndexedCols": "0"})
    w.append(spark.range(4).select(F.lit("x").alias("v")).coalesce(1))
    hwm = DeltaTable(tdir).snapshot.schema["id"].metadata[
        "delta.identity.highWaterMark"]
    assert int(hwm) == 4
    (stats,) = _add_stats(tdir)
    assert "v" not in stats["minValues"]  # the cut still applies elsewhere


def test_stats_columns_on_mapped_table_uses_logical_names(spark, tdir):
    flat = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("e", T.LongType()),
    ])
    w = DeltaWriter.create(
        spark, tdir, flat,
        configuration={
            "delta.columnMapping.mode": "name",
            "delta.dataSkippingStatsColumns": "e",
        })

    def _rows(spark):
        return spark.range(10).select(
            F.col("id").alias("a"),
            F.concat(F.lit("s"), F.col("id")).alias("b"),
            (F.col("id") + 100).alias("e"),
        )

    w.append(_rows(spark).coalesce(1))
    (stats,) = _add_stats(tdir)
    snap = DeltaTable(tdir).snapshot
    phys_e = snap.schema["e"].metadata["delta.columnMapping.physicalName"]
    # stats keyed by PHYSICAL name (spec) and restricted to the one
    # configured LOGICAL column
    assert set(stats["minValues"]) == {phys_e}
    # skipping on the logical name still works through the mapping
    w.append(_rows(spark).withColumn("e", F.col("e") + 1000).coalesce(1))
    sb = DeltaTable(tdir).scan(spark).filter("e", ">=", 1100)
    assert sb.to_df().count() == 10
    assert sb.skip_report()["files_skipped_by_stats"] == 1
