"""Column defaults (Delta spec "Default Columns" — the
``allowColumnDefaults`` writer feature): CURRENT_DEFAULT field metadata,
fill-on-append, protocol gating, refusal matrix."""
from __future__ import annotations

import json
import sys

import pytest
from pyspark.sql import functions as F, types as T

sys.path.insert(0, "/root/repo")

from duckdb_delta_spark.delta.errors import (  # noqa: E402
    SchemaError,
    UnsupportedFeatureError,
)
from duckdb_delta_spark.delta.log import DeltaLog  # noqa: E402
from duckdb_delta_spark.delta.table import DeltaTable  # noqa: E402
from duckdb_delta_spark.delta.writer import DeltaWriter  # noqa: E402

SCHEMA = T.StructType([
    T.StructField("i", T.LongType()),
    T.StructField("src", T.StringType()),
    T.StructField("weight", T.DoubleType()),
])


def _base(spark, n=5):
    return spark.range(n).select(F.col("id").alias("i"))


def test_set_default_then_append_fills(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.set_default("src", "'api'")
    w.set_default("weight", "2.5 * 2")
    w.append(_base(spark).coalesce(1))
    rows = DeltaTable(tdir).to_df(spark).orderBy("i").collect()
    assert all(r.src == "api" and r.weight == 5.0 for r in rows)
    # protocol lists the writer feature; field metadata carries the expr
    snap = DeltaTable(tdir).snapshot
    assert "allowColumnDefaults" in snap.protocol["writerFeatures"]
    assert snap.schema["src"].metadata["CURRENT_DEFAULT"] == "'api'"


def test_explicit_value_beats_default(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.set_default("src", "'api'")
    w.append(
        _base(spark)
        .withColumn("src", F.lit("manual"))
        .withColumn("weight", F.lit(1.0))
        .coalesce(1)
    )
    rows = DeltaTable(tdir).to_df(spark).collect()
    assert all(r.src == "manual" for r in rows)


def test_create_with_defaults_in_schema(spark, tdir):
    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("src", T.StringType(),
                      metadata={"CURRENT_DEFAULT": "'bulk'"}),
    ])
    w = DeltaWriter.create(spark, tdir, schema)
    proto = DeltaTable(tdir).snapshot.protocol
    assert "allowColumnDefaults" in proto["writerFeatures"]
    w.append(spark.range(3).select(F.col("id").alias("i")).coalesce(1))
    assert [r.src for r in DeltaTable(tdir).to_df(spark).collect()] == ["bulk"] * 3


def test_drop_default_restores_missing_column_error(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.set_default("src", "'api'")
    w.drop_default("src")
    with pytest.raises(SchemaError, match="missing table columns"):
        w.append(_base(spark).withColumn("weight", F.lit(1.0)).coalesce(1))
    # feature stays listed (never downgraded), metadata key removed
    snap = DeltaTable(tdir).snapshot
    assert "allowColumnDefaults" in snap.protocol["writerFeatures"]
    assert "CURRENT_DEFAULT" not in (snap.schema["src"].metadata or {})


def test_default_fills_not_null_column(spark, tdir):
    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("req", T.StringType(), nullable=False),
    ])
    w = DeltaWriter.create(spark, tdir, schema)
    w.set_default("req", "'present'")
    w.append(spark.range(4).select(F.col("id").alias("i")).coalesce(1))
    assert DeltaTable(tdir).to_df(spark).where("req = 'present'").count() == 4


def test_overwrite_fills_default(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(
        _base(spark).withColumn("src", F.lit("x"))
        .withColumn("weight", F.lit(0.0)).coalesce(1))
    w.set_default("src", "'ow'")
    w.set_default("weight", "9.0")
    w.overwrite(spark.range(2).select(F.col("id").alias("i")).coalesce(1))
    rows = DeltaTable(tdir).to_df(spark).collect()
    assert len(rows) == 2 and all(r.src == "ow" and r.weight == 9.0 for r in rows)


def test_refusals(spark, tdir):
    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("gen", T.LongType(),
                      metadata={"delta.generationExpression": "i + 1"}),
        T.StructField("ident", T.LongType(), metadata={
            "delta.identity.start": 1, "delta.identity.step": 1}),
        T.StructField("p", T.StringType()),
        T.StructField("s", T.StructType([T.StructField("x", T.LongType())])),
    ])
    w = DeltaWriter.create(spark, tdir, schema, partition_by=["p"])
    with pytest.raises(UnsupportedFeatureError, match="generated"):
        w.set_default("gen", "7")
    with pytest.raises(UnsupportedFeatureError, match="identity"):
        w.set_default("ident", "7")
    with pytest.raises(UnsupportedFeatureError, match="partition"):
        w.set_default("p", "'a'")
    with pytest.raises(UnsupportedFeatureError, match="nested"):
        w.set_default("s.x", "7")
    with pytest.raises(SchemaError, match="no such column"):
        w.set_default("zz", "7")
    with pytest.raises(SchemaError, match="self-contained"):
        w.set_default("i", "i + 1")  # column reference → not foldable


def test_merge_schema_append_fills_default_for_absent_column(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.set_default("src", "'api'")
    # mergeSchema append that omits src AND adds a brand-new column
    w.append(
        _base(spark).withColumn("extra", F.lit(1)).coalesce(1),
        merge_schema=True,
    )
    rows = DeltaTable(tdir).to_df(spark).collect()
    assert all(r.src == "api" and r.extra == 1 for r in rows)


def test_merge_insert_fills_default(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.set_default("src", "'merged'")
    w.append(
        _base(spark, 3).withColumn("src", F.lit("orig"))
        .withColumn("weight", F.lit(1.0)).coalesce(1))
    # source lacks src (defaulted) but carries weight
    src = spark.range(2, 6).select(
        F.col("id").alias("i"), F.lit(7.0).alias("weight"))
    w.merge(src, "t.i = s.i", when_matched_update={"weight": "s.weight"})
    rows = {r.i: (r.src, r.weight)
            for r in DeltaTable(tdir).to_df(spark).collect()}
    assert rows[0] == ("orig", 1.0)
    assert rows[2] == ("orig", 7.0)       # matched: updated, src kept
    assert rows[4] == ("merged", 7.0)     # inserted: default filled
