"""ALTER TABLE ADD/DROP CONSTRAINT: existing-data validation, protocol
upgrade, enforcement wiring, interplay with the ALTER dependency guards."""
from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F, types as T

sys.path.insert(0, "/root/repo")

from duckdb_delta_spark.delta.errors import (  # noqa: E402
    ConstraintViolationError,
    SchemaError,
)
from duckdb_delta_spark.delta.table import DeltaTable  # noqa: E402
from duckdb_delta_spark.delta.writer import DeltaWriter  # noqa: E402

SCHEMA = T.StructType([
    T.StructField("i", T.LongType()),
    T.StructField("s", T.StringType()),
])


def _ids(spark, n, lo=0):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("i"), F.concat(F.lit("v"), F.col("id")).alias("s")
    ).coalesce(1)


def test_add_constraint_validates_then_enforces(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_ids(spark, 10))
    v = w.add_constraint("i_positive", "i >= 0")
    snap = DeltaTable(tdir).snapshot
    assert snap.configuration["delta.constraints.i_positive"] == "i >= 0"
    assert snap.protocol["minWriterVersion"] >= 3
    # enforcement fires on the next violating append
    with pytest.raises(ConstraintViolationError, match="i_positive"):
        w.append(spark.range(1).select(
            F.lit(-5).cast("long").alias("i"), F.lit("x").alias("s")))
    # and a satisfying append still lands
    w.append(_ids(spark, 3, lo=100))
    assert DeltaTable(tdir).to_df(spark).count() == 13


def test_add_constraint_refuses_when_existing_rows_violate(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_ids(spark, 10))
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        w.add_constraint("small", "i < 5")
    assert "delta.constraints.small" not in DeltaTable(tdir).snapshot.configuration


def test_add_constraint_rejects_unresolvable_and_duplicate(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_ids(spark, 3))
    with pytest.raises(SchemaError, match="resolve"):
        w.add_constraint("bad", "zz > 0")
    w.add_constraint("ok", "i >= 0")
    with pytest.raises(SchemaError, match="already exists"):
        w.add_constraint("OK", "i >= 0")  # names case-insensitive


def test_null_evaluations_pass(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(spark.range(3).select(
        F.lit(None).cast("long").alias("i"), F.lit("x").alias("s")))
    w.add_constraint("pos", "i > 0")  # NULL > 0 is NULL → passes
    w.append(spark.range(1).select(
        F.lit(None).cast("long").alias("i"), F.lit("y").alias("s")))


def test_drop_constraint(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_ids(spark, 3))
    w.add_constraint("pos", "i >= 0")
    w.drop_constraint("pos")
    w.append(spark.range(1).select(
        F.lit(-1).cast("long").alias("i"), F.lit("x").alias("s")))
    with pytest.raises(SchemaError, match="no such constraint"):
        w.drop_constraint("pos")
    assert w.drop_constraint("pos", if_exists=True) is None


def test_add_constraint_on_v7_table_lists_feature(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, SCHEMA,
        configuration={"delta.enableRowTracking": "true"})
    w.append(_ids(spark, 3))
    w.add_constraint("pos", "i >= 0")
    proto = DeltaTable(tdir).snapshot.protocol
    assert "checkConstraints" in proto["writerFeatures"]


def test_alter_guard_still_blocks_drop_of_constrained_column(spark, tdir):
    from duckdb_delta_spark.delta.errors import UnsupportedFeatureError

    w = DeltaWriter.create(
        spark, tdir, SCHEMA,
        configuration={"delta.columnMapping.mode": "name"})
    w.append(_ids(spark, 3))
    w.add_constraint("pos", "i >= 0")
    with pytest.raises((SchemaError, UnsupportedFeatureError)):
        w.drop_column("i")
