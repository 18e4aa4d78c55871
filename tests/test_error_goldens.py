"""Golden error-message matrix: the engine's public error surface, pinned.

Reference analogue: the exact-message goldens in
test/sql/main/test_error_messages.test:11-45 over the 43 kernel error codes
(delta_utils.cpp:767-820 ``KernelErrorEnumToString``). Every row triggers a
real failure path and asserts the EXACT rendered message — so refactors
cannot silently change what users (and their alerting regexes) see. Paths
embedded in messages are parameterized via ``{path}``/``{file}``.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter, errors
from duckdb_delta_spark.delta.log import DeltaLog

SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("g", T.LongType()),
        T.StructField("x", T.DoubleType()),
    ]
)


def _ids(spark, n, lo=0):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("i"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 1.5).alias("x"),
    )


def _golden(exc_info, expected: str) -> None:
    assert str(exc_info.value) == expected, (
        f"golden mismatch:\n  got:  {str(exc_info.value)!r}\n"
        f"  want: {expected!r}"
    )


def test_invalid_table_location(tmp_path):
    p = str(tmp_path / "nowhere")
    with pytest.raises(errors.InvalidTableLocationError) as ei:
        DeltaLog(p)
    _golden(
        ei,
        f"InvalidTableLocationError: no Delta table found at {p!r} "
        "(missing _delta_log)",
    )


def test_invalid_table_version(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_ids(spark, 3))
    with pytest.raises(errors.InvalidTableVersionError) as ei:
        DeltaTable(tdir, version=99)
    _golden(
        ei,
        f"InvalidTableVersionError: version 99 not in [0, 1] at {tdir}",
    )


def test_missing_version(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_ids(spark, 3))
    with pytest.raises(errors.MissingVersionError) as ei:
        DeltaLog(tdir).read_commit(7)
    _golden(ei, f"MissingVersionError: commit 7 missing from log at {tdir}")


def test_malformed_log_gap(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_ids(spark, 3))
    w.append(_ids(spark, 3, lo=3))
    os.unlink(os.path.join(tdir, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(errors.MalformedLogError) as ei:
        DeltaTable(tdir)
    _golden(ei, "MalformedLogError: log has a gap: commit 1 missing (target 2)")


def test_malformed_log_bad_json(spark, tdir):
    DeltaWriter.create(spark, tdir, SCHEMA)
    path = os.path.join(tdir, "_delta_log", f"{1:020d}.json")
    with open(path, "w") as f:
        f.write("{not json\n")
    with pytest.raises(errors.MalformedLogError) as ei:
        DeltaLog(tdir).read_commit(1)
    assert str(ei.value).startswith(f"MalformedLogError: {path}:1: invalid JSON (")


def test_commit_conflict(spark, tdir):
    DeltaWriter.create(spark, tdir, SCHEMA)
    log = DeltaLog(tdir)
    with pytest.raises(errors.CommitConflictError) as ei:
        log.commit(0, [{"commitInfo": {"operation": "RACE"}}])
    _golden(ei, f"CommitConflictError: version 0 already committed at {tdir}")


def test_not_null_constraint(spark, tdir):
    strict = T.StructType([T.StructField("i", T.LongType(), False)])
    w = DeltaWriter.create(spark, tdir, strict)
    with pytest.raises(errors.ConstraintViolationError) as ei:
        w.append(spark.range(3).select(
            F.when(F.col("id") < 1, F.col("id")).alias("i")))
    _golden(
        ei,
        "ConstraintViolationError: NOT NULL constraint violated for column 'i'",
    )


def test_check_constraint(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, SCHEMA,
        configuration={"delta.constraints.small_i": "i < 10"},
    )
    with pytest.raises(errors.ConstraintViolationError) as ei:
        w.append(_ids(spark, 3, lo=100))
    _golden(
        ei,
        "ConstraintViolationError: CHECK constraint 'small_i' violated: i < 10",
    )


def test_idempotency(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_ids(spark, 3), txn_app_id="app", txn_version=1)
    with pytest.raises(errors.IdempotencyError) as ei:
        DeltaWriter(tdir, spark).append(
            _ids(spark, 3), txn_app_id="app", txn_version=2, txn_expected_last=0
        )
    _golden(
        ei,
        "IdempotencyError: app 'app': expected last version 0, found 1",
    )


def test_schema_error_missing_columns(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    with pytest.raises(errors.SchemaError) as ei:
        w.append(spark.range(3).select(F.col("id").alias("i")))
    _golden(ei, "SchemaError: input missing table columns: ['g', 'x']")


def test_unsupported_reader_feature(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_ids(spark, 3))
    log = DeltaLog(tdir)
    log.commit(2, [
        {"commitInfo": {"operation": "UPGRADE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["futureMagic"],
                      "writerFeatures": []}},
    ])
    with pytest.raises(errors.UnsupportedFeatureError) as ei:
        DeltaTable(tdir)
    _golden(
        ei,
        "UnsupportedFeatureError: reader features not supported: ['futureMagic']",
    )


def test_unsupported_writer_feature(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_ids(spark, 3))
    DeltaLog(tdir).commit(2, [
        {"commitInfo": {"operation": "UPGRADE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["futureMagic"]}},
    ])
    with pytest.raises(errors.UnsupportedFeatureError) as ei:
        DeltaWriter(tdir, spark).append(_ids(spark, 3, lo=3))
    _golden(
        ei,
        "UnsupportedFeatureError: writer features not supported: ['futureMagic']",
    )


def test_append_only_table(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, SCHEMA, configuration={"delta.appendOnly": "true"}
    )
    w.append(_ids(spark, 3))
    with pytest.raises(errors.UnsupportedFeatureError) as ei:
        DeltaWriter(tdir, spark).delete("i < 1")
    _golden(
        ei,
        "UnsupportedFeatureError: DELETE on an append-only table "
        "(delta.appendOnly)",
    )


def test_deletion_vector_z85(spark):
    from duckdb_delta_spark.delta.dv import z85_decode

    with pytest.raises(errors.DeletionVectorError) as ei:
        z85_decode("abc")
    _golden(ei, "DeletionVectorError: Z85 length 3 not a multiple of 5")


def test_deletion_vector_short_payload(spark):
    from duckdb_delta_spark.delta.dv import deserialize_bitmap

    with pytest.raises(errors.DeletionVectorError) as ei:
        deserialize_bitmap(b"\x00")
    _golden(ei, "DeletionVectorError: DV payload too short")


def test_v2_sidecar_missing(spark, tdir):
    """Covered behaviorally in test_delta_core; pinned here as a golden."""
    import uuid

    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_ids(spark, 3).coalesce(1))
    w.checkpoint()
    log_dir = os.path.join(tdir, "_delta_log")
    classic = next(n for n in os.listdir(log_dir)
                   if n.endswith(".checkpoint.parquet"))
    manifest = os.path.join(
        log_dir, f"{1:020d}.checkpoint.{uuid.uuid4()}.json")
    with open(manifest, "w") as f:
        f.write(json.dumps({"sidecar": {"path": "gone.parquet"}}) + "\n")
    os.unlink(os.path.join(log_dir, classic))
    with pytest.raises(errors.MalformedLogError) as ei:
        DeltaTable(tdir)
    _golden(
        ei,
        "MalformedLogError: v2 checkpoint sidecar missing: "
        f"{os.path.join(log_dir, '_sidecars', 'gone.parquet')} "
        f"(manifest {manifest})",
    )


def test_alter_refuses_constraint_referenced_column(spark, tdir):
    """DROP/RENAME of a column referenced by a CHECK constraint or a
    generation expression refuses at ALTER time (delta-spark parity) —
    committing would break every subsequent append."""
    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("i2", T.LongType(), True,
                      {"delta.generationExpression": "i * 2"}),
    ])
    w = DeltaWriter.create(
        spark, tdir, schema,
        configuration={"delta.columnMapping.mode": "name",
                       "delta.constraints.small_i": "i < 100"},
    )
    with pytest.raises(errors.SchemaError) as ei:
        w.drop_column("i")
    _golden(
        ei,
        "SchemaError: DROP COLUMN 'i': column is referenced by "
        "CHECK constraint 'small_i' (i < 100); "
        "generated column 'i2' (i * 2) "
        "— drop the constraint / generated column first",
    )
    with pytest.raises(errors.SchemaError) as ei2:
        w.rename_column("i", "j")
    _golden(
        ei2,
        "SchemaError: RENAME COLUMN 'i': column is referenced by "
        "CHECK constraint 'small_i' (i < 100); "
        "generated column 'i2' (i * 2) "
        "— drop the constraint / generated column first",
    )
    # dropping the GENERATED column itself is fine (nothing references it)
    w.drop_column("i2")
    # a column matched only inside a string literal is NOT a reference
    w2dir = tdir + "_lit"
    w2 = DeltaWriter.create(
        spark, w2dir, T.StructType([T.StructField("i", T.LongType()),
                                    T.StructField("s", T.StringType())]),
        configuration={"delta.columnMapping.mode": "name",
                       "delta.constraints.tagged": "s != 'i'"},
    )
    w2.drop_column("i")  # 'i' appears only as a string literal


def test_rename_unreferenced_keeps_constraint_enforcing(spark, tdir):
    """Renaming a column NOT referenced by any constraint succeeds, and
    the existing CHECK constraint still enforces afterwards."""
    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("x", T.DoubleType()),
    ])
    w = DeltaWriter.create(
        spark, tdir, schema,
        configuration={"delta.columnMapping.mode": "name",
                       "delta.constraints.small_i": "i < 10"},
    )
    w.rename_column("x", "y")
    ok = spark.createDataFrame([(1, 2.0)], "i long, y double")
    w.append(ok)
    bad = spark.createDataFrame([(99, 2.0)], "i long, y double")
    with pytest.raises(errors.ConstraintViolationError):
        w.append(bad)


def test_alter_column_type_narrowing_refused(spark, tdir):
    """Narrowing (or any non-widening cast) refuses at ALTER time with
    the exact spec-pointing message — committing would corrupt reads of
    files whose physical type no longer fits the declared one."""
    w = DeltaWriter.create(spark, tdir, SCHEMA)  # i long, g long, x double
    with pytest.raises(errors.SchemaError) as ei:
        w.alter_column_type("i", "int")
    _golden(
        ei,
        "SchemaError: ALTER COLUMN 'i' TYPE: long -> integer is not an "
        "allowed widening (Delta typeWidening spec)",
    )
