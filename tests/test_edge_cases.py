"""Edge cases the reference tests explicitly: url-encoded partition values,
timestamp/IN pushdown (which we support beyond the reference's matrix),
empty tables, null partitions.

Reference analogues: url_encoded_path tests, file_skipping_all_types.test,
null partition serialization (delta_insert.cpp:222-223).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter


def test_url_encoded_partition_values_roundtrip(spark, tdir):
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    w = DeltaWriter.create(spark, tdir, schema, partition_by=["k"])
    data = spark.createDataFrame(
        [("plain", 1), ("with space", 2), ("a=b", 3), ("pct%20", 4), (None, 5)],
        schema,
    )
    w.append(data.coalesce(1))

    t = DeltaTable(tdir)
    # log keeps decoded values; null serializes as missing/empty
    vals = {f.partition_values.get("k") for f in t.snapshot.add_files()}
    assert {"plain", "with space", "a=b", "pct%20", None} == vals

    got = {(r["k"], r["v"]) for r in t.to_df(spark).collect()}
    assert got == {("plain", 1), ("with space", 2), ("a=b", 3), ("pct%20", 4), (None, 5)}

    # partition pruning on the funky value
    sb = t.scan(spark).filter("k", "=", "a=b")
    assert [r["v"] for r in sb.to_df().collect()] == [3]
    assert sb.skip_report()["files_skipped_by_partition"] > 0
    # IS NULL finds the hive default partition
    sbn = t.scan(spark).filter("k", "is null")
    assert [r["v"] for r in sbn.to_df().collect()] == [5]


def test_timestamp_and_in_pushdown_beyond_reference(spark, tdir):
    """The reference cannot push timestamps or IN() (delta-kernel-rs#1002,
    SURVEY.md §2B); our stats evaluator handles both."""
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("i", T.LongType())]
    )
    w = DeltaWriter.create(spark, tdir, schema)
    base = dt.datetime(2024, 1, 1)
    for day in range(4):
        rows = [(base + dt.timedelta(days=day, minutes=m), day * 100 + m) for m in range(10)]
        w.append(spark.createDataFrame(rows, schema).coalesce(1))

    t = DeltaTable(tdir)
    sb = t.scan(spark).filter("ts", ">=", dt.datetime(2024, 1, 4))
    assert sb.to_df().count() == 10
    assert sb.skip_report()["files_skipped_by_stats"] == 3

    sb2 = t.scan(spark).filter("i", "in", [0, 1, 305])
    assert sb2.to_df().count() == 3
    assert sb2.skip_report()["files_skipped_by_stats"] == 2


def test_empty_table_scan(spark, tdir):
    schema = T.StructType([T.StructField("i", T.LongType())])
    DeltaWriter.create(spark, tdir, schema)
    df = DeltaTable(tdir).to_df(spark)
    assert df.count() == 0
    assert df.schema.fieldNames() == ["i"]


def test_column_mapping_blocks_append(spark, tdir):
    """Appends to column-mapped tables are unsupported (mirrors the
    reference's writer scope: blind appends to plain tables)."""
    from duckdb_delta_spark import errors
    from duckdb_delta_spark.testing.fixtures import ensure_fixtures

    root = ensure_fixtures(spark, "/root/testdata/sf0.001")
    with pytest.raises(errors.UnsupportedFeatureError):
        DeltaWriter(f"{root}/part_cm", spark).append(
            spark.createDataFrame([(1, "b", 1.0)], "p_partkey long, p_brand string, p_retailprice double")
        )


def test_log_tail_injection_skips_listing(spark, tdir, monkeypatch):
    """CCv2-style log_tail: snapshot resolution from caller-supplied commit
    paths, no directory LIST (reference: delta_utils.cpp:884-888)."""
    import os

    schema = T.StructType([T.StructField("i", T.LongType())])
    w = DeltaWriter.create(spark, tdir, schema)
    w.append(spark.range(7).select(F.col("id").alias("i")))

    tail = [
        os.path.join(tdir, "_delta_log", f"{v:020d}.json") for v in (0, 1)
    ]

    real_listdir = os.listdir

    def no_list(path):
        assert not str(path).endswith("_delta_log"), "log dir was listed"
        return real_listdir(path)

    monkeypatch.setattr(os, "listdir", no_list)
    t = DeltaTable(tdir, log_tail=tail)
    assert t.version == 1
    assert t.to_df(spark).count() == 7
