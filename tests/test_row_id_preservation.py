"""Preserved row ids through OPTIMIZE (Delta spec "Row Tracking": a
dataChange=false rewrite must keep row ids stable — materialized row-id /
row-commit-version columns, config-named, reader-coalesced)."""
from __future__ import annotations

import glob
import sys

import pytest
from pyspark.sql import functions as F, types as T

sys.path.insert(0, "/root/repo")

from duckdb_delta_spark.delta.table import DeltaTable  # noqa: E402
from duckdb_delta_spark.delta.writer import DeltaWriter  # noqa: E402

SCHEMA = T.StructType([
    T.StructField("i", T.LongType()),
    T.StructField("s", T.StringType()),
])


def _ids(spark, n, lo=0):
    return (
        spark.range(lo, lo + n)
        .select(F.col("id").alias("i"),
                F.concat(F.lit("v"), F.col("id")).alias("s"))
        .orderBy("i")
        .coalesce(1)
    )


def _rid_map(spark, path):
    df = DeltaTable(path).scan(spark).with_row_ids().to_df()
    return {r.i: r._row_id for r in df.select("i", "_row_id").collect()}


def test_compact_preserves_row_ids(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, SCHEMA,
        configuration={"delta.enableRowTracking": "true"})
    for k in range(3):
        w.append(_ids(spark, 25, lo=25 * k))
    before = _rid_map(spark, tdir)
    assert before == {i: i for i in range(75)}  # sorted single-file appends

    v = w.compact(target_file_bytes=1 << 30)
    assert v is not None
    snap = DeltaTable(tdir).snapshot
    assert len(snap.add_files()) == 1  # 3 files binned into one
    after = _rid_map(spark, tdir)
    assert after == before, "row ids must survive a dataChange=false rewrite"

    # config names the materialized columns; the rewritten file physically
    # carries them
    mat_id, mat_ver = snap.materialized_row_id_cols
    assert mat_id and mat_ver
    raw = spark.read.parquet(
        *[f.absolute_path(tdir) for f in snap.add_files()])
    assert mat_id in raw.columns and mat_ver in raw.columns
    # commit versions preserved too: all rows came from commits 1..3
    vers = {r[0] for r in raw.select(f"`{mat_ver}`").distinct().collect()}
    assert vers == {1, 2, 3}


def test_zorder_compact_preserves_row_ids_across_reorder(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, T.StructType([
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType()),
        ]),
        configuration={"delta.enableRowTracking": "true"})
    for k in range(3):
        w.append(
            spark.range(200).select(
                (F.col("id") + 200 * k).alias("x"),
                (599 - F.col("id") - 200 * k).alias("y"),
            ).orderBy("x").coalesce(1))
    df = DeltaTable(tdir).scan(spark).with_row_ids().to_df()
    before = {r.x: r._row_id for r in df.select("x", "_row_id").collect()}
    assert w.compact(target_file_bytes=4 << 10, zorder_by=["x", "y"]) is not None
    df = DeltaTable(tdir).scan(spark).with_row_ids().to_df()
    after = {r.x: r._row_id for r in df.select("x", "_row_id").collect()}
    assert after == before


def test_delete_after_compact_keeps_surviving_ids(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, SCHEMA,
        configuration={"delta.enableRowTracking": "true"})
    for k in range(2):
        w.append(_ids(spark, 20, lo=20 * k))
    w.compact(target_file_bytes=1 << 30)
    w.delete("i % 4 = 0")
    after = _rid_map(spark, tdir)
    assert after == {i: i for i in range(40) if i % 4 != 0}


def test_second_compact_coalesces_existing_materialized_ids(spark, tdir):
    w = DeltaWriter.create(
        spark, tdir, SCHEMA,
        configuration={"delta.enableRowTracking": "true"})
    w.append(_ids(spark, 10))
    w.compact(target_file_bytes=1 << 30)  # materializes ids 0..9
    w.append(_ids(spark, 10, lo=10))  # fresh file, ids 10..19 via baseRowId
    before = _rid_map(spark, tdir)
    assert before == {i: i for i in range(20)}
    v = w.compact(target_file_bytes=1 << 30)  # mixes materialized + fresh
    assert v is not None
    assert _rid_map(spark, tdir) == before
    # config committed once; names stable across the second rewrite
    snap = DeltaTable(tdir).snapshot
    mat_id, _ = snap.materialized_row_id_cols
    assert mat_id is not None
