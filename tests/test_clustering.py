"""Clustered tables (Delta spec "Clustered Table" / liquid clustering):
delta.clustering domain metadata, clustering+domainMetadata writer features,
OPTIMIZE clustering on the declared columns without being told."""
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
from duckdb_delta_spark.delta.table import DeltaTable  # noqa: E402
from duckdb_delta_spark.delta.writer import DeltaWriter  # noqa: E402

SCHEMA = T.StructType([
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("s", T.StringType()),
])


def _rows(spark, n=400, seed=0):
    # x ascending, y descending: interleaved appends leave every file
    # wide on both axes until OPTIMIZE clusters
    return spark.range(n).select(
        (F.col("id") + seed).alias("x"),
        (F.lit(n) - F.col("id")).alias("y"),
        F.concat(F.lit("s"), F.col("id") % 7).alias("s"),
    )


def test_create_clustered_metadata_shape(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA, cluster_by=["x", "y"])
    snap = DeltaTable(tdir).snapshot
    feats = snap.protocol["writerFeatures"]
    assert "clustering" in feats and "domainMetadata" in feats
    cfg = json.loads(snap.domain_metadata["delta.clustering"])
    assert cfg["clusteringColumns"] == [["x"], ["y"]]
    assert snap.clustering_columns == ["x", "y"]


def test_optimize_clusters_on_declared_columns(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA, cluster_by=["x", "y"])
    # shuffled appends: each file spans nearly the full x/y range
    for k in range(4):
        w.append(
            _rows(spark).orderBy(F.md5(F.concat(F.col("x"), F.lit(k))))
            .coalesce(1))
    v = w.compact(target_file_bytes=6 << 10)
    assert v is not None
    # commitInfo records the applied clustering
    from duckdb_delta_spark.delta.log import DeltaLog

    ci = [a for a in DeltaLog(tdir).read_commit(v) if "commitInfo" in a][0]
    assert json.loads(
        ci["commitInfo"]["operationParameters"]["clusterBy"]) == ["x", "y"]
    # post-OPTIMIZE, stats skipping prunes on BOTH clustering columns
    for col in ("x", "y"):
        sb = DeltaTable(tdir).scan(spark).filter(col, "<", 50)
        sb.to_df().count()
        rep = sb.skip_report()
        assert rep["files_skipped_by_stats"] > 0, (col, rep)


def test_single_string_cluster_column_falls_back_to_sort(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA, cluster_by=["s"])
    for _ in range(3):
        w.append(_rows(spark).coalesce(1))
    v = w.compact(target_file_bytes=6 << 10)
    assert v is not None
    sb = DeltaTable(tdir).scan(spark).filter("s", "=", "s3")
    sb.to_df().count()
    assert sb.skip_report()["files_skipped_by_stats"] > 0


def test_set_cluster_by_upgrades_and_applies(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_rows(spark).coalesce(1))
    assert DeltaTable(tdir).snapshot.clustering_columns == []
    w.set_cluster_by(["x", "y"])
    snap = DeltaTable(tdir).snapshot
    assert "clustering" in snap.protocol["writerFeatures"]
    assert snap.clustering_columns == ["x", "y"]
    w.set_cluster_by([])  # CLUSTER BY NONE
    assert DeltaTable(tdir).snapshot.clustering_columns == []


def test_refusals(spark, tdir):
    with pytest.raises(UnsupportedFeatureError, match="mutually exclusive"):
        DeltaWriter.create(
            spark, tdir + "_a", SCHEMA, partition_by=["s"], cluster_by=["x"])
    with pytest.raises(SchemaError, match="zz"):
        DeltaWriter.create(spark, tdir + "_b", SCHEMA, cluster_by=["zz"])
    with pytest.raises(UnsupportedFeatureError, match="at most 4"):
        DeltaWriter.create(
            spark, tdir + "_c",
            T.StructType([T.StructField(c, T.LongType())
                          for c in "abcde"]),
            cluster_by=list("abcde"))
    w = DeltaWriter.create(spark, tdir, SCHEMA, partition_by=["s"])
    with pytest.raises(UnsupportedFeatureError, match="partitioned"):
        w.set_cluster_by(["x"])


def test_explicit_zorder_still_wins_over_declared(spark, tdir):
    """Explicit OPTIMIZE args override the declared clustering columns."""
    w = DeltaWriter.create(spark, tdir, SCHEMA, cluster_by=["x", "y"])
    for _ in range(3):
        w.append(_rows(spark).coalesce(1))
    v = w.compact(target_file_bytes=6 << 10, sort_by=["s"])
    assert v is not None
    from duckdb_delta_spark.delta.log import DeltaLog

    ci = [a for a in DeltaLog(tdir).read_commit(v) if "commitInfo" in a][0]
    assert "clusterBy" not in ci["commitInfo"]["operationParameters"]


def test_clustering_on_column_mapped_table(spark, tdir):
    """set_cluster_by on a MAPPED table: domain metadata records PHYSICAL
    names (spec), snapshot maps them back to logical, and OPTIMIZE
    clusters + prunes through the mapping."""
    w = DeltaWriter.create(
        spark, tdir, SCHEMA,
        configuration={"delta.columnMapping.mode": "name"})
    for _ in range(3):
        w.append(_rows(spark).coalesce(1))
    w.set_cluster_by(["x", "y"])
    snap = DeltaTable(tdir).snapshot
    cfg = json.loads(snap.domain_metadata["delta.clustering"])
    phys_x = snap.schema["x"].metadata["delta.columnMapping.physicalName"]
    assert cfg["clusteringColumns"][0] == [phys_x]  # physical in the log
    assert snap.clustering_columns == ["x", "y"]    # logical at the API
    v = w.compact(target_file_bytes=6 << 10)
    assert v is not None
    sb = DeltaTable(tdir).scan(spark).filter("x", "<", 100)
    sb.to_df().count()
    assert sb.skip_report()["files_skipped_by_stats"] > 0
