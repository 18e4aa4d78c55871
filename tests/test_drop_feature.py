"""REORG PURGE + ALTER TABLE DROP FEATURE: DV materialization and
protocol downgrade (delta-spark parity, pragmatic subset)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter
from duckdb_delta_spark.delta.errors import UnsupportedFeatureError

SCHEMA = T.StructType([T.StructField("i", T.LongType()),
                       T.StructField("g", T.LongType())])


def _mk(spark, tdir, n=100):
    w = DeltaWriter.create(spark, tdir, SCHEMA, partition_by=["g"])
    w.append(spark.range(n).select(F.col("id").alias("i"),
                                   (F.col("id") % 2).alias("g")))
    return w


def test_reorg_purge_materializes_dvs(spark, tdir):
    _mk(spark, tdir)
    DeltaTable(tdir).delete(spark, "i % 10 = 0")  # DVs on every file
    snap = DeltaTable(tdir).snapshot
    assert any(f.deletion_vector for f in snap.add_files())

    v = DeltaWriter(tdir, spark).reorg_purge()
    assert v is not None
    t = DeltaTable(tdir)
    assert not any(f.deletion_vector for f in t.snapshot.add_files())
    got = sorted(r["i"] for r in t.to_df(spark).collect())
    assert got == [i for i in range(100) if i % 10 != 0]
    # rows unchanged logically → dataChange: false on adds AND removes
    import json as _json

    from duckdb_delta_spark.delta.log import DeltaLog

    acts = DeltaLog(tdir).read_commit(v)
    for a in acts:
        if "add" in a:
            assert a["add"]["dataChange"] is False
        if "remove" in a:
            assert a["remove"]["dataChange"] is False
            assert a["remove"].get("deletionVector")  # replaced DV carried
    # purge on a clean table is a no-op
    assert DeltaWriter(tdir, spark).reorg_purge() is None


def test_drop_feature_deletion_vectors(spark, tdir):
    _mk(spark, tdir)
    DeltaTable(tdir).delete(spark, "i < 5")
    w = DeltaWriter(tdir, spark)
    with pytest.raises(UnsupportedFeatureError, match="reorg_purge"):
        w.drop_feature("deletionVectors")
    w.reorg_purge()
    v = DeltaWriter(tdir, spark).drop_feature("deletionVectors")
    t = DeltaTable(tdir)
    proto = t.snapshot.protocol
    assert "deletionVectors" not in (proto.get("readerFeatures") or [])
    assert "deletionVectors" not in (proto.get("writerFeatures") or [])
    assert t.to_df(spark).count() == 95
    # a checkpoint was cut at the downgraded version
    assert any(f.startswith(f"{v:020d}.checkpoint")
               for f in os.listdir(os.path.join(tdir, "_delta_log")))
    # a fresh DELETE re-upgrades the protocol (feature re-added on use)
    DeltaTable(tdir).delete(spark, "i = 50")
    proto2 = DeltaTable(tdir).snapshot.protocol
    assert "deletionVectors" in (proto2.get("writerFeatures") or [])


def test_drop_feature_guards(spark, tdir):
    w = _mk(spark, tdir)
    with pytest.raises(UnsupportedFeatureError, match="does not declare"):
        w.drop_feature("deletionVectors")
    w.add_constraint("pos", "i >= 0")
    w2 = DeltaWriter(tdir, spark)
    with pytest.raises(UnsupportedFeatureError, match="constraints exist"):
        w2.drop_feature("checkConstraints")
    w2.drop_constraint("pos")
    DeltaWriter(tdir, spark).drop_feature("checkConstraints")
    proto = DeltaTable(tdir).snapshot.protocol
    # legacy-implied feature drop = legacy writer-version downgrade
    assert proto["minWriterVersion"] == 2
    # arbitrary features refuse
    with pytest.raises(UnsupportedFeatureError):
        DeltaWriter(tdir, spark).drop_feature("invariants")


def test_optimize_where_partition_filtered(spark, tdir):
    """OPTIMIZE ... WHERE: only matching partitions compact; files in
    non-matching partitions are untouched, and a predicate on a
    non-partition column fails loudly."""
    w = DeltaWriter.create(spark, tdir, SCHEMA, partition_by=["g"])
    for lo in (0, 50, 100):  # 3 commits x 2 partitions = small files
        w.append(spark.range(lo, lo + 50).select(
            F.col("id").alias("i"), (F.col("id") % 2).alias("g")))
    before = {f.path: f for f in DeltaTable(tdir).snapshot.add_files()}
    g1_before = [p for p, f in before.items()
                 if f.partition_values.get("g") == "1"]

    v = DeltaWriter(tdir, spark).compact(where="g = 0")
    assert v is not None
    after = {f.path: f for f in DeltaTable(tdir).snapshot.add_files()}
    # g=1 files byte-identical, untouched
    assert [p for p in g1_before if p in after] == g1_before
    # g=0 compacted into fewer files
    g0_after = [f for f in after.values()
                if f.partition_values.get("g") == "0"]
    assert len(g0_after) < 3
    assert DeltaTable(tdir).to_df(spark).count() == 150

    import pytest as _pt

    from duckdb_delta_spark.delta.errors import UnsupportedFeatureError

    with _pt.raises(Exception):  # non-partition column fails resolution
        DeltaWriter(tdir, spark).compact(where="i > 10")

    plain = str(tdir) + "_plain"
    DeltaWriter.create(spark, plain, SCHEMA)
    with _pt.raises(UnsupportedFeatureError, match="partitioned"):
        DeltaWriter(plain, spark).compact(where="g = 0")


def test_generate_symlink_manifest(spark, tdir):
    """GENERATE symlink_format_manifest: per-partition manifest files
    listing the snapshot's data files as URIs; all listed files are the
    live set (readable as plain parquet); DV tables refuse."""
    import urllib.parse

    w = DeltaWriter.create(spark, tdir, SCHEMA, partition_by=["g"])
    w.append(spark.range(100).select(F.col("id").alias("i"),
                                     (F.col("id") % 2).alias("g")))
    written = DeltaWriter(tdir, spark).generate_symlink_manifest()
    assert len(written) == 2  # one per partition dir
    assert all(p.endswith("manifest") for p in written)
    uris = []
    for p in written:
        assert "_symlink_format_manifest/g=" in p.replace("\\", "/")
        with open(p) as fh:
            uris += [ln.strip() for ln in fh if ln.strip()]
    paths = [urllib.parse.unquote(u.removeprefix("file://")) for u in uris]
    live = {f.absolute_path(tdir) for f in DeltaTable(tdir).snapshot.add_files()}
    assert set(paths) == live
    # the manifest's files ARE the table, readable raw
    assert spark.read.parquet(*paths).count() == 100

    DeltaTable(tdir).delete(spark, "i = 3")
    with pytest.raises(UnsupportedFeatureError, match="deletion"):
        DeltaWriter(tdir, spark).generate_symlink_manifest()
    # after purge it regenerates (stale dirs cleared)
    DeltaWriter(tdir, spark).reorg_purge()
    again = DeltaWriter(tdir, spark).generate_symlink_manifest()
    paths2 = []
    for p in again:
        with open(p) as fh:
            paths2 += [urllib.parse.unquote(ln.strip().removeprefix("file://"))
                       for ln in fh if ln.strip()]
    assert spark.read.parquet(*paths2).count() == 99


def test_auto_compact_after_append(spark, tdir):
    """delta.autoOptimize.autoCompact: once a partition crosses
    minNumFiles small files, the append triggers an inline OPTIMIZE
    commit (dataChange=false); without the property nothing happens."""
    from duckdb_delta_spark.delta.log import DeltaLog

    w = DeltaWriter.create(
        spark, tdir, SCHEMA,
        configuration={"delta.autoOptimize.autoCompact": "true",
                       "delta.autoOptimize.minNumFiles": "4"})
    for lo in range(3):
        w.append(spark.range(lo * 10, lo * 10 + 10).select(
            F.col("id").alias("i"), F.lit(0).cast("long").alias("g"))
            .coalesce(1))
    # 3 files < minNumFiles: no compaction yet
    assert DeltaTable(tdir).snapshot.version == 3
    w.append(spark.range(30, 40).select(
        F.col("id").alias("i"), F.lit(0).cast("long").alias("g"))
        .coalesce(1))
    t = DeltaTable(tdir)
    assert t.snapshot.version == 5  # append (v4) + auto OPTIMIZE (v5)
    ops = [a["commitInfo"]["operation"]
           for a in DeltaLog(tdir).read_commit(5) if "commitInfo" in a]
    assert ops == ["OPTIMIZE"]
    assert len(t.snapshot.files) == 1  # 4 smalls packed into one
    assert t.to_df(spark).count() == 40

    # opt-out table: no auto commit
    plain = str(tdir) + "_p"
    w2 = DeltaWriter.create(spark, plain, SCHEMA)
    for lo in range(5):
        w2.append(spark.range(lo, lo + 1).select(
            F.col("id").alias("i"), F.lit(0).cast("long").alias("g"))
            .coalesce(1))
    assert DeltaTable(plain).snapshot.version == 5


def test_drop_feature_truncate_history(spark, tdir):
    """DROP FEATURE ... TRUNCATE HISTORY: the downgrade commit declares
    checkpointProtection + requireCheckpointProtectionBeforeVersion, and
    history below the fresh checkpoint is expired immediately."""
    from duckdb_delta_spark.delta.log import DeltaLog

    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(spark.range(10).select(F.col("id").alias("i"),
                                    (F.col("id") % 2).alias("g")))
    w.add_constraint("i_pos", "i >= 0")
    w.drop_constraint("i_pos")
    v = DeltaWriter(tdir, spark).drop_feature(
        "checkConstraints", truncate_history=True)
    t = DeltaTable(tdir)
    proto = t.snapshot.protocol
    assert "checkConstraints" not in (proto.get("writerFeatures") or [])
    assert "checkpointProtection" in proto["writerFeatures"]
    assert t.snapshot.configuration[
        "delta.requireCheckpointProtectionBeforeVersion"] == str(v)
    # pre-downgrade commits are gone; replay starts at the checkpoint
    log = DeltaLog(tdir)
    commits, _ = log.list_log_files()
    assert min(commits) >= v
    assert t.to_df(spark).count() == 10


def test_checkpoint_protection_blocks_partial_cleanup(spark, tdir):
    """A partial sweep below requireCheckpointProtectionBeforeVersion is
    refused outright; a sweep reaching the boundary proceeds."""
    from duckdb_delta_spark.delta.log import DeltaLog

    w = DeltaWriter.create(spark, tdir, SCHEMA, configuration={
        "delta.requireCheckpointProtectionBeforeVersion": "4"})
    # declare the feature explicitly
    snap = DeltaTable(tdir).snapshot
    assert "4" == snap.configuration[
        "delta.requireCheckpointProtectionBeforeVersion"]
    for k in range(4):
        w.append(spark.range(2).select(F.col("id").alias("i"),
                                       (F.col("id") % 2).alias("g")))
    w.checkpoint()  # ckpt at v4

    import json, os
    # inject checkpointProtection into the protocol via a commit
    log = DeltaLog(tdir)
    proto = DeltaTable(tdir).snapshot.protocol
    wf = sorted(set(proto.get("writerFeatures") or []) |
                {"checkpointProtection"})
    log.commit(5, [{"protocol": {**proto, "writerFeatures": wf}}])

    # age only commits 0..2 (mtime), keep v3 young: horizon 3 < 4 → refuse
    now = __import__("time").time()
    for v in range(3):
        p = os.path.join(tdir, "_delta_log", f"{v:020d}.json")
        os.utime(p, (now - 90 * 86400, now - 90 * 86400))
    assert DeltaWriter(tdir, spark).cleanup_expired_logs(
        retention_ms=30 * 86400 * 1000) == []

    # full sweep (retention 0): horizon reaches the checkpoint ≥ 4 → runs
    deleted = DeltaWriter(tdir, spark).cleanup_expired_logs(retention_ms=0)
    assert deleted
    commits, _ = DeltaLog(tdir).list_log_files()
    assert min(commits) >= 4
    assert DeltaTable(tdir).to_df(spark).count() == 8
