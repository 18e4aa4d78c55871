"""Round-16 robustness fixes: protocol spec validation, CDF rename/drop
refusal, sink appId migration, NOT NULL exact-check rollback.

Delta spec anchors: reader version 3 requires writer version 7
(PROTOCOL.md table-features rules); delta-spark raises
DELTA_NON_ADDITIVE_SCHEMA_CHANGE for CDF ranges crossing a rename/drop.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter, errors
from duckdb_delta_spark.delta.changes import table_changes
from duckdb_delta_spark.delta.log import DeltaLog

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _sink_file_msg(tdir, k=90):
    """A real one-row parquet in the table dir + its commit message — the
    sink SKIPS empty batches since r19 (idle-stream log growth), so tests
    of the COMMIT machinery must carry a file like every real batch."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_delta_spark.streaming.delta_source import _WrittenFile

    name = f"part-sinktest-{_uuid.uuid4().hex}.parquet"
    pq.write_table(
        pa.table({"k": pa.array([k], pa.int64()),
                  "v": pa.array([f"s{k}"], pa.string())}),
        f"{tdir}/{name}")
    return _WrittenFile(rel_path=name, size=os.path.getsize(f"{tdir}/{name}"))


def _mk(spark, path, n=6, configuration=None):
    w = DeltaWriter.create(spark, path, SCHEMA, configuration=configuration)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(n)], SCHEMA)
    w.append(df.coalesce(1))
    return w


def test_upgrade_protocol_reader3_forces_writer7(spark, tdir):
    """upgrade_protocol(3, w<7) must not commit a spec-invalid protocol:
    reader version 3 (readerFeatures) REQUIRES writer version 7
    (writerFeatures). delta-spark's upgradeTableProtocol enforces the
    same coupling."""
    w = _mk(spark, tdir)
    w.upgrade_protocol(3, 2)
    proto = DeltaTable(tdir).snapshot.protocol
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "readerFeatures" in proto and "writerFeatures" in proto
    # the table still reads and writes under the upgraded protocol
    DeltaWriter(tdir, spark).append(
        spark.createDataFrame([(100, "x")], SCHEMA).coalesce(1))
    assert DeltaTable(tdir).to_df(spark).count() == 7


def test_cdf_refuses_rename_inside_range(spark, tdir):
    """table_changes over a range crossing a column-mapping RENAME must
    raise (delta-spark non-additive-schema-change parity) — null-filling
    would silently return NULL for rows that have values under the old
    logical name. Sub-ranges on either side of the rename still work."""
    w = _mk(spark, tdir, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })
    rename_v = w.rename_column("v", "label")
    w.append(spark.createDataFrame(
        [(100, "post")],
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("label", T.StringType())])).coalesce(1))
    log = DeltaLog(tdir)
    with pytest.raises(errors.SchemaError, match="renamed"):
        table_changes(log, spark, starting_version=0).collect()
    # sub-range strictly before the rename: fine, served under old name
    pre = table_changes(log, spark, starting_version=-1,
                        ending_version=rename_v - 1)
    assert set(pre.columns) >= {"k", "v"}
    assert pre.count() == 6
    # sub-range from the rename onward: fine, served under new name
    # (exclusive start must sit AT the rename: version rename_v-1's
    # schema still governs delete reads at prev, so it is in scope)
    post = table_changes(log, spark, starting_version=rename_v)
    assert "label" in post.columns
    assert post.count() == 1


def test_cdf_refuses_drop_inside_range(spark, tdir):
    """Same for DROP COLUMN: pre-drop rows carry values the end schema
    cannot represent — raise, never silently discard."""
    w = _mk(spark, tdir, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })
    w.drop_column("v")
    with pytest.raises(errors.SchemaError, match="dropped"):
        table_changes(DeltaLog(tdir), spark, starting_version=0).collect()


def test_cdf_widen_still_allowed(spark, tdir):
    """Pure widening (ADD column) keeps null-filling — the r15 behavior
    the rename/drop check must not break."""
    w = _mk(spark, tdir, n=3)
    w.add_column("extra", "bigint")
    w.append(spark.createDataFrame(
        [(9, "z", 42)],
        T.StructType(list(SCHEMA.fields)
                     + [T.StructField("extra", T.LongType())])).coalesce(1))
    rows = table_changes(DeltaLog(tdir), spark, starting_version=-1).collect()
    got = sorted((r["k"], r["extra"]) for r in rows)
    assert got == [(0, None), (1, None), (2, None), (9, 42)]


def test_sink_legacy_appid_migration(spark, tdir, tmp_path):
    """Opt-in legacyTxnAppIdMigration: a pipeline whose last batch was
    committed under the pre-upgrade table-path appId resumes under the
    checkpoint-keyed appId without re-committing that batch."""
    from duckdb_delta_spark.delta.snapshot import Snapshot
    from duckdb_delta_spark.streaming.delta_source import DeltaStreamWriter

    w = _mk(spark, tdir, n=0)
    # simulate the pre-upgrade sink: a commit carrying the LEGACY
    # table-path appId at batch 3
    legacy = f"delta_py_sink:{os.path.abspath(tdir)}"
    w.append(
        spark.createDataFrame([(1, "a")], SCHEMA).coalesce(1),
        txn_app_id=legacy, txn_version=3,
    )
    before = DeltaTable(tdir).to_df(spark).count()

    ck = str(tmp_path / "ck")

    def _writer(opts):
        return DeltaStreamWriter(
            tdir, SCHEMA,
            {"checkpointlocation": ck, **opts},
        )

    # replayed batch 3 WITHOUT the option: new appId has no txn, batch
    # re-commits (the documented caveat)
    s0 = _writer({})
    assert s0.app_id.endswith(ck)
    snap = Snapshot.build(DeltaLog(tdir))
    assert snap.transaction_version(s0.app_id) is None
    assert s0._legacy_app_id is None

    # WITH the option: the legacy version is consulted → batch 3 is
    # recognized as committed and skipped
    s1 = _writer({"legacyTxnAppIdMigration": "true"})
    assert s1._legacy_app_id == legacy
    s1.commit([], batchId=3)
    assert DeltaTable(tdir).to_df(spark).count() == before
    # version 3 was NOT re-committed: no new commit landed
    assert DeltaTable(tdir).snapshot.version == snap.version

    # an explicit txnAppId disables the migration seam entirely
    s2 = DeltaStreamWriter(
        tdir, SCHEMA,
        {"checkpointlocation": ck, "legacyTxnAppIdMigration": "true",
         "txnAppId": "mine"})
    assert s2._legacy_app_id is None


def test_struct_nulls_exact_rolls_back_on_read_error(spark, tdir, monkeypatch):
    """If the NOT NULL exact read-back itself fails (corrupt file), the
    staged files must be rolled back, not leaked as orphans."""
    schema = T.StructType([
        T.StructField("s", T.StructType([
            T.StructField("a", T.LongType(), True),
        ]), False),
    ])
    w = DeltaWriter.create(spark, tdir, schema)
    import pyarrow.parquet as pq

    def boom(*a, **k):
        raise OSError("corrupt footer")

    monkeypatch.setattr(pq, "read_table", boom)
    # struct present, leaf NULL: the stats cheap-proof (any zero-null
    # leaf) cannot decide, forcing the exact pyarrow read-back
    df = spark.createDataFrame([((None,),)], schema)
    with pytest.raises(OSError, match="corrupt"):
        w.append(df.coalesce(1))
    # no orphan parquet outside the log: the staged file was unlinked
    leftover = [
        f for f in os.listdir(tdir)
        if f.endswith(".parquet")
    ]
    assert leftover == []


# ---------- racing writers: ConflictChecker-style re-validation ----------


def _two_file_table(spark, path):
    """k 0..4 in file 1, k 10..14 in file 2."""
    w = DeltaWriter.create(spark, path, SCHEMA)
    w.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], SCHEMA).coalesce(1))
    w.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(10, 15)], SCHEMA).coalesce(1))
    return w


def test_update_retries_past_disjoint_append(spark, tdir):
    """append ∥ UPDATE with a condition the appended rows do NOT match:
    the update loses the version race, re-validates, and commits —
    delta-spark ConflictChecker availability."""
    w1 = _mk(spark, tdir, n=10)
    w2 = DeltaWriter(tdir, spark)  # stale snapshot
    w1.append(spark.createDataFrame(
        [(100 + i, "z") for i in range(3)], SCHEMA).coalesce(1))
    v, n = w2.update("k < 5", {"v": "'upd'"})
    assert n == 5
    t = DeltaTable(tdir).to_df(spark)
    assert t.count() == 13
    assert t.where("v = 'upd'").count() == 5


def test_update_conflicts_on_matching_append(spark, tdir):
    """append ∥ UPDATE where the appended rows MATCH the condition: the
    retry would silently skip them → loud conflict (delta-spark
    ConcurrentAppendException analogue)."""
    w1 = _mk(spark, tdir, n=10)
    w2 = DeltaWriter(tdir, spark)
    w1.append(spark.createDataFrame([(1, "dup")], SCHEMA).coalesce(1))
    with pytest.raises(errors.CommitConflictError, match="added rows"):
        w2.update("k < 5", {"v": "'upd'"})
    # nothing half-applied: no DV landed, racer's row intact
    t = DeltaTable(tdir).to_df(spark)
    assert t.count() == 11
    assert t.where("v = 'upd'").count() == 0


def test_update_update_disjoint_files_both_commit(spark, tdir):
    """UPDATE ∥ UPDATE touching DIFFERENT files: the loser re-validates
    (its file untouched, the winner's new images don't match its
    condition) and commits. The DV protocol is pre-enabled: on a LEGACY
    table the winner's first materialized DV carries a protocol action,
    which (delta-spark ProtocolChangedException parity) correctly
    conflicts the loser — steady state is what commutes."""
    w = _two_file_table(spark, tdir)
    w.add_feature_support("deletionVectors")
    w1 = DeltaWriter(tdir, spark)
    w2 = DeltaWriter(tdir, spark)
    w1.update("k = 1", {"v": "'a'"})
    v, n = w2.update("k = 11", {"v": "'b'"})
    assert n == 1
    got = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got[1] == "a" and got[11] == "b"


def test_update_update_same_file_conflicts(spark, tdir):
    """UPDATE ∥ UPDATE touching the SAME file: the loser's DV was built
    against the old mask → loud conflict, no silent lost update."""
    w1 = _mk(spark, tdir, n=10)
    w2 = DeltaWriter(tdir, spark)
    w1.update("k = 1", {"v": "'a'"})
    with pytest.raises(errors.CommitConflictError):
        w2.update("k = 2", {"v": "'b'"})
    got = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got[1] == "a" and got[2] == "v2"  # winner applied, loser not


def test_update_retries_past_full_file_delete(spark, tdir):
    """full-file DELETE ∥ UPDATE on the other file: the delete commits a
    remove-only action (no adds), the update's file is untouched →
    retry commits."""
    _two_file_table(spark, tdir)
    w1 = DeltaWriter(tdir, spark)
    w2 = DeltaWriter(tdir, spark)
    w1.delete("k < 5")  # whole file 1 → remove only
    v, n = w2.update("k = 11", {"v": "'b'"})
    assert n == 1
    t = DeltaTable(tdir).to_df(spark)
    assert t.count() == 5
    assert t.where("v = 'b'").count() == 1


def test_merge_conflicts_on_concurrent_append(spark, tdir):
    """append ∥ MERGE: merge's read set depends on the source join, so
    any concurrently added data file conflicts (conservative)."""
    w1 = _mk(spark, tdir, n=5)
    w2 = DeltaWriter(tdir, spark)
    w1.append(spark.createDataFrame([(50, "r")], SCHEMA).coalesce(1))
    src = spark.createDataFrame([(1, "upd"), (99, "new")], SCHEMA)
    with pytest.raises(errors.CommitConflictError, match="added"):
        w2.merge(src, "t.k = s.k", when_matched_update={"v": "s.v"})


def test_merge_retries_past_full_file_delete(spark, tdir):
    """remove-only DELETE ∥ MERGE on the other file: no added files, no
    metadata change, merge's touched files intact → retry commits."""
    _two_file_table(spark, tdir)
    w1 = DeltaWriter(tdir, spark)
    w2 = DeltaWriter(tdir, spark)
    w1.delete("k < 5")
    src = spark.createDataFrame([(11, "upd")], SCHEMA)
    out = w2.merge(src, "t.k = s.k", when_matched_update={"v": "s.v"},
                   when_not_matched_insert=False)
    assert out is not None
    got = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got[11] == "upd" and 1 not in got


def test_update_conflicts_on_metadata_change(spark, tdir):
    """property/schema change ∥ UPDATE: new images were validated under
    the old metadata → loud conflict."""
    w1 = _mk(spark, tdir, n=5)
    w2 = DeltaWriter(tdir, spark)
    w1.set_properties({"delta.appendOnly": "false"})
    with pytest.raises(errors.CommitConflictError, match="metadata"):
        w2.update("k = 1", {"v": "'a'"})


# ---------- MERGE source uniqueness ----------


def test_merge_multimatch_update_raises(spark, tdir):
    """Duplicate source keys + when_matched_update → raise instead of
    appending one updated image per match
    (DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW parity)."""
    w = _mk(spark, tdir, n=5)
    dup = spark.createDataFrame([(1, "a"), (1, "b")], SCHEMA)
    with pytest.raises(errors.TransactionError, match="more than one"):
        w.merge(dup, "t.k = s.k", when_matched_update={"v": "s.v"})
    # table unchanged, no orphan DV bins
    t = DeltaTable(tdir)
    assert t.to_df(spark).count() == 5
    assert t.snapshot.version == 1


def test_merge_multimatch_conditional_delete_raises(spark, tdir):
    w = _mk(spark, tdir, n=5)
    dup = spark.createDataFrame([(1, "a"), (1, "b")], SCHEMA)
    with pytest.raises(errors.TransactionError, match="more than one"):
        w.merge(dup, "t.k = s.k", when_matched_delete=True,
                when_matched_condition="s.v = 'a'",
                when_not_matched_insert=False)


def test_merge_multimatch_unconditional_delete_ok(spark, tdir):
    """Unconditional when-matched DELETE tolerates duplicate matches —
    deleting a row twice is deterministic (delta-spark parity) — and
    numTargetRowsMatched counts DISTINCT target rows."""
    w = _mk(spark, tdir, n=5)
    dup = spark.createDataFrame([(1, "a"), (1, "b")], SCHEMA)
    v, n_matched, n_ins = w.merge(
        dup, "t.k = s.k", when_matched_delete=True,
        when_not_matched_insert=False)
    assert n_matched == 1
    assert DeltaTable(tdir).to_df(spark).count() == 4


def test_merge_unique_source_still_works(spark, tdir):
    """The uniqueness check must not disturb key-unique merges."""
    w = _mk(spark, tdir, n=5)
    src = spark.createDataFrame([(1, "upd"), (99, "new")], SCHEMA)
    v, n_matched, n_ins = w.merge(
        src, "t.k = s.k", when_matched_update={"v": "s.v"})
    assert (n_matched, n_ins) == (1, 1)
    got = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got[1] == "upd" and got[99] == "new" and len(got) == 6


# ---------- CDF × RESTORE composition (row tracking preserved) ----------


def test_cdf_across_restore_batch_vs_stream(spark, tdir, tmp_path):
    """A CDF range CROSSING a RESTORE commit on a row-tracked table:
    the DV delete surfaces as deletes, the restore's resurrected rows as
    inserts; row ids are stable across the restore (re-added files keep
    baseRowId); and the readChangeFeed STREAM agrees with the batch feed
    row for row."""
    from duckdb_delta_spark.delta.table import DeltaTable as DT
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = DeltaWriter.create(spark, tdir, SCHEMA, configuration={
        "delta.enableChangeDataFeed": "true",
        "delta.enableRowTracking": "true",
    })
    w.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], SCHEMA).coalesce(1))  # v1
    w.delete("k < 4")                                            # v2 (DV)
    w.restore(version=1)                                         # v3

    # row ids preserved across the restore: sorted single file means
    # _row_id == k for every resurrected and surviving row
    rows = (DT(tdir).scan(spark).with_row_ids().to_df()
            .select("k", "_row_id").collect())
    assert {r["k"]: r["_row_id"] for r in rows} == {i: i for i in range(10)}

    batch = sorted(
        (r["_commit_version"], r["_change_type"], r["k"])
        for r in table_changes(DeltaLog(tdir), spark,
                               starting_version=1).collect())
    assert batch == sorted(
        [(2, "delete", i) for i in range(4)]
        + [(3, "insert", i) for i in range(4)])

    # streaming CDF over the same commits agrees exactly
    spark.dataSource.register(DeltaPySource)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("delta_py")
        .option("path", tdir)
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()
    stream = sorted(
        (r["_commit_version"], r["_change_type"], r["k"])
        for r in spark.read.parquet(out).collect()
        if r["_commit_version"] >= 2)
    assert stream == batch


# ---------- crash-during-commit torture: orphan vs committed ----------


def _live_abs(tdir):
    return {
        os.path.abspath(f.absolute_path(tdir))
        for f in DeltaTable(tdir).snapshot.add_files()
    }


def _all_parquet(tdir):
    out = set()
    for root, dirs, files in os.walk(tdir):
        if "_delta_log" in root:
            continue
        for fn in files:
            if fn.endswith(".parquet"):
                out.add(os.path.abspath(os.path.join(root, fn)))
    return out


def test_crash_mid_commit_vacuum_classification(spark, tdir, monkeypatch):
    """A writer killed between data-file promotion and the log's
    put-if-absent leaks orphans (its _rollback never runs). VACUUM must
    classify them correctly: the DEFAULT retention's mtime gate keeps
    fresh orphans (protecting any racing in-flight commit), retention 0
    reclaims exactly them, and committed files are never touched."""
    from duckdb_delta_spark.delta import log as logmod
    from duckdb_delta_spark.delta import writer as wmod

    w = _mk(spark, tdir, n=5)
    committed = _live_abs(tdir)

    class Killed(BaseException):
        """BaseException: models SIGKILL — no except Exception swallows it."""

    def die(self, path, data):
        raise Killed()

    monkeypatch.setattr(logmod.LocalLogStore, "put_if_absent", die)
    monkeypatch.setattr(wmod.DeltaWriter, "_rollback",
                        lambda self, moved: None)  # process is dead
    with pytest.raises(Killed):
        DeltaWriter(tdir, spark).append(spark.createDataFrame(
            [(100, "x"), (101, "y")], SCHEMA).coalesce(1))
    monkeypatch.undo()

    orphans = _all_parquet(tdir) - committed
    assert orphans, "crash must have leaked promoted-but-uncommitted files"
    assert _live_abs(tdir) == committed  # log never saw the dead commit

    # default retention: fresh orphans survive the mtime gate — a racing
    # vacuum cannot eat a genuinely in-flight commit's promoted files
    assert DeltaWriter(tdir, spark).vacuum() == []
    assert orphans <= _all_parquet(tdir)

    # the table keeps working; a new append is unaffected by the debris
    DeltaWriter(tdir, spark).append(
        spark.createDataFrame([(200, "z")], SCHEMA).coalesce(1))
    live_now = _live_abs(tdir)

    # retention 0: exactly the orphans go, every live file stays
    deleted = {os.path.abspath(os.path.join(tdir, p))
               for p in DeltaWriter(tdir, spark).vacuum(retention_ms=0)}
    assert deleted == orphans
    assert _all_parquet(tdir) == live_now
    got = sorted(r["k"] for r in DeltaTable(tdir).to_df(spark).collect())
    assert got == [0, 1, 2, 3, 4, 200]


def test_rollback_unlink_failure_leaks_then_vacuum_reclaims(
        spark, tdir, monkeypatch):
    """_rollback swallows OSError by design (best-effort cleanup on an
    already-failing path) — prove the resulting leak is exactly what a
    later VACUUM reclaims, and the loud conflict still propagates."""
    from duckdb_delta_spark.delta import writer as wmod

    w1 = _mk(spark, tdir, n=5)
    w2 = DeltaWriter(tdir, spark)          # stale snapshot
    w1.set_properties({"custom.tag": "1"})  # metadata change → no retry
    committed = _live_abs(tdir)

    real_unlink = os.unlink

    def eperm(path, *a, **k):
        if str(path).endswith((".parquet", ".bin")):
            raise OSError("injected EPERM")
        return real_unlink(path, *a, **k)

    monkeypatch.setattr(wmod.os, "unlink", eperm)
    with pytest.raises(errors.CommitConflictError, match="metadata"):
        w2.update("k = 1", {"v": "'a'"})
    monkeypatch.undo()

    leaked = _all_parquet(tdir) - committed
    assert leaked, "failed rollback must have left the new images behind"
    deleted = {os.path.abspath(os.path.join(tdir, p))
               for p in DeltaWriter(tdir, spark).vacuum(retention_ms=0)}
    assert leaked <= deleted  # DV .bin files may be reclaimed too
    got = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got == {i: f"v{i}" for i in range(5)}  # update never half-landed


def test_delete_retries_past_disjoint_append(spark, tdir):
    """append ∥ DELETE whose predicate the appended rows do NOT match:
    retry commits; the appended rows survive."""
    w1 = _mk(spark, tdir, n=10)
    w2 = DeltaWriter(tdir, spark)
    w1.append(spark.createDataFrame([(100, "keep")], SCHEMA).coalesce(1))
    v, n = w2.delete("k < 3")
    assert n == 3
    got = sorted(r["k"] for r in DeltaTable(tdir).to_df(spark).collect())
    assert got == [3, 4, 5, 6, 7, 8, 9, 100]


def test_delete_conflicts_on_matching_append(spark, tdir):
    """append ∥ DELETE where the appended rows MATCH the predicate: the
    old file-only retry silently left them undeleted — now a loud
    conflict (delta-spark ConcurrentAppendException analogue)."""
    w1 = _mk(spark, tdir, n=10)
    w2 = DeltaWriter(tdir, spark)
    w1.append(spark.createDataFrame([(1, "late")], SCHEMA).coalesce(1))
    with pytest.raises(errors.CommitConflictError, match="added rows"):
        w2.delete("k < 3")
    assert DeltaTable(tdir).to_df(spark).count() == 11  # nothing applied


def test_racing_writers_fuzz_serializable_or_loud(spark, tdir):
    """Property fuzz over TWO racing writers: B pins a snapshot, A
    commits first, B then runs its op. Every outcome must be
    serializable-or-loud — B either commits (and the table equals the
    SERIAL application A-then-B of a pure-Python model), raises a
    CommitConflictError (table equals A alone), or was a genuine no-op
    on its snapshot (table equals A alone — serializes as B-then-A).
    Silent lost updates / resurrections / duplications are the bug class
    this hunts; ops span append / DV-delete / DV-update / compact."""
    from hypothesis import given, settings, strategies as st

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    op_st = st.tuples(
        st.sampled_from(["append", "delete", "update", "compact"]),
        st.integers(min_value=0, max_value=2),
    )
    case_n = [0]

    def model_apply(model: dict, op, who: str) -> None:
        kind, f = op
        if kind == "append":
            base = 100 if who == "A" else 200
            for i in range(3):
                model[base + i] = i
        elif kind == "delete":
            for k in range(f * 10, f * 10 + 5):
                model.pop(k, None)
        elif kind == "update":
            for k in range(f * 10, f * 10 + 5):
                if k in model:
                    model[k] += 1000
        # compact: content identity

    def spark_apply(w, op, who: str):
        """Returns True if the op COMMITTED data-visible changes, False
        for a genuine no-op; raises on conflict."""
        kind, f = op
        lo, hi = f * 10, f * 10 + 5
        if kind == "append":
            base = 100 if who == "A" else 200
            w.append(spark.createDataFrame(
                [(base + i, i) for i in range(3)], schema).coalesce(1))
            return True
        if kind == "delete":
            return w.delete(f"k >= {lo} and k < {hi}") is not None
        if kind == "update":
            return w.update(
                f"k >= {lo} and k < {hi}", {"v": "v + 1000"}) is not None
        return w.compact(min_files=2) is not None  # content identity

    @settings(max_examples=15, deadline=None, derandomize=True)
    @given(op_a=op_st, op_b=op_st)
    def check(op_a, op_b):
        case_n[0] += 1
        path = os.path.join(tdir, f"race{case_n[0]}")
        w = DeltaWriter.create(spark, path, schema)
        for f in range(3):
            w.append(spark.createDataFrame(
                [(k, k) for k in range(f * 10, f * 10 + 10)],
                schema).coalesce(1))

        model: dict = {k: k for k in range(30)}
        wb = DeltaWriter(path, spark)   # B pins the pre-A snapshot
        wa = DeltaWriter(path, spark)
        a_did = spark_apply(wa, op_a, "A")
        model_a = dict(model)
        model_apply(model_a, op_a, "A")

        try:
            b_did = spark_apply(wb, op_b, "B")
        except errors.CommitConflictError:
            expected = model_a                      # loud loss: A alone
        else:
            expected = dict(model_a)
            if b_did:
                model_apply(expected, op_b, "B")    # serial A then B
            # else: B no-op on its snapshot — serializes as B-then-A

        got = {r["k"]: r["v"]
               for r in DeltaTable(path).to_df(spark).collect()}
        assert got == expected, (op_a, op_b, a_did, got, expected)

    check()


# ---------- streaming sink: ICT stamping + conflict retry ----------


def test_sink_stamps_in_commit_timestamp(spark, tdir, tmp_path):
    """Once a table carries inCommitTimestamps, EVERY commit must — the
    sink's batches included (spec invariant; timestamp travel breaks
    otherwise). Stamped monotonic vs the predecessor."""
    from duckdb_delta_spark.streaming.delta_source import DeltaStreamWriter

    w = DeltaWriter.create(spark, tdir, SCHEMA, configuration={
        "delta.enableInCommitTimestamps": "true"})
    w.append(spark.createDataFrame([(1, "a")], SCHEMA).coalesce(1))
    log = DeltaLog(tdir)
    ict1 = log.read_ict(1)
    assert ict1 is not None

    s = DeltaStreamWriter(
        tdir, SCHEMA, {"checkpointlocation": str(tmp_path / "ck")})
    s.commit([_sink_file_msg(tdir, 90)], batchId=0)
    ict2 = log.read_ict(2)
    assert ict2 is not None and ict2 > ict1
    s.commit([_sink_file_msg(tdir, 91)], batchId=1)
    assert log.read_ict(3) > ict2


def test_sink_retries_past_racing_append(spark, tdir, tmp_path, monkeypatch):
    """A concurrent batch writer stealing the sink's version must not
    fail the streaming query: the sink is a blind append, so it re-bases
    and retries when the racer left metadata/protocol intact."""
    from duckdb_delta_spark.delta.snapshot import Snapshot
    from duckdb_delta_spark.streaming.delta_source import DeltaStreamWriter

    w = _mk(spark, tdir, n=3)
    s = DeltaStreamWriter(
        tdir, SCHEMA, {"checkpointlocation": str(tmp_path / "ck")})

    real = DeltaLog.commit
    fired = []

    def racing(self, version, actions):
        if not fired:
            fired.append(1)
            DeltaWriter(tdir, spark).append(spark.createDataFrame(
                [(50, "racer")], SCHEMA).coalesce(1))
        return real(self, version, actions)

    monkeypatch.setattr(DeltaLog, "commit", racing)
    s.commit([_sink_file_msg(tdir, 90)], batchId=0)
    monkeypatch.undo()

    snap = Snapshot.build(DeltaLog(tdir))
    assert snap.transaction_version(s.app_id) == 0  # batch committed
    got = sorted(r["k"] for r in DeltaTable(tdir).to_df(spark).collect())
    assert got == [0, 1, 2, 50, 90]  # racer's row intact too


def test_sink_conflict_raises_on_metadata_racer(
        spark, tdir, tmp_path, monkeypatch):
    """A racer that CHANGED table metadata invalidates the sink's
    stream-start gates — loud failure, not a blind retry."""
    from duckdb_delta_spark.streaming.delta_source import DeltaStreamWriter

    w = _mk(spark, tdir, n=3)
    s = DeltaStreamWriter(
        tdir, SCHEMA, {"checkpointlocation": str(tmp_path / "ck")})

    real = DeltaLog.commit
    fired = []

    def racing(self, version, actions):
        if not fired:
            fired.append(1)
            DeltaWriter(tdir, spark).set_properties({"custom.x": "1"})
        return real(self, version, actions)

    monkeypatch.setattr(DeltaLog, "commit", racing)
    with pytest.raises(errors.CommitConflictError):
        s.commit([_sink_file_msg(tdir, 90)], batchId=0)


def test_merge_with_schema_evolution(spark, tdir):
    """merge(merge_schema=True) — delta-spark withSchemaEvolution: new
    source columns widen the table, inserts carry them, matched updates
    may assign them, old rows read typed NULLs."""
    w = _mk(spark, tdir, n=3)
    src_schema = T.StructType(list(SCHEMA.fields)
                              + [T.StructField("score", T.LongType())])
    src = spark.createDataFrame([(1, "upd", 10), (99, "new", 20)],
                                src_schema)
    v, n_matched, n_ins = w.merge(
        src, "t.k = s.k",
        when_matched_update={"v": "s.v", "score": "s.score"},
        merge_schema=True)
    assert (n_matched, n_ins) == (1, 1)
    got = {r["k"]: (r["v"], r["score"])
           for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got == {0: ("v0", None), 1: ("upd", 10), 2: ("v2", None),
                   99: ("new", 20)}
    # without the flag, extra source columns are ignored (insert projects
    # the table schema) — and the table schema does not change
    w2 = DeltaWriter(tdir, spark)
    src2 = spark.createDataFrame(
        [(100, "x", 1, 9)],
        T.StructType(list(src_schema.fields)
                     + [T.StructField("extra", T.LongType())]))
    w2.merge(src2, "t.k = s.k")
    t = DeltaTable(tdir)
    assert "extra" not in t.to_df(spark).columns
    assert t.to_df(spark).where("k = 100").first()["score"] == 1


def test_deep_clone_independent_of_source(spark, tdir):
    """DEEP CLONE: byte-identical copy, adds carried unchanged (stats,
    DV descriptors, row ids), and fully source-independent — deleting
    the source's data files cannot break the clone."""
    import shutil

    src = str(tdir) + "_src"
    dst = str(tdir) + "_dst"
    w = DeltaWriter.create(
        spark, src, SCHEMA,
        partition_by=None,
        configuration={"delta.enableRowTracking": "true"})
    w.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], SCHEMA).coalesce(1))
    w.delete("k in (2, 5)")  # DV on the file

    wc = DeltaWriter.clone(spark, src, dst, shallow=False)
    t = DeltaTable(dst)
    got = sorted(r["k"] for r in t.to_df(spark).collect())
    assert got == [0, 1, 3, 4, 6, 7, 8, 9]
    # adds carried relative + row ids preserved
    for f in t.snapshot.add_files():
        assert not os.path.isabs(f.path)
        assert f.base_row_id is not None
    rows = (t.scan(spark).with_row_ids().to_df()
            .select("k", "_row_id").collect())
    assert all(r["_row_id"] == r["k"] for r in rows)

    # source independence: nuke the source tree entirely
    shutil.rmtree(src)
    got2 = sorted(r["k"] for r in DeltaTable(dst).to_df(spark).collect())
    assert got2 == got
    # the clone keeps working as a table (write + vacuum untouched)
    DeltaWriter(dst, spark).append(
        spark.createDataFrame([(100, "x")], SCHEMA).coalesce(1))
    assert DeltaTable(dst).to_df(spark).count() == 9


def test_deep_clone_of_shallow_clone(spark, tdir):
    """Deep-cloning a SHALLOW clone (absolute paths, 'p' DV descriptors)
    re-materializes everything inside the new root."""
    import shutil

    a = str(tdir) + "_a"
    b = str(tdir) + "_b"
    c = str(tdir) + "_c"
    w = DeltaWriter.create(spark, a, SCHEMA)
    w.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], SCHEMA).coalesce(1))
    w.delete("k = 3")
    DeltaWriter.clone(spark, a, b, shallow=True)
    DeltaWriter.clone(spark, b, c, shallow=False)
    shutil.rmtree(a)
    shutil.rmtree(b)
    got = sorted(r["k"] for r in DeltaTable(c).to_df(spark).collect())
    assert got == [0, 1, 2, 4, 5, 6, 7]


def test_vacuum_protocol_logging(spark, tdir):
    """VACUUM with logging brackets the deletion with VACUUM START
    (numFilesToDelete/sizeOfDataToDelete) and VACUUM END
    (COMPLETED/numDeletedFiles) commits — delta-spark vacuum protocol
    logging, here keyed off the delta.vacuum.logging.enabled table
    property or the explicit kwarg."""
    w = _mk(spark, tdir, n=10)
    w.append(spark.createDataFrame(
        [(50 + i, "y") for i in range(5)], SCHEMA).coalesce(1))
    w.compact()  # tombstones the two small files
    w.append(spark.createDataFrame([(100, "x")], SCHEMA).coalesce(1))
    w2 = DeltaWriter(tdir, spark)
    deleted = w2.vacuum(retention_ms=0, logging=True)
    assert len(deleted) >= 1

    hist = {r["version"]: (r["operation"], r)
            for r in DeltaTable(tdir).history(spark).collect()}
    ops = [op for op, _ in hist.values()]
    assert "VACUUM START" in ops and "VACUUM END" in ops
    import json as _json
    for v, (op, row) in sorted(hist.items()):
        if op == "VACUUM START":
            start_v = v
        if op == "VACUUM END":
            end_v = v
    assert end_v == start_v + 1

    # dry_run and logging=False leave the log untouched
    before = DeltaTable(tdir).version
    DeltaWriter(tdir, spark).vacuum(retention_ms=0, dry_run=True,
                                    logging=True)
    DeltaWriter(tdir, spark).vacuum(retention_ms=0)
    assert DeltaTable(tdir).version == before

    # table-property default switches it on
    DeltaWriter(tdir, spark).set_properties(
        {"delta.vacuum.logging.enabled": "true"})
    v0 = DeltaTable(tdir).version
    DeltaWriter(tdir, spark).vacuum(retention_ms=0)
    assert DeltaTable(tdir).version == v0 + 2  # START + END landed


def test_update_delete_idempotent_txn(spark, tdir):
    """foreachBatch-style idempotency on UPDATE/DELETE (merge parity):
    the commit carries txn(appId, version); a replayed version is
    recognized from the snapshot and skipped."""
    w = _mk(spark, tdir, n=6)
    assert w.update("k = 1", {"v": "'a'"},
                    txn_app_id="job", txn_version=1) is not None
    # replay of version 1 → skipped
    w2 = DeltaWriter(tdir, spark)
    assert w2.update("k = 2", {"v": "'b'"},
                     txn_app_id="job", txn_version=1) is None
    got = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got[1] == "a" and got[2] == "v2"
    # next version applies; delete honors the same ledger
    w3 = DeltaWriter(tdir, spark)
    assert w3.delete("k = 3", txn_app_id="job", txn_version=2) is not None
    w4 = DeltaWriter(tdir, spark)
    assert w4.delete("k = 4", txn_app_id="job", txn_version=2) is None
    left = sorted(r["k"] for r in DeltaTable(tdir).to_df(spark).collect())
    assert left == [0, 1, 2, 4, 5]
    assert DeltaTable(tdir).get_transaction_version("job") == 2
