"""Round-17 fixes: conflict re-validation for OVERWRITE/replaceWhere
and RESTORE (the last fail-hard DML paths), atomic MERGE schema
evolution, CDF non-widening type-change refusal, deep-clone DV
re-homing.

Delta anchors: delta-spark ConflictChecker (ConcurrentAppendException /
ConcurrentWriteException), withSchemaEvolution's single-commit
atomicity, DELTA_NON_ADDITIVE_SCHEMA_CHANGE; reference conflict seam:
delta_transaction_manager.cpp:20-32.
"""

from __future__ import annotations

import os
import shutil

import pytest
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
    w.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], SCHEMA).coalesce(1))
    return w


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).coalesce(1)


# ---------- replaceWhere conflict re-validation ----------


def test_replace_where_retries_past_disjoint_append(spark, tdir):
    """append ∥ replaceWhere where the appended rows do NOT match the
    replace predicate: the loser re-validates (UPDATE's exact
    added-rows probe with the replace predicate) and commits."""
    _mk(spark, tdir, n=10)
    w1 = DeltaWriter(tdir, spark)
    w2 = DeltaWriter(tdir, spark)  # stale snapshot
    w1.append(_df(spark, [(100, "racer")]))
    w2.overwrite(_df(spark, [(1, "repl"), (3, "repl")]), where="k in (1, 3)")
    got = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got[1] == "repl" and got[3] == "repl"
    assert got[100] == "racer"
    assert len(got) == 11


def test_replace_where_conflicts_on_matching_append(spark, tdir):
    """append ∥ replaceWhere where the appended rows MATCH the replace
    predicate: the retry would silently leave rows inside the replaced
    region → loud conflict, nothing half-applied."""
    _mk(spark, tdir, n=10)
    w1 = DeltaWriter(tdir, spark)
    w2 = DeltaWriter(tdir, spark)
    w1.append(_df(spark, [(3, "racer")]))
    with pytest.raises(errors.CommitConflictError, match="added rows"):
        w2.overwrite(_df(spark, [(1, "repl")]), where="k < 5")
    t = DeltaTable(tdir).to_df(spark)
    assert t.count() == 11
    assert t.where("v = 'repl'").count() == 0


def test_replace_where_conflicts_on_touched_file(spark, tdir):
    """UPDATE ∥ replaceWhere masking the SAME file: the loser's DV was
    built against the old mask → loud conflict (no lost update)."""
    _mk(spark, tdir, n=10)
    w1 = DeltaWriter(tdir, spark)
    w2 = DeltaWriter(tdir, spark)
    w1.update("k = 7", {"v": "'upd'"})
    with pytest.raises(errors.CommitConflictError):
        w2.overwrite(_df(spark, [(1, "repl")]), where="k < 5")
    got = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got[7] == "upd" and got[1] == "v1"


def test_replace_where_retries_past_vacuum_logging(spark, tdir):
    """VACUUM protocol-logging commits (commitInfo-only) ∥ replaceWhere:
    state-free racer, the replace re-bases and commits."""
    w1 = _mk(spark, tdir, n=6)
    w1.delete("k = 0")
    w2 = DeltaWriter(tdir, spark)
    w1.vacuum(retention_ms=0, logging=True)
    w2.overwrite(_df(spark, [(1, "repl")]), where="k = 1")
    got = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got[1] == "repl" and len(got) == 5


# ---------- full OVERWRITE conflict re-validation ----------


def test_full_overwrite_retries_past_vacuum_logging(spark, tdir):
    """VACUUM START/END ∥ full overwrite: the racer changed no table
    state, so the precomputed manifest removes are still exact → the
    overwrite re-bases and commits."""
    w1 = _mk(spark, tdir, n=6)
    w1.delete("k = 0")  # tombstone so the vacuum has something to log
    w2 = DeltaWriter(tdir, spark)
    w1.vacuum(retention_ms=0, logging=True)
    v = w2.overwrite(_df(spark, [(42, "only")]))
    assert v is not None
    got = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got == {42: "only"}


def test_full_overwrite_conflicts_on_append(spark, tdir):
    """append ∥ full overwrite: the overwrite's remove list no longer
    covers the table → loud conflict (retrying would leave the racer's
    rows alive under 'replace everything' semantics)."""
    _mk(spark, tdir, n=6)
    w1 = DeltaWriter(tdir, spark)
    w2 = DeltaWriter(tdir, spark)
    w1.append(_df(spark, [(100, "racer")]))
    with pytest.raises(errors.CommitConflictError, match="data change"):
        w2.overwrite(_df(spark, [(42, "only")]))
    assert DeltaTable(tdir).to_df(spark).count() == 7


# ---------- RESTORE conflict re-validation ----------


def test_restore_retries_past_vacuum_logging(spark, tdir):
    """VACUUM protocol-logging ∥ RESTORE: commitInfo-only racer, the
    restore diff stays exact → re-base and commit."""
    w1 = _mk(spark, tdir, n=6)           # v1
    w1.append(_df(spark, [(50, "x")]))   # v2
    w1.delete("k = 50")                  # v3 (tombstone for the vacuum)
    w2 = DeltaWriter(tdir, spark)        # pinned at v3
    w1.vacuum(retention_ms=10**12, logging=True)  # deletes nothing, logs
    v = w2.restore(version=2)            # resurrect the k=50 file
    assert v is not None
    got = sorted(r["k"] for r in DeltaTable(tdir).to_df(spark).collect())
    assert got == [0, 1, 2, 3, 4, 5, 50]


def test_restore_conflicts_on_append(spark, tdir):
    """append ∥ RESTORE: the restore diff was computed against a stale
    manifest → loud conflict, racer's rows intact."""
    w1 = _mk(spark, tdir, n=6)           # v1
    w1.append(_df(spark, [(50, "x")]))   # v2
    w2 = DeltaWriter(tdir, spark)        # pinned at v2
    w1.append(_df(spark, [(60, "racer")]))
    with pytest.raises(errors.CommitConflictError, match="data change"):
        w2.restore(version=1)
    got = sorted(r["k"] for r in DeltaTable(tdir).to_df(spark).collect())
    assert got == [0, 1, 2, 3, 4, 5, 50, 60]


# ---------- atomic MERGE schema evolution ----------


def test_merge_schema_evolution_atomic_on_failure(spark, tdir):
    """merge(merge_schema=True) that FAILS (multi-match raise) must not
    leave the widened schema behind — the metaData action rides the
    merge commit itself (delta-spark withSchemaEvolution atomicity)."""
    w = _mk(spark, tdir, n=5)
    src_schema = T.StructType(list(SCHEMA.fields)
                              + [T.StructField("score", T.LongType())])
    dup = spark.createDataFrame([(1, "a", 1), (1, "b", 2)], src_schema)
    with pytest.raises(errors.TransactionError, match="more than one"):
        w.merge(dup, "t.k = s.k",
                when_matched_update={"v": "s.v", "score": "s.score"},
                merge_schema=True)
    t = DeltaTable(tdir)
    assert "score" not in [f.name for f in t.snapshot.schema.fields]
    assert t.snapshot.version == 1  # no extra metadata commit landed


def test_merge_schema_evolution_single_commit(spark, tdir):
    """A successful merge_schema merge lands EXACTLY ONE commit carrying
    both the widened metaData and the data actions."""
    w = _mk(spark, tdir, n=3)
    src_schema = T.StructType(list(SCHEMA.fields)
                              + [T.StructField("score", T.LongType())])
    src = spark.createDataFrame([(1, "upd", 10), (99, "new", 20)],
                                src_schema)
    v0 = DeltaTable(tdir).snapshot.version
    v, n_matched, n_ins = w.merge(
        src, "t.k = s.k",
        when_matched_update={"v": "s.v", "score": "s.score"},
        merge_schema=True)
    assert v == v0 + 1 and (n_matched, n_ins) == (1, 1)
    got = {r["k"]: r["score"]
           for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got == {0: None, 1: 10, 2: None, 99: 20}


# ---------- CDF non-widening type change ----------


def test_cdf_refuses_type_change_inside_range(spark, tdir):
    """table_changes over a range crossing an overwriteSchema TYPE
    change (string -> long is not a spec widening) must raise instead of
    implicitly casting pre-change rows through unionByName."""
    w = _mk(spark, tdir, n=3)
    new_schema = T.StructType([T.StructField("k", T.LongType()),
                               T.StructField("v", T.LongType())])
    w.overwrite(
        spark.createDataFrame([(1, 10), (2, 20)], new_schema).coalesce(1),
        overwrite_schema=True)
    with pytest.raises(errors.SchemaError, match="changed type"):
        table_changes(DeltaLog(tdir), spark, starting_version=0).collect()
    # sub-range after the change still works
    post = table_changes(DeltaLog(tdir), spark, starting_version=2)
    assert post.count() == 0 or "v" in post.columns


def test_cdf_allows_spec_widening_inside_range(spark, tdir):
    """int -> long style widenings stay servable (the walk pre-widens
    frames); only NON-widening type changes raise."""
    int_schema = T.StructType([T.StructField("k", T.LongType()),
                               T.StructField("x", T.IntegerType())])
    w = DeltaWriter.create(spark, tdir, int_schema)
    w.append(spark.createDataFrame([(1, 7)], int_schema).coalesce(1))
    w.alter_column_type("x", T.LongType())
    long_schema = T.StructType([T.StructField("k", T.LongType()),
                                T.StructField("x", T.LongType())])
    w.append(spark.createDataFrame([(2, 8)], long_schema).coalesce(1))
    rows = table_changes(DeltaLog(tdir), spark, starting_version=-1).collect()
    assert sorted((r["k"], r["x"]) for r in rows) == [(1, 7), (2, 8)]


# ---------- deep clone DV re-homing ----------


def test_deep_clone_survives_directory_move(spark, tdir):
    """Deep clone of a shallow clone (whose DVs are absolute 'p'
    descriptors) re-homes the DVs as table-relative 'u' descriptors —
    moving/renaming the cloned directory must not break reads."""
    src = str(tdir) + "_src"
    mid = str(tdir) + "_shallow"
    dst = str(tdir) + "_deep"
    w = _mk(spark, src, n=10)
    w.delete("k in (2, 5)")  # DV on the source file

    DeltaWriter.clone(spark, src, mid, shallow=True)   # 'u' -> 'p'
    DeltaWriter.clone(spark, mid, dst, shallow=False)  # re-home to 'u'

    for f in DeltaTable(dst).snapshot.add_files():
        dv = f.deletion_vector
        if dv:
            assert dv["storageType"] == "u"

    moved = str(tdir) + "_moved"
    shutil.move(dst, moved)
    got = sorted(r["k"] for r in DeltaTable(moved).to_df(spark).collect())
    assert got == [0, 1, 3, 4, 6, 7, 8, 9]
    # fully source-independent: deleting source AND shallow stage is fine
    shutil.rmtree(src)
    shutil.rmtree(mid)
    assert DeltaTable(moved).to_df(spark).count() == 8


# ---------- streaming sink: stale ICT stamp cleared on retry ----------


def test_sink_retry_clears_stale_ict_stamp(spark, tdir, tmp_path,
                                           monkeypatch):
    """A losing commit attempt that stamped inCommitTimestamp (its
    predecessor carried one) must not leak the stale stamp into a later
    attempt whose NEW predecessor — the race winner — carries none."""
    import time as _time

    from duckdb_delta_spark.streaming.delta_source import DeltaStreamWriter

    w = _mk(spark, tdir, n=1)
    # feature listed but config NOT enabled: external writers may then
    # legally commit without ICT while ours stamp when the predecessor did
    w.add_feature_support("inCommitTimestamp")
    log = DeltaLog(tdir)
    v = DeltaTable(tdir).snapshot.version + 1
    now = int(_time.time() * 1000)
    log.commit(v, [{"commitInfo": {
        "operation": "WRITE", "timestamp": now, "inCommitTimestamp": now}}])

    s = DeltaStreamWriter(
        tdir, SCHEMA, {"checkpointlocation": str(tmp_path / "ck")})
    real = DeltaLog.commit
    fired = []

    def racing(self, version, actions):
        if not fired:
            fired.append(1)
            # race winner steals the version WITHOUT an ICT stamp
            real(self, version, [{"commitInfo": {
                "operation": "RACER", "timestamp": now}}])
        return real(self, version, actions)

    monkeypatch.setattr(DeltaLog, "commit", racing)
    s.commit([_sink_file_msg(tdir, 90)], batchId=0)
    monkeypatch.undo()

    head = DeltaTable(tdir).snapshot.version
    # the sink's winning attempt sits after a no-ICT predecessor → its
    # commitInfo must not carry the stale first-attempt stamp
    assert DeltaLog(tdir).read_ict(head) is None


# ---------- three-writer racing fuzz: MERGE / replaceWhere / RESTORE ----------


def test_racing_writers_fuzz3_serializable_or_loud(spark, tdir):
    """Property fuzz over THREE racing writers: B and C pin the pre-A
    snapshot, A commits first, then B, then C. Every outcome must be
    serializable-or-loud — each of B/C either commits (table equals the
    serial application in COMMIT order of a pure-Python model), raises
    CommitConflictError (no trace of the loser), or was a genuine no-op.
    Extends the r16 two-writer fuzz with the ops whose read sets are the
    subtlest: MERGE upsert (source-join read set), replaceWhere
    (predicate region), RESTORE (whole-manifest diff), the state-free
    VACUUM-logging racer the info-only rebase exists for, and the two
    table-state racers every DML retry must refuse to slide past:
    ADD COLUMN (metadata) and protocol upgrade (ProtocolChangedException
    parity — row content is unchanged by either, but a loser pinned
    before them must serialize-or-raise, never blind-retry). The table
    runs with CDF ENABLED and every example additionally replays the
    change feed from the pre-table baseline: folding insert/delete/
    update_postimage in commit order must reconstruct the final state."""
    from hypothesis import given, settings, strategies as st

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    op_st = st.tuples(
        st.sampled_from(["append", "delete", "update", "compact",
                         "merge", "replace", "restore", "vacuum_log",
                         "addcol", "upgrade", "merge_evolve"]),
        st.integers(min_value=0, max_value=2),
    )
    BASE = {"A": 100, "B": 200, "C": 400}
    case_n = [0]

    def model_apply(model: dict, op, who: str) -> None:
        kind, f = op
        lo, hi = f * 10, f * 10 + 5
        if kind == "append":
            for i in range(3):
                model[BASE[who] + i] = i
        elif kind == "delete":
            for k in range(lo, hi):
                model.pop(k, None)
        elif kind == "update":
            for k in range(lo, hi):
                if k in model:
                    model[k] += 1000
        elif kind in ("merge", "merge_evolve"):
            # upsert: update-matched + insert-new; the _evolve variant
            # additionally widens the schema ATOMICALLY with the merge
            # (its commit CARRIES a metaData action) — the added column
            # is NULL on old rows and never read by the k→v projection
            for k in (lo + 2, BASE[who] + 50):
                model[k] = 7000 + BASE[who]
        elif kind == "replace":  # replaceWhere [lo, hi) -> single row
            for k in range(lo, hi):
                model.pop(k, None)
            model[lo] = 999
        elif kind == "restore":  # to v2: exactly the first two seed files
            model.clear()
            model.update({k: k for k in range(20)})
        # compact / vacuum_log / addcol / upgrade: row-content identity
        # (addcol adds a NULL column the k→v projection never reads;
        # upgrade is protocol-only — but BOTH force later racers pinned
        # before them to serialize-or-raise, the path under test)

    def spark_apply(w, op, who: str):
        """True if the op committed, False for a genuine no-op; raises
        CommitConflictError when the engine (correctly) refuses."""
        kind, f = op
        lo, hi = f * 10, f * 10 + 5
        if kind == "append":
            w.append(spark.createDataFrame(
                [(BASE[who] + i, i) for i in range(3)],
                schema).coalesce(1))
            return True
        if kind == "delete":
            return w.delete(f"k >= {lo} and k < {hi}") is not None
        if kind == "update":
            return w.update(
                f"k >= {lo} and k < {hi}", {"v": "v + 1000"}) is not None
        if kind == "merge":
            src = spark.createDataFrame(
                [(lo + 2, 7000 + BASE[who]),
                 (BASE[who] + 50, 7000 + BASE[who])], schema)
            return w.merge(src, "t.k = s.k",
                           when_matched_update={"v": "s.v"}) is not None
        if kind == "merge_evolve":
            # the one DML whose commit carries a metaData action: the
            # widening must land atomically with the row changes, and a
            # loser pinned before it must serialize-or-raise
            evo = T.StructType(list(schema.fields) + [
                T.StructField(f"mcol_{who.lower()}", T.LongType())])
            src = spark.createDataFrame(
                [(lo + 2, 7000 + BASE[who], int(f)),
                 (BASE[who] + 50, 7000 + BASE[who], int(f))], evo)
            return w.merge(src, "t.k = s.k",
                           when_matched_update={"v": "s.v"},
                           merge_schema=True) is not None
        if kind == "replace":
            return w.overwrite(
                spark.createDataFrame([(lo, 999)], schema).coalesce(1),
                where=f"k >= {lo} and k < {hi}") is not None
        if kind == "restore":
            return w.restore(version=2) is not None
        if kind == "vacuum_log":
            w.vacuum(retention_ms=10**12, logging=True)
            return True
        if kind == "addcol":
            return w.add_column(f"extra_{who.lower()}_{f}", "long") is not None
        if kind == "upgrade":
            return w.upgrade_protocol(1, 3 + f) is not None
        return w.compact(min_files=2) is not None  # content identity

    @settings(max_examples=34, deadline=None, derandomize=True)
    @given(op_a=op_st, op_b=op_st, op_c=op_st)
    def check(op_a, op_b, op_c):
        case_n[0] += 1
        path = os.path.join(tdir, f"race3_{case_n[0]}")
        # CDF ON: beyond the content property, every example also proves
        # the change feed REPLAYS to the final state (cdc-file commits,
        # DV-diff derivation, no-cdc remove-only derivation, restore
        # resurrections — all under racing writers)
        w = DeltaWriter.create(spark, path, schema, configuration={
            "delta.enableChangeDataFeed": "true"})
        for f in range(3):
            w.append(spark.createDataFrame(
                [(k, k) for k in range(f * 10, f * 10 + 10)],
                schema).coalesce(1))

        wb = DeltaWriter(path, spark)   # pins the pre-A snapshot
        wc = DeltaWriter(path, spark)   # pins the pre-A snapshot
        wa = DeltaWriter(path, spark)

        expected = {k: k for k in range(30)}
        spark_apply(wa, op_a, "A")
        model_apply(expected, op_a, "A")

        for w_i, op_i, who in ((wb, op_b, "B"), (wc, op_c, "C")):
            try:
                did = spark_apply(w_i, op_i, who)
            except errors.CommitConflictError:
                continue                       # loud loss: no trace
            if did:
                model_apply(expected, op_i, who)
            # else: genuine no-op on its snapshot — serializes first

        got = {r["k"]: r["v"]
               for r in DeltaTable(path).to_df(spark).collect()}
        assert got == expected, (op_a, op_b, op_c, got, expected)

        # CDF replay: fold the feed over an empty dict in commit order
        # (within a commit: deletes before inserts, so a replaced key
        # keeps its new image); preimages carry no state. Equality with
        # the model proves the derived feed is change-complete.
        replay: dict = {}
        feed = sorted(
            table_changes(DeltaLog(path), spark, -1).collect(),
            key=lambda r: (r["_commit_version"],
                           0 if r["_change_type"] == "delete" else 1))
        for r in feed:
            if r["_change_type"] in ("insert", "update_postimage"):
                replay[r["k"]] = r["v"]
            elif r["_change_type"] == "delete":
                replay.pop(r["k"], None)
        assert replay == expected, (op_a, op_b, op_c, replay, expected)

        # reader-side: table_changes_segments over the full history must
        # tile the range contiguously and concatenate to the SAME
        # row-change stream (no op in the fuzz is non-additive — addcol
        # and merge_evolve widen — so this also pins that the segment
        # walker never splits on additive changes)
        from duckdb_delta_spark.delta.changes import table_changes_segments

        head = DeltaTable(path).snapshot.version
        segs = table_changes_segments(DeltaLog(path), spark, -1)
        assert segs[0][0] == -1 and segs[-1][1] == head
        assert all(segs[i + 1][0] == segs[i][1]
                   for i in range(len(segs) - 1)), [(s, e) for s, e, _ in segs]
        key = ["_commit_version", "_change_type", "k", "v"]
        seg_rows = sorted(
            tuple(r[c] for c in key)
            for _s, _e, fr in segs for r in fr.select(*key).collect())
        assert seg_rows == sorted(tuple(r[c] for c in key) for r in feed), \
            (op_a, op_b, op_c)

    check()


# ---------- CDF non-additive range: segmented drain escape hatch ----------


def test_cdf_segments_drain_rename_crossing_range(spark, tdir, tmp_path):
    """table_changes_segments drains a range CROSSING a rename: one
    segment per schema era (the metadata-only rename commit contributes
    no rows), each served under its own end schema; the streaming CDF
    source started at each segment boundary agrees row for row."""
    from duckdb_delta_spark.delta.changes import table_changes_segments
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = _mk(spark, tdir, n=4, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })                                                   # v1: insert 0..3
    w.delete("k = 0")                                    # v2: delete 0
    rename_v = w.rename_column("v", "label")             # v3: rename
    w.append(spark.createDataFrame(
        [(100, "post")],
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("label", T.StringType())])
    ).coalesce(1))                                       # v4: insert 100

    log = DeltaLog(tdir)
    # the plain call still refuses the crossing range
    with pytest.raises(errors.SchemaError, match="renamed"):
        table_changes(log, spark, starting_version=-1).collect()

    segs = table_changes_segments(log, spark, starting_version=-1)
    assert [(s, e) for s, e, _ in segs] == \
        [(-1, rename_v - 1), (rename_v, 4)]

    pre = sorted((r["_commit_version"], r["_change_type"], r["k"], r["v"])
                 for r in segs[0][2].collect())
    assert pre == sorted(
        [(1, "insert", i, f"v{i}") for i in range(4)]
        + [(2, "delete", 0, "v0")])
    post = [(r["_commit_version"], r["_change_type"], r["k"], r["label"])
            for r in segs[1][2].collect()]
    assert post == [(4, "insert", 100, "post")]

    # streaming CDF started AT the post-rename boundary agrees
    spark.dataSource.register(DeltaPySource)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("delta_py")
        .option("path", tdir)
        .option("readChangeFeed", "true")
        .option("startingVersion", str(rename_v + 1))
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()
    stream = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["label"])
        for r in spark.read.parquet(out).collect())
    assert stream == post


def test_cdf_segments_no_boundary_single_segment(spark, tdir):
    """Without a non-additive change the helper degrades to one segment
    identical to the plain table_changes call."""
    from duckdb_delta_spark.delta.changes import table_changes_segments

    w = _mk(spark, tdir, n=3)
    w.add_column("extra", "bigint")  # additive: NOT a boundary
    w.delete("k = 1")
    segs = table_changes_segments(DeltaLog(tdir), spark, starting_version=0)
    assert len(segs) == 1 and (segs[0][0], segs[0][1]) == (0, 3)
    want = sorted((r["_commit_version"], r["_change_type"], r["k"]) for r in
                  table_changes(DeltaLog(tdir), spark, 0).collect())
    got = sorted((r["_commit_version"], r["_change_type"], r["k"]) for r in
                 segs[0][2].collect())
    assert got == want


# ---------- commit-scaled lineitem_multi fixture ----------


def test_lineitem_multi_commits_scale_with_key_bands(spark, tmp_path):
    """_build_lineitem_multi splits 3 append commits per 10M key band:
    driver testdata (keys < 600k) keeps the historical single-band 3
    commits, while the key-shifted sf1 replica set (tools/make_sf1.py,
    STRIDE=10M) scales commit count with data — the axis the streaming
    SF1 checkpoint measures (per-batch log replay is O(new commits))."""
    from duckdb_delta_spark.testing import fixtures as FX

    src = tmp_path / "src"
    src.mkdir()
    li = spark.createDataFrame(
        [(k + band * 10_000_000, float(k)) for band in (0, 1, 2)
         for k in (1, 600, 1_500)],
        "l_orderkey bigint, l_quantity double",
    )
    li.coalesce(1).write.parquet(str(src / "lineitem.parquet"))

    path = str(tmp_path / "multi")
    FX._build_lineitem_multi(spark, str(src), path)
    # create + 3 bands x 3 range commits
    assert DeltaLog(path).resolve_version(None) == 9
    got = sorted(r["l_orderkey"]
                 for r in DeltaTable(path).to_df(spark).collect())
    assert got == sorted(r["l_orderkey"] for r in li.collect())


# ---------- protocol-change racers conflict DML retries ----------


def test_update_conflicts_on_protocol_change(spark, tdir):
    """protocol upgrade ∥ UPDATE: delta-spark's checkProtocolCompatibility
    raises ProtocolChangedException UNCONDITIONALLY when the winner
    carried a protocol action — the loser's plan predates whatever the
    new protocol obliges writers to do (row-id ranges, appendOnly,
    reader features its adds must honor), so no silent retry."""
    _mk(spark, tdir, n=10)
    w1 = DeltaWriter(tdir, spark)
    w2 = DeltaWriter(tdir, spark)  # stale snapshot
    assert w1.upgrade_protocol(1, 3) is not None
    with pytest.raises(errors.CommitConflictError, match="protocol change"):
        w2.update("k = 7", {"v": "'upd'"})
    got = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    assert got[7] == "v7"  # nothing half-applied


def test_delete_conflicts_on_feature_enable(spark, tdir):
    """add_feature_support ∥ DELETE: same bar via the writer-features
    path (the racer may have enabled e.g. rowTracking, which obliges
    every subsequent add to carry a baseRowId the loser never planned)."""
    _mk(spark, tdir, n=10)
    w1 = DeltaWriter(tdir, spark)
    w2 = DeltaWriter(tdir, spark)
    assert w1.add_feature_support("rowTracking") is not None
    with pytest.raises(errors.CommitConflictError, match="protocol change"):
        w2.delete("k >= 8")
    assert DeltaTable(tdir).to_df(spark).count() == 10


def test_full_file_delete_keeps_legacy_protocol(spark, tdir):
    """A DELETE whose every touched file is FULLY covered writes no DV —
    it must leave a legacy (1,2) table legacy (delta-spark only upgrades
    when a vector is materialized; a gratuitous protocol action would
    also conflict every concurrent DML retry for nothing)."""
    from duckdb_delta_spark.delta.snapshot import Snapshot

    w = DeltaWriter.create(spark, tdir, SCHEMA)
    w.append(_df(spark, [(i, f"v{i}") for i in range(5)]))
    w.append(_df(spark, [(i, f"v{i}") for i in range(10, 15)]))
    w.delete("k < 5")  # whole first file
    snap = Snapshot.build(DeltaLog(tdir))
    assert snap.protocol == {"minReaderVersion": 1, "minWriterVersion": 2}
    assert DeltaTable(tdir).to_df(spark).count() == 5
    # a PARTIAL delete then upgrades exactly once
    w.delete("k = 10")
    snap = Snapshot.build(DeltaLog(tdir))
    assert "deletionVectors" in snap.protocol.get("readerFeatures", [])


# ---------- CDF without cdc files (remove-only / overwrite commits) ----------


def test_cdf_partition_drop_delete_writes_no_cdc(spark, tdir, tmp_path):
    """A CDF-enabled DELETE whose every touched file is fully covered
    commits remove-only and writes NO _change_data — readers derive the
    deletes from the removed files' live rows (Delta spec no-cdc
    derivation; a 100-TB retention DELETE must not rewrite the dropped
    partition as cdc). Batch and streaming CDF agree row for row."""
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = DeltaWriter.create(spark, tdir, SCHEMA, configuration={
        "delta.enableChangeDataFeed": "true"})
    w.append(_df(spark, [(i, f"v{i}") for i in range(4)]))        # v1 file A
    w.append(_df(spark, [(i, f"v{i}") for i in range(10, 14)]))   # v2 file B
    res = w.delete("k < 4")                                       # v3: drop A
    assert res is not None and res[1] == 4
    assert not os.path.isdir(os.path.join(tdir, "_change_data"))

    batch = sorted((r["_commit_version"], r["_change_type"], r["k"])
                   for r in table_changes(DeltaLog(tdir), spark,
                                          starting_version=2).collect())
    assert batch == [(3, "delete", i) for i in range(4)]

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - already registered on this session
        pass
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (spark.readStream.format("delta_py").option("path", tdir)
         .option("readChangeFeed", "true").option("startingVersion", "3")
         .load().writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()
    stream = sorted((r["_commit_version"], r["_change_type"], r["k"])
                    for r in spark.read.parquet(out).collect()
                    if r["_commit_version"] >= 3)
    assert stream == batch


def test_cdf_full_overwrite_writes_no_cdc(spark, tdir):
    """INSERT OVERWRITE with CDF on: whole-file removes + adds, so no
    cdc files — the feed derives old rows as deletes, new as inserts
    (an overwrite of 100 TB must not write the table twice)."""
    w = DeltaWriter.create(spark, tdir, SCHEMA, configuration={
        "delta.enableChangeDataFeed": "true"})
    w.append(_df(spark, [(1, "old"), (2, "old")]))   # v1
    w.overwrite(_df(spark, [(7, "new")]))            # v2
    assert not os.path.isdir(os.path.join(tdir, "_change_data"))
    got = sorted((r["_change_type"], r["k"])
                 for r in table_changes(DeltaLog(tdir), spark,
                                        starting_version=1).collect())
    assert got == [("delete", 1), ("delete", 2), ("insert", 7)]


def test_cdf_replace_where_partial_still_writes_cdc(spark, tdir):
    """replaceWhere that DV-masks a file PARTIALLY keeps writing cdc for
    the whole commit (once one cdc action exists, readers use cdc
    exclusively) — feed equals replaced-region deletes + inserted rows."""
    w = DeltaWriter.create(spark, tdir, SCHEMA, configuration={
        "delta.enableChangeDataFeed": "true"})
    w.append(_df(spark, [(i, f"v{i}") for i in range(6)]))       # one file
    w.overwrite(_df(spark, [(1, "repl")]), where="k in (1, 2)")  # partial
    assert os.path.isdir(os.path.join(tdir, "_change_data"))
    got = sorted((r["_change_type"], r["k"])
                 for r in table_changes(DeltaLog(tdir), spark,
                                        starting_version=1).collect())
    assert got == [("delete", 1), ("delete", 2), ("insert", 1)]


def test_cdf_partition_drop_on_column_mapped_table(spark, tdir):
    """No-cdc derivation × column mapping: the dropped file is read at
    the PREVIOUS snapshot through the mapping (physical parquet names →
    logical), so the derived deletes carry logical columns exactly like
    cdc-file commits do."""
    w = DeltaWriter.create(spark, tdir, SCHEMA, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true"})
    w.append(_df(spark, [(i, f"v{i}") for i in range(3)]))      # v1 file A
    w.append(_df(spark, [(i, f"v{i}") for i in range(10, 13)]))  # v2 file B
    w.delete("k < 3")                                            # v3 drop A
    assert not os.path.isdir(os.path.join(tdir, "_change_data"))
    got = sorted((r["_commit_version"], r["_change_type"], r["k"], r["v"])
                 for r in table_changes(DeltaLog(tdir), spark,
                                        starting_version=2).collect())
    assert got == [(3, "delete", i, f"v{i}") for i in range(3)]


# ---------- VACUUM LITE (log-tombstone-driven, no listing) ----------


def test_vacuum_lite_uses_log_tombstones_only(spark, tdir):
    """VACUUM LITE (delta-spark 3.3): candidates come from the log's
    remove tombstones — the expired compacted-away file goes, the
    ORPHAN the log never saw stays (a full vacuum's job), and no
    directory walk happens (cost O(tombstones), the object-store-scale
    shape)."""
    w = _mk(spark, tdir, n=6)
    w.append(_df(spark, [(10, "x")]))
    assert w.compact(min_files=2) is not None  # tombstones the old files

    orphan = os.path.join(tdir, "orphan-staging-leftover.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    os.utime(orphan, (1000, 1000))  # ancient: a FULL vacuum would take it

    deleted = w.vacuum(retention_ms=0, lite=True)
    assert deleted and all("orphan" not in p for p in deleted)
    assert os.path.exists(orphan)
    # the table still reads exactly its live content
    got = sorted(r["k"] for r in DeltaTable(tdir).to_df(spark).collect())
    assert got == [0, 1, 2, 3, 4, 5, 10]
    # lite again: nothing left that the log knows about
    assert w.vacuum(retention_ms=0, lite=True) == []
    # a FULL vacuum finally reaps the orphan
    assert any("orphan" in p for p in w.vacuum(retention_ms=0))
    assert not os.path.exists(orphan)
    with pytest.raises(ValueError, match="mutually exclusive"):
        w.vacuum(lite=True, inventory=spark.range(1).selectExpr(
            "'x.parquet' AS path"))
