"""Round-19 REAL-thread concurrency extensions (verdict r18 #1/#6):

* the streaming foreachBatch replaceWhere sink racing OPTIMIZE and a
  retention job on one table — sink retries must serialize-or-raise,
  every batch must land exactly once, and the CDF must replay to the
  final state through the compaction noise;
* four threads whose op mix includes RENAME COLUMN on a column-mapped
  CDF table — the non-additive boundary op joins the racing suite: the
  fold oracle goes schema-dynamic, and the change-feed replay drains
  through table_changes_segments when a committed rename makes the
  whole-range feed refuse loudly.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter, errors
from duckdb_delta_spark.delta.log import DeltaLog


def test_threaded_replace_sink_optimize_retention(spark, tdir):
    """The streaming replaceWhere sink (callable batch-derived predicate,
    exactly-once txn stamps) races an OPTIMIZE loop and a retention job
    (partition-drop DELETE + VACUUM logging) on one CDF table, real
    threads. The sink thread retries loud losses — every batch must land
    EXACTLY once; the final table equals the last replace per day (after
    a deterministic post-join retention sweep), and the change feed
    replays to it through the dataChange=false compaction noise."""
    schema = T.StructType([
        T.StructField("day", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    DeltaWriter.create(spark, tdir, schema, partition_by=["day"],
                       configuration={"delta.enableChangeDataFeed": "true"})
    N_BATCH, PER = 8, 10   # batch b replaces day b//2 (days 0..3, twice)

    def batch_rows(b):
        return [(b // 2, b * 1000 + j, j) for j in range(PER)]

    def pred(batch_df):
        days = sorted(r["day"] for r in
                      batch_df.select("day").distinct().collect())
        return "day in (" + ",".join(map(str, days)) + ")"

    from duckdb_delta_spark.streaming.foreach_sink import (
        delta_foreach_replace_where,
    )

    from thread_evidence import Evidence

    ev = Evidence("replace-sink-triad")
    barrier = threading.Barrier(3)

    def sink():
        fn = delta_foreach_replace_where(tdir, pred, txn_app_id="replsink")
        barrier.wait()
        for b in range(N_BATCH):
            for attempt in range(30):
                try:
                    fn(spark.createDataFrame(batch_rows(b), schema)
                       .coalesce(1), b)
                    ev.op("sink", "replace", batch=b, attempt=attempt)
                    break
                except errors.CommitConflictError:
                    ev.op("sink", "replace", batch=b, attempt=attempt,
                          outcome="conflict")
                    continue            # loud loss: replay the batch
            else:                       # pragma: no cover
                raise AssertionError(f"batch {b} never landed")

    def compactor():
        w = DeltaWriter(tdir, spark)
        barrier.wait()
        for i in range(6):
            try:
                v = w.compact(min_files=2)
                ev.op("compactor", "compact", attempt=i, version=v)
            except errors.CommitConflictError:
                ev.op("compactor", "compact", attempt=i, outcome="conflict")
                continue

    def retention():
        w = DeltaWriter(tdir, spark)
        barrier.wait()
        for i, day in enumerate((0, 1, 0)):
            try:
                v = w.delete(f"day = {day}")
                ev.op("retention", "delete", day=day, version=v)
            except errors.CommitConflictError:
                ev.op("retention", "delete", day=day, outcome="conflict")
            v = w.vacuum(retention_ms=10**12, logging=True)
            ev.op("retention", "vacuum", round=i, version=v)

    with ThreadPoolExecutor(max_workers=3) as ex:
        for f in [ex.submit(ev.wrap(n, g)) for n, g in
                  (("sink", sink), ("compactor", compactor),
                   ("retention", retention))]:
            f.result(timeout=600)

    # deterministic final sweep: whatever interleaving won on days 0/1,
    # retention finishes the job after the race
    w = DeltaWriter(tdir, spark)
    for day in (0, 1):
        w.delete(f"day = {day}")

    snap = DeltaTable(tdir).snapshot
    ev.check(snap.transaction_version("replsink") == N_BATCH - 1,
             "not every sink batch landed exactly once",
             txn_version=snap.transaction_version("replsink"))
    # last replace per surviving day wins: batch 5 owns day 2, 7 owns 3
    expected = {r[1]: (r[0], r[2]) for b in (5, 7) for r in batch_rows(b)}
    got = {r["id"]: (r["day"], r["v"]) for r in
           DeltaTable(tdir).to_df(spark).collect()}
    ev.check(got == expected, "final table state != last-replace-wins",
             n_got=len(got), n_expected=len(expected),
             extra_keys=sorted(set(got) - set(expected))[:20],
             missing_keys=sorted(set(expected) - set(got))[:20])

    # a replayed batch with different data must be skipped (exactly-once)
    head = DeltaTable(tdir).snapshot.version
    fn = delta_foreach_replace_where(tdir, pred, txn_app_id="replsink")
    fn(spark.createDataFrame([(9, 10**6, -1)], schema), 3)
    ev.check(DeltaTable(tdir).snapshot.version == head,
             "replayed sink batch was not skipped", head=head)

    # CDF replays to the final state through the noise
    from duckdb_delta_spark.delta.changes import table_changes

    replay: dict = {}
    for r in sorted(table_changes(DeltaLog(tdir), spark, -1).collect(),
                    key=lambda r: (r["_commit_version"],
                                   0 if r["_change_type"] == "delete"
                                   else 1)):
        if r["_change_type"] in ("insert", "update_postimage"):
            replay[r["id"]] = (r["day"], r["v"])
        elif r["_change_type"] == "delete":
            replay.pop(r["id"], None)
    ev.check(replay == expected, "CDF replay != final state",
             n_replay=len(replay), n_expected=len(expected))


def test_threaded_writers_with_renames_serialize_or_loud(spark, tdir):
    """Four OS threads on a column-mapped CDF table with RENAME COLUMN in
    the op mix — the non-additive boundary op the racing suite lacked.
    Serializability oracle as in the r18 threaded test (fold committed
    ops' semantics in log-commit order; renames are row-content
    identity), made schema-dynamic: the value column's FINAL name comes
    from the table schema. The change-feed property upgrades to the
    segmented drain: with a committed rename the whole-range feed must
    refuse loudly, and folding the CONCATENATED segments (value column
    resolved per era) must still replay to the model."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    w0 = DeltaWriter.create(spark, tdir, schema, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })
    w0.append(spark.createDataFrame(
        [(k, k) for k in range(30)], schema).coalesce(1))   # v1: seed
    BASE = {"A": 100, "B": 200, "C": 300, "D": 400}
    SCRIPTS = {
        "A": [("append", 0), ("rename", 0), ("delete", 1), ("update", 2),
              ("append", 1)],
        "B": [("delete", 0), ("update", 1), ("rename", 1), ("append", 2),
              ("delete", 2)],
        "C": [("update", 0), ("append", 3), ("rename", 2), ("update", 1),
              ("delete", 0)],
        "D": [("rename", 3), ("update", 2), ("append", 4), ("rename", 4),
              ("delete", 1)],
    }

    from duckdb_delta_spark.delta.snapshot import Snapshot

    def vcol_of(snap) -> str:
        # the value column keeps position 1 through renames (added
        # columns append at the end; this mix adds none)
        return snap.schema.fields[1].name

    from thread_evidence import Evidence

    ev = Evidence("renames-mix")
    barrier = threading.Barrier(len(SCRIPTS))

    def run_thread(who):
        w = DeltaWriter(tdir, spark)
        out = []
        barrier.wait()
        for kind, f in SCRIPTS[who]:
            lo, hi = f * 10, f * 10 + 5
            try:
                if kind == "append":
                    snap = Snapshot.build(w.log)
                    vc = vcol_of(snap)
                    rows = [(BASE[who] + f * 10 + j, j) for j in range(3)]
                    res = w.append(spark.createDataFrame(
                        rows,
                        T.StructType([T.StructField("k", T.LongType()),
                                      T.StructField(vc, T.LongType())]))
                        .coalesce(1))
                elif kind == "delete":
                    res = w.delete(f"k >= {lo} and k < {hi}")
                elif kind == "update":
                    snap = Snapshot.build(w.log)
                    vc = vcol_of(snap)
                    res = w.update(f"k >= {lo} and k < {hi}",
                                   {vc: f"{vc} + 1000"})
                elif kind == "rename":
                    snap = Snapshot.build(w.log)
                    res = w.rename_column(
                        vcol_of(snap), f"v_{who.lower()}_{f}")
            except (errors.CommitConflictError, errors.SchemaError):
                ev.op(who, kind, f=f, outcome="loud_loss")
                continue        # loud loss (incl. a racer renaming the
            except errors.UnsupportedFeatureError:
                ev.op(who, kind, f=f, outcome="unsupported")
                continue        # column out from under this op mid-plan)
            if res is None:
                ev.op(who, kind, f=f, outcome="noop")
                continue
            v = res if isinstance(res, int) else res[0]
            ev.op(who, kind, f=f, version=v)
            out.append((v, kind, f, who))
        return out

    with ThreadPoolExecutor(max_workers=len(SCRIPTS)) as ex:
        committed = [c for f in [
            ex.submit(ev.wrap(who, run_thread), who) for who in SCRIPTS
        ] for c in f.result(timeout=600)]

    versions = [v for v, *_ in committed]
    ev.check(len(set(versions)) == len(versions),
             "two ops claim one commit version",
             committed=sorted(committed))

    model = {k: k for k in range(30)}
    for v, kind, f, who in sorted(committed):
        lo, hi = f * 10, f * 10 + 5
        if kind == "append":
            for j in range(3):
                model[BASE[who] + f * 10 + j] = j
        elif kind == "delete":
            for k in range(lo, hi):
                model.pop(k, None)
        elif kind == "update":
            for k in range(lo, hi):
                if k in model:
                    model[k] += 1000
        # rename: row-content identity

    final_snap = DeltaTable(tdir).snapshot
    vfinal = vcol_of(final_snap)
    got = {r["k"]: r[vfinal] for r in
           DeltaTable(tdir).to_df(spark).collect()}
    ev.check(got == model, "table state != log-order fold oracle",
             committed=sorted(committed), got=sorted(got.items()),
             model=sorted(model.items()))

    # change-feed replay, era-aware: with a committed rename the
    # whole-range feed refuses LOUDLY; the segmented drain replays
    from duckdb_delta_spark.delta.changes import (
        table_changes,
        table_changes_segments,
    )
    from duckdb_delta_spark.delta.errors import SchemaError

    renames = [v for v, kind, _f, _w in committed if kind == "rename"]
    log = DeltaLog(tdir)
    if renames:
        with pytest.raises(SchemaError, match="table_changes_segments"):
            table_changes(log, spark, -1)
        frames = [fr for _s, _e, fr in
                  table_changes_segments(log, spark, -1)]
    else:  # pragma: no cover - contention-dependent
        frames = [table_changes(log, spark, -1)]
    replay: dict = {}
    rows = []
    for fr in frames:
        vc = fr.columns[1]
        rows.extend(
            (r["_commit_version"], r["_change_type"], r["k"], r[vc])
            for r in fr.collect())
    for ver, ct, k, val in sorted(
            rows, key=lambda t: (t[0], 0 if t[1] == "delete" else 1)):
        if ct in ("insert", "update_postimage"):
            replay[k] = val
        elif ct == "delete":
            replay.pop(k, None)
    ev.check(replay == model, "era-segmented CDF replay != fold oracle",
             committed=sorted(committed), replay=sorted(replay.items()),
             model=sorted(model.items()))
