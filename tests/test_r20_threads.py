"""Round-20 REAL-thread concurrency extension (verdict r19 #6): the CDF
STREAM READER races live writers.

The r19 threaded mix raced writers (appends / deletes / updates /
renames) against each other and replayed the feed BATCH-side after the
dust settled; the stream reader's schema-boundary check was only ever
exercised sequentially. Here one thread drains a ``readChangeFeed``
stream micro-batch by micro-batch — the real planning path
(latestOffset → partitions → read), same code Structured Streaming
drives — while writer threads append, delete, update and RENAME the
value column out from under it. The contract under race: the stream
serves frames EQUAL to the committed history's change feed up to the
last offset it drained, then fails with the loud boundary error naming
``table_changes_segments`` — it never serves a post-rename row under
the old column name (mislabeling) and never drops or duplicates a
pre-boundary row.
"""

from __future__ import annotations

import threading
import time
from collections import Counter
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter, errors
from duckdb_delta_spark.delta.log import DeltaLog


def test_threaded_cdf_stream_reader_races_writers(spark, tdir):
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    w0 = DeltaWriter.create(spark, tdir, schema, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })
    w0.append(spark.createDataFrame(
        [(k, k) for k in range(20)], schema).coalesce(1))       # v1: seed

    from duckdb_delta_spark.delta.errors import SchemaError
    from duckdb_delta_spark.delta.snapshot import Snapshot
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    from thread_evidence import Evidence

    ev = Evidence("cdf-reader-race")
    barrier = threading.Barrier(4)
    writers_done = threading.Event()
    rename_version: list = []        # single committed rename's version

    # the reader pins its schema NOW — before any writer runs — so the
    # pinned era is the seed (k, v) schema and every post-rename commit
    # is a non-additive boundary for it
    src = DeltaPySource({"path": tdir, "readChangeFeed": "true",
                         "startingVersion": "0"})
    reader = src.streamReader(src.schema())
    log = DeltaLog(tdir)

    def vcol_of(snap) -> str:
        return snap.schema.fields[1].name

    def appender():
        w = DeltaWriter(tdir, spark)
        barrier.wait()
        for b in range(6):
            try:
                snap = Snapshot.build(w.log)
                vc = vcol_of(snap)
                v = w.append(spark.createDataFrame(
                    [(100 + b * 10 + j, j) for j in range(3)],
                    T.StructType([T.StructField("k", T.LongType()),
                                  T.StructField(vc, T.LongType())]))
                    .coalesce(1))
                ev.op("appender", "append", b=b, version=v)
            except (errors.CommitConflictError, errors.SchemaError):
                ev.op("appender", "append", b=b, outcome="loud_loss")

    def mutator():
        w = DeltaWriter(tdir, spark)
        barrier.wait()
        for i, (kind, lo) in enumerate(
                (("delete", 0), ("update", 5), ("delete", 10),
                 ("update", 15))):
            try:
                if kind == "delete":
                    v = w.delete(f"k >= {lo} and k < {lo + 4}")
                else:
                    snap = Snapshot.build(w.log)
                    vc = vcol_of(snap)
                    v = w.update(f"k >= {lo} and k < {lo + 4}",
                                 {vc: f"{vc} + 1000"})
                ev.op("mutator", kind, lo=lo, version=v)
            except (errors.CommitConflictError, errors.SchemaError):
                ev.op("mutator", kind, lo=lo, outcome="loud_loss")

    def renamer():
        w = DeltaWriter(tdir, spark)
        barrier.wait()
        time.sleep(0.4)              # let some pre-boundary commits land
        for attempt in range(30):    # the boundary MUST commit
            try:
                snap = Snapshot.build(w.log)
                v = w.rename_column(vcol_of(snap), "val")
                rename_version.append(v)
                ev.op("renamer", "rename", attempt=attempt, version=v)
                break
            except (errors.CommitConflictError, errors.SchemaError):
                ev.op("renamer", "rename", attempt=attempt,
                      outcome="conflict")
        else:  # pragma: no cover
            raise AssertionError("rename never committed")
        v = w.append(spark.createDataFrame(
            [(999, 9)],
            T.StructType([T.StructField("k", T.LongType()),
                          T.StructField("val", T.LongType())]))
            .coalesce(1))
        ev.op("renamer", "post_rename_append", version=v)

    drained: list = []               # (commit_version, change_type, k, v)
    state = {"last": None, "boundary": None}

    def reader_thread():
        start = reader.initialOffset()["version"]
        barrier.wait()
        while True:
            head = reader.latestOffset()["version"]
            if head <= start:
                if writers_done.is_set():
                    break
                time.sleep(0.01)
                continue
            try:
                parts = reader.partitions({"version": start},
                                          {"version": head})
            except SchemaError as e:
                state["boundary"] = e
                ev.op("reader", "boundary", at_head=head, drained_to=start)
                break
            n = 0
            for p in parts:
                for rb in reader.read(p):
                    for row in rb.to_pylist():
                        drained.append((row["_commit_version"],
                                        row["_change_type"],
                                        row["k"], row["v"]))
                        n += 1
            ev.op("reader", "drain", start=start, end=head, rows=n)
            start = head
            state["last"] = head

    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [ex.submit(ev.wrap(n, f)) for n, f in
                (("appender", appender), ("mutator", mutator),
                 ("renamer", renamer))]
        fr = ex.submit(ev.wrap("reader", reader_thread))
        for f in futs:
            f.result(timeout=600)
        writers_done.set()
        fr.result(timeout=600)

    # the rename always commits, so the reader must end on the LOUD
    # boundary error (never a silent stop, never mislabeled rows)
    ev.check(state["boundary"] is not None,
             "reader never hit the boundary despite a committed rename",
             rename_version=rename_version, last=state["last"])
    ev.check("table_changes_segments" in str(state["boundary"])
             or "non-additive" in str(state["boundary"]),
             "boundary error does not name the remediation",
             error=str(state["boundary"]))

    # nothing served at or past the rename: the pinned (k, v) schema
    # cannot label post-rename rows
    rv = rename_version[0]
    ev.check(all(cv < rv for cv, *_ in drained),
             "reader served rows from at/after the rename boundary",
             rename_version=rv,
             bad=[d for d in drained if d[0] >= rv][:10])

    # drained rows == the committed history's change feed, exactly, up
    # to the last fully-drained offset (era-segmented batch feed is the
    # oracle; every drained version is pre-boundary so the value column
    # is the seed-era "v" in both)
    from duckdb_delta_spark.delta.changes import table_changes_segments

    last = state["last"]
    if last is None:      # reader hit the boundary on its first plan
        ev.check(drained == [], "rows drained without a recorded offset",
                 n=len(drained))
        return
    feed: list = []
    for _s, _e, fr_ in table_changes_segments(log, spark, -1):
        vc = fr_.columns[1]
        feed.extend(
            (r["_commit_version"], r["_change_type"], r["k"], r[vc])
            for r in fr_.collect() if r["_commit_version"] <= last)
    ev.check(Counter(drained) == Counter(feed),
             "drained stream rows != committed feed up to drained offset",
             drained_to=last, n_drained=len(drained), n_feed=len(feed),
             only_drained=sorted(set(drained) - set(feed))[:10],
             only_feed=sorted(set(feed) - set(drained))[:10])
