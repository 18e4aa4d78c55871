"""Round-18 fixes: idle foreachBatch replaceWhere streams must not grow
the log, table_changes_segments is a single driver pass with no probe
jobs, OVERWRITE/replaceWhere/RESTORE conflict retries commit through the
object-store conditional-PUT seam, DELETE/replaceWhere cdc pre-images
derive from the DV diff (exact even for sampling and wall-clock
predicates), and replaceWhere refuses nondeterministic predicates at
entry (its contract check is inherently a second evaluation).

Delta anchors: delta-spark rejects nondeterministic DML conditions
(DeltaAnalysisException NON_DETERMINISTIC_EXPRESSION) — this engine
exceeds that for DELETE by making the single evaluation authoritative;
S3 conditional writes (If-None-Match) as the commit primitive —
reference analogue: delta_transaction_manager.cpp conflict seam.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import DataFrame, types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter, errors
from duckdb_delta_spark.delta.log import DeltaLog

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _mk(spark, path, n=6, configuration=None, partition_by=None):
    w = DeltaWriter.create(spark, path, SCHEMA, configuration=configuration,
                           partition_by=partition_by)
    w.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], SCHEMA).coalesce(1))
    return w


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).coalesce(1)


# ---------- idle replaceWhere streams must not grow the log ----------


def test_foreach_replace_where_skips_empty_batch(spark, tdir):
    """An empty micro-batch commits NOTHING (an idle stream with sparse
    batches must not inflate log replay with no-op commits) — including
    in where=None full-overwrite mode, where the old behavior would have
    TRUNCATED the table. Exactly-once stays intact: the skipped batch id
    carries no txn stamp, and a later non-empty batch commits normally;
    a replayed empty batch is skipped again."""
    from duckdb_delta_spark.streaming.foreach_sink import (
        delta_foreach_replace_where,
    )

    w = _mk(spark, tdir, n=4)
    head = DeltaTable(tdir).snapshot.version

    def pred(batch_df):
        ks = sorted(r["k"] for r in batch_df.select("k").distinct().collect())
        return "k in (" + ",".join(map(str, ks)) + ")"

    fn = delta_foreach_replace_where(tdir, pred, txn_app_id="r18")
    empty = spark.createDataFrame([], SCHEMA)

    fn(empty, 0)                                   # idle batch: no commit
    assert DeltaTable(tdir).snapshot.version == head
    fn(empty, 0)                                   # replayed empty: no-op
    assert DeltaTable(tdir).snapshot.version == head

    fn(_df(spark, [(1, "one")]), 1)                # real batch commits
    assert DeltaTable(tdir).snapshot.version == head + 1
    got = sorted(map(tuple,
                     DeltaTable(tdir).to_df(spark).collect()))
    assert got == [(0, "v0"), (1, "one"), (2, "v2"), (3, "v3")]

    # full-overwrite mode: an idle batch must NOT truncate the table
    fo = delta_foreach_replace_where(tdir, lambda b: None, txn_app_id="fo")
    fo(empty, 0)
    assert DeltaTable(tdir).snapshot.version == head + 1
    assert sorted(map(tuple, DeltaTable(tdir).to_df(spark).collect())) == got


# ---------- segments: one driver pass, zero probe jobs ----------


def test_cdf_segments_issue_no_count_jobs(spark, tdir, monkeypatch):
    """table_changes_segments never fires a Spark job: boundary commits
    are metadata-only (row-free by construction) and zero-commit eras are
    dropped statically. Guarded by making ANY count()/isEmpty() call
    explode — the walk must stay lazy. Covers the probe-prone shapes: a
    rename as the FINAL commit (trailing zero-commit era) and two
    back-to-back renames (zero-commit middle era)."""
    from duckdb_delta_spark.delta.changes import table_changes_segments

    w = _mk(spark, tdir, n=4, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })                                            # v1: insert 0..3
    w.delete("k = 0")                             # v2: delete 0
    v3 = w.rename_column("v", "label")            # v3: boundary
    v4 = w.rename_column("label", "tag")          # v4: boundary (adjacent)

    def boom(self, *a, **kw):                     # pragma: no cover
        raise AssertionError("segments walk must not run Spark jobs")

    monkeypatch.setattr(DataFrame, "count", boom)
    monkeypatch.setattr(DataFrame, "isEmpty", boom)
    segs = table_changes_segments(DeltaLog(tdir), spark, -1)
    monkeypatch.undo()

    # the (v3, v3] era between the adjacent renames and the trailing
    # (v4, v4] era are both zero-commit: dropped without any probe
    assert [(s, e) for s, e, _ in segs] == [(-1, v3 - 1)]
    rows = sorted((r["_commit_version"], r["_change_type"], r["k"])
                  for r in segs[0][2].collect())
    assert rows == sorted([(1, "insert", i) for i in range(4)]
                          + [(2, "delete", 0)])


# ---------- DML conflict retries through the conditional-PUT store ----------


class _CountingStore:
    """Conditional-PUT LogStore (If-None-Match model): refuses the second
    PUT of a key — the object-store commit primitive."""

    def __init__(self):
        self.puts = 0

    def put_if_absent(self, path, data):
        self.puts += 1
        if os.path.exists(path):
            raise FileExistsError(path)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.rename(tmp, path)


def test_replace_where_retry_through_object_store_stub(spark, tdir):
    """A replaceWhere losing the version race to a DISJOINT append
    retries and commits THROUGH the conditional-PUT store: first PUT
    412s, re-validation passes (no racer rows inside the region), second
    PUT wins the next version."""
    w = _mk(spark, tdir, n=6)
    store = _CountingStore()
    loser = DeltaWriter(tdir, spark, store=store)  # pins pre-race snapshot
    DeltaWriter(tdir, spark).append(_df(spark, [(100, "racer")]))

    v = loser.overwrite(_df(spark, [(2, "two")]), where="k >= 2 and k < 4")
    assert store.puts == 2, "expected one 412 + one winning PUT"
    assert v == DeltaTable(tdir).snapshot.version
    got = sorted(map(tuple, DeltaTable(tdir).to_df(spark).collect()))
    assert got == [(0, "v0"), (1, "v1"), (2, "two"), (4, "v4"),
                   (5, "v5"), (100, "racer")]

    # a racer INSIDE the region still loses loudly through the store
    store2 = _CountingStore()
    loser2 = DeltaWriter(tdir, spark, store=store2)
    DeltaWriter(tdir, spark).append(_df(spark, [(2, "inside")]))
    with pytest.raises(errors.CommitConflictError):
        loser2.overwrite(_df(spark, [(2, "x")]), where="k >= 2 and k < 4")
    assert store2.puts == 1  # the 412; re-validation refused the retry


def test_restore_retry_through_object_store_stub(spark, tdir):
    """RESTORE losing the race to a state-free VACUUM-logging commit
    rebases past it and commits through the REAL S3-model store
    (ObjectStoreLogStore over FilesystemObjectStore): the loser's first
    conditional PUT 412s, the rebase retry wins the next version."""
    from duckdb_delta_spark.delta.objectstore import (
        FilesystemObjectStore,
        ObjectStoreLogStore,
    )

    w = _mk(spark, tdir, n=3)                      # v0 create, v1 append
    w.append(_df(spark, [(10, "ten")]))            # v2
    client = FilesystemObjectStore()
    loser = DeltaWriter(tdir, spark, store=ObjectStoreLogStore(client))
    DeltaWriter(tdir, spark).vacuum(retention_ms=10**12, logging=True)

    v = loser.restore(version=1)
    assert v is not None
    assert client.conflicts == 1 and client.puts == 2  # one 412 + one win
    assert sorted(r["k"] for r in DeltaTable(tdir).to_df(spark).collect()) \
        == [0, 1, 2]


# ---------- CDF pre-image re-scan requires a deterministic predicate ----------


def test_cdf_sampling_delete_preimages_match_mask(spark, tdir):
    """A rand()-based sampling DELETE on a CDF table is SOUND here:
    the predicate is evaluated exactly once (into the DV build), and
    cdc pre-images derive from the DV DIFF — never a re-scan that would
    select a different random subset. The cdc 'delete' rows must equal
    EXACTLY the rows that vanished from the table (LLM-pipeline random
    downsampling with an auditable change feed)."""
    w = _mk(spark, tdir, n=200, configuration={
        "delta.enableChangeDataFeed": "true"})
    before = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    res = w.delete("rand() < 0.5 and k >= 10")
    assert res is not None
    head = res[0]
    after = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    vanished = {k: v for k, v in before.items() if k not in after}
    assert 0 < len(vanished) < 190  # the sample actually sampled
    assert all(k >= 10 for k in vanished)

    from duckdb_delta_spark.delta.changes import table_changes

    feed = table_changes(DeltaLog(tdir), spark, head - 1, head).collect()
    assert all(r["_change_type"] == "delete" for r in feed)
    assert {r["k"]: r["v"] for r in feed} == vanished


def test_cdf_wall_clock_delete_preimages_match_mask(spark, tdir):
    """The same exactness bar for a WALL-CLOCK predicate
    (current_timestamp()-relative retention): Catalyst calls it
    deterministic, but each query binds its own current time, so a
    pre-image re-scan could match MORE rows than the mask did. DV-diff
    derivation makes the cdc rows equal the masked rows regardless."""
    import time as _t

    w = DeltaWriter.create(spark, tdir, SCHEMA, configuration={
        "delta.enableChangeDataFeed": "true"})
    now_s = int(_t.time())
    # half the rows are "old" relative to the wall clock, half are far
    # in the future; keys 0..9 old
    rows = [(i, str(now_s - (10**6 if i < 10 else -10**6))) for i in range(20)]
    w.append(_df(spark, rows))
    res = w.delete(
        "cast(v as long) < unix_timestamp(current_timestamp())")
    assert res is not None and res[1] == 10
    from duckdb_delta_spark.delta.changes import table_changes

    feed = table_changes(DeltaLog(tdir), spark, res[0] - 1, res[0]).collect()
    assert sorted(r["k"] for r in feed) == list(range(10))
    assert all(r["_change_type"] == "delete" for r in feed)
    assert sorted(r["k"] for r in
                  DeltaTable(tdir).to_df(spark).collect()) == \
        list(range(10, 20))


def test_replace_where_rejects_nondeterministic_condition(spark, tdir):
    """replaceWhere refuses nondeterministic predicates AT ENTRY (with
    or without CDF): the flow evaluates the predicate several times —
    contract check, region mask, cdc pre-images — and two evaluations
    would replace one region while validating another."""
    for conf in ({"delta.enableChangeDataFeed": "true"}, None):
        path = tdir + ("_cdf" if conf else "_plain")
        w = _mk(spark, path, n=20, configuration=conf)
        with pytest.raises(errors.UnsupportedFeatureError,
                           match="nondeterministic"):
            w.overwrite(_df(spark, [(1, "x")]), where="rand() < 0.5")
        assert DeltaTable(path).to_df(spark).count() == 20


# ---------- TRUE thread-concurrent writers: serializable in commit order ----------


THREAD_VARIANTS = {
    # the original mix: every op family, spread contention
    "mixed": {
        "A": [("append", 0), ("delete", 0), ("merge", 1),
              ("update", 2), ("replace", 1)],
        "B": [("delete", 1), ("append", 1), ("update", 0),
              ("merge", 2), ("addcol", 0)],
        "C": [("merge", 0), ("replace", 2), ("append", 2),
              ("delete", 2), ("update", 1)],
        "D": [("update", 1), ("addcol", 1), ("restore", 0),
              ("append", 3), ("delete", 0)],
    },
    # region contention: four threads replacing/deleting/updating the
    # SAME key ranges — maximal read-set overlap, retries must refuse
    "regions": {
        "A": [("replace", 0), ("delete", 0), ("replace", 1),
              ("update", 0), ("append", 0)],
        "B": [("delete", 0), ("replace", 0), ("update", 1),
              ("replace", 2), ("append", 1)],
        "C": [("update", 0), ("delete", 1), ("replace", 0),
              ("delete", 2), ("append", 2)],
        "D": [("replace", 2), ("update", 2), ("delete", 0),
              ("replace", 1), ("append", 3)],
    },
    # metadata-heavy: racing widenings (addcol + merge_evolve, the
    # metaData-carrying DML) and RESTOREs rolling them back
    "metadata": {
        "A": [("merge_evolve", 0), ("addcol", 0), ("merge", 1),
              ("restore", 0), ("append", 0)],
        "B": [("addcol", 1), ("merge_evolve", 1), ("update", 0),
              ("addcol", 2), ("append", 1)],
        "C": [("restore", 0), ("merge_evolve", 2), ("delete", 0),
              ("addcol", 3), ("append", 2)],
        "D": [("update", 1), ("restore", 0), ("merge_evolve", 0),
              ("delete", 1), ("append", 3)],
    },
}


@pytest.mark.parametrize("variant", list(THREAD_VARIANTS))
def test_threaded_writers_serialize_in_commit_order(spark, tdir, variant):
    """Four OS threads hammer one CDF-enabled table CONCURRENTLY (no
    pinned turn-taking — every interleaving, retry, and put-if-absent
    race is real). The serializability oracle: fold each committed op's
    SEMANTIC effect (predicate + payload) over a pure-Python model in
    LOG-COMMIT order; the table must equal the fold, and the change feed
    must replay to it. Ops that lose loudly (CommitConflictError) must
    leave no trace — any residue breaks the fold equality.

    Complements the derandomized 3-writer fuzz (pinned snapshots,
    deterministic commit order) with genuine thread interleaving:
    commit-version allocation under contention, retry re-validation
    against snapshots that move WHILE the op runs, and the local
    O_EXCL put-if-absent as the only arbiter. Three op-mix variants:
    spread contention, same-region contention, metadata-heavy
    (widenings racing RESTOREs)."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    w0 = DeltaWriter.create(spark, tdir, schema, configuration={
        "delta.enableChangeDataFeed": "true"})
    w0.append(spark.createDataFrame(
        [(k, k) for k in range(30)], schema).coalesce(1))   # v1: seed
    SEED_V = 1
    BASE = {"A": 100, "B": 200, "C": 300, "D": 400}

    # per-thread scripts: heavy key overlap on [0, 30) to force real
    # conflicts; appends/merges use disjoint per-(thread, step) keys
    SCRIPTS = THREAD_VARIANTS[variant]

    from thread_evidence import Evidence

    ev = Evidence(f"serialize-{variant}")

    def run_thread(who):
        """Returns [(commit_version, kind, f)] for ops that committed."""
        w = DeltaWriter(tdir, spark)
        out = []
        barrier.wait()
        for kind, f in SCRIPTS[who]:
            lo, hi = f * 10, f * 10 + 5
            try:
                if kind == "append":
                    res = w.append(spark.createDataFrame(
                        [(BASE[who] + f * 10 + j, j) for j in range(3)],
                        schema).coalesce(1))
                elif kind == "delete":
                    res = w.delete(f"k >= {lo} and k < {hi}")
                elif kind == "update":
                    res = w.update(f"k >= {lo} and k < {hi}",
                                   {"v": "v + 1000"})
                elif kind == "merge":
                    src = spark.createDataFrame(
                        [(lo + 2, 7000 + BASE[who]),
                         (BASE[who] + 50 + f, 7000 + BASE[who])], schema)
                    res = w.merge(src, "t.k = s.k",
                                  when_matched_update={"v": "s.v"})
                elif kind == "merge_evolve":
                    evo = T.StructType(list(schema.fields) + [
                        T.StructField(f"mc_{who.lower()}_{f}", T.LongType())])
                    src = spark.createDataFrame(
                        [(lo + 2, 7000 + BASE[who], int(f)),
                         (BASE[who] + 60 + f, 7000 + BASE[who], int(f))],
                        evo)
                    res = w.merge(src, "t.k = s.k",
                                  when_matched_update={"v": "s.v"},
                                  merge_schema=True)
                elif kind == "replace":
                    res = w.overwrite(
                        spark.createDataFrame([(lo, 999)], schema)
                        .coalesce(1),
                        where=f"k >= {lo} and k < {hi}")
                elif kind == "restore":
                    res = w.restore(version=SEED_V)
                elif kind == "addcol":
                    res = w.add_column(f"x_{who.lower()}_{f}", "long")
            except errors.CommitConflictError:
                ev.op(who, kind, f=f, outcome="conflict")
                continue                    # loud loss: must leave no trace
            except errors.SchemaError:
                # also a loud loss: a racer WIDENED the table mid-flight
                # and this op's source no longer carries every table
                # column (plain merge's insert clause requires them) —
                # documented refusal; the fold equality below verifies
                # it left no trace
                ev.op(who, kind, f=f, outcome="schema_refusal")
                continue
            if res is None:
                ev.op(who, kind, f=f, outcome="noop")
                continue                    # genuine no-op on its snapshot
            v = res if isinstance(res, int) else res[0]
            ev.op(who, kind, f=f, version=v)
            out.append((v, kind, f, who))
        return out

    barrier = threading.Barrier(len(SCRIPTS))
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
        elif kind == "merge":
            for k in (lo + 2, BASE[who] + 50 + f):
                model[k] = 7000 + BASE[who]
        elif kind == "merge_evolve":
            for k in (lo + 2, BASE[who] + 60 + f):
                model[k] = 7000 + BASE[who]
        elif kind == "replace":
            for k in range(lo, hi):
                model.pop(k, None)
            model[lo] = 999
        elif kind == "restore":
            model = {k: k for k in range(30)}
        # addcol: row-content identity

    got = {r["k"]: r["v"] for r in
           DeltaTable(tdir).to_df(spark).select("k", "v").collect()}
    ev.check(got == model, "table state != log-order fold oracle",
             committed=sorted(committed), got=sorted(got.items()),
             model=sorted(model.items()))

    # the change feed replays to the same state (delete-before-insert
    # within a commit, like the fuzz's replay property). One interleaving
    # is legitimately unservable: a RESTORE that crosses a racer's ADD
    # COLUMN rolls the schema back NON-additively in a commit that also
    # carries data changes — both table_changes and the segment walker
    # must refuse that range LOUDLY rather than null-fill (delta-spark's
    # non-additive-schema-change error), and only then is replay skipped.
    from duckdb_delta_spark.delta.changes import table_changes
    from duckdb_delta_spark.delta.errors import SchemaError

    try:
        feed = table_changes(DeltaLog(tdir), spark, -1).collect()
    except SchemaError:
        restores = [v for v, kind, _f, _w in committed if kind == "restore"]
        widens = [v for v, kind, _f, _w in committed
                  if kind in ("addcol", "merge_evolve")]
        ev.check(
            bool(restores and widens and min(widens) < max(restores)),
            "CDF refused a range with no schema-rollback to justify it",
            committed=sorted(committed))
        return
    replay: dict = {}
    for r in sorted(feed,
                    key=lambda r: (r["_commit_version"],
                                   0 if r["_change_type"] == "delete"
                                   else 1)):
        if r["_change_type"] in ("insert", "update_postimage"):
            replay[r["k"]] = r["v"]
        elif r["_change_type"] == "delete":
            replay.pop(r["k"], None)
    ev.check(replay == model, "CDF replay != fold oracle",
             committed=sorted(committed), replay=sorted(replay.items()),
             model=sorted(model.items()))


def test_threaded_ingest_optimize_retention_triad(spark, tdir):
    """The production concurrency triad on ONE table, real threads: an
    exactly-once ingest loop (txn-stamped appends), an OPTIMIZE loop
    (dataChange=false compaction), and a retention job (partition-drop
    DELETEs — remove-only, no cdc rewrite — plus VACUUM-protocol
    logging, the state-free racer everyone must rebase past). Loud
    losses are allowed for OPTIMIZE/retention (they re-run); the ingest
    path must land ALL batches exactly once. Final state is made
    deterministic by a post-join retention sweep; the change feed must
    replay to it through the compaction noise (dataChange=false commits
    contribute nothing)."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from thread_evidence import Evidence

    schema = T.StructType([
        T.StructField("day", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    DeltaWriter.create(spark, tdir, schema, partition_by=["day"],
                       configuration={"delta.enableChangeDataFeed": "true"})
    N_BATCH, PER = 8, 25   # days 0..3, two batches each
    ev = Evidence("triad")

    def batch_rows(b):
        return [(b // 2, b * 1000 + j, j) for j in range(PER)]

    barrier = threading.Barrier(3)

    def ingest():
        w = DeltaWriter(tdir, spark)
        barrier.wait()
        for b in range(N_BATCH):
            v = w.append(spark.createDataFrame(batch_rows(b), schema)
                         .coalesce(1),
                         txn_app_id="ingest", txn_version=b, max_retries=25)
            ev.op("ingest", "append", batch=b, version=v)

    def compactor():
        w = DeltaWriter(tdir, spark)
        barrier.wait()
        n = 0
        for i in range(6):
            try:
                v = w.compact(min_files=2)
                ev.op("compactor", "compact", attempt=i, version=v)
                if v is not None:
                    n += 1
            except errors.CommitConflictError:
                ev.op("compactor", "compact", attempt=i, outcome="conflict")
                continue
        return n

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
        futs = [ex.submit(ev.wrap(n, f)) for n, f in
                (("ingest", ingest), ("compactor", compactor),
                 ("retention", retention))]
        for f in futs:
            f.result(timeout=600)

    # deterministic final sweep: whatever the interleaving left of days
    # 0/1, retention finishes the job after the race
    w = DeltaWriter(tdir, spark)
    for day in (0, 1):
        w.delete(f"day = {day}")

    snap = DeltaTable(tdir).snapshot
    ev.check(snap.transaction_version("ingest") == N_BATCH - 1,
             "not every ingest batch landed exactly once",
             txn_version=snap.transaction_version("ingest"))
    expected = {r[1]: (r[0], r[2]) for b in range(4, 8)
                for r in batch_rows(b)}
    got = {r["id"]: (r["day"], r["v"]) for r in
           DeltaTable(tdir).to_df(spark).collect()}
    ev.check(got == expected, "final table state != fold oracle",
             n_got=len(got), n_expected=len(expected),
             extra_keys=sorted(set(got) - set(expected))[:20],
             missing_keys=sorted(set(expected) - set(got))[:20])

    # replayed batch with DIFFERENT data is skipped (exactly-once)
    from duckdb_delta_spark.streaming.foreach_sink import delta_foreach_batch

    head = snap.version
    delta_foreach_batch(tdir, txn_app_id="ingest")(
        spark.createDataFrame([(9, 10**6, -1)], schema), 3)
    ev.check(DeltaTable(tdir).snapshot.version == head,
             "replayed ingest batch was not skipped",
             head=head, got=DeltaTable(tdir).snapshot.version)

    # change feed replays to the final state through the noise:
    # compaction commits add nothing, partition drops derive deletes
    # without cdc files, racing interleavings fold away
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


def test_cdf_delete_mixed_full_and_partial_files(spark, tdir):
    """One DELETE spanning a FULLY-covered file and a PARTIALLY-masked
    one: a partial file forces cdc for the whole commit (readers use cdc
    exclusively once present), so the pre-images must combine the full
    file's live rows (restricted scan, no predicate) with the partial
    file's DV-diff rows — both derived without re-evaluating the
    predicate."""
    from duckdb_delta_spark.delta.changes import table_changes

    w = DeltaWriter.create(spark, tdir, SCHEMA, configuration={
        "delta.enableChangeDataFeed": "true"})
    w.append(_df(spark, [(i, f"a{i}") for i in range(5)]))     # file A: 0..4
    w.append(_df(spark, [(i, f"b{i}") for i in range(10, 15)]))  # file B
    res = w.delete("k < 12")     # all of A, part of B
    assert res is not None and res[1] == 7
    assert os.path.isdir(os.path.join(tdir, "_change_data"))

    feed = table_changes(DeltaLog(tdir), spark, res[0] - 1, res[0]).collect()
    assert all(r["_change_type"] == "delete" for r in feed)
    assert sorted((r["k"], r["v"]) for r in feed) == \
        [(i, f"a{i}") for i in range(5)] + [(10, "b10"), (11, "b11")]
    assert sorted(r["k"] for r in DeltaTable(tdir).to_df(spark).collect()) \
        == [12, 13, 14]


def test_cdf_update_nondeterministic_assignment_postimage_matches(spark, tdir):
    """UPDATE ... SET v = uuid()-class assignments: the data write and
    the cdc postimage write are two jobs, so the computed images are
    PINNED (persist) — the postimage in the change feed must equal the
    row actually written to the table, byte for byte."""
    from duckdb_delta_spark.delta.changes import table_changes

    w = _mk(spark, tdir, n=8, configuration={
        "delta.enableChangeDataFeed": "true"})
    res = w.update("k < 4", {"v": "concat('u-', uuid())"})
    assert res is not None and res[1] == 4
    table = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    post = {r["k"]: r["v"]
            for r in table_changes(DeltaLog(tdir), spark,
                                   res[0] - 1, res[0]).collect()
            if r["_change_type"] == "update_postimage"}
    assert set(post) == {0, 1, 2, 3}
    assert all(post[k] == table[k] for k in post), (post, table)
    assert all(v.startswith("u-") for v in post.values())


def test_cdf_merge_nondeterministic_assignment_postimage_matches(spark, tdir):
    """Same pin for MERGE: update assignments and insert expressions
    evaluating uuid() must agree between the written files and the cdc
    images (update_postimage AND insert rows)."""
    from duckdb_delta_spark.delta.changes import table_changes

    w = _mk(spark, tdir, n=4, configuration={
        "delta.enableChangeDataFeed": "true"})
    src = spark.createDataFrame([(1, "x"), (99, "x")], SCHEMA)
    res = w.merge(src, "t.k = s.k",
                  when_matched_update={"v": "concat('m-', uuid())"})
    assert res is not None
    version = res[0]
    table = {r["k"]: r["v"] for r in DeltaTable(tdir).to_df(spark).collect()}
    feed = table_changes(DeltaLog(tdir), spark, version - 1,
                         version).collect()
    post = {r["k"]: r["v"] for r in feed
            if r["_change_type"] in ("update_postimage", "insert")}
    assert set(post) == {1, 99}
    assert all(post[k] == table[k] for k in post), (post, table)
    assert post[1].startswith("m-")
