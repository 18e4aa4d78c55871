"""Round-19 fixes: the replaceWhere CDF path pins ONE evaluation of the
input frame across the cdc and data writes (the UPDATE/MERGE pin's
sibling gap), the foreachBatch replaceWhere sink decides emptiness from
the write's own footer stats (no per-batch isEmpty probe job) and skips
only batch-derived (callable) predicates by default (replace-with-empty
stays a real semantic for static predicates), the nondeterministic-
condition guard falls back to a textual scan when the JVM plan surface
is absent (Spark Connect), `_dv_diff_preimages` handles an all-empty
diff explicitly, and the streaming CDF source fails LOUDLY at a
non-additive schema boundary (rename/drop/type change mid-stream) with
an error naming `table_changes_segments` — delta-spark parity: CDF
streams fail on non-additive changes and require a restart, never serve
rows under the wrong column name or silently null-fill.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import DataFrame, functions as F, types as T

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


def _table(spark, path):
    return {r["k"]: r["v"] for r in DeltaTable(path).to_df(spark).collect()}


# ---------- replaceWhere sink: emptiness from write stats, no probe ----------


def test_foreach_replace_where_no_isempty_probe(spark, tdir, monkeypatch):
    """The sink must never call isEmpty(): emptiness is decided from the
    batch write's own footer stats inside overwrite(skip_if_empty=True).
    With isEmpty booby-trapped, a non-empty batch still commits and an
    empty batch still skips — zero probe jobs either way."""
    from duckdb_delta_spark.streaming.foreach_sink import (
        delta_foreach_replace_where,
    )

    w = _mk(spark, tdir, n=4)
    head = DeltaTable(tdir).snapshot.version

    def boom(self, *a, **kw):  # pragma: no cover
        raise AssertionError("sink must not run an isEmpty probe job")

    monkeypatch.setattr(DataFrame, "isEmpty", boom)

    def pred(batch_df):
        ks = sorted(r["k"] for r in batch_df.select("k").distinct().collect())
        return "k in (" + ",".join(map(str, ks)) + ")"

    fn = delta_foreach_replace_where(tdir, pred, txn_app_id="r19")
    fn(_df(spark, [(1, "one")]), 0)                # non-empty: commits
    assert DeltaTable(tdir).snapshot.version == head + 1
    fn(spark.createDataFrame([], SCHEMA), 1)       # empty: skipped
    assert DeltaTable(tdir).snapshot.version == head + 1
    assert _table(spark, tdir) == {0: "v0", 1: "one", 2: "v2", 3: "v3"}


def test_foreach_replace_where_static_empty_batch_replaces(spark, tdir):
    """Replace-with-empty is a real pipeline semantic for STATIC SQL
    predicates: an empty batch with a static where clears the region
    (with a loud ``stream.replace.empty_commit`` event). where=None is
    the dangerous mode — a full overwrite of an idle/empty batch wipes
    what the previous batch wrote — so it SKIPS by default (r20, per
    advisor) and ``skip_empty=False`` is the explicit truncate opt-in.
    skip_empty=True opts a static predicate back into skipping."""
    from duckdb_delta_spark.streaming.foreach_sink import (
        delta_foreach_replace_where,
    )

    w = _mk(spark, tdir, n=6)
    empty = spark.createDataFrame([], SCHEMA)

    # static predicate: the empty batch REPLACES (clears) the region,
    # and the clear is loudly visible in the event log
    from duckdb_delta_spark.delta import logging as dlog

    events: list = []
    fn = delta_foreach_replace_where(tdir, "k >= 4", txn_app_id="s1")
    dlog.add_sink(events.append)
    try:
        fn(empty, 0)
    finally:
        dlog.remove_sink(events.append)
    assert _table(spark, tdir) == {i: f"v{i}" for i in range(4)}
    assert any(e["event"] == "stream.replace.empty_commit" for e in events)

    # static predicate + skip_empty=True: opt back in to skipping
    head = DeltaTable(tdir).snapshot.version
    fn2 = delta_foreach_replace_where(tdir, "k >= 2", txn_app_id="s2",
                                      skip_empty=True)
    fn2(empty, 0)
    assert DeltaTable(tdir).snapshot.version == head
    assert _table(spark, tdir) == {i: f"v{i}" for i in range(4)}

    # where=None (full overwrite): the empty batch SKIPS by default —
    # truncate-on-idle must never be the default
    fn3 = delta_foreach_replace_where(tdir, None, txn_app_id="s3")
    fn3(empty, 0)
    assert DeltaTable(tdir).snapshot.version == head
    assert _table(spark, tdir) == {i: f"v{i}" for i in range(4)}

    # where=None + skip_empty=False: the explicit truncate opt-in
    fn4 = delta_foreach_replace_where(tdir, None, txn_app_id="s4",
                                      skip_empty=False)
    fn4(empty, 0)
    assert _table(spark, tdir) == {}


def test_foreach_replace_where_callable_empty_never_runs_callable(
        spark, tdir):
    """An empty batch must never reach the callable: a batch-derived
    predicate is meaningless with no rows (an IN-list builder would
    produce 'k in ()' or return None and TRUNCATE)."""
    from duckdb_delta_spark.streaming.foreach_sink import (
        delta_foreach_replace_where,
    )

    w = _mk(spark, tdir, n=3)
    head = DeltaTable(tdir).snapshot.version
    calls = []

    def pred(batch_df):  # pragma: no cover - must not run
        calls.append(1)
        return None

    fn = delta_foreach_replace_where(tdir, pred, txn_app_id="r19c")
    fn(spark.createDataFrame([], SCHEMA), 0)
    assert not calls
    assert DeltaTable(tdir).snapshot.version == head
    assert len(_table(spark, tdir)) == 3


def test_overwrite_skip_if_empty_rolls_back_failed_contract(spark, tdir):
    """Write-first mode: a contract violation AFTER the data write must
    roll the staged files back — no orphan parquet outside the log."""
    w = _mk(spark, tdir, n=4)
    before = {f.path for f in DeltaTable(tdir).snapshot.add_files()}
    with pytest.raises(errors.ConstraintViolationError):
        w.overwrite(_df(spark, [(99, "outside")]), where="k < 2",
                    skip_if_empty=True)
    live = {f.path for f in DeltaTable(tdir).snapshot.add_files()}
    assert live == before
    on_disk = {
        os.path.relpath(os.path.join(r, f), tdir)
        for r, _d, fs in os.walk(tdir) for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
        and "deletion_vector" not in f
    }
    assert on_disk == before, "staged files leaked past the rollback"


# ---------- replaceWhere CDF: the input frame is pinned across writes ----------


def test_cdf_replace_where_nondeterministic_input_insert_matches(spark, tdir):
    """uuid()-bearing INPUT to a replaceWhere on a CDF table: the cdc
    'insert' image write and the data write are two jobs, so the input
    frame is PINNED (persist) — the feed's insert rows must equal the
    rows actually written to the table, byte for byte (the UPDATE/MERGE
    pin's sibling path, ADVICE r18)."""
    from duckdb_delta_spark.delta.changes import table_changes

    w = _mk(spark, tdir, n=8, configuration={
        "delta.enableChangeDataFeed": "true"})
    inp = spark.range(3).select(
        F.col("id").alias("k"),
        F.concat(F.lit("r-"), F.expr("uuid()")).alias("v"),
    ).coalesce(1)
    v = w.overwrite(inp, where="k < 4")   # partial file: forces cdc
    assert v is not None
    table = _table(spark, tdir)
    feed = table_changes(DeltaLog(tdir), spark, v - 1, v).collect()
    ins = {r["k"]: r["v"] for r in feed if r["_change_type"] == "insert"}
    assert set(ins) == {0, 1, 2}
    assert all(ins[k] == table[k] for k in ins), (ins, table)
    assert all(x.startswith("r-") for x in ins.values())
    dels = sorted(r["k"] for r in feed if r["_change_type"] == "delete")
    assert dels == [0, 1, 2, 3]


# ---------- nondeterministic guard: textual fallback without the JVM ----------


def test_replace_where_rejects_nondeterministic_without_jvm_surface(
        spark, tdir, monkeypatch):
    """When the analyzed-plan surface is absent (Spark Connect has no
    _jdf), the guard must NOT silently pass: the predicate's text is
    scanned for the known nondeterministic functions."""
    from duckdb_delta_spark.delta import writer as W

    monkeypatch.setattr(W, "_plan_all_deterministic", lambda df: None)
    w = _mk(spark, tdir, n=6)
    for bad in ("rand() < 0.5", "uuid() = 'x'",
                "monotonically_increasing_id() = 0"):
        with pytest.raises(errors.UnsupportedFeatureError,
                           match="nondeterministic"):
            w.overwrite(_df(spark, [(1, "x")]), where=bad)
    # deterministic predicates still pass through the fallback
    v = w.overwrite(_df(spark, [(1, "one")]), where="k = 1")
    assert v is not None
    assert _table(spark, tdir)[1] == "one"


# ---------- _dv_diff_preimages: explicit empty-diff handling ----------


def test_cdf_stream_fails_loudly_on_rename_midstream(spark, tdir):
    """A rename committed MID-STREAM (after the reader pinned its
    schema): the next planning pass must fail LOUDLY with an error
    naming table_changes_segments — never serve post-rename rows under
    the stream's old column name (the executor read matches files by
    physicalName, so without the check the rows would arrive silently
    mislabeled). A fresh reader restarted past the boundary drains the
    new era; a fresh reader over the WHOLE range fails too (the old era
    is unservable under the new pinned schema — batch parity)."""
    from duckdb_delta_spark.delta.errors import SchemaError
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = _mk(spark, tdir, n=4, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })                                             # v1: insert 0..3
    src = DeltaPySource({"path": tdir, "readChangeFeed": "true"})
    reader = src.streamReader(src.schema())        # pins the (k, v) schema
    pre = reader._cdf_file_refs(0, 1)              # pre-boundary era drains
    assert pre and all(f.change_type == "insert" for f in pre)

    v2 = w.rename_column("v", "label")             # non-additive boundary
    w.append(spark.createDataFrame(
        [(9, "nine")],
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("label", T.StringType())])).coalesce(1))
    head = DeltaTable(tdir).snapshot.version

    with pytest.raises(SchemaError, match="table_changes_segments"):
        reader._cdf_file_refs(1, head)

    # restart past the boundary: pinned at the post-rename schema, the
    # new era drains
    src2 = DeltaPySource({"path": tdir, "readChangeFeed": "true"})
    r2 = src2.streamReader(src2.schema())
    refs = r2._cdf_file_refs(v2, head)
    assert refs and all(f.change_type == "insert" for f in refs)
    # ...but the whole range still crosses the boundary and fails
    with pytest.raises(SchemaError, match="non-additive"):
        r2._cdf_file_refs(0, head)


def test_cdf_stream_rename_fails_loudly_end_to_end(spark, tdir):
    """End-to-end: a readChangeFeed stream planned over a range crossing
    a rename fails the QUERY with the error naming
    table_changes_segments — no rows are served under the wrong name."""
    import shutil as _sh

    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = _mk(spark, tdir, n=4, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })
    w.rename_column("v", "label")
    w.append(spark.createDataFrame(
        [(9, "nine")],
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("label", T.StringType())])).coalesce(1))

    spark.dataSource.register(DeltaPySource)
    out, ckpt = str(tdir) + "_out", str(tdir) + "_ckpt"
    q = (
        spark.readStream.format("delta_py")
        .option("path", tdir)
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="table_changes_segments"):
        q.awaitTermination(120)
    _sh.rmtree(out, ignore_errors=True)
    _sh.rmtree(ckpt, ignore_errors=True)


def test_cdf_stream_tolerates_additive_changes(spark, tdir):
    """Additive evolution must NOT trip the boundary check, in either
    time direction: a reader pinned BEFORE an ADD COLUMN keeps serving
    (the new column is projected away by the pinned stream schema), and
    a reader pinned AFTER it serves the old era (null-fill) — exactly
    the batch walker's additive rule."""
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = _mk(spark, tdir, n=3, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })                                             # v1: insert 0..2
    src = DeltaPySource({"path": tdir, "readChangeFeed": "true"})
    old_reader = src.streamReader(src.schema())    # pins (k, v)

    w.add_column("extra", "long")                  # v2: additive
    w.append(spark.createDataFrame(
        [(7, "seven", 1)],
        T.StructType(list(SCHEMA.fields)
                     + [T.StructField("extra", T.LongType())])).coalesce(1))
    head = DeltaTable(tdir).snapshot.version

    refs = old_reader._cdf_file_refs(0, head)      # newer additive era: ok
    assert sum(1 for f in refs if f.change_type == "insert") == 2

    src2 = DeltaPySource({"path": tdir, "readChangeFeed": "true"})
    new_reader = src2.streamReader(src2.schema())  # pins (k, v, extra)
    refs2 = new_reader._cdf_file_refs(0, head)     # older era: null-fill ok
    assert sum(1 for f in refs2 if f.change_type == "insert") == 2


def test_dv_diff_preimages_empty_results_explicit(spark, tdir):
    """Defensive contract (ADVICE r18): results rows with n_new == 0
    (desc=None) are filtered, and an all-empty result set returns an
    explicit empty frame with the feed schema — never an IndexError or
    json.loads(None) crash."""
    w = _mk(spark, tdir, n=4)
    snap = DeltaTable(tdir).snapshot
    fake = [{"f": "file:/nowhere", "n_src": 3, "n_fan": 0, "n_new": 0,
             "full": False, "desc": None}]
    pre = w._dv_diff_preimages(snap, fake)
    assert pre.columns == ["k", "v", "_change_type"]
    assert pre.count() == 0


# ---------- split/non-split walk equivalence over random histories ----------


OPS_POOL = ["append", "append", "delete", "update", "rename", "addcol",
            "widen", "append", "dropx"]


@pytest.mark.parametrize("seed", range(20))
def test_walk_changes_split_nonsplit_equivalence(spark, tdir, seed):
    """Property over derandomized random histories (appends / deletes /
    updates / renames / DROPPED columns / added columns / type
    widenings) for the r18-rewritten single-pass `_walk_changes`:

    * history with NO non-additive change → exactly one segment, equal
      to `table_changes` row-for-row (split and non-split walks agree);
    * history WITH renames/drops → `table_changes` over the full range
      raises loudly, and EACH segment equals `table_changes` re-run over
      that segment's own (start, end] bounds — direct frame equality,
      not just the replay property the r17 fuzz pins."""
    import random

    from duckdb_delta_spark.delta.changes import (
        table_changes,
        table_changes_segments,
    )
    from duckdb_delta_spark.delta.errors import SchemaError

    rng = random.Random(1000 + seed)
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("n", T.IntegerType()),
    ])
    w = DeltaWriter.create(spark, tdir, schema, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })

    vname, extras, widened = "v", [], False
    next_k, n_boundaries = 0, 0

    def cur_schema():
        return T.StructType(
            [T.StructField("k", T.LongType()),
             T.StructField(vname, T.StringType()),
             T.StructField("n", T.LongType() if widened
                           else T.IntegerType())]
            + [T.StructField(x, T.LongType()) for x in extras])

    def do_append():
        nonlocal next_k
        rows = [(next_k + i, f"s{next_k + i}", (next_k + i) % 100)
                + (None,) * len(extras) for i in range(5)]
        w.append(spark.createDataFrame(rows, cur_schema()).coalesce(1))
        next_k += 5

    do_append()                                     # seed data
    for step in range(5):
        op = rng.choice(OPS_POOL)
        if op == "append":
            do_append()
        elif op == "delete":
            w.delete(f"k % 7 = {rng.randrange(7)} and k < {next_k}")
        elif op == "update":
            w.update(f"k % 5 = {rng.randrange(5)}",
                     {vname: f"concat({vname}, '_u')"})
        elif op == "rename":
            new = f"{vname}_r{step}"
            w.rename_column(vname, new)
            vname, n_boundaries = new, n_boundaries + 1
        elif op == "addcol":
            x = f"x{step}"
            w.add_column(x, "long")
            extras.append(x)
        elif op == "dropx" and extras:
            # DROP COLUMN is the other non-additive boundary op: only
            # previously-ADDED columns drop, so later appends/updates
            # stay valid against the tracked schema
            w.drop_column(extras.pop())
            n_boundaries += 1
        elif op == "widen" and not widened:
            w.alter_column_type("n", "long")
            widened = True
        else:                              # widen/dropx unavailable
            do_append()

    log = DeltaLog(tdir)
    head = DeltaTable(tdir).snapshot.version
    segs = table_changes_segments(log, spark, -1)

    def rows(fr):
        cols = sorted(fr.columns)
        return sorted(tuple(str(r[c]) for c in cols)
                      for r in fr.select(*cols).collect())

    # bounds: ordered, non-overlapping, inside (-1, head]
    bounds = [(s, e) for s, e, _ in segs]
    assert bounds[0][0] == -1 and bounds[-1][1] <= head
    assert all(s < e or s == -1 for s, e in bounds)
    assert all(bounds[i][1] <= bounds[i + 1][0]
               for i in range(len(bounds) - 1)), bounds

    if n_boundaries == 0:
        assert len(segs) == 1 and bounds[0] == (-1, head)
        assert rows(segs[0][2]) == rows(table_changes(log, spark, -1))
    else:
        with pytest.raises(SchemaError,
                           match="table_changes_segments"):
            table_changes(log, spark, -1)
        for s, e, fr in segs:
            assert rows(fr) == rows(table_changes(log, spark, s, e)), \
                (seed, s, e)


# ---------- empty APPEND micro-batches skip the commit (both sinks) ----------


def test_foreach_append_skips_empty_batch(spark, tdir):
    """The foreachBatch APPEND sink skips empty micro-batches entirely
    (same idle-stream log-growth class as the r18 replaceWhere skip, and
    decided the same zero-probe way: from the write's own footer stats).
    Plain w.append keeps its committed-empty-version semantics."""
    from duckdb_delta_spark.streaming.foreach_sink import delta_foreach_batch

    w = _mk(spark, tdir, n=2)
    head = DeltaTable(tdir).snapshot.version
    fn = delta_foreach_batch(tdir, txn_app_id="ap19")
    empty = spark.createDataFrame([], SCHEMA)
    fn(empty, 0)                                   # idle: no commit
    fn(empty, 0)                                   # replayed idle: no-op
    assert DeltaTable(tdir).snapshot.version == head
    fn(_df(spark, [(7, "seven")]), 1)              # real batch commits
    assert DeltaTable(tdir).snapshot.version == head + 1
    assert _table(spark, tdir) == {0: "v0", 1: "v1", 7: "seven"}
    # plain append still commits an empty version (API semantics pinned
    # by test_append_drops_empty_part_files)
    v = DeltaWriter(tdir, spark).append(empty)
    assert v == head + 2


def test_foreach_append_merge_schema_wired(spark, tdir):
    """delta_foreach_batch(merge_schema=True) actually forwards the flag
    (it was declared but never passed to append — a widened batch raised
    SchemaError): a batch carrying a new column widens the table in the
    same commit, and a schema-widening EMPTY batch still commits (the
    metaData change is real)."""
    _mk(spark, tdir, n=2)
    from duckdb_delta_spark.streaming.foreach_sink import delta_foreach_batch

    wide = T.StructType(list(SCHEMA.fields)
                        + [T.StructField("extra", T.LongType())])
    fn = delta_foreach_batch(tdir, txn_app_id="ms19", merge_schema=True)
    fn(spark.createDataFrame([(5, "five", 50)], wide).coalesce(1), 0)
    t = DeltaTable(tdir)
    assert "extra" in [f.name for f in t.snapshot.schema.fields]
    rows = {r["k"]: (r["v"], r["extra"])
            for r in t.to_df(spark).collect()}
    assert rows == {0: ("v0", None), 1: ("v1", None), 5: ("five", 50)}


def test_datasource_sink_skips_empty_batch(spark, tdir):
    """The exactly-once DataSource sink commits NOTHING for an empty
    micro-batch (emptiness is already known from the executor commit
    messages — zero probe jobs), and a later non-empty replay check
    still works off the txn map."""
    from duckdb_delta_spark.streaming.delta_source import DeltaStreamWriter

    _mk(spark, tdir, n=2)
    head = DeltaTable(tdir).snapshot.version
    w = DeltaStreamWriter(tdir, SCHEMA, {"checkpointlocation": "/tmp/ck19"})
    w.commit([], 0)
    w.commit([], 1)
    assert DeltaTable(tdir).snapshot.version == head


def test_cdf_stream_fails_loudly_on_drop_midstream(spark, tdir):
    """DROP COLUMN is the other non-additive boundary: a reader pinned
    before the drop must fail loudly on the post-drop era (serving NULL
    where pre-drop rows had values is the silent corruption delta-spark
    refuses), naming table_changes_segments."""
    from duckdb_delta_spark.delta.errors import SchemaError
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = _mk(spark, tdir, n=3, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })
    w.add_column("extra", "long")                  # v2: additive
    src = DeltaPySource({"path": tdir, "readChangeFeed": "true"})
    reader = src.streamReader(src.schema())        # pins (k, v, extra)
    w.drop_column("extra")                         # v3: boundary
    w.append(_df(spark, [(9, "nine")]))            # v4: post-drop era
    head = DeltaTable(tdir).snapshot.version
    with pytest.raises(SchemaError, match="table_changes_segments"):
        reader._cdf_file_refs(2, head)
    # restarted past the boundary, the post-drop era drains
    src2 = DeltaPySource({"path": tdir, "readChangeFeed": "true"})
    refs = src2.streamReader(src2.schema())._cdf_file_refs(3, head)
    assert refs and all(f.change_type == "insert" for f in refs)


def test_foreach_merge_empty_batch_commits_nothing(spark, tdir):
    """The merge sink's empty micro-batch is a genuine no-op on the
    writer side (merge returns None before any commit when nothing
    matched and nothing inserted) — pin that idle upsert streams don't
    grow the log either."""
    from duckdb_delta_spark.streaming.foreach_sink import delta_foreach_merge

    _mk(spark, tdir, n=3)
    head = DeltaTable(tdir).snapshot.version
    fn = delta_foreach_merge(tdir, "t.k = s.k",
                             when_matched_update={"v": "s.v"},
                             txn_app_id="mg19")
    fn(spark.createDataFrame([], SCHEMA), 0)
    fn(spark.createDataFrame([], SCHEMA), 1)
    assert DeltaTable(tdir).snapshot.version == head
    fn(_df(spark, [(1, "upd"), (50, "new")]), 2)   # real batch commits
    assert DeltaTable(tdir).snapshot.version == head + 1
    assert _table(spark, tdir) == {0: "v0", 1: "upd", 2: "v2", 50: "new"}
