"""Round-20 fixes (ADVICE r19): the streaming CDF schema-era cache is
DIRECTION-KEYED (a schema validated as an older era — pure add between
era and pin — must not be trusted when the same schema reappears AFTER
the pin via a post-pin DROP of the added column), the foreachBatch
replaceWhere sink skips empty batches by default for where=None (an
idle full-overwrite stream must not truncate the table; the explicit
``skip_empty=False`` opts into truncate) and emits a loud
``stream.replace.empty_commit`` event when a static predicate's empty
batch clears its region, the sink's commit event carries the RESOLVED
per-batch predicate for callable mode, and the textual nondeterminism
fallback strips quoted string literals before the function-name scan
(a literal containing "uuid(" is not a nondeterministic predicate).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter, errors

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _mk(spark, path, n=4, configuration=None):
    w = DeltaWriter.create(spark, path, SCHEMA, configuration=configuration)
    w.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], SCHEMA).coalesce(1))
    return w


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).coalesce(1)


def _table(spark, path):
    return {r["k"]: r["v"] for r in DeltaTable(path).to_df(spark).collect()}


# ---------- CDF stream: schema-era cache is direction-keyed ----------


def test_cdf_schema_cache_direction_keyed(spark, tdir):
    """ADVICE r19 (delta_source direction-agnostic cache): a column is
    ADDED just before the stream pins, then DROPPED after the pin — the
    pre-add era's schema and the post-drop era's schema are EQUAL
    StructTypes, so an undirected cache that validated the pre-add era
    (pure add old→pinned, legal) would trust the post-drop era by
    equality and serve the DROP silently. The caches must be keyed by
    direction: the post-pin DROP still raises."""
    from duckdb_delta_spark.delta.errors import SchemaError
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = _mk(spark, tdir, n=3, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })                                             # v1: insert, schema (k,v)
    w.add_column("extra", "long")                  # v2: schema (k,v,extra)
    w.append(spark.createDataFrame(
        [(7, "seven", 1)],
        T.StructType(list(SCHEMA.fields)
                     + [T.StructField("extra", T.LongType())])).coalesce(1))

    src = DeltaPySource({"path": tdir, "readChangeFeed": "true"})
    reader = src.streamReader(src.schema())        # pins (k, v, extra)
    pin = reader._pinned_version

    # drain the whole pre-pin range: validates and CACHES the (k, v)
    # schema as an older era (pure add between era and pin — legal)
    refs = reader._cdf_file_refs(0, pin)
    assert refs
    assert reader._cdf_schema_ok_old  # (k, v) era cached as OLD

    w.drop_column("extra")                         # post-pin: schema (k,v)
    w.append(spark.createDataFrame(
        [(9, "nine")], SCHEMA).coalesce(1))
    head = DeltaTable(tdir).snapshot.version

    # the post-drop schema EQUALS the cached older-era schema; the
    # direction-keyed cache must not be fooled — the drop still raises
    with pytest.raises(SchemaError, match="non-additive"):
        reader._cdf_file_refs(pin, head)


# ---------- replace sink: resolved callable predicate in the event ----------


def test_replace_sink_logs_resolved_callable_predicate(spark, tdir):
    """ADVICE r19 (observability): since callable predicates resolve
    inside overwrite(), the sink's ``stream.replace.commit`` event must
    still carry the RESOLVED per-batch predicate string, not None."""
    from duckdb_delta_spark.delta import logging as dlog
    from duckdb_delta_spark.streaming.foreach_sink import (
        delta_foreach_replace_where,
    )

    _mk(spark, tdir, n=4)

    def pred(batch_df):
        ks = sorted(r["k"] for r in batch_df.select("k").collect())
        return "k in (" + ",".join(str(k) for k in ks) + ")"

    fn = delta_foreach_replace_where(tdir, pred, txn_app_id="r20obs")
    events: list = []
    dlog.add_sink(events.append)
    try:
        fn(_df(spark, [(1, "one"), (2, "two")]), 0)
    finally:
        dlog.remove_sink(events.append)
    commits = [e for e in events if e["event"] == "stream.replace.commit"]
    assert commits and commits[0]["predicate"] == "k in (1,2)"
    assert _table(spark, tdir) == {0: "v0", 1: "one", 2: "two", 3: "v3"}


def test_replace_sink_where_none_empty_batch_skips_by_default(spark, tdir):
    """ADVICE r19 (medium): Structured Streaming delivers empty batches
    (stateful no-emit, recovery re-execution) — a where=None sink must
    not truncate on one by default. Non-empty batches still overwrite."""
    from duckdb_delta_spark.streaming.foreach_sink import (
        delta_foreach_replace_where,
    )

    _mk(spark, tdir, n=4)
    head = DeltaTable(tdir).snapshot.version
    fn = delta_foreach_replace_where(tdir, None, txn_app_id="r20none")
    fn(spark.createDataFrame([], SCHEMA), 0)       # idle batch: no-op
    assert DeltaTable(tdir).snapshot.version == head
    assert len(_table(spark, tdir)) == 4
    fn(_df(spark, [(8, "eight")]), 1)              # real batch: overwrites
    assert _table(spark, tdir) == {8: "eight"}


# ---------- textual nondeterminism fallback: literal-safe ----------


def test_nondet_textual_fallback_ignores_string_literals(
        spark, tdir, monkeypatch):
    """ADVICE r19: a string LITERAL containing "uuid(" inside an
    otherwise deterministic predicate must not trip the textual
    fallback; real nondeterministic calls outside literals still do."""
    from duckdb_delta_spark.delta import writer as W

    monkeypatch.setattr(W, "_plan_all_deterministic", lambda df: None)
    w = _mk(spark, tdir, n=4)

    # literal mentioning uuid( — deterministic, must pass
    v = w.overwrite(_df(spark, [(1, "call uuid() first")]),
                    where="k = 1 or v = 'call uuid() first'")
    assert v is not None
    assert _table(spark, tdir)[1] == "call uuid() first"

    # doubled-quote SQL escape inside the literal, still deterministic
    v2 = w.overwrite(_df(spark, [(1, "x")]),
                     where="k = 1 or v = 'it''s rand() o''clock'")
    assert v2 is not None

    # a REAL nondeterministic call outside any literal still refuses,
    # even with a decoy literal alongside
    with pytest.raises(errors.UnsupportedFeatureError,
                       match="nondeterministic"):
        w.overwrite(_df(spark, [(1, "x")]),
                    where="v = 'rand()' and uuid() = 'y'")


def test_strip_string_literals_unit():
    from duckdb_delta_spark.delta.writer import _strip_string_literals as s

    assert s("v = 'uuid()'") == "v = ''"
    assert s('v = "rand()"') == "v = ''"
    assert s(r"v = 'a\'b rand()'") == "v = ''"
    assert s("v = 'it''s rand()'") == "v = ''''"  # two adjacent literals
    assert "rand(" not in s("v = 'it''s rand() x'")
    assert s("rand() < 0.5") == "rand() < 0.5"


# ---------- schemaTrackingDir: auto-advancing CDF stream restart ----------


def test_cdf_schema_tracking_records_boundary_and_auto_advances(spark, tdir):
    """VERDICT r19 #2 (delta-spark ``schemaTrackingLocation`` analogue):
    with .option('schemaTrackingDir', d) the stream STILL fails loudly
    at a non-additive boundary (unchanged contract) but persists the
    boundary first; a restarted reader — naturally re-pinned at HEAD —
    auto-advances: it serves every era under the pinned schema via
    columnMapping-id matching (renames relabel, drops project away), so
    recovery is one restart from the checkpointed offset instead of a
    manual startingVersion computation."""
    import json as _json
    import os as _os

    from duckdb_delta_spark.delta.errors import SchemaError
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = _mk(spark, tdir, n=3, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })                                             # v1: insert 0..2
    track = str(tdir) + "_track"
    opts = {"path": tdir, "readChangeFeed": "true",
            "schemaTrackingDir": track}
    src = DeltaPySource(opts)
    reader = src.streamReader(src.schema())        # pins (k, v)
    pre = reader._cdf_file_refs(0, 1)              # checkpointed offset: 1
    assert pre and all(f.change_type == "insert" for f in pre)

    w.rename_column("v", "label")                  # v2: boundary
    w.append(spark.createDataFrame(
        [(9, "nine")],
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("label", T.StringType())])).coalesce(1))
    head = DeltaTable(tdir).snapshot.version

    # fail-loud is unchanged, but the error names the recorded remedy
    with pytest.raises(SchemaError, match="schemaTrackingDir"):
        reader._cdf_file_refs(1, head)
    rec = _os.path.join(track, "boundary.json")
    assert _os.path.isfile(rec)
    assert _json.load(open(rec))["version"] == 2

    # restart (fresh reader, same options): auto-advances — the old era
    # serves under the pinned schema, the whole backlog drains
    src2 = DeltaPySource(opts)
    r2 = src2.streamReader(src2.schema())          # pins (k, label) @ HEAD
    assert r2._auto_advance
    refs = r2._cdf_file_refs(1, head)              # from checkpointed offset
    assert refs and all(f.change_type == "insert" for f in refs)
    full = r2._cdf_file_refs(0, head)              # old era also servable
    assert sum(1 for f in full if f.change_type == "insert") == 2

    # a NO-option restart keeps today's fail-loud behavior
    src3 = DeltaPySource({"path": tdir, "readChangeFeed": "true"})
    r3 = src3.streamReader(src3.schema())
    with pytest.raises(SchemaError, match="table_changes_segments"):
        r3._cdf_file_refs(0, head)


def test_cdf_schema_tracking_end_to_end_restart(spark, tdir):
    """End-to-end over real query lifecycles sharing one checkpoint:
    the stream fails at the rename, and ONE restart with the option
    drains the remaining commits exactly once — row-values equal to the
    era-segmented batch feed over the same range (old-era rows relabel
    to the pinned column names)."""
    from duckdb_delta_spark.delta.changes import table_changes_segments
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = _mk(spark, tdir, n=3, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })                                             # v1: insert 0..2
    spark.dataSource.register(DeltaPySource)
    track, ck = str(tdir) + "_track", str(tdir) + "_ck"
    got: list = []

    def run():
        q = (spark.readStream.format("delta_py")
             .option("path", tdir)
             .option("readChangeFeed", "true")
             .option("startingVersion", "0")
             .option("schemaTrackingDir", track)
             .load()
             .writeStream
             .foreachBatch(lambda df, bid: got.extend(
                 tuple(r) for r in df.drop("_commit_timestamp").collect()))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(120)

    run()                                          # drains era 1
    n_first = len(got)
    assert n_first == 3

    w.rename_column("v", "label")                  # v2: boundary
    w.append(spark.createDataFrame(
        [(9, "nine")],
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("label", T.StringType())])).coalesce(1))
    w.delete("k = 1")                              # v4: delete row

    with pytest.raises(Exception, match="schemaTrackingDir"):
        run()                                      # fails AT the boundary
    assert len(got) == n_first                     # nothing duplicated

    run()                                          # ONE restart: drains rest
    new = sorted(got[n_first:])
    # oracle: the era-segmented batch feed over the same range
    from duckdb_delta_spark.delta.log import DeltaLog

    expect = []
    for _s, _e, fr in table_changes_segments(DeltaLog(tdir), spark, 1):
        expect.extend(
            (r[0], r[1], r[2], r[3])
            for r in fr.drop("_commit_timestamp").collect())
    assert new == sorted(expect), (new, sorted(expect))


def test_cdf_schema_tracking_two_boundaries_two_restarts(spark, tdir):
    """Boundaries can repeat: after an auto-advancing restart crossed
    rename #1, a LATER rename #2 is a new post-pin boundary — the
    reader must fail loudly again, the tracking record must advance
    MONOTONICALLY (4 over 2, never regress), and a second restart must
    serve all THREE eras under the newest pinned schema."""
    import json as _json
    import os as _os

    from duckdb_delta_spark.delta.errors import SchemaError
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = _mk(spark, tdir, n=3, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })                                             # v1: insert 0..2
    track = str(tdir) + "_track"
    opts = {"path": tdir, "readChangeFeed": "true",
            "schemaTrackingDir": track}
    rec = _os.path.join(track, "boundary.json")

    src = DeltaPySource(opts)
    r1 = src.streamReader(src.schema())            # pins (k, v)
    assert r1._cdf_file_refs(0, 1)

    w.rename_column("v", "a")                      # v2: boundary #1
    w.append(spark.createDataFrame(
        [(10, "ten")],
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("a", T.StringType())])).coalesce(1))
    head1 = DeltaTable(tdir).snapshot.version      # v3
    with pytest.raises(SchemaError, match="schemaTrackingDir"):
        r1._cdf_file_refs(1, head1)
    assert _json.load(open(rec))["version"] == 2

    src2 = DeltaPySource(opts)
    r2 = src2.streamReader(src2.schema())          # pins (k, a) @ v3
    assert r2._auto_advance
    assert len(r2._cdf_file_refs(1, head1)) == 1   # crossed boundary #1

    w.rename_column("a", "b")                      # v4: boundary #2
    w.append(spark.createDataFrame(
        [(11, "eleven")],
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("b", T.StringType())])).coalesce(1))
    head2 = DeltaTable(tdir).snapshot.version      # v5
    # the auto-advancing reader STILL fails loudly on the NEW era...
    with pytest.raises(SchemaError, match="schemaTrackingDir"):
        r2._cdf_file_refs(head1, head2)
    # ...and the record advanced monotonically
    assert _json.load(open(rec))["version"] == 4

    src3 = DeltaPySource(opts)
    r3 = src3.streamReader(src3.schema())          # pins (k, b) @ v5
    assert r3._auto_advance
    assert len(r3._cdf_file_refs(head1, head2)) == 1
    # all three eras servable under the newest pin, nothing duplicated
    full = r3._cdf_file_refs(0, head2)
    assert sum(1 for f in full if f.change_type == "insert") == 3


def test_cdf_schema_tracking_offline_boundary_still_loud(spark, tdir):
    """A boundary that commits while the stream is OFFLINE must not be
    crossed silently by a pre-existing tracking record: relaxation only
    covers eras strictly BEFORE the recorded (user-acknowledged)
    boundary. The restarted reader fails loudly exactly once at the
    unacknowledged era — and the failure records the REAL boundary
    start (the first version from which every later era is additive to
    the pin), not the failing commit, so ONE more restart serves
    everything instead of re-failing commit by commit."""
    import json as _json
    import os as _os

    from duckdb_delta_spark.delta.errors import SchemaError
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    w = _mk(spark, tdir, n=3, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })                                             # v1: insert 0..2
    track = str(tdir) + "_track"
    opts = {"path": tdir, "readChangeFeed": "true",
            "schemaTrackingDir": track}
    rec = _os.path.join(track, "boundary.json")

    src = DeltaPySource(opts)
    r1 = src.streamReader(src.schema())            # pins (k, v)
    assert r1._cdf_file_refs(0, 1)

    w.rename_column("v", "a")                      # v2: boundary #1
    w.append(spark.createDataFrame(
        [(10, "ten")],
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("a", T.StringType())])).coalesce(1))
    head1 = DeltaTable(tdir).snapshot.version      # v3
    with pytest.raises(SchemaError, match="schemaTrackingDir"):
        r1._cdf_file_refs(1, head1)                # acknowledged: record=2
    assert _json.load(open(rec))["version"] == 2

    # boundary #2 commits while NO reader is live
    w.rename_column("a", "b")                      # v4: boundary #2
    w.append(spark.createDataFrame(
        [(11, "eleven")],
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("b", T.StringType())])).coalesce(1))
    head2 = DeltaTable(tdir).snapshot.version      # v5

    # the restart acknowledges ONLY boundary #1: eras at/after the
    # record take the strict check and the offline rename is LOUD
    src2 = DeltaPySource(opts)
    r2 = src2.streamReader(src2.schema())          # pins (k, b) @ v5
    assert r2._auto_advance and r2._tracked_boundary == 2
    with pytest.raises(SchemaError, match="schemaTrackingDir"):
        r2._cdf_file_refs(1, head2)
    # ...recording the real boundary start v4, NOT the failing commit v2
    assert _json.load(open(rec))["version"] == 4

    # second restart serves all three eras under the newest pin
    src3 = DeltaPySource(opts)
    r3 = src3.streamReader(src3.schema())
    full = r3._cdf_file_refs(0, head2)
    assert sum(1 for f in full if f.change_type == "insert") == 3


def test_cdf_schema_tracking_corrupt_record_is_loud(spark, tdir):
    """The tracking record gates a semantic relaxation — a corrupt or
    hand-edited ``boundary.json`` must fail stream START with an
    actionable error naming the file, never be silently ignored (which
    would re-fail an acknowledged boundary) or trusted (garbage
    version). Deleting the file resets tracking."""
    import os as _os

    from duckdb_delta_spark.delta.errors import SchemaError
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    _mk(spark, tdir, n=2, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableChangeDataFeed": "true",
    })
    track = str(tdir) + "_track"
    _os.makedirs(track)
    rec = _os.path.join(track, "boundary.json")
    opts = {"path": tdir, "readChangeFeed": "true",
            "schemaTrackingDir": track}

    for payload in (b"", b"{not json", b'{"no_version": 1}',
                    b'{"version": -5}', b'{"version": "abc"}'):
        with open(rec, "wb") as fh:
            fh.write(payload)
        src = DeltaPySource(opts)
        with pytest.raises(SchemaError, match="boundary.json"):
            src.streamReader(src.schema())

    _os.unlink(rec)                                # reset: starts clean
    src = DeltaPySource(opts)
    reader = src.streamReader(src.schema())
    assert not reader._auto_advance
    assert reader._cdf_file_refs(0, 1)


# ---------- vacuum vs racing writers: the soak-captured triad flake ----------


def test_vacuum_skips_staging_dirs(spark, tdir):
    """Regression for the soak-captured triad flake (1/50 runs,
    .fixtures/thread_evidence): vacuum's tree walk listed a concurrent
    writer's transient ``_staging_*`` dir, which vanished (rollback /
    move-on-commit) before its own scandir — FileNotFoundError killed
    the retention thread. A LIVE staging dir (its mtime moves with every
    file the writer stages) must never be walked, so retention can't
    reap mid-write files."""
    import os
    import time

    w = _mk(spark, tdir, n=4)
    staged = os.path.join(tdir, "_staging_deadbeef")
    os.makedirs(staged)
    f = os.path.join(staged, "part-00000.parquet")
    open(f, "wb").write(b"x")
    old = time.time() - 10 * 86400
    os.utime(f, (old, old))      # the FILE is old; the DIR is live (fresh)

    gone = w.vacuum(retention_ms=3_600_000)        # 1h retention
    assert os.path.exists(f), "vacuum reaped an uncommitted staging file"
    assert not any("_staging_" in p for p in gone)


def test_vacuum_reclaims_orphaned_staging_dirs(spark, tdir):
    """The flip side of the live-staging protection: a ``_staging_*``
    dir orphaned by a hard-crashed writer (SIGKILL between the parquet
    write and the rollback rmtree) must STILL be reclaimable, or
    repeated crashes leak disk unboundedly with no cleanup path. Vacuum
    descends into a staging dir only once the dir itself has aged past
    the retention cutoff — a live writer's dir is seconds old."""
    import os
    import time

    w = _mk(spark, tdir, n=4)
    orphan = os.path.join(tdir, "_staging_0ddba11")
    os.makedirs(orphan)
    f = os.path.join(orphan, "part-00000.parquet")
    open(f, "wb").write(b"x")
    old = time.time() - 10 * 86400                 # crashed 10 days ago
    os.utime(f, (old, old))
    os.utime(orphan, (old, old))

    live = os.path.join(tdir, "_staging_cdc_fresh")
    os.makedirs(live)
    g = os.path.join(live, "part-00000.parquet")
    open(g, "wb").write(b"y")

    gone = w.vacuum(retention_ms=3_600_000)        # 1h retention
    assert not os.path.exists(f), "orphaned staging file never reclaimed"
    assert os.path.exists(g), "vacuum reaped a live writer's staging file"
    assert any("_staging_0ddba11" in p for p in gone)

    # dry_run reports without deleting
    orphan2 = os.path.join(tdir, "_staging_feedface")
    os.makedirs(orphan2)
    h = os.path.join(orphan2, "part-00000.parquet")
    open(h, "wb").write(b"z")
    os.utime(h, (old, old))
    os.utime(orphan2, (old, old))
    plan = w.vacuum(retention_ms=3_600_000, dry_run=True)
    assert os.path.exists(h)
    assert any("_staging_feedface" in p for p in plan)


def test_vacuum_tolerates_vanished_dir(spark, tdir, monkeypatch):
    """The other half of the race: ANY listed directory (an emptied
    hive-partition dir, a racer's workspace) may vanish between the
    parent listing and its own scandir — vacuum must treat it as empty,
    not die."""
    import os

    w = _mk(spark, tdir, n=4)
    doomed = os.path.join(tdir, "day=9")
    os.makedirs(doomed)

    real_scandir = os.scandir

    def racing_scandir(path, *a, **k):
        if os.path.abspath(str(path)) == os.path.abspath(doomed):
            raise FileNotFoundError(2, "No such file or directory", path)
        return real_scandir(path, *a, **k)

    monkeypatch.setattr(os, "scandir", racing_scandir)
    gone = w.vacuum(retention_ms=10**12)           # must not raise
    assert gone == []


# ---------- Connect-surface sweep: every _jdf consumer has a fallback ----

#: the five registry queries that assert on physical-plan text — the
#: package's only _jdf consumers besides the writer's determinism guard
_PLAN_ASSERTING = [
    "ds_region_nation_rank",
    "ds_return_ratio_rank",
    "ds_join_chain",
    "ds_nation_pair_orders",
    "ds_geo_rollup_avgs",
]


def test_connect_sim_plan_asserting_queries(spark, monkeypatch):
    """VERDICT r19 #3: with the classic-only JVM surface mocked away
    (``plans.jdf_or_none`` → None, the package-wide seam), every
    plan-asserting registry query must still run — the broadcast-join
    assertion evaluates against captured ``df.explain()`` text instead
    of crashing on a missing ``_jdf`` — and return real rows."""
    from duckdb_delta_spark import plans
    from duckdb_delta_spark.queries import all_queries

    monkeypatch.setattr(plans, "jdf_or_none", lambda df: None)

    # prove the fallback produces real physical-plan text, not ""
    text = plans.physical_plan_text(spark.range(2))
    assert "Physical Plan" in text or "Range" in text, text

    queries = all_queries()
    for name in _PLAN_ASSERTING:
        # the broadcast assertion inside each query ran on explain text
        rows = queries[name].fn(spark, "/root/testdata/sf0.001").collect()
        # ds_nation_pair_orders is genuinely empty at sf0.001
        assert rows or name == "ds_nation_pair_orders", name


def test_connect_sim_nondet_guard_fails_closed(spark, tdir, monkeypatch):
    """With ``_jdf`` absent everywhere (Connect simulation through the
    real seam, not a writer-internal patch), the determinism guard must
    neither silently pass a nondeterministic predicate nor crash: the
    textual fallback refuses with the NAMED UnsupportedFeatureError,
    and deterministic predicates still commit."""
    from duckdb_delta_spark import plans

    monkeypatch.setattr(plans, "jdf_or_none", lambda df: None)
    w = _mk(spark, tdir, n=4)

    v = w.overwrite(_df(spark, [(1, "det")]), where="k = 1")
    assert v is not None
    assert _table(spark, tdir)[1] == "det"

    with pytest.raises(errors.UnsupportedFeatureError,
                       match="nondeterministic"):
        w.overwrite(_df(spark, [(2, "x")]), where="uuid() = 'y'")
