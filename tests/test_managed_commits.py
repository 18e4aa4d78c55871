"""Catalog-managed commits (CCv2 seam): DeltaLog/DeltaWriter route commits
through a catalog-provided commit function instead of put-if-absent.

Mirrors the reference's staged-commit routing — the engine prepares the
commit payload, the parent catalog's commit function ratifies or rejects
it (reference: src/storage/delta_transaction.cpp:318-409, attach wiring
delta_extension.cpp:45-74). A rejection maps onto the same
CommitConflictError taxonomy every retry loop already handles.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter
from duckdb_delta_spark.delta.errors import CommitConflictError
from duckdb_delta_spark.delta.log import DeltaLog
from duckdb_delta_spark.delta.snapshot import Snapshot

SCHEMA = T.StructType([T.StructField("i", T.LongType())])


class FakeCatalog:
    """In-memory version ledger. Publishes ratified commits into the
    table's _delta_log (so readers work) and records the paths it owns —
    the source of a CCv2 ``log_tail``."""

    def __init__(self, table_path: str):
        self.log_dir = os.path.join(table_path, "_delta_log")
        self.ledger: dict[int, str] = {}
        self.n_calls = 0
        self.reject_versions: set[int] = set()

    def commit_fn(self, version: int, payload: bytes):
        self.n_calls += 1
        if version in self.reject_versions or version in self.ledger:
            return None  # catalog refuses: version taken / fenced
        path = os.path.join(self.log_dir, f"{version:020d}.json")
        flags = os.O_CREAT | os.O_EXCL | os.O_WRONLY
        try:
            fd = os.open(path, flags)
        except FileExistsError:
            return None
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        self.ledger[version] = path
        return path

    def log_tail(self) -> list[str]:
        return [self.ledger[v] for v in sorted(self.ledger)]


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("i"))


def test_commits_route_through_catalog(spark, tdir):
    w = DeltaWriter.create(spark, tdir, SCHEMA)
    cat = FakeCatalog(tdir)
    mw = DeltaWriter(tdir, spark, commit_fn=cat.commit_fn)
    mw.append(_df(spark, 0, 10))
    mw = DeltaWriter(tdir, spark, commit_fn=cat.commit_fn)
    mw.append(_df(spark, 10, 15))
    assert cat.n_calls >= 2 and sorted(cat.ledger) == [1, 2]
    # the published log reads back through the normal path
    assert DeltaTable(tdir).scan(spark).to_df().count() == 15


def test_catalog_rejection_maps_to_conflict_taxonomy(spark, tdir):
    DeltaWriter.create(spark, tdir, SCHEMA)
    cat = FakeCatalog(tdir)
    cat.reject_versions = {1}
    mw = DeltaWriter(tdir, spark, commit_fn=cat.commit_fn)
    with pytest.raises(CommitConflictError, match="catalog commit function"):
        mw.append(_df(spark, 0, 10))
    # ... and the normal put-if-absent race ALSO surfaces through the
    # callback: another writer (filesystem path) takes version 1, then the
    # managed writer tries the same version
    cat.reject_versions = set()
    DeltaWriter(tdir, spark).append(_df(spark, 0, 5))
    mw2 = DeltaWriter(tdir, spark, commit_fn=cat.commit_fn)
    mw2._snapshot.version  # pinned at construction (sees version 1)
    # force a stale commit attempt at an already-taken version
    with pytest.raises(CommitConflictError):
        mw2.log.commit(1, [{"commitInfo": {"operation": "WRITE"}}])


def test_managed_writer_retries_like_filesystem_writer(spark, tdir):
    """The append retry loop (revalidate + next version) works unchanged
    over the catalog seam: a competing filesystem commit between pin and
    commit is absorbed by the retry, ending in a ratified catalog commit."""
    DeltaWriter.create(spark, tdir, SCHEMA)
    cat = FakeCatalog(tdir)
    mw = DeltaWriter(tdir, spark, commit_fn=cat.commit_fn)
    # interleave: a plain writer lands version 1 after mw pinned version 0
    DeltaWriter(tdir, spark).append(_df(spark, 100, 110))
    mw.append(_df(spark, 0, 10), max_retries=1)  # retries to version 2
    assert sorted(cat.ledger) == [2]
    assert DeltaTable(tdir).scan(spark).to_df().count() == 20


def test_log_tail_and_commit_fn_compose(spark, tdir):
    """A catalog that ratified the commits can hand the tail back for
    LIST-free snapshot resolution: DeltaLog(log_tail=...) resolves the
    exact versions the catalog published."""
    DeltaWriter.create(spark, tdir, SCHEMA)
    cat = FakeCatalog(tdir)
    mw = DeltaWriter(tdir, spark, commit_fn=cat.commit_fn, log_tail=None)
    mw.append(_df(spark, 0, 10))
    mw = DeltaWriter(tdir, spark, commit_fn=cat.commit_fn)
    mw.append(_df(spark, 10, 30))

    # version 0 came from create() (filesystem); catalog owns 1..2
    v0 = os.path.join(tdir, "_delta_log", f"{0:020d}.json")
    tail = [v0] + cat.log_tail()
    log = DeltaLog(tdir, log_tail=tail, commit_fn=cat.commit_fn)
    snap = Snapshot.build(log)
    assert snap.version == 2
    assert sum(a.num_records or 0 for a in snap.add_files()) == 30


def test_concurrent_managed_and_filesystem_writers(spark, tdir):
    """Contention across the seam: threads alternate catalog-managed and
    filesystem writers against one table; every append retries through
    the shared conflict taxonomy and no commit is lost or duplicated."""
    import threading

    DeltaWriter.create(spark, tdir, SCHEMA)
    cat = FakeCatalog(tdir)
    errors: list = []

    def run(tid: int):
        try:
            w = (DeltaWriter(tdir, spark, commit_fn=cat.commit_fn)
                 if tid % 2 == 0 else DeltaWriter(tdir, spark))
            w.append(_df(spark, tid * 100, tid * 100 + 10), max_retries=30)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    t = DeltaTable(tdir)
    assert t.snapshot.version == 8  # 8 appends, contiguous versions
    rows = sorted(r["i"] for r in t.to_df(spark).collect())
    assert rows == sorted(
        i for tid in range(8) for i in range(tid * 100, tid * 100 + 10))
    # catalog ratified the managed half
    assert len(cat.ledger) == 4
