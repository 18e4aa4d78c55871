"""Round-20 latent-bug sweep fixes (adversarial review of the CDF
derivation + DV modules): additive schema evolution INSIDE containers
(array elements / map entries) is servable by the change feed instead
of being refused as non-additive; the CDF walk parses each commit JSON
exactly once; the big-diff route never silently drops a descriptor
whose cardinality is missing; corrupt DV inputs surface as
DeletionVectorError naming the file/offset, never a raw struct.error;
_read_cdc issues ONE parquet read with a broadcast partition-value map
instead of a read+union per distinct partition tuple."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter
from duckdb_delta_spark.delta.changes import (
    _non_additive_changes,
    table_changes,
    table_changes_segments,
)
from duckdb_delta_spark.delta.log import DeltaLog


NEST1 = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("items", T.ArrayType(T.StructType([
        T.StructField("a", T.IntegerType())]))),
    T.StructField("m", T.MapType(T.StringType(), T.StructType([
        T.StructField("x", T.IntegerType())]))),
])
NEST2 = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("items", T.ArrayType(T.StructType([
        T.StructField("a", T.LongType()),          # widened int -> long
        T.StructField("b", T.StringType())]))),    # added in element
    T.StructField("m", T.MapType(T.StringType(), T.StructType([
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType())]))),   # added in map value
])


def test_cdf_serves_additive_nested_container_evolution(spark, tdir):
    """A field ADDED (or spec-widened) inside an ``array<struct>``
    element or map value is additive evolution — the writer evolves it,
    so the feed must serve the range in one frame (old rows null-fill
    the nested add, widened scalars cast), not refuse it; and
    table_changes_segments must not insert a spurious era boundary."""
    w = DeltaWriter.create(spark, tdir, NEST1, configuration={
        "delta.enableChangeDataFeed": "true"})
    w.append(spark.createDataFrame(
        [(1, [(10,)], {"u": (7,)}), (2, None, None)], NEST1).coalesce(1))
    w.append(spark.createDataFrame(
        [(3, [(20, "x")], {"v": (8, 9)})], NEST2).coalesce(1),
        merge_schema=True)

    df = table_changes(DeltaLog(tdir), spark, 0)
    rows = {r["k"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["items"] == [Row(a=10, b=None)]     # null-filled add
    assert rows[1]["items"][0]["a"] == 10              # widened value kept
    assert rows[1]["m"]["u"] == Row(x=7, y=None)
    assert rows[2]["items"] is None                    # NULL containers stay NULL
    assert rows[3]["items"] == [Row(a=20, b="x")]
    # served under the table's ACTUAL end schema (merge_schema adds the
    # nested fields; it does not widen types — delta-spark parity)
    assert (df.schema["items"].dataType
            == DeltaTable(tdir).snapshot.schema["items"].dataType)

    segs = table_changes_segments(DeltaLog(tdir), spark, 0)
    assert len(segs) == 1                              # no spurious boundary


def test_dtype_problems_accepts_nested_widening():
    """Spec type-widening applies at any nesting level: int -> long
    inside an array element (e.g. written by a foreign engine's ALTER)
    is additive for the feed."""
    widened = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("items", T.ArrayType(T.StructType([
            T.StructField("a", T.LongType())]))),
        NEST1["m"],
    ])
    assert _non_additive_changes(NEST1.fields, widened.fields) == []


def test_nested_container_drop_rename_still_refused():
    """Only ADDITIVE container changes relaxed: a drop / rename /
    non-widening change inside an array element or map value is still
    non-additive, with the nested path named."""
    back = _non_additive_changes(NEST2.fields, NEST1.fields)
    assert any("dropped" in p for p in back)           # b, y dropped going back
    assert any("changed type" in p for p in back)      # long -> int narrows

    renamed = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("items", T.ArrayType(T.StructType([
            T.StructField("z", T.IntegerType())]))),
        NEST1["m"],
    ])
    probs = _non_additive_changes(NEST1.fields, renamed.fields)
    assert probs and any("items.element" in p or "dropped" in p
                         for p in probs)

    narrowed_map = T.StructType([
        T.StructField("k", T.LongType()),
        NEST1["items"],
        T.StructField("m", T.MapType(T.StringType(), T.StructType([
            T.StructField("x", T.ShortType())]))),
    ])
    probs = _non_additive_changes(NEST1.fields, narrowed_map.fields)
    assert any("m.value" in p and "changed type" in p for p in probs)


def test_cdf_walk_parses_each_commit_once(spark, tdir, monkeypatch):
    """The walk's docstring promises one driver pass over each commit
    JSON; previously every commit was parsed twice (snapshot replay +
    classification) and probed a third time for the ICT."""
    sch = T.StructType([T.StructField("k", T.LongType())])
    w = DeltaWriter.create(spark, tdir, sch, configuration={
        "delta.enableChangeDataFeed": "true"})
    for i in range(3):
        w.append(spark.createDataFrame([(i,)], sch).coalesce(1))

    calls: dict[int, int] = {}
    real = DeltaLog.read_commit

    def counting(self, version):
        calls[version] = calls.get(version, 0) + 1
        return real(self, version)

    monkeypatch.setattr(DeltaLog, "read_commit", counting)
    df = table_changes(DeltaLog(tdir), spark, 1)       # walks commits 2..3
    assert df.count() == 2
    assert calls.get(2) == 1 and calls.get(3) == 1, calls


def test_dv_corrupt_inputs_raise_named_errors(tdir):
    """Corrupt DV descriptors/files surface as DeletionVectorError
    naming the file and what broke — never a raw struct.error from an
    executor, and an explicit offset 0 is rejected, not coerced to 1."""
    import os
    import struct

    import numpy as np

    os.makedirs(tdir, exist_ok=True)
    from duckdb_delta_spark.delta.dv import (
        DeletionVectorError,
        deserialize_bitmap,
        read_dv_from_descriptor,
        serialize_bitmap,
        write_dv_file,
    )

    [desc] = write_dv_file(tdir, [np.array([1, 5, 9], dtype=np.uint64)])
    assert read_dv_from_descriptor(desc, tdir).tolist() == [1, 5, 9]

    with pytest.raises(DeletionVectorError, match="offset 0"):
        read_dv_from_descriptor({**desc, "offset": 0}, tdir)
    with pytest.raises(DeletionVectorError, match="outside file"):
        read_dv_from_descriptor({**desc, "offset": 10**6}, tdir)

    # truncated file: dataSize extends past EOF
    from duckdb_delta_spark.delta.dv import dv_file_path

    path = dv_file_path(tdir, desc)
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[:-6])
    with pytest.raises(DeletionVectorError, match="extends past the end"):
        read_dv_from_descriptor(desc, tdir)
    open(path, "wb").write(raw)                        # restore

    # overclaimed bitmap count inside the payload
    data = bytearray(serialize_bitmap(np.array([1], dtype=np.uint64)))
    struct.pack_into("<Q", data, 4, 99)                # n_bitmaps 1 -> 99
    with pytest.raises(DeletionVectorError, match="corrupt DV payload"):
        deserialize_bitmap(bytes(data))


def test_read_cdc_one_scan_many_partitions(spark, tdir):
    """A cdc commit touching many partitions plans ONE parquet scan with
    a broadcast partition-value map — not a read+union per distinct
    partition tuple (500 partitions would mean a 500-branch plan)."""
    sch = T.StructType([
        T.StructField("p", T.IntegerType()),
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ])
    w = DeltaWriter.create(spark, tdir, sch, partition_by=["p"],
                           configuration={
                               "delta.enableChangeDataFeed": "true"})
    w.append(spark.createDataFrame(
        [(i % 4, i, f"v{i}") for i in range(12)], sch).coalesce(1))
    w.update("k >= 0", {"v": "upper(v)"})              # cdc in all 4 parts

    log = DeltaLog(tdir)
    head = DeltaTable(tdir).snapshot.version
    df = table_changes(log, spark, head - 1, head)     # the UPDATE commit only
    rows = df.filter(df["_change_type"] == "update_postimage").collect()
    assert len(rows) == 12
    assert {r["p"] for r in rows} == {0, 1, 2, 3}      # constants injected
    assert all(r["v"] == f"V{r['k']}" for r in rows)

    from duckdb_delta_spark.plans import physical_plan_text

    plan = physical_plan_text(df)
    import re

    n_scans = len(re.findall(r"FileScan parquet|Scan parquet", plan))
    assert n_scans == 1, f"expected one cdc scan, plan has {n_scans}"


def test_big_route_serves_descriptor_missing_cardinality(spark, tdir,
                                                         monkeypatch):
    """The executor-decode route prunes a diff direction only on PROOF
    of emptiness. A (spec-violating) foreign descriptor with no
    cardinality routes to the decode — previously it was silently
    dropped and the feed lost its delete rows, diverging from the
    small route which always decodes."""
    import json as _json
    import os as _os

    import duckdb_delta_spark.delta.changes as ch

    sch = T.StructType([T.StructField("k", T.LongType())])
    w = DeltaWriter.create(spark, tdir, sch)           # no CDF: cdc-less
    w.append(spark.createDataFrame([(i,) for i in range(10)],
                                   sch).coalesce(1))
    w.delete("k IN (2, 5)")                            # partial-file DV
    head = DeltaTable(tdir).snapshot.version

    # strip cardinality from the committed add.deletionVector
    log_dir = _os.path.join(tdir, "_delta_log")
    cpath = _os.path.join(log_dir, f"{head:020d}.json")
    lines = []
    stripped = 0
    for line in open(cpath):
        if not line.strip():
            continue
        a = _json.loads(line)
        dv = (a.get("add") or {}).get("deletionVector")
        if dv and "cardinality" in dv:
            del dv["cardinality"]
            stripped += 1
        lines.append(_json.dumps(a))
    assert stripped
    open(cpath, "w").write("\n".join(lines) + "\n")

    monkeypatch.setattr(ch, "DIFF_JOIN_MAX", -1)       # force the big route
    df = table_changes(DeltaLog(tdir), spark, head - 1, head)
    dels = sorted(r["k"] for r in df.collect()
                  if r["_change_type"] == "delete")
    assert dels == [2, 5]
