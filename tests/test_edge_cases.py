"""Edge cases the reference tests explicitly: url-encoded partition values,
timestamp/IN pushdown (which we support beyond the reference's matrix),
empty tables, null partitions.

Reference analogues: url_encoded_path tests, file_skipping_all_types.test,
null partition serialization (delta_insert.cpp:222-223).
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter


def test_url_encoded_partition_values_roundtrip(spark, tdir):
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    w = DeltaWriter.create(spark, tdir, schema, partition_by=["k"])
    data = spark.createDataFrame(
        [("plain", 1), ("with space", 2), ("a=b", 3), ("pct%20", 4), (None, 5)],
        schema,
    )
    w.append(data.coalesce(1))

    t = DeltaTable(tdir)
    # log keeps decoded values; null serializes as missing/empty
    vals = {f.partition_values.get("k") for f in t.snapshot.add_files()}
    assert {"plain", "with space", "a=b", "pct%20", None} == vals

    got = {(r["k"], r["v"]) for r in t.to_df(spark).collect()}
    assert got == {("plain", 1), ("with space", 2), ("a=b", 3), ("pct%20", 4), (None, 5)}

    # partition pruning on the funky value
    sb = t.scan(spark).filter("k", "=", "a=b")
    assert [r["v"] for r in sb.to_df().collect()] == [3]
    assert sb.skip_report()["files_skipped_by_partition"] > 0
    # IS NULL finds the hive default partition
    sbn = t.scan(spark).filter("k", "is null")
    assert [r["v"] for r in sbn.to_df().collect()] == [5]


def test_timestamp_and_in_pushdown_beyond_reference(spark, tdir):
    """The reference cannot push timestamps or IN() (delta-kernel-rs#1002,
    SURVEY.md §2B); our stats evaluator handles both."""
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("i", T.LongType())]
    )
    w = DeltaWriter.create(spark, tdir, schema)
    base = dt.datetime(2024, 1, 1)
    for day in range(4):
        rows = [(base + dt.timedelta(days=day, minutes=m), day * 100 + m) for m in range(10)]
        w.append(spark.createDataFrame(rows, schema).coalesce(1))

    t = DeltaTable(tdir)
    sb = t.scan(spark).filter("ts", ">=", dt.datetime(2024, 1, 4))
    assert sb.to_df().count() == 10
    assert sb.skip_report()["files_skipped_by_stats"] == 3

    sb2 = t.scan(spark).filter("i", "in", [0, 1, 305])
    assert sb2.to_df().count() == 3
    assert sb2.skip_report()["files_skipped_by_stats"] == 2


def test_empty_table_scan(spark, tdir):
    schema = T.StructType([T.StructField("i", T.LongType())])
    DeltaWriter.create(spark, tdir, schema)
    df = DeltaTable(tdir).to_df(spark)
    assert df.count() == 0
    assert df.schema.fieldNames() == ["i"]


def _mapped_schema(mode_fields):
    return T.StructType(
        [
            T.StructField(
                name, typ, True,
                {"delta.columnMapping.id": i + 1,
                 "delta.columnMapping.physicalName": f"col-{i:04d}"},
            )
            for i, (name, typ) in enumerate(mode_fields)
        ]
    )


@pytest.mark.parametrize("mode", ["name", "id"])
def test_column_mapping_append_roundtrip(spark, tdir, mode):
    """Appends to column-mapped tables write PHYSICAL column names +
    parquet field ids; reads resolve by physicalName (name mode) or by
    parquet.field.id from the footer (id mode — reference:
    delta_utils.hpp:300-311, column_mapping_id_mode.test)."""
    import pyarrow.parquet as pq

    schema = _mapped_schema(
        [("k", T.LongType()), ("v", T.StringType()), ("x", T.DoubleType())]
    )
    w = DeltaWriter.create(
        spark, tdir, schema,
        configuration={"delta.columnMapping.mode": mode,
                       "delta.columnMapping.maxColumnId": "3"},
    )
    df = spark.range(50).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") * 0.5).alias("x"),
    )
    w.append(df.coalesce(1))

    t = DeltaTable(tdir)
    (f,) = t.snapshot.add_files()
    # physical layout on disk: renamed columns + field ids in the footer
    pf = pq.ParquetFile(f.absolute_path(tdir))
    arrow_names = [fld.name for fld in pf.schema_arrow]
    assert arrow_names == ["col-0000", "col-0001", "col-0002"]
    assert pf.schema_arrow.field(0).metadata[b"PARQUET:field_id"] == b"1"
    # stats keyed by physical names (Delta spec on mapped tables)
    stats = json.loads(f.stats)
    assert stats["minValues"]["col-0000"] == 0
    assert stats["maxValues"]["col-0000"] == 49

    got = t.to_df(spark)
    assert got.columns == ["k", "v", "x"]
    assert got.count() == 50
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(50))
    # stats pruning through the logical->physical translation
    sb = t.scan(spark).filter("k", ">=", 100)
    assert sb.to_df().count() == 0
    assert sb.skip_report()["files_skipped_by_stats"] == 1


def test_column_mapping_id_resolves_by_field_id(spark, tdir):
    """id mode must match columns by field id even when the parquet file's
    column NAMES are unrelated garbage (the reference's generated
    column_mapping_id_mode fixture has exactly this shape)."""
    import json as _json
    import time as _time
    import uuid as _uuid

    from duckdb_delta_spark.delta.log import DeltaLog
    from duckdb_delta_spark.delta.writer import _commit_info

    schema = _mapped_schema([("k", T.LongType()), ("v", T.StringType())])
    os.makedirs(os.path.join(tdir, "_delta_log"))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    # data written under names matching NEITHER logical nor physicalName
    spark.range(20).select(
        F.col("id").alias("zz_9", metadata={"parquet.field.id": 1}),
        F.concat(F.lit("s"), F.col("id")).alias("aa_0", metadata={"parquet.field.id": 2}),
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(tdir, "data"))
    meta = {
        "id": str(_uuid.uuid4()),
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema.json(),
        "partitionColumns": [],
        "configuration": {"delta.columnMapping.mode": "id",
                          "delta.columnMapping.maxColumnId": "2"},
        "createdTime": int(_time.time() * 1000),
    }
    actions = [
        {"commitInfo": _commit_info("CREATE TABLE")},
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": meta},
    ]
    data_dir = os.path.join(tdir, "data")
    for name in sorted(os.listdir(data_dir)):
        if name.endswith(".parquet"):
            full = os.path.join(data_dir, name)
            actions.append({"add": {
                "path": f"data/{name}", "partitionValues": {},
                "size": os.path.getsize(full),
                "modificationTime": int(os.path.getmtime(full) * 1000),
                "dataChange": True,
                "stats": _json.dumps({"numRecords": 20}),
            }})
    DeltaLog(tdir).commit(0, actions)

    got = DeltaTable(tdir).to_df(spark)
    assert got.columns == ["k", "v"]
    assert got.count() == 20
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(20))
    # a second generation appended by OUR writer coexists (different
    # physical names, same field ids)
    DeltaWriter(tdir, spark).append(
        spark.range(20, 30).select(
            F.col("id").alias("k"), F.concat(F.lit("s"), F.col("id")).alias("v")
        )
    )
    got2 = DeltaTable(tdir).to_df(spark)
    assert got2.count() == 30
    assert got2.agg(F.sum("k")).collect()[0][0] == sum(range(30))


def test_log_tail_injection_skips_listing(spark, tdir, monkeypatch):
    """CCv2-style log_tail: snapshot resolution from caller-supplied commit
    paths, no directory LIST (reference: delta_utils.cpp:884-888)."""
    import os

    schema = T.StructType([T.StructField("i", T.LongType())])
    w = DeltaWriter.create(spark, tdir, schema)
    w.append(spark.range(7).select(F.col("id").alias("i")))

    tail = [
        os.path.join(tdir, "_delta_log", f"{v:020d}.json") for v in (0, 1)
    ]

    real_listdir = os.listdir

    def no_list(path):
        assert not str(path).endswith("_delta_log"), "log dir was listed"
        return real_listdir(path)

    monkeypatch.setattr(os, "listdir", no_list)
    t = DeltaTable(tdir, log_tail=tail)
    assert t.version == 1
    assert t.to_df(spark).count() == 7


def test_structured_logging_sink(spark, tdir):
    """Engine operations emit structured records through registered sinks
    (reference analogue: delta_kernel_logging -> LoggerCallback,
    delta_utils.cpp:1175-1242). A sink raising must never fail the op."""
    from duckdb_delta_spark.delta import logging as dlog

    records = []
    dlog.add_sink(records.append)
    dlog.add_sink(lambda r: 1 / 0)  # hostile sink: must be swallowed
    try:
        w = DeltaWriter.create(spark, tdir, T.StructType(
            [T.StructField("i", T.LongType())]))
        w.append(spark.range(40).select(F.col("id").alias("i")).coalesce(2))
        w.delete("i < 4")
        w.checkpoint()
        sb = DeltaTable(tdir).scan(spark).filter("i", ">=", 10)
        sb.to_df().count()
    finally:
        dlog.remove_sink(records.append)  # no-op (different object) — fine
        dlog._SINKS.clear()

    events = [r["event"] for r in records]
    for expected in ("commit.write", "snapshot.build", "delete.apply",
                     "checkpoint.write", "scan.plan"):
        assert expected in events, f"missing {expected} in {set(events)}"
    commit = next(r for r in records if r["event"] == "commit.write"
                  and r.get("operation") == "DELETE")
    assert commit["version"] == 2
    plan = [r for r in records if r["event"] == "scan.plan"][-1]
    assert plan["files_total"] >= 1 and "files_skipped_by_stats" in plan
    assert all("ts_ms" in r and r["table_path"] for r in records)


def test_non_utc_session_timezone_semantics(spark, tdir):
    """TIMESTAMP (UTC-adjusted instant) vs TIMESTAMP_NTZ (wall clock)
    under a NON-UTC session timezone — the reference distinguishes these
    at delta_utils.cpp:566-567 and the bench session pins UTC, so this is
    the only place the adjustment is non-vacuously exercised.

    A SQL literal '2024-01-01 12:00:00' entered under
    America/Los_Angeles is the instant 2024-01-01T20:00Z when typed
    TIMESTAMP (renders 12:00 under LA, 20:00 under UTC) but a fixed
    12:00 wall clock when typed TIMESTAMP_NTZ. Collected naive datetimes
    are OS-tz (UTC here) renderings of the instant. A timestamp
    PARTITION value round-trips the instant through hive-dir recovery +
    constant injection under the same session tz."""
    import datetime as _dt

    from duckdb_delta_spark.delta.table import DeltaTable
    from duckdb_delta_spark.delta.writer import DeltaWriter

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        df = spark.sql(
            """SELECT id AS i,
                      TIMESTAMP\'2024-01-01 12:00:00\' AS ts,
                      TIMESTAMP_NTZ\'2024-01-01 12:00:00\' AS ntz,
                      TIMESTAMP\'2024-01-01 12:00:00\' AS pt
               FROM range(2)"""
        )
        w = DeltaWriter.create(spark, tdir, df.schema, partition_by=["pt"])
        w.append(df)

        out = DeltaTable(tdir).to_df(spark)
        # NTZ survives as NTZ in the read schema
        assert isinstance(
            out.schema["ntz"].dataType, T.TimestampNTZType), out.schema
        got = {r["i"]: r for r in out.collect()}
        instant = _dt.datetime(2024, 1, 1, 20, 0, 0)  # 12:00 LA = 20:00Z
        wall = _dt.datetime(2024, 1, 1, 12, 0, 0)
        assert got[0]["ts"] == instant, got[0]
        assert got[0]["ntz"] == wall, got[0]
        # partition value: hive-dir recovery + injection under the same
        # session tz preserves the instant
        assert got[0]["pt"] == instant, got[0]

        # session-tz rendering: ts shifts with the session, ntz never
        render = out.select(
            F.date_format("ts", "HH:mm").alias("ts_la"),
            F.date_format("ntz", "HH:mm").alias("ntz_la"),
        ).collect()[0]
        assert (render["ts_la"], render["ntz_la"]) == ("12:00", "12:00")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        render_utc = DeltaTable(tdir).to_df(spark).select(
            F.date_format("ts", "HH:mm").alias("ts_utc"),
            F.date_format("ntz", "HH:mm").alias("ntz_utc"),
        ).collect()[0]
        assert (render_utc["ts_utc"], render_utc["ntz_utc"]) == (
            "20:00", "12:00")

        # stats pruning on the instant column: footer stats hold the UTC
        # instant, so a UTC-wall literal past 20:00 skips every file
        sb = DeltaTable(tdir).scan(spark).filter(
            "ts", ">", _dt.datetime(2024, 1, 1, 20, 30, 0))
        assert sb.to_df().count() == 0
        assert sb.skip_report()["files_scanned"] == 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_nested_column_mapping_write_roundtrip(spark, tdir):
    """Writes to tables with NESTED column mapping (struct fields inside
    structs/arrays/maps carry their own physicalName/id): the write path
    renames every nesting level via a positional struct cast, parquet
    footers hold physical names + field ids at every level, stats JSON is
    keyed physically at every level (so nested-path pruning works on our
    own writes), and UPDATE/DELETE rewrites preserve all of it."""
    import pyarrow.parquet as pq

    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("info", T.StructType([
            T.StructField("a", T.LongType()),
            T.StructField("s", T.StringType()),
        ])),
        T.StructField("tags", T.ArrayType(T.StructType([
            T.StructField("k", T.StringType())]))),
        T.StructField("attrs", T.MapType(T.StringType(), T.StructType([
            T.StructField("v", T.LongType())]))),
    ])
    w = DeltaWriter.create(
        spark, tdir, schema,
        configuration={"delta.columnMapping.mode": "name"})
    df = spark.range(20).select(
        F.col("id").alias("i"),
        F.struct(F.col("id").alias("a"),
                 F.concat(F.lit("n"), F.col("id")).alias("s")).alias("info"),
        F.array(F.struct(F.concat(F.lit("t"), F.col("id")).alias("k")))
        .alias("tags"),
        F.create_map(F.lit("m"), F.struct((F.col("id") * 3).alias("v")))
        .alias("attrs"))
    w.append(df.repartitionByRange(2, "i"))

    t = DeltaTable(tdir)
    files = t.snapshot.add_files()
    # physical names + field ids at EVERY level in the footer
    pf = pq.ParquetFile(files[0].absolute_path(tdir))
    assert all(n.startswith("col-") for n in pf.schema_arrow.names)
    info_f = pf.schema_arrow.field(1)
    assert info_f.metadata[b"PARQUET:field_id"] is not None
    inner_names = [info_f.type.field(j).name
                   for j in range(info_f.type.num_fields)]
    assert all(n.startswith("col-") for n in inner_names)
    assert all(info_f.type.field(j).metadata
               and b"PARQUET:field_id" in info_f.type.field(j).metadata
               for j in range(info_f.type.num_fields))
    # stats keyed by physical names at every level
    stats = json.loads(files[0].stats)
    info_phys = next(
        (f.metadata or {})["delta.columnMapping.physicalName"]
        for f in t.snapshot.schema.fields if f.name == "info")
    assert info_phys in stats["minValues"]
    assert all(k.startswith("col-")
               for k in stats["minValues"][info_phys])

    # logical read roundtrip, nested values intact
    got = t.to_df(spark)
    assert got.columns == ["i", "info", "tags", "attrs"]
    assert got.count() == 20
    assert got.where("info.a = i AND info.s = concat('n', i)").count() == 20
    assert got.selectExpr("i", "explode(tags) AS e").where(
        "e.k = concat('t', CAST(i AS STRING))").count() == 20
    assert got.selectExpr("attrs['m'].v AS mv", "i").where(
        "mv = 3 * i").count() == 20

    # nested-path stats pruning against our OWN stats
    sb = t.scan(spark).filter("info.a", ">=", 100)
    assert sb.to_df().count() == 0
    assert sb.skip_report()["files_skipped_by_stats"] == 2

    # DML rewrites keep the mapping intact
    DeltaWriter(tdir, spark).update(
        "i = 3", {"info": "named_struct('a', 99L, 's', 'upd')"})
    assert DeltaTable(tdir).to_df(spark).where(
        "info.a = 99 AND info.s = 'upd'").count() == 1
    DeltaWriter(tdir, spark).delete("i = 5")
    assert DeltaTable(tdir).to_df(spark).count() == 19

    # and the streaming source reads the rewritten nested-CM table too
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    src = DeltaPySource({"path": tdir, "startingVersion": "0",
                         "ignoreChanges": "true"})
    reader = src.streamReader(src.schema())
    parts = reader.partitions(
        {"version": -1},
        {"version": 3})
    rows = 0
    for p in parts:
        for batch in reader.read(p):
            rows += batch.num_rows
    assert rows > 0


def test_nested_column_mapping_optimize_reorg_constraint(spark, tdir):
    """Maintenance ops on NESTED column-mapped tables: OPTIMIZE's rewrite
    reads the files under physical names at EVERY nesting level (a
    logical nested read schema silently NULLED every nested field — the
    r14 bug this pins), REORG PURGE materializes DVs without losing
    nested values, and CHECK constraints referencing nested dotted paths
    enforce on append."""
    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("info", T.StructType(
            [T.StructField("a", T.LongType())])),
    ])
    DeltaWriter.create(spark, tdir, schema,
                       configuration={"delta.columnMapping.mode": "name"})
    for lo in range(0, 20, 5):
        DeltaWriter(tdir, spark).append(spark.range(lo, lo + 5).select(
            F.col("id").alias("i"),
            F.struct(F.col("id").alias("a")).alias("info")).coalesce(1))

    DeltaWriter(tdir, spark).add_constraint("a_pos", "info.a >= 0")
    from duckdb_delta_spark.delta.errors import ConstraintViolationError
    with pytest.raises(ConstraintViolationError):
        DeltaWriter(tdir, spark).append(
            spark.createDataFrame([(99, (-1,))], schema).coalesce(1))

    DeltaWriter(tdir, spark).compact()
    t = DeltaTable(tdir)
    assert len(t.snapshot.add_files()) == 1
    got = t.to_df(spark)
    assert got.where("info.a = i").count() == 20 == got.count()

    DeltaWriter(tdir, spark).delete("i = 3")
    DeltaWriter(tdir, spark).reorg_purge()
    t2 = DeltaTable(tdir)
    g2 = t2.to_df(spark)
    assert g2.where("info.a = i").count() == 19 == g2.count()
    assert not any(f.deletion_vector for f in t2.snapshot.add_files())
