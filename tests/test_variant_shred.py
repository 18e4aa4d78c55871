"""Write-side variant shredding: codec units, round-trips through the
engine's own reader, residual bytes cross-checked against the
spec-derived foreign encoder, and the feature/refusal gates."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter
from duckdb_delta_spark.delta import variant as V
from duckdb_delta_spark.delta.errors import (
    SchemaError,
    UnsupportedFeatureError,
)
from duckdb_delta_spark.testing import foreign

VSCHEMA = T.StructType([
    T.StructField("i", T.LongType()),
    T.StructField("v", T.VariantType()),
])


def _vtable(spark, tdir, rows_json: list[tuple[int, str | None]]):
    w = DeltaWriter.create(spark, tdir, VSCHEMA)
    w.enable_variant_shredding()
    df = spark.createDataFrame(rows_json, "i long, j string").select(
        "i", F.parse_json("j").alias("v"))
    return w, df


def test_codec_parses_spark_bytes(spark):
    """The codec reads what Spark's encoder writes: non-contiguous object
    offsets, nested arrays, every scalar we shred on."""
    row = spark.range(1).select(F.parse_json(F.lit(
        '{"k":3,"t":"x","extra":[1,2],"d":1.5e300,"dec":1.5,"b":true}'
    )).alias("v")).head()
    v = row["v"]
    names = V.parse_metadata(v.metadata)
    ids = {n: i for i, n in enumerate(names)}
    fields = V.object_fields(v.value)
    assert set(fields) == set(ids.values())
    assert V.decode_scalar(fields[ids["k"]]) == ("long", 3)
    assert V.decode_scalar(fields[ids["t"]]) == ("string", "x")
    assert V.decode_scalar(fields[ids["d"]]) == ("double", 1.5e300)
    assert V.decode_scalar(fields[ids["b"]]) == ("boolean", True)
    assert V.decode_scalar(fields[ids["extra"]])[0] == "other"  # array
    # JSON decimals encode as variant DECIMAL → residual, never coerced
    assert V.decode_scalar(fields[ids["dec"]])[0] == "other"
    # each child slice is a self-contained value
    for b in fields.values():
        assert V.value_size(b) == len(b)


def test_encode_object_orders_by_field_name():
    """Residual objects list ids in lexicographic field-NAME order even
    when the metadata dictionary is unsorted (readers binary-search)."""
    names = ["zz", "aa"]  # unsorted dictionary: id 0 = "zz", id 1 = "aa"
    enc = V.encode_object(
        {0: V.encode_object({}, names), 1: b"\x01"}, names)
    # ids must appear as [1, 0] ("aa" < "zz"); small header → ids at [2:4]
    assert list(enc[2:4]) == [1, 0]
    fields = V.object_fields(enc)
    assert set(fields) == {0, 1}


def test_shredded_write_roundtrip_and_residual_bytes(spark, tdir):
    """Round-trip through the engine AND byte-exact residual check
    against the foreign spec encoder: u rides the object residual with
    its original (int8) encoding and field id."""
    w, df = _vtable(spark, tdir, [(0, '{"k":5,"t":"x","u":7}')])
    w.append(df.coalesce(1), shred={"v": {"k": "long", "t": "string"}})

    out = DeltaTable(tdir).to_df(spark)
    got = json.loads(out.select(F.to_json("v").alias("j")).head()["j"])
    assert got == {"k": 5, "t": "x", "u": 7}

    # raw physical layout: typed subcolumns + spec-exact residual
    files = [os.path.join(tdir, f) for f in os.listdir(tdir)
             if f.endswith(".parquet")]
    raw = spark.read.parquet(*files).select("v.*").head()
    assert raw["typed_value"]["k"]["typed_value"] == 5
    assert raw["typed_value"]["t"]["typed_value"] == "x"
    names = V.parse_metadata(bytes(raw["metadata"]))
    uid = names.index("u")
    expect = foreign.variant_obj({uid: foreign.variant_int8(7)})
    assert bytes(raw["value"]) == expect


def test_shredded_write_edge_cases(spark, tdir):
    """Missing fields, type-mismatch → field residual, bare scalar, full
    shred (no residual), and null variants all round-trip."""
    rows = [
        (0, '{"k":1,"t":"a","u":9}'),   # normal + residual
        (1, '{"k":"oops","t":"b"}'),    # k wrong type → field residual
        (2, '{"t":"c"}'),               # k missing
        (3, '{"k":4,"t":"d"}'),         # fully shredded, no residual
        (4, '42'),                      # bare scalar, no object
        (5, None),                      # null variant
    ]
    w, df = _vtable(spark, tdir, rows)
    w.append(df.coalesce(1), shred={"v": {"k": "long", "t": "string"}})
    out = DeltaTable(tdir).to_df(spark)
    got = {r["i"]: (None if r["j"] is None else json.loads(r["j"]))
           for r in out.select("i", F.to_json("v").alias("j")).collect()}
    assert got == {0: {"k": 1, "t": "a", "u": 9},
                   1: {"k": "oops", "t": "b"},
                   2: {"t": "c"}, 3: {"k": 4, "t": "d"}, 4: 42, 5: None}

    files = [os.path.join(tdir, f) for f in os.listdir(tdir)
             if f.endswith(".parquet")]
    phys = {r["i"]: r["v"] for r in spark.read.parquet(*files).collect()}
    assert phys[1]["typed_value"]["k"]["typed_value"] is None
    assert phys[1]["typed_value"]["k"]["value"] is not None  # field residual
    assert phys[3]["value"] is None                          # no residual
    assert phys[4]["typed_value"] is None                    # bare scalar
    assert phys[4]["value"] is not None
    assert phys[5] is None

    # typed access still works across layouts
    ks = out.select("i", F.try_variant_get("v", "$.k", "long").alias("k"))
    assert {r["i"]: r["k"] for r in ks.collect()} == {
        0: 1, 1: None, 2: None, 3: 4, 4: None, 5: None}


def test_shredded_write_refusals(spark, tdir, tmp_path):
    """Feature gate, column-mapping gate, non-variant target, and
    enable() on a variant-less table all refuse loudly."""
    w = DeltaWriter.create(spark, tdir, VSCHEMA)
    df = spark.createDataFrame([(0, '{"k":1}')], "i long, j string").select(
        "i", F.parse_json("j").alias("v"))
    with pytest.raises(UnsupportedFeatureError, match="variantShredding"):
        w.append(df, shred={"v": {"k": "long"}})
    w.enable_variant_shredding()
    with pytest.raises(SchemaError, match="not a variant column"):
        DeltaWriter(tdir, spark).append(df, shred={"i": {"k": "long"}})
    with pytest.raises(ValueError, match="unsupported shred type"):
        DeltaWriter(tdir, spark).append(df, shred={"v": {"k": "decimal"}})

    novar = str(tmp_path / "novar")
    w2 = DeltaWriter.create(
        spark, novar, T.StructType([T.StructField("i", T.LongType())]))
    with pytest.raises(SchemaError, match="no variant column"):
        w2.enable_variant_shredding()

    mapped = str(tmp_path / "mapped")
    DeltaWriter.create(
        spark, mapped, VSCHEMA,
        configuration={"delta.columnMapping.mode": "name"})
    wm = DeltaWriter(mapped, spark)
    wm.enable_variant_shredding()
    with pytest.raises(UnsupportedFeatureError, match="column-mapped"):
        wm.append(df, shred={"v": {"k": "long"}})


def test_shredded_and_legacy_appends_interleave(spark, tdir):
    """Shredding is a per-file choice: shredded and legacy commits on the
    same table read back as one uniform variant column."""
    w, df = _vtable(spark, tdir,
                    [(i, '{"k":%d,"t":"s%d"}' % (i, i)) for i in range(6)])
    w.append(df.where("i % 2 = 0").coalesce(1),
             shred={"v": {"k": "long"}})
    w.append(df.where("i % 2 = 1").coalesce(1))  # legacy layout
    out = DeltaTable(tdir).to_df(spark)
    got = {r["i"]: json.loads(r["j"]) for r in
           out.select("i", F.to_json("v").alias("j")).collect()}
    assert got == {i: {"k": i, "t": f"s{i}"} for i in range(6)}


def test_codec_wide_object_and_long_strings(spark, tdir):
    """Header-width edges: 300-field objects (4-byte num_elements /
    multi-byte offsets on the residual) and >63-byte strings (long-string
    primitive) survive the shred → reassemble round-trip."""
    import json as _json

    obj = {f"f{i:03d}": i for i in range(300)}
    obj["k"] = 7
    obj["big"] = "x" * 200  # long-string encoding (4-byte length)
    payload = _json.dumps(obj)
    w, df = _vtable(spark, tdir, [(0, payload)])
    w.append(df.coalesce(1), shred={"v": {"k": "long"}})
    out = DeltaTable(tdir).to_df(spark)
    got = _json.loads(out.select(F.to_json("v").alias("j")).head()["j"])
    assert got == obj
    # typed path still extracted k
    files = [os.path.join(tdir, f) for f in os.listdir(tdir)
             if f.endswith(".parquet")]
    raw = spark.read.parquet(*files).select("v.*").head()
    assert raw["typed_value"]["k"]["typed_value"] == 7
    # residual really carries 301 fields
    names = V.parse_metadata(bytes(raw["metadata"]))
    fields = V.object_fields(bytes(raw["value"]))
    assert len(fields) == 301
    assert V.decode_scalar(fields[names.index("big")]) == ("string", "x" * 200)
