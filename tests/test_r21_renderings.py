"""Round-21 optimization pins.

Three internals changed for driver-side round-trip / socket-frame cost,
each with a value-identity obligation:

* ``_subdist_sql`` / ``_ssd_fixed_sql`` — SQL-string renderings of the
  PQ fixed-point distance expressions — must compute exactly what the
  Column-API twins (``_subdist_array`` / ``_ssd_fixed``, kept as the
  reference implementations) compute.
* ``lsh_bucket`` with a column NAME must equal ``lsh_bucket`` with a
  Column (the two construction paths must parse to the same tree).
* the streaming source's ``arrowEmitMode`` option — 'combined' (one
  record batch per file) and 'chunks' (per row group) must produce the
  identical stream result; an unknown mode must refuse loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_subdist_sql_matches_column_api(spark):
    from duckdb_delta_spark.operators.similarity import (
        _subdist_array, _subdist_sql,
    )

    book = [[0.25, -1.5], [3.125, 0.0], [-0.1, 2.7]]
    df = spark.createDataFrame(
        [(1, [0.3, -1.4, 9.0, 9.0]), (2, [-0.1, 2.7, 9.0, 9.0]),
         (3, [3.0, 0.05, 9.0, 9.0])],
        "id long, v array<double>")
    sv = F.slice(F.col("v").cast("array<double>"), 1, 2)
    got_col = df.select("id", _subdist_array(sv, book).alias("d")) \
                .orderBy("id").collect()
    got_sql = df.select("id", F.expr(_subdist_sql(
        "slice(CAST(`v` AS ARRAY<DOUBLE>), 1, 2)", book)).alias("d")) \
                .orderBy("id").collect()
    assert [tuple(r) for r in got_col] == [tuple(r) for r in got_sql]


def test_ssd_fixed_sql_matches_column_api(spark):
    from duckdb_delta_spark.operators.similarity import (
        _ssd_fixed, _ssd_fixed_sql,
    )

    df = spark.createDataFrame(
        [([0.5, -2.25], [0.5, -2.25]), ([1.0, 2.0], [3.0, -4.0]),
         ([0.1, 0.2], [0.3, 0.7])],
        "a array<double>, b array<double>")
    got_col = [r[0] for r in
               df.select(_ssd_fixed(F.col("a"), F.col("b"))).collect()]
    got_sql = [r[0] for r in
               df.select(F.expr(_ssd_fixed_sql("a", "b"))).collect()]
    assert got_col == got_sql
    assert got_col[0] == 0  # identical vectors -> zero distance


def test_lsh_bucket_name_and_column_paths_agree(spark):
    from duckdb_delta_spark.operators.similarity import lsh_bucket

    planes = [[1.0, -1.0, 0.5], [-0.25, 0.0, 2.0]]
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [-1.0, 5.0, -2.0]), (3, [0.0, 0.0, 0.0])],
        "id long, embedding array<double>")
    by_name = df.select(
        "id", lsh_bucket("embedding", planes).alias("b")).orderBy("id")
    by_col = df.select(
        "id", lsh_bucket(F.col("embedding"), planes).alias("b")).orderBy("id")
    assert [tuple(r) for r in by_name.collect()] == \
           [tuple(r) for r in by_col.collect()]
    # dot >= 0 ties (the zero vector) must bucket as '1' on both paths
    assert by_name.collect()[2]["b"] == "11"


def _run_stream(spark, tdir, ckpt, out, mode):
    q = (
        spark.readStream.format("delta_py")
        .option("path", tdir)
        .option("startingVersion", "0")
        .option("arrowEmitMode", mode)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_arrow_emit_modes_identical(spark, tmp_path):
    from pyspark.sql import types as T

    from duckdb_delta_spark import DeltaWriter
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - registered by an earlier test
        pass
    tdir = str(tmp_path / "t")
    schema = T.StructType([T.StructField("i", T.LongType()),
                           T.StructField("g", T.LongType())])
    w = DeltaWriter.create(spark, tdir, schema, partition_by=["g"])
    w.append(spark.range(50).select(F.col("id").alias("i"),
                                    (F.col("id") % 3).alias("g")))
    results = {}
    for mode in ("combined", "chunks"):
        out = str(tmp_path / f"out_{mode}")
        ckpt = str(tmp_path / f"ckpt_{mode}")
        _run_stream(spark, tdir, ckpt, out, mode)
        rows = spark.read.schema(schema).parquet(out).collect()
        results[mode] = sorted(tuple(r) for r in rows)
    assert results["combined"] == results["chunks"]
    assert len(results["combined"]) == 50


def test_arrow_emit_mode_rejects_unknown(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T

    from duckdb_delta_spark import DeltaWriter
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001
        pass
    tdir = str(tmp_path / "t2")
    schema = T.StructType([T.StructField("i", T.LongType())])
    w = DeltaWriter.create(spark, tdir, schema)
    w.append(spark.range(3).select(F.col("id").alias("i")))
    with pytest.raises(Exception, match="arrowEmitMode"):
        q = (
            spark.readStream.format("delta_py")
            .option("path", tdir)
            .option("arrowEmitMode", "bogus")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_cosine_sql_matches_column_api(spark):
    from duckdb_delta_spark.operators.similarity import cosine, cosine_sql

    df = spark.createDataFrame(
        [([1.0, 0.0, 2.0], [0.5, -1.0, 2.0]),
         ([0.1, 0.2, 0.3], [0.1, 0.2, 0.3]),
         ([3.0, -4.0, 0.0], [-3.0, 4.0, 0.0])],
        "a array<double>, b array<double>")
    got_col = [r[0] for r in df.select(cosine(F.col("a"), F.col("b"))).collect()]
    got_sql = [r[0] for r in df.select(cosine_sql("a", "b")).collect()]
    assert got_col == got_sql
    assert abs(got_sql[1] - 1.0) < 1e-12 and abs(got_sql[2] + 1.0) < 1e-12


def test_span_stats_complement_counting(spark):
    """duplicate_span_stats was rewritten to complement counting
    (n_dup = n_spans - unique-to-doc occurrences; n_spans from the
    token count, no window materialization). Pin against the
    join-back reference shape on a frame covering: too-short docs
    (0 windows), exact duplicates (all spans shared), partial overlap,
    and repeated windows WITHIN one doc (the occurrence-counting
    subtlety: a window repeated in one doc only is still unique)."""
    from duckdb_delta_spark.operators import dedup as D

    span = 3
    base = "alpha beta gamma delta epsilon"       # 5 tokens -> 3 windows
    rows = [
        (1, base),                                 # dup of 2
        (2, base),                                 # dup of 1
        (3, "alpha beta gamma zeta eta"),          # shares 1 window w/ 1,2
        (4, "one two"),                            # too short: 0 windows
        (5, "x y z x y z x y z"),                  # self-repeats only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_fraction"])
           for r in D.duplicate_span_stats(df, span=span).collect()}
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (3, 3, 1.0)
    assert got[3] == (3, 1, round(1 / 3, 4))
    assert got[4] == (0, 0, 0.0)
    # doc 5: 7 windows, every window string repeats within doc 5 only
    # ("x y z" appears 3x etc.) -> n_docs per hash is 1 -> zero dups
    assert got[5] == (7, 0, 0.0)
