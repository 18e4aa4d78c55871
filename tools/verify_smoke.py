"""Happy-path e2e: create -> append (plain + partitioned) -> scan with
skip-report assertions -> time travel -> checkpoint roundtrip."""
import shutil, tempfile, os
from duckdb_delta_spark.session import get_spark
from duckdb_delta_spark.delta.table import DeltaTable
from duckdb_delta_spark.delta.writer import DeltaWriter

spark = get_spark("smoke")
_fx = os.path.join(os.path.dirname(__file__), "..", ".fixtures")
os.makedirs(_fx, exist_ok=True)  # gitignored; absent on fresh checkouts
base = tempfile.mkdtemp(dir=_fx)
try:
    path = os.path.join(base, "t")
    df = spark.range(100).selectExpr(
        "id", "id % 4 AS p", "CAST(id * 1.5 AS DOUBLE) AS v")
    w = DeltaWriter.create(spark, path, df.schema, partition_by=["p"])
    w.append(df)
    assert DeltaTable(path).to_df(spark).count() == 100
    print("create+partitioned append OK")

    w.append(spark.range(100, 200).selectExpr(
        "id", "id % 4 AS p", "CAST(id * 1.5 AS DOUBLE) AS v"))
    t = DeltaTable(path)
    sc = t.scan(spark).filter("p", "=", 1)
    got = sc.to_df().count()
    assert got == 50, got
    rep = sc.skip_report()
    assert rep["files_skipped_by_partition"] > 0, rep
    print("partition prune OK", rep)

    assert t.scan(spark).filter("id", "<", 10).to_df().count() == 10
    print("stats skip OK")

    v0 = DeltaTable(path, version=1).to_df(spark).count()
    assert v0 == 100, v0  # v0=CREATE, v1=first append
    print("time travel OK")

    w.checkpoint()
    assert DeltaTable(path).to_df(spark).count() == 200
    print("checkpoint roundtrip OK")
finally:
    shutil.rmtree(base)
print("smoke OK")
