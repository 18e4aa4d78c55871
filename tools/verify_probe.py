"""Error-path probes: error taxonomy (bad path/version), NOT NULL rejection,
idempotent txn matrix, DV read path, double checkpoint."""
import os, shutil, tempfile
from duckdb_delta_spark.session import get_spark
from duckdb_delta_spark.delta.table import DeltaTable
from duckdb_delta_spark.delta.writer import DeltaWriter
from duckdb_delta_spark.delta import errors as E

spark = get_spark("probe")
_fx = os.path.join(os.path.dirname(__file__), "..", ".fixtures")
os.makedirs(_fx, exist_ok=True)  # gitignored; absent on fresh checkouts
base = tempfile.mkdtemp(dir=_fx)
try:
    # taxonomy: bad location / bad version
    try:
        DeltaTable(os.path.join(base, "nope"))
        raise SystemExit("FAIL: bad path accepted")
    except E.InvalidTableLocationError:
        print("bad path OK")
    path = os.path.join(base, "t")
    df = spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    w = DeltaWriter.create(spark, path, df.schema)
    w.append(df)
    try:
        DeltaTable(path, version=99)
        raise SystemExit("FAIL: bad version accepted")
    except E.InvalidTableVersionError:
        print("bad version OK")

    # NOT NULL rejection
    from pyspark.sql import types as T
    nn_schema = T.StructType([
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("v", T.DoubleType())])
    p2 = os.path.join(base, "nn")
    w2 = DeltaWriter.create(spark, p2, nn_schema)
    bad = spark.createDataFrame([(None, 1.0)], nn_schema._as_nullable() if hasattr(nn_schema, "_as_nullable") else T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]))
    try:
        w2.append(bad)
        raise SystemExit("FAIL: NOT NULL violation accepted")
    except E.ConstraintViolationError:
        print("not-null rejection OK")
    # no orphan parquet left behind beside the log
    stray = [f for f in os.listdir(p2) if f.endswith(".parquet")]
    assert not stray, stray

    # idempotent txn matrix: txn_expected_last gates a replayed writer
    w.append(df, txn_app_id="app", txn_version=7)
    assert DeltaTable(path).get_transaction_version("app") == 7
    try:
        w.append(df, txn_app_id="app", txn_version=8, txn_expected_last=6)
        raise SystemExit("FAIL: stale expected_last accepted")
    except E.IdempotencyError:
        pass
    w.append(df, txn_app_id="app", txn_version=8, txn_expected_last=7)
    assert DeltaTable(path).get_transaction_version("app") == 8
    assert DeltaTable(path).to_df(spark).count() == 30
    print("idempotent txn OK")

    # DV read path: delete some rows, count reflects it
    w.delete("id < 5")
    assert DeltaTable(path).to_df(spark).count() == 15  # id<5 appears in all 3 appends
    print("dv read OK")

    # double checkpoint is safe
    w.checkpoint(); w.checkpoint()
    assert DeltaTable(path).to_df(spark).count() == 15  # id<5 appears in all 3 appends
    print("double checkpoint OK")
finally:
    shutil.rmtree(base)
print("probe OK")
