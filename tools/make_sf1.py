"""Generate `.benchdata/sf1/` — a 10x key-shifted replication of
/root/testdata/sf0.1 for scale-checkpoint runs (docs/tpch_sf1.md,
docs/tpcds_sf1.md).

Referential integrity is preserved: each replica i shifts every key
family by i * STRIDE (custkey/suppkey/partkey/orderkey/event_id/user_id
consistently across fact and dim tables), so joins land exactly as in
the original and per-key group sizes stay constant while key
cardinality and row count grow 10x — the TPC-H dbgen scaling shape.
region/nation are genuine dimensions and are copied once.

Output layout matches the testdata convention (`<table>.parquet` — a
directory here, which `spark.read.parquet` handles identically).

Usage: PYTHONPATH=/root/repo python tools/make_sf1.py [replicas]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 10_000_000  # far above every sf0.1 key max (orderkey < 600k)

#: key columns to shift, per table
SHIFTS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
COPY = ("region", "nation")


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = "/root/testdata/sf0.1"
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".benchdata", "sf1")
    os.makedirs(dst, exist_ok=True)

    from pyspark.sql import functions as F

    from duckdb_delta_spark.session import get_spark

    spark = get_spark("make_sf1")
    for t in COPY:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"[sf1] {t}: copied {df.count()}")
    from duckdb_delta_spark.queries import load

    for t, keys in SHIFTS.items():
        if not os.path.exists(f"{src}/{t}.parquet"):
            continue
        # load() (not raw read) so events' TIMESTAMP(NANOS) ts is already
        # normalized to a Spark-native timestamp before replication
        base = load(spark, src, t)
        cols = base.columns
        key_types = {k: base.schema[k].dataType.simpleString() for k in keys}
        out = None
        for i in range(replicas):
            rep = base.select(
                *[
                    (F.col(c) + F.lit(i * STRIDE)).cast(key_types[c]).alias(c)
                    if c in keys else F.col(c)
                    for c in cols
                ]
            )
            out = rep if out is None else out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"[sf1] {t}: {replicas}x -> {out.count()}")
    print(f"[sf1] done -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
