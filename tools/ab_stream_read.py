"""Interleaved A/B for the streaming Arrow read path (round-20 verdict #3).

Variant 'combined' = one record batch per file (Table.combine_chunks
before to_batches, plus pa.repeat constant columns); variant 'chunks' =
the historical per-row-group emit. Both run through the SAME source code
at HEAD — the emit shape is the reader's ``arrowEmitMode`` option, so the
two variants interleave in one session with zero code swapping.

Per shape (2-col select, full 16-col read, CDF feed) the variants run
in the balanced order C K K C C K K C C K (5 lifecycles each); each
lifecycle reports wall seconds plus the sum of Spark's own
``durationMs.addBatch`` across its progress events. Output committed as
plans/r21/stream_read_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import cpu_canary_mt
from duckdb_delta_spark.session import get_spark
from duckdb_delta_spark.testing import fixtures as FX

ORDER = ["combined", "chunks", "chunks", "combined", "combined",
         "chunks", "chunks", "combined", "combined", "chunks"]


def lifecycle(spark, root, shape: str, mode: str) -> dict:
    from duckdb_delta_spark.queries import dsum

    name = f"ab_{uuid.uuid4().hex[:10]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{name}")
    rs = (
        spark.readStream.format("delta_py")
        .option("startingVersion", "0")
        .option("arrowEmitMode", mode)
    )
    if shape == "select2":
        stream = (rs.option("path", os.path.join(root, "lineitem_multi"))
                  .option("select", "l_returnflag,l_quantity").load())
        agg = stream.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty"))
    elif shape == "full16":
        stream = rs.option(
            "path", os.path.join(root, "lineitem_multi")).load()
        agg = stream.groupBy("l_linestatus").agg(
            F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("s"))
    elif shape == "cdf":
        stream = (rs.option("path", os.path.join(root, "orders_upd"))
                  .option("readChangeFeed", "true")
                  .option("startingVersion", "2")
                  .option("select", "o_totalprice").load())
        agg = stream.groupBy("_change_type").agg(
            F.count(F.lit(1)).alias("n"))
    else:
        raise ValueError(shape)
    t0 = time.time()
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    add_batch_ms = sum(
        (p["durationMs"].get("addBatch") or 0) for p in q.recentProgress)
    spark.catalog.dropTempView(name)
    return {"wall_s": round(wall, 3), "add_batch_ms": add_batch_ms}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_stream_read")
    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001
        pass
    root = FX.ensure_fixtures(spark, sf_dir)
    shapes = ["select2", "full16", "cdf"]
    canary_pre = cpu_canary_mt()
    results: dict[str, dict] = {}
    for shape in shapes:
        for mode in ("combined", "chunks"):  # warm, untimed
            lifecycle(spark, root, shape, mode)
        samples = {"combined": {"wall": [], "addb": []},
                   "chunks": {"wall": [], "addb": []}}
        for mode in ORDER:
            r = lifecycle(spark, root, shape, mode)
            samples[mode]["wall"].append(r["wall_s"])
            samples[mode]["addb"].append(r["add_batch_ms"])
        results[shape] = {
            "combined_wall": samples["combined"]["wall"],
            "chunks_wall": samples["chunks"]["wall"],
            "combined_addbatch_ms": samples["combined"]["addb"],
            "chunks_addbatch_ms": samples["chunks"]["addb"],
            "combined_wall_min": min(samples["combined"]["wall"]),
            "chunks_wall_min": min(samples["chunks"]["wall"]),
            "combined_addbatch_min": min(samples["combined"]["addb"]),
            "chunks_addbatch_min": min(samples["chunks"]["addb"]),
        }
        print(f"[ab] {shape}: combined wall {results[shape]['combined_wall_min']}s "
              f"addBatch {results[shape]['combined_addbatch_min']}ms | "
              f"chunks wall {results[shape]['chunks_wall_min']}s "
              f"addBatch {results[shape]['chunks_addbatch_min']}ms",
              file=sys.stderr)
    canary_post = cpu_canary_mt()
    out = {
        "method": "interleaved C K K C C K K C C K per shape, 5 lifecycles "
                  "each, one session, warmed; addBatch from durationMs",
        "sf_dir": sf_dir,
        "canary_mt_pre": canary_pre,
        "canary_mt_post": canary_post,
        "shapes": results,
    }
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r21", "stream_read_ab.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
