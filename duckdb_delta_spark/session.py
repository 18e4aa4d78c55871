"""SparkSession factory with scale-appropriate defaults.

Local test profile: ``local[N]`` single JVM. The configs below are chosen so
the *same* code is cluster-correct: AQE (runtime re-plan, skew-join handling,
partition coalescing), parquet filter pushdown, Arrow for the pandas-UDF slow
path, UTC session time zone (Delta partition-value timestamps are tz-naive
strings; UTC makes Spark and the DuckDB oracle agree).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "duckdb_delta_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # One shuffle partition per core locally; on a real cluster this is
        # sized to executors*cores (AQE coalesces down when partitions are
        # small, and splits skewed ones).
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet carries TIMESTAMP(NANOS); Spark has no ns
        # timestamp — read as long, loaders convert (truncate) to µs
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Delta scans pass explicit file lists; below this many paths Spark
        # stats them driver-side instead of launching a listing job (a
        # 90-file table costs a 90-task job otherwise). Above it — e.g.
        # thousands of files on an object store — the parallel listing job
        # kicks in, which is the behavior you want at that scale.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
        # Local test files are single small parquet files; 8 MiB splits keep
        # all cores busy on them. On a cluster against TB-scale tables the
        # right value is the 128 MiB default — large enough that per-task
        # overhead amortizes, small enough to fit executor memory.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get(
            "SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # DV decode + DELETE bitmap-build UDFs import this package on
        # executors; local mode resolves it via the driver cwd, a real
        # cluster needs the path shipped (or the wheel installed)
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        # Fork Python workers from a daemon that has pandas/pyarrow/the
        # Arrow serializers (and this package's executor-side modules)
        # already imported — cold workers inherit them copy-on-write
        # instead of re-importing per process. Cuts several seconds off
        # the first wide Python-worker stage (streaming sink, pandas
        # UDFs); see duckdb_delta_spark/_daemon.py.
        .config("spark.python.daemon.module", "duckdb_delta_spark._daemon")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
