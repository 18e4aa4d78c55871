"""Python-worker daemon with heavy modules preloaded before forking.

Spark forks every Python worker from a daemon process
(``spark.python.daemon.module``, default ``pyspark.daemon``). A freshly
forked worker then imports pandas / pyarrow / the Arrow serializers on
first use — ~0.3-0.7 s per worker, paid again for every cold worker in
the fleet. On a wide stage (one worker per core, e.g. the streaming
sink's read+write pipeline) that import storm dominates the first
micro-batch's wall time.

Importing those modules HERE, in the daemon before any fork, makes every
worker inherit them via copy-on-write for free — the same trick used for
daemon preloads in other Spark deployments. Cluster-correct: the daemon
runs on each executor, so the preload scales with executors, not tasks.

Enabled by ``session.get_spark`` via
``spark.python.daemon.module=duckdb_delta_spark._daemon`` (the package
is on the executor PYTHONPATH already — see session.py).
"""

from __future__ import annotations

# Preloads: each except-guarded so a broken optional dep never takes the
# whole worker fleet down with it.
for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyarrow.parquet",
    "pyarrow.compute",
    "pyspark.serializers",
    "pyspark.sql.types",
    "pyspark.sql.pandas.types",
    "pyspark.sql.pandas.serializers",
    # executor-side paths of this engine: DV decode, footer stats
    "duckdb_delta_spark.delta.dv",
    "duckdb_delta_spark.delta.writer",
):
    try:
        __import__(_mod)
    except Exception:  # noqa: BLE001 - preload is best-effort
        pass


if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
