"""duckdb_delta_spark — a PySpark-native Delta Lake engine.

Re-implements, Spark-first, the capability surface of the DuckDB ``delta``
extension (reference: motherduckdb/duckdb-delta): reading Delta tables
(log replay, checkpoints, time travel, stats/partition file skipping,
deletion vectors, column mapping, schema evolution), blind-append writes
with per-file statistics and an atomic commit protocol, checkpointing,
metadata table functions, and an attach-style catalog — plus a set of
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference does not have.

Architecture (see SURVEY.md §7): all Delta-protocol mechanics live in
plain Python on the driver (the logs are small); all data movement is
declarative PySpark DataFrame code so Catalyst/Tungsten handle pushdown,
pruning, codegen and shuffle. There is no Catalyst extension: like the
reference — which swaps the file list under DuckDB's parquet scan
(reference: src/functions/delta_scan/delta_scan.cpp:83-121) — we resolve
the file list *before* building the DataFrame.
"""

# Lazy re-exports (PEP 562): importing the bare package must stay cheap.
# Every executor-side Python worker that unpickles a streaming source /
# sink object imports this package first — eagerly pulling pyspark.sql +
# pandas here cost ~0.6s PER WORKER SPAWN, which dominated the
# cold-session cost of the streaming queries.
_EXPORTS = {
    "DeltaLog": "duckdb_delta_spark.delta.log",
    "Snapshot": "duckdb_delta_spark.delta.snapshot",
    "DeltaScanBuilder": "duckdb_delta_spark.delta.scan",
    "DeltaTable": "duckdb_delta_spark.delta.table",
    "DeltaWriter": "duckdb_delta_spark.delta.writer",
    "DeltaCatalog": "duckdb_delta_spark.delta.catalog",
    "errors": "duckdb_delta_spark.delta.errors",
}


def __getattr__(name):
    if name == "errors":
        import duckdb_delta_spark.delta.errors as mod

        return mod
    mod_name = _EXPORTS.get(name)
    if mod_name is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod_name), name)


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))


__version__ = "0.1.0"

__all__ = [
    "DeltaLog",
    "Snapshot",
    "DeltaScanBuilder",
    "DeltaTable",
    "DeltaWriter",
    "DeltaCatalog",
    "errors",
]
