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

from duckdb_delta_spark.delta.log import DeltaLog
from duckdb_delta_spark.delta.snapshot import Snapshot
from duckdb_delta_spark.delta.scan import DeltaScanBuilder
from duckdb_delta_spark.delta.table import DeltaTable
from duckdb_delta_spark.delta.writer import DeltaWriter
from duckdb_delta_spark.delta.catalog import DeltaCatalog
from duckdb_delta_spark.delta import errors

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
