"""The reference's registered SQL functions, 1:1 as Python free functions.

The reference registers these with DuckDB at extension load
(reference: src/delta_extension.cpp:95-108):

* ``delta_scan(path)``                 — src/functions/delta_scan/delta_scan.cpp:83-121
* ``delta_list_files(path[, version])``— src/functions/delta_metadata_scan.cpp:65-148
* ``delta_domain_metadata(path[, version])`` — src/functions/delta_domain_metadata.cpp:20-77
* ``delta_get_transaction_version(table, app_id)`` /
  ``delta_set_transaction_version(table, app_id, new_v[, expected_v])``
  — src/functions/delta_transaction_utils/idempotency_helpers.cpp:41-145

Each is a thin veneer over :class:`~duckdb_delta_spark.delta.table.DeltaTable`
so a user of the reference finds the same names with the same semantics; the
class API remains the primary surface. Functions that need a table accept a
path (the reference's versions that take an *attached table* are covered by
``DeltaCatalog`` + these on ``catalog.table(name).path``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duckdb_delta_spark.delta.table import DeltaTable

__all__ = [
    "delta_scan",
    "delta_list_files",
    "delta_domain_metadata",
    "delta_get_transaction_version",
    "delta_set_transaction_version",
]


def delta_scan(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    pushdown: str = "all",
) -> DataFrame:
    """Scan a Delta table at HEAD (or a pinned ``version``) as a DataFrame."""
    return DeltaTable(path, version=version).scan(spark, pushdown=pushdown).to_df()


def delta_list_files(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """File manifest: data_file, cardinality, partition_values, have_deletes,
    delete_count, size — one row per live add-file."""
    return DeltaTable(path, version=version).file_manifest(spark)


def delta_domain_metadata(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Live domain metadata (domain, configuration) of the snapshot."""
    return DeltaTable(path, version=version).domain_metadata(spark)


def delta_get_transaction_version(path: str, app_id: str) -> int | None:
    """Latest committed ``txn`` version for ``app_id``, or None."""
    return DeltaTable(path).get_transaction_version(app_id)


def delta_set_transaction_version(
    spark: SparkSession,
    path: str,
    app_id: str,
    version: int,
    expected_last: int | None = None,
) -> int:
    """Commit an idempotency bookmark; raises ``IdempotencyError`` when
    ``expected_last`` mismatches the snapshot's recorded version."""
    return DeltaTable(path).set_transaction_version(
        spark, app_id, version, expected_last=expected_last
    )
