"""Structured Streaming source for Delta tables (Python DataSource API).

Spark-native incremental consumption: offsets are Delta log VERSIONS, a
micro-batch is the set of data files the commits in ``(start, end]``
added, and each file is one input partition read executor-side with
pyarrow — so `readStream.format("delta_py")` follows a table commit by
commit exactly like delta-spark's streaming source follows appends.

Semantics: append-driven. Commits whose adds are ``dataChange: false``
(OPTIMIZE) are skipped outright; a commit that REMOVES data with
``dataChange: true`` (DELETE/UPDATE/MERGE/RESTORE) fails the stream
unless ``ignoreChanges=true`` (then its added image files still flow, the
standard delta-spark contract). Deletion-vector masks on newly added
files are honored by dropping masked row indexes at read time.

Usage::

    from duckdb_delta_spark.streaming.delta_source import DeltaPySource
    spark.dataSource.register(DeltaPySource)
    df = (spark.readStream.format("delta_py")
          .option("path", table_path)
          .option("startingVersion", "0")   # default: table HEAD at start
          .load())
"""

from __future__ import annotations

import json
import os
import urllib.parse
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


@dataclass
class _FileSlice(InputPartition):
    path: str  # absolute data-file path
    partition_values: tuple  # ((col, value or None), ...)
    dv: str | None  # deletion-vector descriptor JSON
    table_path: str


class DeltaPySource(DataSource):
    """``format("delta_py")`` — Delta table as a streaming (and batch)
    source through the Python DataSource API."""

    @classmethod
    def name(cls) -> str:
        return "delta_py"

    def __init__(self, options):
        super().__init__(options)
        self._path = options.get("path")
        if not self._path:
            raise ValueError("delta_py requires .option('path', <table dir>)")

    def schema(self) -> StructType:
        from duckdb_delta_spark.delta.log import DeltaLog
        from duckdb_delta_spark.delta.snapshot import Snapshot

        snap = Snapshot.build(DeltaLog(self._path))
        return snap.schema

    def streamReader(self, schema: StructType) -> "DeltaStreamReader":
        return DeltaStreamReader(self._path, schema, self.options)


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, schema: StructType, options):
        from duckdb_delta_spark.delta.log import DeltaLog
        from duckdb_delta_spark.delta.snapshot import Snapshot

        self.table_path = os.path.abspath(table_path)
        self.schema = schema
        self.ignore_changes = (
            str(options.get("ignoreChanges", "false")).lower() == "true"
        )
        self._log = DeltaLog(self.table_path)
        start = options.get("startingVersion")
        if start is None:
            self._initial = self._log.latest_version()
        else:
            self._initial = int(start) - 1  # first batch INCLUDES this version
        # partition columns fixed at stream start
        snap = Snapshot.build(self._log)
        self._partition_columns = snap.partition_columns

    # ---- offsets ----

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        return {"version": self._log.latest_version()}

    def partitions(self, start: dict, end: dict):
        parts: list[_FileSlice] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            adds, has_removal = self._classify(v)
            if has_removal and not self.ignore_changes:
                raise ValueError(
                    f"commit {v} removes data; streaming a table with "
                    "updates/deletes requires .option('ignoreChanges','true')"
                )
            for a in adds:
                rel = urllib.parse.unquote(a["path"])
                full = (
                    rel
                    if "://" in rel or os.path.isabs(rel)
                    else os.path.join(self.table_path, rel)
                )
                pv = a.get("partitionValues") or {}
                parts.append(
                    _FileSlice(
                        path=full,
                        partition_values=tuple(
                            (c, pv.get(c)) for c in self._partition_columns
                        ),
                        dv=json.dumps(a["deletionVector"])
                        if a.get("deletionVector")
                        else None,
                        table_path=self.table_path,
                    )
                )
        return parts

    def _classify(self, version: int):
        adds = []
        has_removal = False
        for action in self._log.read_commit(version):
            if action.get("add") and action["add"].get("dataChange", True):
                adds.append(action["add"])
            elif action.get("remove") and action["remove"].get("dataChange", True):
                has_removal = True
        return adds, has_removal

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream's checkpoint

    # ---- executor-side read ----

    def read(self, partition: _FileSlice):
        import numpy as np
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        if partition.dv:
            from duckdb_delta_spark.delta.dv import read_dv_from_descriptor

            deleted = read_dv_from_descriptor(
                json.loads(partition.dv), partition.table_path
            )
            keep = np.ones(table.num_rows, dtype=bool)
            keep[deleted.astype("int64")] = False
            table = table.filter(keep)

        pvals = dict(partition.partition_values)
        cols = []
        for f in self.schema.fields:
            if f.name in pvals:
                v = pvals[f.name]
                cols.append([_coerce_pv(v, f.dataType)] * table.num_rows)
            else:
                cols.append(table.column(f.name).to_pylist())
        yield from zip(*cols) if table.num_rows else iter(())


def _coerce_pv(v, dtype):
    """Partition value (log string) → Python value for the row tuples."""
    import datetime as dt

    from pyspark.sql import types as T

    if v is None or v == "":
        return None
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return int(v)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(v)
    if isinstance(dtype, T.BooleanType):
        return str(v).lower() == "true"
    if isinstance(dtype, T.DateType):
        return dt.date.fromisoformat(str(v)[:10])
    return v
