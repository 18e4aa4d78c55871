"""Arrow-path local relations: driver-side rows → pure-JVM DataFrame.

``spark.createDataFrame(list, schema)`` builds a pickled-RDD-backed
relation whose EVERY job spawns Python workers across all
default-parallelism slices — measured ~4-6 s per job on local[32] even
for one row, and a Python round-trip per task on a real cluster. That is
poison on hot paths that build small broadcast maps (partition-value
injection, file-number maps, row-id bases: one tiny map per SCAN).

:func:`local_df` ships the rows as ONE Arrow batch instead (pandas
conversion path): the result is a JVM local relation, ~0.1 s to build,
and every downstream job — including the broadcast hash join it usually
feeds — is Python-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Literal/collected rows → DataFrame via the Arrow local-relation
    path. ``schema`` is a StructType or DDL string; ``rows`` any iterable
    of tuples/Rows. Empty input still yields a typed empty relation."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    rows = [tuple(r) for r in rows]
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=schema.fieldNames(), dtype=object)
    pdf = pdf.where(pd.notna(pdf), None)
    return spark.createDataFrame(pdf, schema)
