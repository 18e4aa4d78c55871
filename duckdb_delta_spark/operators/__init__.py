"""Large-scale training-data operators (beyond the reference's surface).

Everything here is a plain DataFrame→DataFrame transformer built from
JVM-side ``pyspark.sql.functions`` (codegen'd, shuffle-aware); Python/pandas
UDFs appear only where semantics genuinely require them (multimodal decode
stubs). Each operator has a matching DuckDB-SQL oracle in
``duckdb_delta_spark.queries.pipeline`` so the driver can hash-verify it.
"""
