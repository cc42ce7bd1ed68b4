"""Scalar/aggregate function surface of the engine.

The reference ships a fixed 75-function registry
(reference docs/sql/FUNCTION_CATALOG.md, definitions
src/velostream/sql/execution/expression/functions.rs:3040-3791). Almost all
map 1:1 to `pyspark.sql.functions` built-ins; this package provides:

- ``analytics``: reference-specific analytics (DELTA) as Catalyst rewrites,
- ``headers``: Kafka-header functions over the `headers` column,
- ``catalog``: name → Spark-SQL-expression mapping used by the SQL dialect
  translator (velostream_spark.sql) so reference SQL runs unchanged.
"""
