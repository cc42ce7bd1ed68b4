"""Velostream SQL dialect on Spark.

- ``dialect``: parse + translate velostream SQL text (reference grammar:
  docs/sql/PARSER_GRAMMAR.md; parser src/velostream/sql/parser/*) into
  Spark SQL plus a structured job spec (sources/sinks/emit/annotations).
- ``engine``: execute translated statements — the Spark analog of the
  reference's StreamExecutionEngine + StreamJobServer (engine.rs:667,
  stream_job_server.rs), with CSAS/CTAS, INSERT/UPDATE/DELETE, SHOW.
"""

from velostream_spark.sql.dialect import Statement, parse_statement, translate_select
from velostream_spark.sql.engine import SqlEngine
from velostream_spark.sql.validator import validate_app, validate_statement

__all__ = [
    "Statement",
    "parse_statement",
    "translate_select",
    "SqlEngine",
    "validate_statement",
    "validate_app",
]
