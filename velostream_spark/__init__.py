"""velostream-spark: a PySpark-native streaming analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference streaming-SQL engine (velostreamai/velostream — Rust, row-at-a-time,
Kafka-first; see SURVEY.md), re-expressed idiomatically on Apache Spark:

- Spark SQL / DataFrames + Catalyst replace the hand-written expression
  evaluator and per-operator processors (reference:
  src/velostream/sql/execution/processors/*).
- Structured Streaming (micro-batch, watermarks, stateful ops) replaces the
  custom window/watermark/join state machinery (reference:
  src/velostream/sql/execution/window_v2/*, watermarks.rs, join/*).
- A thin dialect + job layer provides the reference's SQL surface
  (CREATE STREAM/TABLE AS SELECT, WITH-clause config, EMIT CHANGES|FINAL,
  tumbling/sliding/session/ROWS windows, stream-table and interval joins).

Nothing in this package is ported from the reference's implementation; the
reference is used only as a behavioral specification (cited per-module as
``file:line`` under /root/reference).
"""

from velostream_spark.session import get_session, load_tables

__all__ = ["get_session", "load_tables"]
__version__ = "0.1.0"
