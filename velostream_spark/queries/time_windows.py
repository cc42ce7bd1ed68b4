"""Time-based windows: tumbling, sliding, session — batch semantics of the
reference's windowed aggregations (EMIT FINAL over a bounded source).

Reference parity (SURVEY.md §2.6):
- Tumbling — reference src/velostream/sql/execution/window_v2/strategies/tumbling.rs:30-120,
  WindowSpec::Tumbling ast.rs:596-599 → F.window(ts, size)
- Sliding — strategies/sliding.rs:1-25, ast.rs:601-605 → F.window(ts, size, slide)
- Session — strategies/session.rs:1-30, ast.rs:607-611 → F.session_window(ts, gap)
- TUMBLE_START/TUMBLE_END — functions.rs:3569-3586 → window.start / window.end

The streaming forms (watermarks, EMIT CHANGES vs FINAL, late data) live in
velostream_spark.streaming; these batch queries pin down the *assignment and
aggregation semantics* against the DuckDB oracle, which models windows with
epoch arithmetic / gaps-and-islands.

Scale: windowed groupBy shuffles on (window, key) — at 100 TB the tumbling
bucket is a pure hash key (no state growth); session windows use Spark's
native session-merge exec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velostream_spark.registry import query, tables


@query(
    "tumbling_window",
    oracle="""
    SELECT to_timestamp(floor(epoch(ts) / 300) * 300)::TIMESTAMP       AS window_start,
           to_timestamp(floor(epoch(ts) / 300) * 300 + 300)::TIMESTAMP AS window_end,
           event_type,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 4) AS total_value,
           ROUND(AVG(value), 6) AS avg_value,
           MIN(value)           AS min_value,
           MAX(value)           AS max_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("time-window", "tumbling"),
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregation (reference tumbling.rs:30-120),
    with TUMBLE_START/TUMBLE_END as window.start/window.end. Spark windows
    align to the epoch, mirrored by the oracle's epoch arithmetic."""
    t = tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            F.col("w").end.alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


@query(
    "sliding_window",
    oracle="""
    WITH buckets AS (
      SELECT to_timestamp(floor(epoch(ts) / 300) * 300)::TIMESTAMP AS window_start, value
      FROM events
      UNION ALL
      SELECT to_timestamp(floor(epoch(ts) / 300) * 300 - 300)::TIMESTAMP AS window_start, value
      FROM events
    )
    SELECT window_start,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM buckets
    GROUP BY window_start
    """,
    tags=("time-window", "sliding"),
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding every 5 minutes (reference sliding.rs:1-25):
    each record lands in size/slide = 2 windows. The oracle materializes the
    same two bucket assignments explicitly."""
    t = tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "session_window",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id,
           MIN(ts)                       AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE  AS session_end,
           COUNT(*)                      AS n_events,
           ROUND(SUM(value), 4)          AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("time-window", "session"),
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows, 30-minute inactivity gap (reference
    session.rs:1-30; session merge semantics). Spark's native session_window
    exec merges adjacent sessions distributed; the oracle derives identical
    sessions via gaps-and-islands."""
    t = tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w").start.alias("session_start"),
            F.col("w").end.alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "window_with_having",
    oracle="""
    SELECT to_timestamp(floor(epoch(ts) / 3600) * 3600)::TIMESTAMP AS window_start,
           user_id,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
    tags=("time-window", "having"),
)
def window_with_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed GROUP BY + HAVING — the reference's windowed-aggregation-with-
    HAVING path (select.rs windowed GROUP BY + having filter)."""
    t = tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .where(F.col("n_events") >= 3)
        .select(
            F.col("w").start.alias("window_start"),
            "user_id",
            "n_events",
            "total_value",
        )
    )
