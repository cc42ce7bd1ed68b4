"""OVER-clause window functions: LAG/LEAD, ranking, value functions,
distribution functions, aggregates over ROWS/RANGE frames, and the
reference-specific DELTA aggregate (rewritten to lag).

Reference parity (SURVEY.md §2.5): dispatch at reference
src/velostream/sql/execution/expression/window_functions.rs:145-171; frame
specs at ast.rs:671-706; DELTA at functions.rs:3148-3160.

Every ORDER BY carries a unique tie-break column so ranking/offset results
are deterministic — required for oracle hash-matching and good practice
anyway (the reference's per-partition buffers are insertion-ordered, which
is its implicit tie-break).

Scale: Spark's window exec sorts within partitions after hash-partitioning
by the PARTITION BY key — one shuffle per distinct partitioning, reused
across functions sharing the spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from velostream_spark.registry import query, tables


@query(
    "lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value, 1)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LAG(value, 2, -1.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev2_value,
           LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
    tags=("window-fn", "lag-lead"),
)
def lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG / LEAD with offset + default (reference window_functions.rs:362,436)."""
    t = tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return t["events"].select(
        "user_id",
        "event_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
        F.lead("value", 1).over(w).alias("next_value"),
    )


@query(
    "ranking_functions",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER w AS rnk,
           DENSE_RANK()  OVER w AS drnk,
           NTILE(4)      OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window-fn", "ranking"),
)
def ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER / RANK / DENSE_RANK / NTILE (reference
    window_functions.rs:148-157, 510)."""
    t = tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "value_functions",
    oracle="""
    SELECT user_id, event_id, value,
           FIRST_VALUE(value) OVER w AS first_val,
           LAST_VALUE(value)  OVER w AS last_val,
           NTH_VALUE(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window-fn", "value-fns"),
)
def value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE over an explicit full-partition
    frame (reference window_functions.rs:150-152)."""
    t = tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return t["events"].select(
        "user_id",
        "event_id",
        "value",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@query(
    "distribution_functions",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window-fn", "distribution"),
)
def distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST (reference window_functions.rs:153-155).
    Global ORDER BY window — fine at test scale; at 100 TB you'd rank within
    partitions or pre-aggregate, since an un-partitioned window serializes."""
    t = tables(spark, sf_dir)
    w = W.orderBy("o_totalprice", "o_orderkey")
    return t["orders"].select(
        "o_orderkey",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "value_distribution_functions",
    oracle="""
    SELECT user_id, event_id, value,
           FIRST_VALUE(value)  OVER wf AS first_val,
           LAST_VALUE(value)   OVER wf AS last_val,
           NTH_VALUE(value, 2) OVER wf AS second_val,
           ROUND(PERCENT_RANK() OVER wo, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER wo, 6) AS cume
    FROM events
    WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           wo AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
    tags=("window-fn", "value-fns", "distribution"),
)
def value_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE + PERCENT_RANK / CUME_DIST in one
    gate entry (reference window_functions.rs:150-155). Combined so one
    official slot verifies both window-function families; both windows
    partition by user_id, so WindowExec reuses a single hash-partitioning
    exchange — and unlike a global ORDER BY window, this shape stays
    parallel at 100 TB. Standalone entries remain for parity."""
    t = tables(spark, sf_dir)
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    wo = W.partitionBy("user_id").orderBy("value", "event_id")
    return t["events"].select(
        "user_id",
        "event_id",
        "value",
        F.first("value").over(wf).alias("first_val"),
        F.last("value").over(wf).alias("last_val"),
        F.nth_value("value", 2).over(wf).alias("second_val"),
        F.round(F.percent_rank().over(wo), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(wo), 6).alias("cume"),
    )


@query(
    "agg_over_rows_frame",
    oracle="""
    SELECT user_id, event_id, ts, value,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS moving_avg,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
           MIN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_min,
           MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_max,
           COUNT(*)   OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n_in_frame
    FROM events
    """,
    tags=("window-fn", "frames", "rows-window"),
)
def agg_over_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over a bounded ROWS frame — the batch semantics of the
    reference's `ROWS WINDOW BUFFER n ROWS` construct (reference ast.rs:617-652,
    window_v2/strategies/rows.rs:30-45): last-N-rows-per-key moving analytics.
    The per-record streaming form lives in velostream_spark.streaming.rows_window."""
    t = tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-3, 0)
    running = w.rowsBetween(W.unboundedPreceding, 0)
    return t["events"].select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(F.avg("value").over(frame), 6).alias("moving_avg"),
        F.round(F.sum("value").over(running), 4).alias("running_sum"),
        F.min("value").over(frame).alias("moving_min"),
        F.max("value").over(frame).alias("moving_max"),
        F.count(F.lit(1)).over(frame).alias("n_in_frame"),
    )


@query(
    "range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING) AS n_similar_price
    FROM orders
    """,
    tags=("window-fn", "frames", "range"),
)
def range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN value-based frame (reference ast.rs:671-706
    WindowFrameUnits::Range).

    ADJUDICATION: true VALUE-based range semantics (rows whose o_totalprice
    is within ±50000 of the current row's), matching the syntax, the SQL
    standard, and DuckDB. The reference's executor reuses the ROWS
    row-offset arms for numeric RANGE bounds (expression/
    window_functions.rs:322-325 — its own comment concedes "you'd need to
    look at ORDER BY values for true RANGE semantics"); we do not mirror
    that row-offset shortcut. Interval-typed RANGE bounds get the same
    treatment in dialect._rewrite_interval_frames."""
    t = tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-50000, 50000)
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar_price"),
    )


@query(
    "delta_function",
    oracle="""
    SELECT user_id, event_id, ts, value,
           ROUND(value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
             AS value_delta
    FROM events
    """,
    tags=("window-fn", "velostream-specific"),
)
def delta_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELTA — reference-specific consecutive-difference aggregate
    (reference functions.rs:3148-3160), rewritten Spark-first as
    `value - lag(value) OVER w` exactly as SURVEY §4.3.6 prescribes."""
    from velostream_spark.functions.analytics import delta

    t = tables(spark, sf_dir)
    return t["events"].select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(
            delta("value", partition_by=["user_id"], order_by=["ts", "event_id"]), 4
        ).alias("value_delta"),
    )
