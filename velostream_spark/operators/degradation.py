"""Graceful degradation for stream-table joins — reference
src/velostream/server/graceful_degradation.rs:16-30: what happens when the
joined table has no row for a stream record's key.

| mode | reference behavior | Spark expression |
|---|---|---|
| UseDefaults  | substitute configured defaults  | left join + coalesce(col, default) |
| SkipRecord   | drop the record                 | inner join |
| EmitNulls    | pass through with NULLs         | left join |
| FailFast     | error the job                   | left join + raise_error on miss |
| WaitAndRetry | buffer & retry when table grows | stream-side: watermarked outer join
|              |                                 | (match arrives within the window);
|              |                                 | batch: equivalent to EmitNulls |

All modes compile to ordinary Catalyst joins — the dimension side broadcasts
when small, so per-record "O(1) lookup" becomes a broadcast-hash probe.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DegradationMode(str, Enum):
    USE_DEFAULTS = "use_defaults"
    SKIP_RECORD = "skip_record"
    EMIT_NULLS = "emit_nulls"
    FAIL_FAST = "fail_fast"
    WAIT_AND_RETRY = "wait_and_retry"


def stream_table_join(
    stream: DataFrame,
    table: DataFrame,
    on: str | list[str] | Column,
    mode: DegradationMode = DegradationMode.EMIT_NULLS,
    defaults: dict[str, object] | None = None,
    broadcast_table: bool = True,
) -> DataFrame:
    """Stream-table join with a missing-row policy (reference
    stream_table_join.rs:22 + graceful_degradation.rs:16-30)."""
    t = F.broadcast(table) if broadcast_table else table
    if mode is DegradationMode.SKIP_RECORD:
        return stream.join(t, on, "inner")
    joined = stream.join(t, on, "left")
    if mode is DegradationMode.EMIT_NULLS:
        return joined
    table_cols = [c for c in table.columns if c not in stream.columns]
    if mode is DegradationMode.USE_DEFAULTS:
        defaults = defaults or {}
        return joined.select(
            *[F.col(c) for c in stream.columns],
            *[
                F.coalesce(F.col(c), F.lit(defaults.get(c))).alias(c)
                for c in table_cols
            ],
        )
    if mode is DegradationMode.FAIL_FAST:
        probe = table_cols[0]
        marker = F.when(
            F.col(probe).isNull(),
            F.raise_error(F.lit("FailFast: no table row for stream record")),
        ).otherwise(F.col(probe))
        return joined.withColumn(probe, marker)
    raise ValueError(f"unknown mode: {mode}")


def wait_and_retry_join(
    stream: DataFrame,
    dim_stream: DataFrame,
    key: str,
    stream_time: str = "ts",
    dim_time: str = "dim_ts",
    grace_minutes: int = 10,
    retention_minutes: int = 60,
) -> DataFrame:
    """WaitAndRetry (reference graceful_degradation.rs:16-30 WaitAndRetry
    {max_retries, initial_delay, backoff}) — the streaming form.

    The reference buffers a stream record whose table lookup missed and
    retries with backoff as the table ingests new rows. In a dataflow
    engine the retry loop IS state retention: a watermarked LEFT OUTER
    stream-stream join holds the record in the join state store, a late
    dimension row arriving within ``grace_minutes`` matches it (the
    "retry succeeds" path), and when the watermark passes the grace bound
    the record emits null-enriched exactly once (the "retries exhausted"
    fallback = EmitNulls). ``max_retries x delay`` maps to the grace
    interval; exponential backoff has no analog because the state store
    probes on every micro-batch for free.

    ``retention_minutes`` bounds how far BACK a dimension row may have
    arrived before the stream record and still match — the state-eviction
    horizon for the dimension side (both bounds are required for Spark to
    evict join state; unbounded retention would grow state forever at
    100-TB scale).

    Both inputs must be streaming and carry event-time columns; watermarks
    are applied here.
    """
    s = stream.withWatermark(stream_time, "0 seconds")
    d = dim_stream.withWatermark(dim_time, "0 seconds")
    dim_key = f"_dim_{key}"
    d2 = d.withColumnRenamed(key, dim_key)
    cond = (
        (F.col(key) == F.col(dim_key))
        & (
            F.col(dim_time)
            >= F.col(stream_time) - F.expr(f"INTERVAL {retention_minutes} MINUTES")
        )
        & (
            F.col(dim_time)
            <= F.col(stream_time) + F.expr(f"INTERVAL {grace_minutes} MINUTES")
        )
    )
    return s.join(d2, cond, "left_outer").drop(dim_key)
