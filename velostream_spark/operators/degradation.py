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
