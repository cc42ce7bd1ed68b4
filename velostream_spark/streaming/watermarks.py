"""Watermark strategies — the reference's four watermark generators
(``sql/execution/watermarks.rs:60-110``: BoundedOutOfOrderness, Punctuated,
Ascending, Custom) re-expressed Spark-first.

Two of them ARE Spark's native watermark:

- **BoundedOutOfOrderness(delay)** → ``withWatermark(time_col, delay)`` —
  Spark's exact semantics (watermark = max observed event time − delay,
  updated per micro-batch ≈ the reference's ``watermark_interval``).
- **Ascending** → ``withWatermark(time_col, "0 seconds")`` — in-order
  streams need no allowance; windows finalize the moment a later event
  appears.

The other two need a clock Spark's built-in watermark can't express —
records whose OWN event time must NOT advance the clock:

- **Punctuated**: only special marker records (e.g. source heartbeats)
  carry watermark progress; data records never close windows.
- **Custom**: an arbitrary per-record expression yields the watermark
  (the reference's ``CustomWatermarkGenerator::generate_watermark``).

Both are served by :func:`clocked_tumbling_final` — a stateful tumbling
EMIT FINAL aggregation (``applyInPandasWithState``) whose clock advances
only on a dedicated *clock column* (NULL never advances it). Punctuated =
clock column ``CASE WHEN is_marker THEN ts END``; Custom = any expression.

Scale note: the clock is per SOURCE (one stateful group), mirroring the
reference's per-source sequential watermark manager (watermarks.rs:40-56);
state is O(open windows × groups) aggregate cells, but throughput is bound
by one task per source. High-volume in-order or bounded-delay streams
should use the Spark-native strategies, which parallelize fully.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "with_watermark_strategy",
    "clocked_tumbling_final",
    "punctuated_clock",
]


def with_watermark_strategy(
    sdf: DataFrame,
    time_col: str,
    strategy: str = "bounded",
    delay: str = "10 seconds",
) -> DataFrame:
    """Apply a Spark-native watermark strategy to a streaming DataFrame.

    ``bounded`` (BoundedOutOfOrderness, the reference default) uses
    ``delay``; ``ascending`` pins the delay to zero — the reference's
    minimal-latency in-order case.
    """
    s = strategy.lower()
    if s in ("bounded", "bounded_out_of_orderness", "boundedoutoforderness"):
        return sdf.withWatermark(time_col, delay)
    if s == "ascending":
        return sdf.withWatermark(time_col, "0 seconds")
    raise ValueError(
        f"unknown native strategy {strategy!r} — punctuated/custom go "
        "through clocked_tumbling_final"
    )


def punctuated_clock(time_col: str, marker_col: str) -> Column:
    """Clock column for the Punctuated strategy: marker records carry their
    event time, data records contribute nothing (NULL)."""
    return F.when(F.col(marker_col), F.col(time_col))


def clocked_tumbling_final(
    sdf: DataFrame,
    time_col: str,
    clock_col: str,
    window_minutes: int,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Tumbling-window COUNT/SUM per ``group_col``, EMIT FINAL, with the
    event-time clock advancing ONLY on ``clock_col`` values.

    A window ``[start, start+w)`` is emitted (exactly once) by the first
    micro-batch whose clock reaches ``start+w``; rows arriving for an
    already-emitted window are dropped (the reference's LateDataStrategy::
    Drop default). Rows with NULL ``group_col`` or ``value_col`` are
    ignored as data but still read for the clock.

    Output: ``(group_col, window_start, window_end, cnt, total)``.
    """
    win_us = window_minutes * 60 * 1_000_000

    # the op emits the STRINGIFIED group (it rides the state key); the
    # declared schema says so, and the cast back to the source dtype
    # happens in the plan after the stateful stage
    out_schema = StructType(
        [
            StructField(group_col, StringType()),
            StructField("window_start", TimestampType()),
            StructField("window_end", TimestampType()),
            StructField("cnt", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("clock_us", LongType()),
            StructField("windows_json", StringType()),  # {"start|group": [n, sum]}
        ]
    )

    def func(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            clock_us, blob = state.get
            wins: dict[str, list] = json.loads(blob)
        else:
            clock_us, wins = -1, {}
        # windows already emitted by PRIOR batches are closed; windows this
        # batch's clock advance will finalize still accept this batch's own
        # rows (clock granularity = micro-batch, like Spark's watermark)
        prev_clock_us = clock_us

        for pdf in pdfs:
            clk = pdf["__clock"].dropna()
            if len(clk):
                clock_us = max(clock_us, int(clk.astype("int64").max()) // 1_000)
            data = pdf[pdf["__group"].notna() & pdf["__value"].notna()]
            if len(data):
                ts_us = data[time_col].astype("int64").to_numpy() // 1_000
                starts = (ts_us // win_us) * win_us
                for start, grp, val in zip(
                    starts, data["__group"].to_numpy(), data["__value"].to_numpy()
                ):
                    if int(start) + win_us <= prev_clock_us:
                        continue  # late for an already-emitted window → Drop
                    k = f"{int(start)}|{grp}"
                    cell = wins.get(k)
                    if cell is None:
                        wins[k] = [1, float(val)]
                    else:
                        cell[0] += 1
                        cell[1] += float(val)

        done = [k for k in wins if int(k.split("|", 1)[0]) + win_us <= clock_us]
        rows = []
        for k in sorted(done):
            start_us, grp = k.split("|", 1)
            n, total = wins.pop(k)
            rows.append(
                {
                    group_col: grp,
                    "window_start": pd.Timestamp(int(start_us) * 1_000),
                    "window_end": pd.Timestamp((int(start_us) + win_us) * 1_000),
                    "cnt": n,
                    "total": total,
                }
            )
        state.update((clock_us, json.dumps(wins)))
        if rows:
            yield pd.DataFrame(rows)

    prepared = sdf.select(
        F.col(time_col),
        F.col(clock_col).alias("__clock"),
        F.col(group_col).cast("string").alias("__group"),
        F.col(value_col).cast("double").alias("__value"),
        # per-source clock: ONE stateful group (see module docstring)
        F.lit(0).alias("__src"),
    )
    out = prepared.groupBy("__src").applyInPandasWithState(
        func,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    # group values were stringified for the state key; cast back
    return out.withColumn(
        group_col, F.col(group_col).cast(sdf.schema[group_col].dataType)
    )
