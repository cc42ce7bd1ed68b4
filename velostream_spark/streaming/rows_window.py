"""ROWS WINDOW BUFFER — the reference's per-record streaming analytic
window (WindowSpec::Rows, ast.rs:617-652; strategy
window_v2/strategies/rows.rs:30-45; grammar docs/sql/PARSER_GRAMMAR.md:100-226)
as a custom stateful Spark op.

Semantics: per partition key, a bounded ring buffer of the last ``n`` rows;
for EVERY incoming record the analytic functions are evaluated over the
buffer and a row is emitted (EmitMode::EveryRecord, ast.rs:567-575), or only
once the buffer is full (EmitMode::BufferFull). Inactive partitions expire
(RowExpirationMode, ast.rs:580-592).

Spark has no built-in per-record streaming window-function operator, so this
is ``applyInPandasWithState``: state = the value buffer (array<double>) + a
lifetime row counter; each micro-batch is processed *vectorized* (pandas
rolling over state-prefix + batch, then the prefix sliced off) — no Python
per-row loop. Emission cadence is per-record within each micro-batch, which
converges to the reference's per-record stream when batches are small.

Scale: state per key is O(buffer_size) doubles — independent of stream
length; the shuffle is the groupBy(partition key) exchange only. Skewed keys
bound their cost by the same O(buffer) state.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

#: fn name -> output Spark type
SUPPORTED_FNS = {
    "avg": DoubleType(),
    "sum": DoubleType(),
    "min": DoubleType(),
    "max": DoubleType(),
    "count": LongType(),
    "first": DoubleType(),   # oldest value in the buffer
    "last": DoubleType(),    # current value
    "lag": DoubleType(),     # previous value (offset 1), NULL at partition start
    "row_number": LongType(),  # lifetime position within the partition
}


def _agg_over_prefix(
    fn: str, s: pd.Series, n_prev: int, buffer: int, cnt0: int
) -> pd.Series:
    """Evaluate ``fn`` over the last-``buffer`` rolling frame of ``s`` (state
    prefix + batch), returning only the batch slice. All vectorized."""
    roll = s.rolling(buffer, min_periods=1)
    if fn == "avg":
        out = roll.mean()
    elif fn == "sum":
        out = roll.sum()
    elif fn == "min":
        out = roll.min()
    elif fn == "max":
        out = roll.max()
    elif fn == "count":
        out = roll.count().astype("int64")
    elif fn == "last":
        out = s
    elif fn == "lag":
        out = s.shift(1)
    elif fn == "first":
        idx = np.maximum(np.arange(len(s)) - buffer + 1, 0)
        out = pd.Series(s.to_numpy()[idx], index=s.index)
    elif fn == "row_number":
        # cnt0 = rows seen before the state prefix entered the buffer; the
        # prefix occupies positions cnt0+1..cnt0+n_prev.
        out = pd.Series(np.arange(1, len(s) + 1) + cnt0, index=s.index)
    else:  # pragma: no cover
        raise ValueError(f"unsupported rows-window fn: {fn}")
    return out.iloc[n_prev:]


def rows_window_stream(
    sdf: DataFrame,
    partition_by: list[str],
    order_by: str,
    value_col: str,
    buffer_size: int,
    aggs: list[tuple[str, str]],
    emit: str = "every_record",
    expire_after_ms: int | None = None,
) -> DataFrame:
    """Streaming ROWS WINDOW over ``sdf``.

    ``aggs`` is ``[(out_col, fn), ...]`` with fn ∈ SUPPORTED_FNS. Output =
    partition cols + order col + value col + agg cols, one row per input
    record (``emit='every_record'``) or per record once the buffer is full
    (``emit='buffer_full'``).
    """
    for _, fn in aggs:
        if fn not in SUPPORTED_FNS:
            raise ValueError(f"unsupported rows-window fn: {fn}")
    if emit not in ("every_record", "buffer_full"):
        raise ValueError(f"unknown emit mode: {emit}")

    in_schema = dict(zip(sdf.schema.names, sdf.schema.fields))
    out_fields = (
        [in_schema[c] for c in partition_by]
        + [in_schema[order_by], StructField(value_col, DoubleType())]
        + [StructField(out, SUPPORTED_FNS[fn]) for out, fn in aggs]
    )
    out_schema = StructType(out_fields)
    state_schema = "values array<double>, cnt long"
    n_keys = len(partition_by)
    buffer = buffer_size
    emit_full = emit == "buffer_full"

    def func(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        prev_values, cnt = state.get if state.exists else ([], 0)
        prev_values = list(prev_values)
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(order_by, kind="mergesort")
            vals = pdf[value_col].astype(float)
            s = pd.concat(
                [pd.Series(prev_values, dtype=float), vals], ignore_index=True
            )
            out = pd.DataFrame(
                {
                    **{c: key[i] for i, c in enumerate(partition_by)},
                    order_by: pdf[order_by].to_numpy(),
                    value_col: vals.to_numpy(),
                }
            )
            cnt0 = cnt - len(prev_values)
            for out_col, fn in aggs:
                out[out_col] = _agg_over_prefix(
                    fn, s, len(prev_values), buffer, cnt0
                ).to_numpy()
            cnt += len(pdf)
            prev_values = list(s.iloc[-buffer:])
            if emit_full:
                # positions (lifetime) of this batch's rows
                pos = np.arange(cnt - len(pdf) + 1, cnt + 1)
                out = out[pos >= buffer]
            if not out.empty:
                yield out
        state.update((prev_values, cnt))
        if expire_after_ms is not None:
            state.setTimeoutDuration(expire_after_ms)

    timeout = "ProcessingTimeTimeout" if expire_after_ms is not None else "NoTimeout"
    return sdf.groupBy(*partition_by).applyInPandasWithState(
        func, out_schema, state_schema, "append", timeout
    )


def rows_window_batch(
    df: DataFrame,
    partition_by: list[str],
    order_by: str | list[str],
    value_col: str,
    buffer_size: int,
    aggs: list[tuple[str, str]],
    emit: str = "every_record",
) -> DataFrame:
    """Batch twin of ``rows_window_stream`` — identical semantics via native
    window functions (``ROWS BETWEEN buffer-1 PRECEDING AND CURRENT ROW``),
    fully Catalyst-planned (WindowExec, no Python). Use this form whenever
    the input is bounded; the streaming form exists for unbounded per-record
    emission."""
    from pyspark.sql.window import Window

    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*partition_by).orderBy(*order_cols)
    frame = w.rowsBetween(-(buffer_size - 1), 0)
    v = F.col(value_col).cast("double")

    def expr(fn: str) -> Column:
        if fn == "avg":
            return F.avg(v).over(frame)
        if fn == "sum":
            return F.sum(v).over(frame)
        if fn == "min":
            return F.min(v).over(frame)
        if fn == "max":
            return F.max(v).over(frame)
        if fn == "count":
            return F.count(v).over(frame)
        if fn == "first":
            return F.first(v).over(frame)
        if fn == "last":
            return v
        if fn == "lag":
            return F.lag(v, 1).over(w)
        if fn == "row_number":
            return F.row_number().over(w).cast("long")
        raise ValueError(f"unsupported rows-window fn: {fn}")

    out = df.select(
        *partition_by,
        *order_cols,
        v.alias(value_col),
        *[expr(fn).alias(out_col) for out_col, fn in aggs],
    )
    if emit == "buffer_full":
        out = (
            df.select(
                *partition_by,
                *order_cols,
                v.alias(value_col),
                F.row_number().over(w).alias("_rn"),
                *[expr(fn).alias(out_col) for out_col, fn in aggs],
            )
            .where(F.col("_rn") >= buffer_size)
            .drop("_rn")
        )
    return out
