"""ROWS WINDOW BUFFER — the reference's per-record streaming analytic
window (WindowSpec::Rows, ast.rs:617-652; strategy
window_v2/strategies/rows.rs:30-45; grammar docs/sql/PARSER_GRAMMAR.md:100-226)
as a custom stateful Spark op.

Semantics: per partition key, a bounded ring buffer of the last ``n`` rows;
for EVERY incoming record the analytic functions are evaluated over the
buffer and a row is emitted (EmitMode::EveryRecord, ast.rs:567-575), or only
once the buffer is full (EmitMode::BufferFull). Inactive partitions expire
(RowExpirationMode, ast.rs:580-592). Multiple analytic functions may target
different columns of the same buffer (as in one reference OVER clause list).

Spark has no built-in per-record streaming window-function operator, so this
is ``applyInPandasWithState``: state = one value buffer per referenced
column (array<array<double>>) + a lifetime row counter; each micro-batch is
processed *vectorized* (pandas rolling over state-prefix + batch, then the
prefix sliced off) — no Python per-row loop. Emission cadence is per-record
within each micro-batch, which converges to the reference's per-record
stream when batches are small.

Scale: state per key is O(buffer_size × n_cols) doubles — independent of
stream length; the shuffle is the groupBy(partition key) exchange only.
Skewed keys bound their cost by the same O(buffer) state.
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

#: agg spec: (out_col, fn) using the default value column, or
#: (out_col, fn, col) targeting an explicit column
AggSpec = "tuple[str, str] | tuple[str, str, str]"


def _normalize_aggs(aggs, value_col: str) -> list[tuple[str, str, str]]:
    out = []
    for spec in aggs:
        if len(spec) == 2:
            out.append((spec[0], spec[1], value_col))
        else:
            out.append((spec[0], spec[1], spec[2]))
        if out[-1][1] not in SUPPORTED_FNS:
            raise ValueError(f"unsupported rows-window fn: {out[-1][1]}")
    return out


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
    aggs: list,
    emit: str = "every_record",
    expire_after_ms: int | None = None,
) -> DataFrame:
    """Streaming ROWS WINDOW over ``sdf``.

    ``aggs``: ``[(out_col, fn), ...]`` (over ``value_col``) or
    ``[(out_col, fn, col), ...]`` (per-agg column) with fn ∈ SUPPORTED_FNS.
    Output = partition cols + order col + every referenced value col +
    agg cols, one row per input record (``emit='every_record'``) or per
    record once the buffer is full (``emit='buffer_full'``).
    """
    if emit not in ("every_record", "buffer_full"):
        raise ValueError(f"unknown emit mode: {emit}")
    specs = _normalize_aggs(aggs, value_col)
    # ordered distinct value columns; value_col always present for output
    # stability with the 2-tuple API
    cols: list[str] = []
    for c in [value_col] + [c for _, _, c in specs]:
        if c not in cols:
            cols.append(c)

    in_schema = dict(zip(sdf.schema.names, sdf.schema.fields))
    out_fields = (
        [in_schema[c] for c in partition_by]
        + [in_schema[order_by]]
        + [StructField(c, DoubleType()) for c in cols]
        + [StructField(out, SUPPORTED_FNS[fn]) for out, fn, _ in specs]
    )
    out_schema = StructType(out_fields)
    state_schema = "values array<array<double>>, cnt long"
    buffer = buffer_size
    emit_full = emit == "buffer_full"

    def func(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            prev_lists, cnt = state.get
            prev = {c: list(prev_lists[i]) for i, c in enumerate(cols)}
        else:
            prev, cnt = {c: [] for c in cols}, 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(order_by, kind="mergesort")
            series = {}
            n_prev = {}
            for c in cols:
                vals = pdf[c].astype(float)
                series[c] = pd.concat(
                    [pd.Series(prev[c], dtype=float), vals], ignore_index=True
                )
                n_prev[c] = len(prev[c])
            out = pd.DataFrame(
                {
                    **{c: key[i] for i, c in enumerate(partition_by)},
                    order_by: pdf[order_by].to_numpy(),
                    **{c: pdf[c].astype(float).to_numpy() for c in cols},
                }
            )
            cnt0 = cnt - n_prev[cols[0]]
            for out_col, fn, c in specs:
                out[out_col] = _agg_over_prefix(
                    fn, series[c], n_prev[c], buffer, cnt0
                ).to_numpy()
            cnt += len(pdf)
            prev = {c: list(series[c].iloc[-buffer:]) for c in cols}
            if emit_full:
                # positions (lifetime) of this batch's rows
                pos = np.arange(cnt - len(pdf) + 1, cnt + 1)
                out = out[pos >= buffer]
            if not out.empty:
                yield out
        state.update(([prev[c] for c in cols], cnt))
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
    aggs: list,
    emit: str = "every_record",
) -> DataFrame:
    """Batch twin of ``rows_window_stream`` — identical semantics via native
    window functions (``ROWS BETWEEN buffer-1 PRECEDING AND CURRENT ROW``),
    fully Catalyst-planned (WindowExec, no Python). Use this form whenever
    the input is bounded; the streaming form exists for unbounded per-record
    emission."""
    from pyspark.sql.window import Window

    specs = _normalize_aggs(aggs, value_col)
    cols: list[str] = []
    for c in [value_col] + [c for _, _, c in specs]:
        if c not in cols:
            cols.append(c)
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*partition_by).orderBy(*order_cols)
    frame = w.rowsBetween(-(buffer_size - 1), 0)

    def expr(fn: str, col: str) -> Column:
        v = F.col(col).cast("double")
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

    base_cols = [
        *partition_by,
        *order_cols,
        *[F.col(c).cast("double").alias(c) for c in cols],
    ]
    agg_cols = [expr(fn, c).alias(out_col) for out_col, fn, c in specs]
    if emit == "buffer_full":
        return (
            df.select(
                *base_cols,
                F.row_number().over(w).alias("_rn"),
                *agg_cols,
            )
            .where(F.col("_rn") >= buffer_size)
            .drop("_rn")
        )
    return df.select(*base_cols, *agg_cols)
