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


def rows_window_stream_bucketed(
    sdf: DataFrame,
    partition_by: list[str],
    order_by: str,
    value_col: str,
    buffer_size: int,
    aggs: list,
    emit: str = "every_record",
    expire_after_ms: int | None = None,
    buckets: int = 32,
) -> DataFrame:
    """ROWS WINDOW with **bucketed** state — the high-key-cardinality path.

    ``applyInPandasWithState`` invokes the Python function once per KEY per
    micro-batch; with millions of logical keys the per-call overhead (Arrow
    chunk + pandas assembly, ~0.5 ms) dominates regardless of how little
    data each key carries. Here the physical state key is
    ``pmod(hash(partition cols), buckets)`` and each bucket keeps every
    resident key's ring buffer inside one pickled dict, so Python is entered
    ``buckets`` times per batch and the per-key work is vectorized pandas
    (stable-sort concat + groupby-rolling) across ALL keys in the bucket.

    Tradeoffs vs the per-key form (``rows_window_stream``):
    - bucket state is one blob, rewritten per touched bucket per batch —
      choose ``buckets`` so each bucket's resident-key population fits
      executor memory (state per key is still O(buffer × n_cols));
    - key expiry is handled inside the bucket (per-key last-seen pruning on
      each invocation) rather than by the state-store timeout.

    Semantics are identical to ``rows_window_stream``; the parity tests pin
    both against the batch twin / DuckDB oracle.
    """
    import pickle
    import time as _time

    if emit not in ("every_record", "buffer_full"):
        raise ValueError(f"unknown emit mode: {emit}")
    specs = _normalize_aggs(aggs, value_col)
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
    state_schema = "blob binary"
    buffer = buffer_size
    emit_full = emit == "buffer_full"
    pcols = list(partition_by)
    KEY = "__velo_key"

    def func(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        # state: {key: (np.ndarray[n<=buffer, n_cols] buffer, cnt, last_seen)}
        if state.hasTimedOut:  # pragma: no cover — buckets persist
            state.remove()
            return
        st: dict = pickle.loads(state.get[0]) if state.exists else {}
        now = _time.time() * 1000.0
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values([*pcols, order_by], kind="mergesort")
            pdf = pdf.reset_index(drop=True)
            # one composite key column for grouping/state lookup
            if len(pcols) == 1:
                keys = pdf[pcols[0]]
            else:
                keys = pd.Series(
                    list(zip(*[pdf[c] for c in pcols])), index=pdf.index, dtype=object
                )
            uniq = list(dict.fromkeys(keys))
            # prefix block: stored ring buffers of keys present in this batch
            # (one np.concatenate — no per-key DataFrame construction)
            ents = [
                (k, st[k][0]) for k in uniq if k in st and len(st[k][0])
            ]
            batch_vals = np.column_stack(
                [pdf[c].to_numpy(dtype=float) for c in cols]
            )
            if ents:
                pre_vals = np.concatenate([buf for _, buf in ents])
                pre_keys = np.array(
                    [k for k, buf in ents for _ in range(len(buf))], dtype=object
                )
                n_pre = len(pre_vals)
                all_vals = np.concatenate([pre_vals, batch_vals])
                all_keys = np.concatenate(
                    [pre_keys, keys.to_numpy(dtype=object)]
                )
                is_batch = np.concatenate(
                    [np.zeros(n_pre, dtype=bool), np.ones(len(pdf), dtype=bool)]
                )
                combined = pd.DataFrame(all_vals, columns=cols)
                combined[KEY] = all_keys
                # stable sort: per key, prefix rows (first in concat order)
                # stay before the batch's (already ordered) rows
                order = np.argsort(all_keys, kind="stable")
                combined = combined.iloc[order].reset_index(drop=True)
                is_batch = is_batch[order]
                # map each batch row of `combined` back to its pdf row
                src = np.concatenate(
                    [np.full(n_pre, -1), np.arange(len(pdf))]
                )[order]
            else:
                n_pre = 0
                combined = pd.DataFrame(batch_vals, columns=cols)
                combined[KEY] = keys.to_numpy(dtype=object)
                is_batch = np.ones(len(pdf), dtype=bool)
                src = np.arange(len(pdf))

            g = combined.groupby(KEY, sort=False)
            pos = g.cumcount().to_numpy()  # 0-based position within key
            key_start = np.arange(len(combined)) - pos
            vals = {c: combined[c].to_numpy() for c in cols}

            # lifetime counter base per key: stored cnt minus resident
            # prefix length, so row_number = base + pos + 1
            base_map = {
                k: (st[k][1] - len(st[k][0]) if k in st else 0) for k in uniq
            }
            lifetime = (
                pd.Series(combined[KEY]).map(base_map).to_numpy(dtype=np.int64)
                + pos
                + 1
            )

            out_cols: dict[str, np.ndarray] = {}
            rolls: dict[str, object] = {}

            def roll(c):
                if c not in rolls:
                    rolls[c] = g[c].rolling(buffer, min_periods=1)
                return rolls[c]

            for out_col, fn, c in specs:
                if fn == "avg":
                    r = roll(c).mean().to_numpy()
                elif fn == "sum":
                    r = roll(c).sum().to_numpy()
                elif fn == "min":
                    r = roll(c).min().to_numpy()
                elif fn == "max":
                    r = roll(c).max().to_numpy()
                elif fn == "count":
                    r = roll(c).count().to_numpy().astype("int64")
                elif fn == "last":
                    r = vals[c]
                elif fn == "lag":
                    r = g[c].shift(1).to_numpy()
                elif fn == "first":
                    tgt = key_start + np.maximum(pos - buffer + 1, 0)
                    r = vals[c][tgt]
                elif fn == "row_number":
                    r = lifetime
                else:  # pragma: no cover
                    raise ValueError(f"unsupported rows-window fn: {fn}")
                out_cols[out_col] = r

            mask = is_batch.copy()
            if emit_full:
                mask &= lifetime >= buffer
            rows = src[mask]  # pdf row index per emitted row (dtypes intact)
            out = pd.DataFrame(
                {
                    **{c: pdf[c].to_numpy()[rows] for c in pcols},
                    order_by: pdf[order_by].to_numpy()[rows],
                    **{c: vals[c][mask] for c in cols},
                    **{oc: v[mask] for oc, v in out_cols.items()},
                }
            )
            # state update: per-key tail of the combined frame, via np.split
            # on group boundaries (no per-key pandas ops)
            tail = g.tail(buffer)
            tkeys = tail[KEY].to_numpy()
            bounds = np.nonzero(tkeys[1:] != tkeys[:-1])[0] + 1
            tvals = tail[cols].to_numpy(dtype=float)
            chunks = np.split(tvals, bounds)
            kheads = [tkeys[0], *tkeys[bounds]] if len(tkeys) else []
            seen = pd.Series(combined[KEY]).value_counts()
            for k, chunk in zip(kheads, chunks):
                old = st.get(k)
                pre_len = len(old[0]) if old is not None else 0
                old_cnt = old[1] if old is not None else 0
                n_batch = int(seen[k]) - pre_len
                st[k] = (chunk, old_cnt + n_batch, now)
            if not out.empty:
                yield out
        if expire_after_ms is not None:
            st = {k: v for k, v in st.items() if now - v[2] <= expire_after_ms}
        if st:
            state.update((pickle.dumps(st, protocol=pickle.HIGHEST_PROTOCOL),))
        else:
            state.remove()

    bucket_expr = F.pmod(
        F.hash(*[F.col(c) for c in pcols]), F.lit(buckets)
    ).alias("__velo_bucket")
    return (
        sdf.withColumn("__velo_bucket", bucket_expr)
        .groupBy("__velo_bucket")
        .applyInPandasWithState(func, out_schema, state_schema, "append", "NoTimeout")
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
