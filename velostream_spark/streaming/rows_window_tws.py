"""ROWS WINDOW BUFFER on the ``transformWithStateInPandas`` API — the
Spark-4 forward path for the reference's per-record streaming analytic
window (WindowSpec::Rows, ast.rs:617-652; rows.rs:30-45).

Same semantics as ``rows_window.rows_window_stream`` (per-key bounded ring
buffer, every-record / buffer-full emission, inactivity expiry), expressed
through the arbitrary-stateful-processing API Spark added to replace
``applyInPandasWithState``:

- the ring buffer lives in a typed ``ValueState`` (RocksDB-backed, so at
  production scale state is spill-safe and snapshotted incrementally —
  the HDFS-backed store used by ``applyInPandasWithState`` keeps every
  key's state on-heap between batches);
- inactivity expiry (RowExpirationMode, ast.rs:580-592) uses native
  per-key TIMERS (``registerTimer`` / ``handleExpiredTimer``) instead of
  the single state-timeout slot, which also generalizes to per-window
  timers if an op needs more than one deadline per key.

Requires ``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
(transformWithState is RocksDB-only); callers set it per session — see
tests/test_streaming.py. The bucketed ``applyInPandasWithState`` form
remains the bench path on this single-node build (RocksDB commit overhead
is pure cost at tmpfs scale); parity between the two is pinned so either
can serve.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)
from pyspark.sql.types import DoubleType, StructField, StructType

from velostream_spark.streaming.rows_window import (
    SUPPORTED_FNS,
    _agg_over_prefix,
    _normalize_aggs,
)

if TYPE_CHECKING:  # pragma: no cover
    pass


class _RowsWindowProcessor(StatefulProcessor):
    """Per-key ring-buffer processor.

    State: one ValueState ``(cnt, flat)`` — lifetime row count plus the
    buffer contents flattened row-major over the referenced value columns
    (≤ buffer_size × n_cols doubles per key, independent of stream
    length). Timers: at most one per key, re-armed to
    ``now + expire_after_ms`` on every batch the key appears in; firing
    drops the key's buffer (ClearBuffer semantics of RowExpirationMode).
    """

    def __init__(
        self,
        partition_by: list[str],
        order_by: str,
        cols: list[str],
        specs: list[tuple[str, str, str]],
        buffer_size: int,
        emit_full: bool,
        expire_after_ms: int | None,
    ) -> None:
        self._pcols = partition_by
        self._order = order_by
        self._cols = cols
        self._specs = specs
        self._buffer = buffer_size
        self._emit_full = emit_full
        self._expire_ms = expire_after_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("ring", "cnt long, flat array<double>")

    def _rearm_timer(self, timerValues: TimerValues) -> None:
        if self._expire_ms is None:
            return
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._expire_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        cols, buffer = self._cols, self._buffer
        n_cols = len(cols)
        if self._state.exists():
            cnt, flat = self._state.get()
            prev_mat = np.asarray(flat, dtype=float).reshape(-1, n_cols)
        else:
            cnt, prev_mat = 0, np.empty((0, n_cols))
        # Coalesce the whole micro-batch BEFORE the single sort: a key's
        # batch can span multiple Arrow chunks, and sorting each chunk
        # independently would interleave out-of-order rows into the ring
        # buffer (diverging from the applyInPandasWithState form, which
        # coalesces first — parity pinned in tests/test_streaming.py).
        chunks = [pdf for pdf in rows if not pdf.empty]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(
                chunks, ignore_index=True
            )
            pdf = pdf.sort_values(self._order, kind="mergesort")
            n_prev = len(prev_mat)
            series = {
                c: pd.concat(
                    [pd.Series(prev_mat[:, i], dtype=float), pdf[c].astype(float)],
                    ignore_index=True,
                )
                for i, c in enumerate(cols)
            }
            out = pd.DataFrame(
                {
                    **{c: key[i] for i, c in enumerate(self._pcols)},
                    self._order: pdf[self._order].to_numpy(),
                    **{c: pdf[c].astype(float).to_numpy() for c in cols},
                }
            )
            cnt0 = cnt - n_prev
            for out_col, fn, c in self._specs:
                out[out_col] = _agg_over_prefix(
                    fn, series[c], n_prev, buffer, cnt0
                ).to_numpy()
            cnt += len(pdf)
            prev_mat = np.column_stack(
                [series[c].iloc[-buffer:].to_numpy() for c in cols]
            )
            if self._emit_full:
                pos = np.arange(cnt - len(pdf) + 1, cnt + 1)
                out = out[pos >= buffer]
            if not out.empty:
                yield out
        self._state.update((cnt, [float(x) for x in prev_mat.ravel()]))
        self._rearm_timer(timerValues)

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        self._state.clear()
        return iter(())

    def close(self) -> None:
        pass


def rows_window_stream_tws(
    sdf: DataFrame,
    partition_by: list[str],
    order_by: str,
    value_col: str,
    buffer_size: int,
    aggs: list,
    emit: str = "every_record",
    expire_after_ms: int | None = None,
) -> DataFrame:
    """Streaming ROWS WINDOW via ``transformWithStateInPandas``.

    Same signature/contract as ``rows_window.rows_window_stream``; output
    schema and values are identical (pinned in tests/test_streaming.py
    against both the applyInPandasWithState form and the batch twin).
    """
    if emit not in ("every_record", "buffer_full"):
        raise ValueError(f"unknown emit mode: {emit}")
    specs = _normalize_aggs(aggs, value_col)
    cols: list[str] = []
    for c in [value_col] + [c for _, _, c in specs]:
        if c not in cols:
            cols.append(c)

    # Shuffle/Arrow carry only key + order + referenced value columns.
    sdf = sdf.select(*dict.fromkeys([*partition_by, order_by, *cols]))

    in_schema = dict(zip(sdf.schema.names, sdf.schema.fields))
    out_schema = StructType(
        [in_schema[c] for c in partition_by]
        + [in_schema[order_by]]
        + [StructField(c, DoubleType()) for c in cols]
        + [StructField(out, SUPPORTED_FNS[fn]) for out, fn, _ in specs]
    )
    proc = _RowsWindowProcessor(
        partition_by=list(partition_by),
        order_by=order_by,
        cols=cols,
        specs=specs,
        buffer_size=buffer_size,
        emit_full=emit == "buffer_full",
        expire_after_ms=expire_after_ms,
    )
    time_mode = "ProcessingTime" if expire_after_ms is not None else "None"
    return sdf.groupBy(*partition_by).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="append",
        timeMode=time_mode,
    )
