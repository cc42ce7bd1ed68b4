"""True stream-STREAM as-of join — both sides unbounded, state + watermark.

``streaming_asof_join`` (queries/streaming_queries.py) enriches a stream
against a STATIC table, where per-batch application of the batch operator
is exact. When the right side is ALSO a stream (a CDC feed, a quote
stream), no per-batch shortcut exists: a left row at time t cannot be
finalized until no more right rows at-or-before t can arrive — a
watermark condition — and late right rows must revise the provisional
best match. Spark's built-in stream-stream joins cover equi + interval
conditions but not "LATEST right ≤ t", so this is a custom stateful
operator (``applyInPandasWithState``, the session_join/rows_window
pattern).

Semantics are the STRICT as-of: attach the latest right with ``rt < t``
(not ≤). That choice is what makes incremental finalization airtight:
with delay-0 watermarks, a left row at t is emittable exactly when
``watermark >= t`` — every future right arrival has ``rt >= watermark
>= t`` and can never satisfy ``rt < t``. (The INCLUSIVE form can never
finalize its newest rows: a future right with ``rt == t`` is always
admissible at ``watermark == t``, so a bounded run would hold back the
corpus-max rows forever. DuckDB's ASOF JOIN accepts ``>`` as well as
``>=``, so the strict oracle is still its native operator.)

Per-key state, pickled: ``rights`` — the (rt, payload) list pruned to
all rows at-or-above the watermark PLUS the single latest row below it
(only that one can ever win for a future left, since future lefts have
``t >= watermark``); ``pending`` — left rows whose t the watermark has
not reached. Duplicate right timestamps keep the row with the larger
tiebreak column (the batch oracle's ``max_by`` convention). Event-time
timeouts drive finalization: the timeout is set to the earliest pending
left's t, so when the watermark passes it Spark re-invokes the key with
``hasTimedOut`` and the due rows flush — including availableNow's
trailing batches, which is how a bounded run emits EVERY left row and
hash-matches the batch/DuckDB oracle exactly. Keys with no pending
lefts carry a retention timeout (right-side state is reference data; it
expires after ``retention_minutes`` without traffic, documented).

Scale: state per key is O(pending-within-watermark + rights-within-
watermark + 1) — bounded by the watermark horizon, not the stream's
lifetime; the exchange is ONE hash partition by key, the same shuffle
the batch operator performs.
"""

from __future__ import annotations

import pickle
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType, TimestampType

__all__ = ["asof_join_stream_stream"]


def asof_join_stream_stream(
    sdf: DataFrame,
    key_col: str,
    time_col: str,
    side_col: str,
    left_side: str,
    id_col: str,
    payload_cols: list[str],
    tiebreak_col: str,
    retention_minutes: int = 24 * 60,
) -> DataFrame:
    """``sdf`` (ONE union-tagged watermarked stream; ``side_col`` ==
    ``left_side`` marks left rows, everything else is right rows) →
    appended ``(id_col, key_col, time_col, asof_<payload>...)`` — one row
    per left row, finalized when the watermark reaches its ``time_col``.

    ``payload_cols`` are taken from right rows; ``tiebreak_col`` (one of
    the payload columns) resolves duplicate right timestamps per key —
    larger wins, the batch ``max_by`` convention."""
    in_fields = {f.name: f.dataType for f in sdf.schema.fields}
    out_schema = StructType(
        [
            StructField(id_col, in_fields[id_col]),
            StructField(key_col, in_fields[key_col]),
            StructField(time_col, TimestampType()),
            *[StructField(f"asof_{p}", in_fields[p]) for p in payload_cols],
        ]
    )
    state_schema = "blob binary"  # pickled (rights, pending)
    tb_idx = payload_cols.index(tiebreak_col)
    retention_ms = retention_minutes * 60_000

    def func(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        rights: list[tuple] = []  # (rt_us, payload tuple), sorted by rt_us
        pending: list[tuple] = []  # (t_us, lid), sorted by t_us
        if state.exists:
            rights, pending = pickle.loads(state.get[0])

        if state.hasTimedOut and not pending:
            # the RETENTION timer (no pending lefts): the key saw no
            # traffic for retention_minutes — drop its reference data
            # instead of re-arming forever
            state.remove()
            return

        if not state.hasTimedOut:
            batch = pd.concat(list(pdfs), ignore_index=True)
            if len(batch):
                ts_us = (batch[time_col].astype("int64") // 1_000).to_numpy()
                is_left = (batch[side_col] == left_side).to_numpy()
                lids = batch[id_col].to_numpy()
                pay = [batch[p].to_numpy() for p in payload_cols]
                for j in range(len(batch)):
                    if is_left[j]:
                        pending.append((int(ts_us[j]), lids[j]))
                    else:
                        row = (int(ts_us[j]), tuple(col[j] for col in pay))
                        rights.append(row)
                rights.sort(key=lambda r: (r[0], r[1][tb_idx]))
                # duplicate rt: keep the max-tiebreak row (last after sort)
                dedup: list[tuple] = []
                for r in rights:
                    if dedup and dedup[-1][0] == r[0]:
                        dedup[-1] = r
                    else:
                        dedup.append(r)
                rights = dedup
                pending.sort(key=lambda p: p[0])

        wm_us = state.getCurrentWatermarkMs() * 1_000
        out_rows: list[tuple] = []
        still: list[tuple] = []
        import bisect

        rts = [r[0] for r in rights]
        for t_us, lid in pending:
            if t_us <= wm_us:
                # final: future rights have rt >= wm >= t, never < t
                i = bisect.bisect_left(rts, t_us) - 1  # latest rt < t
                payload = rights[i][1] if i >= 0 else (None,) * len(payload_cols)
                out_rows.append((lid, t_us, payload))
            else:
                still.append((t_us, lid))
        pending = still

        # prune rights: everything >= wm stays; below wm only the latest
        # can ever win for a future left (future lefts have t >= wm)
        cut = bisect.bisect_left(rts, wm_us)
        if cut > 1:
            rights = rights[cut - 1 :]

        if pending or rights:
            state.update((pickle.dumps((rights, pending), protocol=4),))
            if pending:
                due_ms = pending[0][0] // 1_000
            else:
                due_ms = rights[-1][0] // 1_000 + retention_ms
            state.setTimeoutTimestamp(max(due_ms, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()

        if out_rows:
            data = {
                id_col: pd.Series([r[0] for r in out_rows]),
                key_col: key[0],
                time_col: pd.to_datetime(
                    pd.Series([r[1] for r in out_rows], dtype="int64"), unit="us"
                ),
            }
            for pi, p in enumerate(payload_cols):
                data[f"asof_{p}"] = pd.Series([r[2][pi] for r in out_rows])
            yield pd.DataFrame(data)

    return sdf.groupBy(key_col).applyInPandasWithState(
        func, out_schema, state_schema, "append", "EventTimeTimeout"
    )
