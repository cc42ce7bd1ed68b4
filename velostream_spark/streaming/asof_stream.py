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

__all__ = ["asof_join_stream_stream", "asof_join_stream_stream_bucketed"]


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
                _ingest(rights, pending, range(len(batch)), ts_us, is_left, lids, pay, tb_idx)
                rights = _dedup_rights(rights, tb_idx)
                pending.sort(key=lambda p: p[0])

        wm_us = state.getCurrentWatermarkMs() * 1_000
        out_rows, rights, pending = _flush(rights, pending, wm_us, len(payload_cols))

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
            yield _emit_frame(out_rows, key[0], id_col, key_col, time_col, payload_cols)

    return sdf.groupBy(key_col).applyInPandasWithState(
        func, out_schema, state_schema, "append", "EventTimeTimeout"
    )


def _ingest(rights, pending, idx, ts_us, is_left, lids, pay, tb_idx) -> None:
    for j in idx:
        if is_left[j]:
            pending.append((int(ts_us[j]), lids[j]))
        else:
            rights.append((int(ts_us[j]), tuple(col[j] for col in pay)))


def _dedup_rights(rights: list[tuple], tb_idx: int) -> list[tuple]:
    """Sort by (rt, tiebreak) and keep ONE row per rt — the max-tiebreak
    one (the batch oracle's max_by convention), across batches too."""
    rights.sort(key=lambda r: (r[0], r[1][tb_idx]))
    dedup: list[tuple] = []
    for r in rights:
        if dedup and dedup[-1][0] == r[0]:
            dedup[-1] = r
        else:
            dedup.append(r)
    return dedup


def _flush(rights, pending, wm_us, n_payload):
    """Emit every pending left the watermark has reached (strict as-of:
    future rights have rt >= wm >= t, never < t) and prune rights to
    everything >= wm plus the single latest row below it."""
    import bisect

    out_rows: list[tuple] = []
    still: list[tuple] = []
    rts = [r[0] for r in rights]
    for t_us, lid in pending:
        if t_us <= wm_us:
            i = bisect.bisect_left(rts, t_us) - 1  # latest rt < t
            payload = rights[i][1] if i >= 0 else (None,) * n_payload
            out_rows.append((lid, t_us, payload))
        else:
            still.append((t_us, lid))
    cut = bisect.bisect_left(rts, wm_us)
    if cut > 1:
        rights = rights[cut - 1 :]
    return out_rows, rights, still


def _emit_frame(out_rows, key_vals, id_col, key_col, time_col, payload_cols):
    data = {
        id_col: pd.Series([r[0] for r in out_rows]),
        key_col: key_vals if not isinstance(key_vals, list) else pd.Series(key_vals),
        time_col: pd.to_datetime(
            pd.Series([r[1] for r in out_rows], dtype="int64"), unit="us"
        ),
    }
    for pi, p in enumerate(payload_cols):
        data[f"asof_{p}"] = pd.Series([r[2][pi] for r in out_rows])
    return pd.DataFrame(data)


def _bucket_flush(st: dict, wm_us: int, retention_us: int, n_payload: int):
    """Flush + retention walk over one bucket's ``{key: (rights, pending)}``
    state dict, IN PLACE. Returns ``(out_rows, out_keys, earliest_pending,
    newest_rt)`` for the caller's emission and timer re-arm.

    Retention is per KEY, matching the per-key twin's contract: a key with
    no pending lefts whose newest right saw no traffic for
    ``retention_minutes`` is dead reference data and is evicted HERE, in
    the walk — a hot neighbour key in the same bucket can never keep it
    alive (r11 finding: a per-bucket timer alone grows state with
    distinct-keys-ever under skewed traffic). The bucket-level timeout
    stays purely a wake-up mechanism."""
    all_out: list[tuple] = []
    out_keys: list = []
    earliest_pending = None
    newest_rt = 0
    for k in list(st):
        rights, pending = st[k]
        out_rows, rights, pending = _flush(rights, pending, wm_us, n_payload)
        for r in out_rows:
            all_out.append(r)
            out_keys.append(k)
        if not pending and (not rights or rights[-1][0] + retention_us <= wm_us):
            del st[k]
            continue
        st[k] = (rights, pending)
        if pending:
            earliest_pending = (
                pending[0][0]
                if earliest_pending is None
                else min(earliest_pending, pending[0][0])
            )
        if rights:
            newest_rt = max(newest_rt, rights[-1][0])
    return all_out, out_keys, earliest_pending, newest_rt


def asof_join_stream_stream_bucketed(
    sdf: DataFrame,
    key_col: str,
    time_col: str,
    side_col: str,
    left_side: str,
    id_col: str,
    payload_cols: list[str],
    tiebreak_col: str,
    retention_minutes: int = 24 * 60,
    buckets: int | None = None,
) -> DataFrame:
    """Bucketed-state form of :func:`asof_join_stream_stream` — the
    high-key-cardinality path (the session_join/rows_window pattern):
    ``applyInPandasWithState`` enters Python once per STATE KEY per
    micro-batch (~0.5-1 ms each), so keying by user means a 48k-user
    batch pays ~30-50 s of pure invocation overhead. The physical state
    key here is ``pmod(hash(key), buckets)``: Python is entered
    ``buckets`` times per batch, each bucket holds every resident key's
    (rights, pending) in one pickled dict, and the per-key walk runs
    in-process over sorted per-key slices. Semantics identical to the
    per-key form (same _ingest/_dedup/_flush helpers, same watermark
    finalization and timeout flush) — equality pinned in pytest; measured
    8-9x on the bench entry (PERF.md)."""
    import numpy as np
    from pyspark.sql import functions as F

    if buckets is None:
        try:
            buckets = 4 * int(
                sdf.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except Exception:
            buckets = 128

    in_fields = {f.name: f.dataType for f in sdf.schema.fields}
    out_schema = StructType(
        [
            StructField(id_col, in_fields[id_col]),
            StructField(key_col, in_fields[key_col]),
            StructField(time_col, TimestampType()),
            *[StructField(f"asof_{p}", in_fields[p]) for p in payload_cols],
        ]
    )
    state_schema = "blob binary"  # pickled {key: (rights, pending)}
    tb_idx = payload_cols.index(tiebreak_col)
    retention_ms = retention_minutes * 60_000

    def func(bucket_key, pdfs, state):
        st: dict = pickle.loads(state.get[0]) if state.exists else {}
        if state.hasTimedOut and not any(p for _, p in st.values()):
            state.remove()
            return

        if not state.hasTimedOut:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values([key_col, time_col], kind="mergesort")
                ts_us = (pdf[time_col].astype("int64") // 1_000).to_numpy()
                is_left = (pdf[side_col] == left_side).to_numpy()
                lids = pdf[id_col].to_numpy()
                keys = pdf[key_col].to_numpy()
                pay = [pdf[p].to_numpy() for p in payload_cols]
                change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
                starts = np.concatenate(([0], change, [len(keys)]))
                for a, b in zip(starts[:-1], starts[1:]):
                    k = keys[a]
                    rights, pending = st.get(k, ([], []))
                    _ingest(rights, pending, range(a, b), ts_us, is_left, lids, pay, tb_idx)
                    rights = _dedup_rights(rights, tb_idx)
                    pending.sort(key=lambda p: p[0])
                    st[k] = (rights, pending)

        wm_us = state.getCurrentWatermarkMs() * 1_000
        all_out, out_keys, earliest_pending, newest_rt = _bucket_flush(
            st, wm_us, retention_ms * 1_000, len(payload_cols)
        )

        if st:
            state.update((pickle.dumps(st, protocol=4),))
            if earliest_pending is not None:
                due_ms = earliest_pending // 1_000
            else:
                due_ms = newest_rt // 1_000 + retention_ms
            state.setTimeoutTimestamp(max(due_ms, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()

        if all_out:
            yield _emit_frame(all_out, out_keys, id_col, key_col, time_col, payload_cols)

    bucket_expr = F.pmod(F.hash(F.col(key_col)), F.lit(buckets))
    projected = sdf.select(
        *dict.fromkeys([key_col, time_col, id_col, side_col, *payload_cols])
    ).withColumn("__velo_bucket", bucket_expr)
    return projected.groupBy("__velo_bucket").applyInPandasWithState(
        func, out_schema, state_schema, "append", "EventTimeTimeout"
    )
