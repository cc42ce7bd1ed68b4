"""True streaming session-windowed stream-stream join — the unbounded form
of ``queries/joins.py::session_join`` (reference JoinMode session
co-windowing, ``sql/execution/join/coordinator.rs:101-102``).

Semantics: two event kinds of one key match iff they fall in the same
gap-separated session (a left event and right event extend each other's
session — merged-session semantics, exactly the batch twin's
co-sessionization).

Spark has no built-in session-windowed stream-stream join (session windows
exist only for aggregations), so this is a custom stateful operator
(SURVEY §2 option (b)): ``applyInPandasWithState`` keyed by the join key.

State per key = the OPEN session only: ``(session_start, last_ts,
left_ids, right_ids)``.  Pairs are emitted EAGERLY — when the later element
of a pair arrives — rather than on session close:

- every pair is emitted exactly once (new lefts × buffered rights +
  buffered lefts × new rights + new lefts × new rights, as events walk the
  session in time order);
- a bounded availableNow run therefore emits the complete pair set and
  hash-matches the batch composition (no watermark-cutoff asymmetry);
- a gap larger than ``gap`` closes the session: state resets, nothing to
  flush (everything was already emitted).

Scale: state is O(open-session events per key), not O(stream); expired
keys are garbage-collected via event-time timeout at ``last_ts + gap``
(fires on the first micro-batch whose watermark passes it, including the
trailing no-data batch).  The pair generation is inherently |L|x|R| per
session — the session cap is the data's own session size, the same bound
the reference's in-memory session buffer carries.

Ordering assumption (same as the reference's watermark contract): events
within a key arrive session-ordered up to the watermark delay; an event
older than the open session's start cannot resurrect an already-closed
session (it starts a new one retroactively only within the open session).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["session_pair_join_stream", "session_pair_join_stream_bucketed"]


def session_pair_join_stream(
    sdf: DataFrame,
    key_col: str,
    time_col: str,
    id_col: str,
    side_col: str,
    left_side: str,
    right_side: str,
    gap_minutes: int = 30,
    left_out: str = "left_id",
    right_out: str = "right_id",
) -> DataFrame:
    """``sdf`` (streaming, watermarked on ``time_col``) → appended pairs
    ``(left_out, right_out, key_col, session_start)``.

    ``side_col`` holds ``left_side`` / ``right_side`` markers; other rows
    must be filtered out upstream.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    in_fields = {f.name: f.dataType for f in sdf.schema.fields}
    out_schema = StructType(
        [
            StructField(left_out, in_fields[id_col]),
            StructField(right_out, in_fields[id_col]),
            StructField(key_col, in_fields[key_col]),
            StructField("session_start", TimestampType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("session_start", LongType()),  # unix micros
            StructField("last_ts", LongType()),
            StructField("left_ids", StringType()),  # comma-joined (Arrow-simple)
            StructField("right_ids", StringType()),
        ]
    )

    def func(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # session expired past the watermark — GC only
            return
        if state.exists:
            start_us, last_us, l_csv, r_csv = state.get
            lefts = [int(x) for x in l_csv.split(",") if x]
            rights = [int(x) for x in r_csv.split(",") if x]
        else:
            start_us = last_us = None
            lefts, rights = [], []

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([time_col, id_col], kind="mergesort")
        ts_us = (batch[time_col].astype("int64") // 1_000).to_numpy()
        ids = batch[id_col].to_numpy()
        sides = batch[side_col].to_numpy()

        out_l: list[int] = []
        out_r: list[int] = []
        out_s: list[int] = []
        for t, i, side in zip(ts_us, ids, sides):
            t = int(t)
            if last_us is not None and t - last_us > gap_us:
                # gap closes the open session; its pairs are already out
                start_us, lefts, rights = None, [], []
            if start_us is None:
                start_us = t
            if side == left_side:
                for r in rights:
                    out_l.append(int(i))
                    out_r.append(r)
                    out_s.append(start_us)
                lefts.append(int(i))
            else:
                for l in lefts:
                    out_l.append(l)
                    out_r.append(int(i))
                    out_s.append(start_us)
                rights.append(int(i))
            last_us = t

        state.update(
            (
                start_us,
                last_us,
                ",".join(map(str, lefts)),
                ",".join(map(str, rights)),
            )
        )
        # event-time GC: key's state dies once the watermark passes the gap
        state.setTimeoutTimestamp((last_us + gap_us) // 1_000)

        if out_l:
            yield pd.DataFrame(
                {
                    left_out: pd.Series(out_l, dtype="int64"),
                    right_out: pd.Series(out_r, dtype="int64"),
                    key_col: key[0],
                    "session_start": pd.to_datetime(
                        pd.Series(out_s, dtype="int64"), unit="us"
                    ),
                }
            )

    return sdf.groupBy(key_col).applyInPandasWithState(
        func, out_schema, state_schema, "append", "EventTimeTimeout"
    )


def session_pair_join_stream_bucketed(
    sdf: DataFrame,
    key_col: str,
    time_col: str,
    id_col: str,
    side_col: str,
    left_side: str,
    right_side: str,
    gap_minutes: int = 30,
    left_out: str = "left_id",
    right_out: str = "right_id",
    buckets: int | None = None,
) -> DataFrame:
    """Bucketed-state form of ``session_pair_join_stream`` — the
    high-key-cardinality path (same design as
    ``rows_window.rows_window_stream_bucketed``).

    ``applyInPandasWithState`` enters Python once per state key per
    micro-batch (~0.5 ms each: Arrow chunk + pandas assembly); with many
    users that per-call overhead dominates the actual session walk. The
    physical state key here is ``pmod(hash(key), buckets)``: Python is
    entered ``buckets`` times per batch, each bucket holds every resident
    key's open session in one pickled dict, and the per-key session walk
    runs in-process over numpy-split per-key slices.

    Key GC happens inside the bucket: a key whose open session ended more
    than ``gap`` before the bucket's max seen event time is definitively
    closed for in-order data (any later event would start a new session),
    so its state is dropped — the in-bucket analog of the per-key form's
    event-time timeout.

    Semantics are identical to ``session_pair_join_stream``; the parity
    test runs both forms plus the batch twin on one input.
    """
    import pickle

    import numpy as np
    from pyspark.sql import functions as F

    gap_us = gap_minutes * 60 * 1_000_000

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
            StructField(left_out, in_fields[id_col]),
            StructField(right_out, in_fields[id_col]),
            StructField(key_col, in_fields[key_col]),
            StructField("session_start", TimestampType()),
        ]
    )
    state_schema = "blob binary"

    def func(bucket_key, pdfs, state):
        if state.hasTimedOut:  # pragma: no cover — buckets persist
            state.remove()
            return
        st: dict = pickle.loads(state.get[0]) if state.exists else {}
        out_l: list[int] = []
        out_r: list[int] = []
        out_k: list = []
        out_s: list[int] = []
        max_seen = 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values([key_col, time_col, id_col], kind="mergesort")
            ts_us = (pdf[time_col].astype("int64") // 1_000).to_numpy()
            ids = pdf[id_col].to_numpy()
            is_left = (pdf[side_col] == left_side).to_numpy()
            keys = pdf[key_col].to_numpy()
            max_seen = max(max_seen, int(ts_us.max()))
            # contiguous per-key slices (input sorted by key)
            change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
            starts = np.concatenate(([0], change, [len(keys)]))
            for a, b in zip(starts[:-1], starts[1:]):
                k = keys[a]
                k = None if (isinstance(k, float) and np.isnan(k)) else k
                ent = st.get(k)
                if ent is not None:
                    start_us, last_us, lefts, rights = ent
                else:
                    start_us = last_us = None
                    lefts, rights = [], []
                for j in range(a, b):
                    t = int(ts_us[j])
                    if last_us is not None and t - last_us > gap_us:
                        start_us, lefts, rights = None, [], []
                    if start_us is None:
                        start_us = t
                    i = int(ids[j])
                    if is_left[j]:
                        for r in rights:
                            out_l.append(i)
                            out_r.append(r)
                            out_k.append(k)
                            out_s.append(start_us)
                        lefts.append(i)
                    else:
                        for l in lefts:
                            out_l.append(l)
                            out_r.append(i)
                            out_k.append(k)
                            out_s.append(start_us)
                        rights.append(i)
                    last_us = t
                st[k] = (start_us, last_us, lefts, rights)
        # in-bucket GC: sessions closed w.r.t. the bucket's own event clock
        if max_seen:
            dead = [k for k, e in st.items() if e[1] + gap_us < max_seen]
            for k in dead:
                del st[k]
        state.update((pickle.dumps(st, protocol=pickle.HIGHEST_PROTOCOL),))
        if out_l:
            yield pd.DataFrame(
                {
                    left_out: pd.Series(out_l, dtype="int64"),
                    right_out: pd.Series(out_r, dtype="int64"),
                    key_col: out_k,
                    "session_start": pd.to_datetime(
                        pd.Series(out_s, dtype="int64"), unit="us"
                    ),
                }
            )

    bucket_expr = F.pmod(F.hash(F.col(key_col)), F.lit(buckets))
    projected = sdf.select(
        *dict.fromkeys([key_col, time_col, id_col, side_col])
    ).withColumn("__velo_bucket", bucket_expr)
    return (
        projected.groupBy("__velo_bucket")
        .applyInPandasWithState(func, out_schema, state_schema, "append", "NoTimeout")
    )
