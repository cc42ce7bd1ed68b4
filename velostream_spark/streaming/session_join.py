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

__all__ = ["session_pair_join_stream"]


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
