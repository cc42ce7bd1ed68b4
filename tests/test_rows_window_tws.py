"""Tests for the Spark-4 ``transformWithStateInPandas`` ROWS WINDOW path.

ENVIRONMENT EXEMPTION (README "environment exemptions"): transformWithState's
Python state server speaks protobuf — starting any such query needs the
``google.protobuf`` package, absent from this container (no installs). So:

- the *processor logic* is parity-tested here by driving
  ``_RowsWindowProcessor`` directly against a pandas rolling-window oracle
  (multi-batch state carry, multi-chunk Arrow input, buffer_full emission);
- the *plan* is pinned: building the DataFrame must produce a
  TransformWithStateInPandas node (construction is JVM-side and works);
- the *end-to-end* streaming parity run is written but auto-skips without
  ``google.protobuf`` — it runs verbatim on any cluster that has it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from velostream_spark.streaming.rows_window_tws import _RowsWindowProcessor


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema):
        return self.state

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


class _FakeTimerValues:
    def getCurrentProcessingTimeInMs(self):
        return 1_000_000


AGGS = [("moving_avg", "avg"), ("moving_min", "min"), ("buffer_n", "count")]


def _make_processor(buffer=5, emit="every_record", expire_ms=None):
    proc = _RowsWindowProcessor(
        partition_by=["user_id"],
        order_by="event_id",
        cols=["value"],
        specs=[(out, fn, "value") for out, fn in AGGS],
        buffer_size=buffer,
        emit_full=emit == "buffer_full",
        expire_after_ms=expire_ms,
    )
    handle = _FakeHandle()
    proc.init(handle)
    return proc, handle


def _oracle(values: np.ndarray, buffer: int) -> pd.DataFrame:
    s = pd.Series(values, dtype=float)
    return pd.DataFrame(
        {
            "moving_avg": s.rolling(buffer, min_periods=1).mean(),
            "moving_min": s.rolling(buffer, min_periods=1).min(),
            "buffer_n": s.rolling(buffer, min_periods=1).count(),
        }
    )


def _feed(proc, handle, batches):
    """Feed chunk-lists batch by batch; return the concatenated emissions."""
    outs = []
    for chunks in batches:
        outs.extend(proc.handleInputRows(("u1",), iter(chunks), _FakeTimerValues()))
    return (
        pd.concat(outs, ignore_index=True)
        if outs
        else pd.DataFrame(columns=["user_id", "event_id", "value"])
    )


def _chunk(ids, vals):
    return pd.DataFrame({"event_id": ids, "value": np.asarray(vals, dtype=float)})


def test_processor_multibatch_matches_pandas_rolling():
    proc, handle = _make_processor(buffer=5)
    rng = np.random.RandomState(7)
    ids = np.arange(100)
    vals = rng.randn(100) * 10
    # 3 micro-batches of uneven size, each a single chunk
    batches = [[_chunk(ids[:30], vals[:30])], [_chunk(ids[30:31], vals[30:31])],
               [_chunk(ids[31:], vals[31:])]]
    got = _feed(proc, handle, batches)
    want = _oracle(vals, 5)
    assert len(got) == 100
    np.testing.assert_allclose(got["moving_avg"].to_numpy(), want["moving_avg"])
    np.testing.assert_allclose(got["moving_min"].to_numpy(), want["moving_min"])
    np.testing.assert_allclose(got["buffer_n"].to_numpy(), want["buffer_n"])
    # state carries (cnt, flat) sized by the buffer, not the stream
    cnt, flat = handle.state.get()
    assert cnt == 100 and len(flat) == 5


def test_processor_coalesces_chunks_before_sorting():
    """r5 advice (medium): a key's micro-batch spanning multiple Arrow
    chunks must be globally ordered by order_by — per-chunk sorting would
    interleave out-of-order rows into the ring buffer."""
    rng = np.random.RandomState(3)
    ids = np.arange(60)
    vals = rng.randn(60)
    perm = rng.permutation(60)
    # one batch delivered as three unsorted, interleaved chunks
    chunks = [
        _chunk(ids[perm[:20]], vals[perm[:20]]),
        _chunk(ids[perm[20:40]], vals[perm[20:40]]),
        _chunk(ids[perm[40:]], vals[perm[40:]]),
    ]
    proc, _ = _make_processor(buffer=4)
    got = _feed(proc, _FakeHandle(), [chunks])
    want = _oracle(vals, 4)
    assert list(got["event_id"]) == list(ids)
    np.testing.assert_allclose(got["moving_avg"].to_numpy(), want["moving_avg"])
    np.testing.assert_allclose(got["moving_min"].to_numpy(), want["moving_min"])


def test_processor_buffer_full_emission_and_timers():
    proc, handle = _make_processor(buffer=4, emit="buffer_full", expire_ms=5000)
    got = _feed(proc, handle, [[_chunk(np.arange(3), np.arange(3))]])
    assert len(got) == 0  # fewer rows than the buffer → nothing emitted
    got = _feed(proc, handle, [[_chunk(np.arange(3, 10), np.arange(3, 10))]])
    # rows 4..10 (1-indexed positions ≥ buffer) emit
    assert list(got["event_id"]) == list(range(3, 10))
    # timer re-armed once per batch at now + expire_after_ms
    assert handle.timers == [1_000_000 + 5000]
    # firing the timer clears the ring buffer
    assert list(proc.handleExpiredTimer(("u1",), _FakeTimerValues(), None)) == []
    assert not handle.state.exists()


def test_tws_plan_constructs(spark):
    """Plan construction (JVM-side) works without google.protobuf — pin
    that the DataFrame carries a transformWithState node with the declared
    output schema; only query START needs the protobuf state server."""
    from velostream_spark.streaming.rows_window_tws import rows_window_stream_tws
    from velostream_spark.streaming.source import stream_table

    sdf = stream_table(spark, "/root/testdata/sf0.001", "events")
    out = rows_window_stream_tws(sdf, ["user_id"], "event_id", "value", 10, AGGS)
    assert [f.name for f in out.schema.fields] == [
        "user_id", "event_id", "value", "moving_avg", "moving_min", "buffer_n",
    ]
    plan = out._jdf.queryExecution().logical().toString()
    assert "TransformWithState" in plan


def test_tws_streaming_parity_end_to_end(spark, tmp_path):
    """Full streaming parity vs the batch twin — runs wherever
    google.protobuf exists (any real cluster); auto-skips in this
    container (no installs allowed)."""
    pytest.importorskip("google.protobuf")
    from velostream_spark.session import load_tables
    from velostream_spark.streaming.rows_window import rows_window_batch
    from velostream_spark.streaming.rows_window_tws import rows_window_stream_tws
    from velostream_spark.streaming.runner import run_available_now
    from velostream_spark.streaming.source import stream_table

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    sf = "/root/testdata/sf0.001"
    sdf = stream_table(spark, sf, "events")
    got = run_available_now(
        rows_window_stream_tws(sdf, ["user_id"], "event_id", "value", 10, AGGS),
        "append",
        "tws_parity",
    )
    want = rows_window_batch(
        load_tables(spark, sf, register_views=False)["events"],
        ["user_id"], "event_id", "value", 10, AGGS,
    )
    cols = ["user_id", "event_id", "moving_avg", "moving_min", "buffer_n"]
    a = {tuple(r) for r in got.select(*cols).collect()}
    b = {tuple(r) for r in want.select(*cols).collect()}
    assert a == b
