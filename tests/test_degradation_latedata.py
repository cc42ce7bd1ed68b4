"""Graceful-degradation join modes (reference graceful_degradation.rs) and
the UpdatePreviousWindow late-data strategy (watermarks.rs:113-130) — the
re-fire behavior only visible across micro-batches."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from velostream_spark.operators.degradation import DegradationMode, stream_table_join
from velostream_spark.streaming.late_data import LateDataStrategy, with_late_policy
from velostream_spark.streaming.runner import run_foreach_batch
from velostream_spark.streaming.source import stream_parquet


@pytest.fixture()
def stream_and_table(spark):
    stream = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, payload string"
    )
    table = spark.createDataFrame(
        [(1, "ACME", 0.1), (2, "GLOBEX", 0.2)], "id int, name string, rate double"
    )
    return stream, table


def test_emit_nulls(stream_and_table):
    s, t = stream_and_table
    out = stream_table_join(s, t, "id", DegradationMode.EMIT_NULLS)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[3]["name"] is None and len(rows) == 3


def test_skip_record(stream_and_table):
    s, t = stream_and_table
    out = stream_table_join(s, t, "id", DegradationMode.SKIP_RECORD)
    assert {r["id"] for r in out.collect()} == {1, 2}


def test_use_defaults(stream_and_table):
    s, t = stream_and_table
    out = stream_table_join(
        s, t, "id", DegradationMode.USE_DEFAULTS,
        defaults={"name": "UNKNOWN", "rate": 0.0},
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[3]["name"] == "UNKNOWN" and rows[3]["rate"] == 0.0
    assert rows[1]["name"] == "ACME"


def test_fail_fast(stream_and_table, spark):
    s, t = stream_and_table
    out = stream_table_join(s, t, "id", DegradationMode.FAIL_FAST)
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "FailFast" in str(ei.value)


def test_update_previous_window_refires(spark, tmp_path):
    """UpdatePreviousWindow: a late row inside the grace period re-fires its
    already-emitted window with the corrected aggregate (reference
    tumbling.rs:64-120 historical-window re-fire = Spark update mode)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows1 = [(1, "2024-01-01 10:01:00", 10.0), (2, "2024-01-01 10:22:00", 5.0)]
    rows2 = [(3, "2024-01-01 10:02:30", 7.0)]  # late: belongs to the first window

    def write(rows, name, mtime_off):
        pdf = spark.createDataFrame(
            rows, "event_id long, ts string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp")).toPandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        p = os.path.join(src, name)
        pdf.to_parquet(p, index=False)
        t = time.time() + mtime_off
        os.utime(p, (t, t))

    write(rows1, "b0.parquet", -60)
    write(rows2, "b1.parquet", 0)
    schema = "event_id long, ts timestamp, value double"
    sdf = stream_parquet(spark, src, schema=spark.createDataFrame([], schema).schema,
                         max_files_per_trigger=1)
    wm, mode = with_late_policy(sdf, "ts", "30 minutes", LateDataStrategy.UPDATE_PREVIOUS)
    assert mode == "update"
    agg = wm.groupBy(F.window("ts", "5 minutes").alias("w")).agg(
        F.sum("value").alias("total")
    ).select(F.col("w").start.alias("ws"), "total")
    emissions = []

    def collect(bdf, bid):
        for r in bdf.collect():
            emissions.append((bid, str(r["ws"]), r["total"]))

    run_foreach_batch(agg, collect, output_mode="update", query_name="late_refire")
    w1 = [e for e in emissions if e[1].startswith("2024-01-01 10:00")]
    # first batch emitted total=10.0; the late row re-fired it with 17.0
    assert any(t == 10.0 for _, _, t in w1), emissions
    assert any(t == 17.0 for _, _, t in w1), emissions
    # final state: last emission for the window carries the corrected value
    assert sorted(w1)[-1][2] == 17.0


def test_wait_and_retry_late_dim_row_enriches(spark, tmp_path):
    """WaitAndRetry (graceful_degradation.rs:16-30): a stream record whose
    dimension lookup misses is HELD in join state; the dimension row
    arriving in a later micro-batch within the grace window matches it
    ("retry succeeds" — the record emits enriched, never null), while a
    record whose dimension never arrives emits null-enriched exactly once
    after the watermark passes its grace bound ("retries exhausted")."""
    from velostream_spark.operators.degradation import wait_and_retry_join

    s_dir, d_dir = str(tmp_path / "s"), str(tmp_path / "d")
    os.makedirs(s_dir)
    os.makedirs(d_dir)

    def write(rows, schema, dirpath, name, mtime_off):
        pdf = spark.createDataFrame(rows, schema).toPandas()
        for c in pdf.columns:
            if pdf[c].dtype.kind == "M":
                pdf[c] = pdf[c].astype("datetime64[us]")
        p = os.path.join(dirpath, name)
        pdf.to_parquet(p, index=False)
        t = time.time() + mtime_off
        os.utime(p, (t, t))

    import datetime as dt

    T = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    s_schema = "event_id long, cust long, ts timestamp"
    d_schema = "cust long, tier string, dim_ts timestamp"
    # batch 0: two stream events, no useful dim rows yet
    write([(1, 10, T(10, 0)), (2, 20, T(10, 0))], s_schema, s_dir, "b0.parquet", -60)
    write([(50, "old", T(9, 0))], d_schema, d_dir, "b0.parquet", -60)
    # batch 1: cust=10's dim row arrives 5 min later (inside the 10-min
    # grace). Matching far-future rows on BOTH sides push the global
    # watermark (min across inputs) past 10:10 so cust=20's record
    # exhausts its grace and emits null.
    write([(3, 99, T(11, 0))], s_schema, s_dir, "b1.parquet", 0)
    write([(10, "gold", T(10, 5)), (99, "noise", T(11, 0))],
          d_schema, d_dir, "b1.parquet", 0)

    sdf = stream_parquet(spark, s_dir, schema=spark.createDataFrame([], s_schema).schema,
                         max_files_per_trigger=1)
    ddf = stream_parquet(spark, d_dir, schema=spark.createDataFrame([], d_schema).schema,
                         max_files_per_trigger=1)
    joined = wait_and_retry_join(
        sdf, ddf, key="cust", stream_time="ts", dim_time="dim_ts",
        grace_minutes=10, retention_minutes=60,
    )
    rows = {}

    def collect(bdf, bid):
        for r in bdf.collect():
            rows[r["event_id"]] = (r["tier"], r["dim_ts"])

    run_foreach_batch(joined, collect, output_mode="append",
                      query_name="wait_and_retry")
    # retry succeeded: emitted enriched (once), not null
    assert rows[1] == ("gold", T(10, 5))
    # retries exhausted: emitted null-enriched after watermark passed 10:10
    assert rows[2] == (None, None)


def test_include_in_next_window_maps_to_process(spark):
    """watermarks.rs:361: IncludeInNextWindow → LateDataAction::Process —
    the late record is NOT dropped; it re-enters normal window assignment
    (the reference never relocates it to a 'next' window). Spark mapping:
    update mode — same machinery as UPDATE_PREVIOUS, pinned here so the
    strategy name stays wired."""
    import datetime as _dt

    from velostream_spark.streaming.late_data import (
        LateDataStrategy,
        with_late_policy,
    )

    assert LateDataStrategy("include_in_next_window") is LateDataStrategy.INCLUDE_IN_NEXT
    sdf = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .withColumnRenamed("timestamp", "ts")
    )
    wm, mode = with_late_policy(sdf, "ts", "10 minutes", LateDataStrategy.INCLUDE_IN_NEXT)
    assert mode == "update"
    assert wm.isStreaming
