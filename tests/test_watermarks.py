"""Watermark strategies (reference watermarks.rs:60-110): the same input
stream finalizes DIFFERENT windows under Ascending / BoundedOutOfOrderness /
Punctuated / Custom — one pytest per strategy pinning the emitted-window
cutoff.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from velostream_spark.streaming.runner import run_available_now
from velostream_spark.streaming.source import stream_parquet
from velostream_spark.streaming.watermarks import (
    clocked_tumbling_final,
    punctuated_clock,
    with_watermark_strategy,
)

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _write_stream_chunks(spark, rows_per_chunk: list[list[tuple]], schema, tmpdir):
    """Each chunk becomes one file → one micro-batch (maxFilesPerTrigger=1),
    in order."""
    import os

    os.makedirs(tmpdir, exist_ok=True)
    for i, rows in enumerate(rows_per_chunk):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmpdir}/chunk{i}")
    paths = [f"{tmpdir}/chunk{i}" for i in range(len(rows_per_chunk))]
    # one directory of parquet files, lexicographic order == arrival order
    merged = f"{tmpdir}/merged"
    os.makedirs(merged, exist_ok=True)
    n = 0
    for p in paths:
        for f in sorted(os.listdir(p)):
            if f.endswith(".parquet"):
                os.link(f"{p}/{f}", f"{merged}/{n:04d}.parquet")
                n += 1
    return merged


#: one event every 5 minutes, 10:00 .. 11:00 inclusive, one user
DATA = [(1, _ts(m), 1.0) for m in range(0, 61, 5)]
SCHEMA = "user_id long, ts timestamp, value double"


def _native_tumbling_windows(spark, tmp_path, strategy, delay="20 minutes"):
    src = _write_stream_chunks(spark, [DATA[:7], DATA[7:]], SCHEMA, str(tmp_path / "d"))
    sdf = stream_parquet(spark, src, max_files_per_trigger=1)
    wm = with_watermark_strategy(sdf, "ts", strategy, delay)
    agg = wm.groupBy(F.window("ts", "15 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    out = run_available_now(agg, "append", f"wm_{strategy}").toPandas()
    return sorted(pd.Timestamp(w.start).to_pydatetime() for w in out["window"])


def test_ascending_strategy_minimal_latency(spark, tmp_path):
    """Ascending (in-order stream, zero allowance): every window whose end
    the stream has passed finalizes — ends 10:15..11:00 → 4 windows."""
    starts = _native_tumbling_windows(spark, tmp_path, "ascending")
    assert starts == [_ts(0), _ts(15), _ts(30), _ts(45)]


def test_bounded_out_of_orderness_holds_back(spark, tmp_path):
    """Bounded(20 min): watermark = 11:00 − 20 min = 10:40 → only windows
    ending ≤ 10:40 finalize (2 windows) — SAME input as ascending."""
    starts = _native_tumbling_windows(spark, tmp_path, "bounded", "20 minutes")
    assert starts == [_ts(0), _ts(15)]


MARKED_SCHEMA = "user_id long, ts timestamp, value double, is_marker boolean"


def _marked(rows, markers):
    out = [(u, t, v, False) for u, t, v in rows]
    out += [(None, t, None, True) for t in markers]
    return sorted(out, key=lambda r: r[1])


def test_punctuated_only_markers_advance_clock(spark, tmp_path):
    """Punctuated: data reaches 11:00 but the only marker says 10:30 →
    exactly the windows ending ≤ 10:30 emit; a later marker-only batch
    (11:00) releases the rest. Data records NEVER advance the clock."""
    chunk1 = _marked(DATA, [_ts(30)])
    src1 = _write_stream_chunks(spark, [chunk1], MARKED_SCHEMA, str(tmp_path / "p1"))
    sdf = stream_parquet(spark, src1, max_files_per_trigger=1).withColumn(
        "__punct", punctuated_clock("ts", "is_marker")
    )
    got = run_available_now(
        clocked_tumbling_final(sdf, "ts", "__punct", 15, "user_id", "value"),
        "append",
        "punct1",
    ).toPandas()
    starts = sorted(pd.Timestamp(t).to_pydatetime() for t in got["window_start"])
    assert starts == [_ts(0), _ts(15)]  # ends 10:15, 10:30 ≤ marker 10:30

    # marker-only second batch at 11:00 releases windows through 11:00
    chunks = [chunk1, _marked([], [_ts(60)])]
    src2 = _write_stream_chunks(spark, chunks, MARKED_SCHEMA, str(tmp_path / "p2"))
    sdf2 = stream_parquet(spark, src2, max_files_per_trigger=1).withColumn(
        "__punct", punctuated_clock("ts", "is_marker")
    )
    got2 = run_available_now(
        clocked_tumbling_final(sdf2, "ts", "__punct", 15, "user_id", "value"),
        "append",
        "punct2",
    ).toPandas()
    starts2 = sorted(pd.Timestamp(t).to_pydatetime() for t in got2["window_start"])
    assert starts2 == [_ts(0), _ts(15), _ts(30), _ts(45)]
    # counts: 15-minute windows over 5-minute spaced data → 3 events each
    assert got2["cnt"].tolist() == [3] * 4


def test_custom_generator_expression(spark, tmp_path):
    """Custom (CustomWatermarkGenerator): each record carries a source-
    embedded watermark hint (here ts − 10 min); clock = max(hint) = 10:50 →
    windows ending ≤ 10:50 (3 windows) — between bounded(20m)'s 2 and
    ascending's 4 on the same input."""
    src = _write_stream_chunks(spark, [DATA], SCHEMA, str(tmp_path / "c"))
    sdf = stream_parquet(spark, src, max_files_per_trigger=1).withColumn(
        "wm_hint", F.col("ts") - F.expr("INTERVAL 10 MINUTES")
    )
    got = run_available_now(
        clocked_tumbling_final(sdf, "ts", "wm_hint", 15, "user_id", "value"),
        "append",
        "custom_wm",
    ).toPandas()
    starts = sorted(pd.Timestamp(t).to_pydatetime() for t in got["window_start"])
    assert starts == [_ts(0), _ts(15), _ts(30)]
