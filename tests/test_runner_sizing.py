"""Size-adaptive shuffle/state partitioning of the bounded streaming
runner (r15-opt): small bounded inputs must not pay one state-store
instance per session shuffle partition, and the session conf must be
restored afterwards. Cluster regime (large input) must be untouched."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from velostream_spark.streaming import runner
from velostream_spark.streaming.source import stream_table


def test_stream_input_bytes_resolves_glob_source(spark):
    sdf = stream_table(spark, SF_SMOKE, "events").select("event_id")
    n = runner._stream_input_bytes(sdf)
    actual = os.path.getsize(os.path.join(SF_SMOKE, "events.parquet"))
    assert n == actual, (n, actual)


def test_stream_input_bytes_none_for_batch_df(spark):
    df = spark.range(10)
    assert runner._stream_input_bytes(df) is None


def test_sized_partitions_small_input_and_restore(spark):
    session_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sdf = stream_table(spark, SF_SMOKE, "events")
    n_bytes = runner._stream_input_bytes(sdf)
    expect = min(session_n, max(1, math.ceil(n_bytes / runner._TARGET_PART_BYTES)))
    with runner._sized_shuffle_partitions(sdf):
        inside = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if expect > session_n // 2:  # hysteresis keeps the session value
            assert inside == session_n
        else:
            assert inside == expect, (inside, expect)
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) == session_n


def test_sized_partitions_respects_disable_env(spark, monkeypatch):
    monkeypatch.setattr(runner, "_TARGET_PART_BYTES", -1)
    session_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sdf = stream_table(spark, SF_SMOKE, "events")
    with runner._sized_shuffle_partitions(sdf):
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == session_n


def test_sized_partitions_large_input_keeps_session_value(spark, monkeypatch):
    # cluster regime: bytes/target >> session partitions → conf untouched
    monkeypatch.setattr(runner, "_TARGET_PART_BYTES", 1)
    session_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sdf = stream_table(spark, SF_SMOKE, "events")
    with runner._sized_shuffle_partitions(sdf):
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == session_n


def test_state_partitions_follow_sizing_end_to_end(spark):
    """A bounded stateful run on a tiny source uses the derived partition
    count for its state store (visible as the sink's task partitioning),
    and results match batch dropDuplicates exactly."""
    sdf = stream_table(spark, SF_SMOKE, "events").select("user_id", "event_type")
    out = runner.run_available_now(
        sdf.dropDuplicates(["user_id"]), "append", "sizing_e2e"
    )
    got = {r["user_id"] for r in out.collect()}
    from velostream_spark.session import load_tables

    t = load_tables(spark, SF_SMOKE, register_views=False)
    expect = {r["user_id"] for r in t["events"].select("user_id").distinct().collect()}
    assert got == expect


def test_local_ckpt_file_manager_set_and_restored(spark):
    # r16: the runner's throwaway local checkpoints use the FileSystem-based
    # manager (process-cached FileSystem) for the duration of a bounded run,
    # then the session conf is restored exactly.
    assert spark.conf.get(runner._FM_CONF, None) is None
    with runner._local_ckpt_file_manager(spark):
        assert spark.conf.get(runner._FM_CONF) == runner._FM_FS_BASED
    assert spark.conf.get(runner._FM_CONF, None) is None
    # a user-chosen manager is put back, not clobbered
    spark.conf.set(runner._FM_CONF, "com.example.CustomManager")
    try:
        with runner._local_ckpt_file_manager(spark):
            assert spark.conf.get(runner._FM_CONF) == runner._FM_FS_BASED
        assert spark.conf.get(runner._FM_CONF) == "com.example.CustomManager"
    finally:
        spark.conf.unset(runner._FM_CONF)


def test_local_ckpt_file_manager_respects_disable_env(spark, monkeypatch):
    monkeypatch.setattr(runner, "_LOCAL_CKPT_FM", False)
    with runner._local_ckpt_file_manager(spark):
        assert spark.conf.get(runner._FM_CONF, None) is None


def test_bounded_run_results_identical_under_fs_manager(spark):
    # same stateful job, default vs FileSystem-based manager → identical rows
    from velostream_spark.streaming.runner import run_available_now

    def run():
        sdf = stream_table(spark, SF_SMOKE, "events").select(
            "event_id", "user_id", "value"
        )
        out = run_available_now(
            sdf.dropDuplicates(["user_id"]), "append", "fm_parity"
        )
        return {tuple(r) for r in out.collect()}

    with_fm = run()
    try:
        runner._LOCAL_CKPT_FM = False
        without_fm = run()
    finally:
        runner._LOCAL_CKPT_FM = True
    assert with_fm == without_fm and len(with_fm) > 0
