from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    """A VANILLA SparkSession, deliberately NOT get_session().

    The driver's correctness harness runs catalog queries in its own plain
    session (ANSI on, no nanosAsLong, default timezone) — round 1 failed
    0/50 because the engine only worked inside its tuned factory session.
    Testing against a vanilla session keeps that from regressing: every
    required conf must be applied at runtime by load_tables itself.
    """
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("velostream-spark-tests")
        # Perf-only knobs (don't change semantics): small shuffle for tiny
        # test data, no UI, enough driver memory for the suite.
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("WARN")
    yield s
