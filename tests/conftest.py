from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from velostream_spark.session import get_session

    # Modest parallelism for tests: tiny data, JVM startup dominates.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_session("velostream-spark-tests")
    yield s
