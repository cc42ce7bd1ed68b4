"""Every catalog query hash-matches its DuckDB oracle — the local mirror of
the driver's CORRECTNESS gate. Runs at sf0.001 by default;
set VELO_PARITY_SF=/root/testdata/sf0.01 to run the driver's exact scale.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("VELO_PARITY_SF", "/root/testdata/sf0.001")


def _names():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from velostream_spark.registry import all_queries

    return sorted(all_queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    from tests.oracle import check_query

    rows, problems = check_query(spark, name, SF_DIR)
    assert not problems, f"{name}: {problems}"
