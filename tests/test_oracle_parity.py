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


def test_mirror_flags_int_vs_float_dtype_drift():
    """Regression for the r4 `sequence_packing` gate miss: equal values but
    int64 on the Spark side vs float64 on the oracle side (DuckDB HUGEINT →
    pandas float) must be reported as a mismatch, because the driver hashes
    stringified values ('107' != '107.0'). The old mirror coerced both sides
    to float64 and passed."""
    import pandas as pd

    from tests.oracle import compare_frames

    spark_pdf = pd.DataFrame({"total_tokens": pd.array([107, 3], dtype="int64")})
    oracle_pdf = pd.DataFrame({"total_tokens": pd.array([107.0, 3.0], dtype="float64")})
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert problems and "dtype class mismatch" in problems[0]


def test_duckdb_integer_sum_needs_cast():
    """Documents WHY every oracle must CAST integer SUMs: DuckDB's SUM(int)
    is HUGEINT, which pandas renders as float64 — a silent dtype-class drift
    vs Spark's int64. If a DuckDB upgrade ever changes this, the CAST audit
    rule can be relaxed."""
    import duckdb
    import pandas as pd

    pdf = duckdb.connect().execute(
        "SELECT SUM(x) AS s, CAST(SUM(x) AS BIGINT) AS s_cast "
        "FROM (SELECT UNNEST([1, 2, 3]) AS x)"
    ).df()
    assert not pd.api.types.is_integer_dtype(pdf["s"])
    assert pd.api.types.is_integer_dtype(pdf["s_cast"])
