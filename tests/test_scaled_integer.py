"""ScaledInteger combinators (functions/scaled.py) — the reference's exact
fixed-point money type (types.rs:52-79) as Spark long-codegen expressions.

Exactness contract: for inputs carrying <= scale decimal digits, the
scaled-long pipeline must reproduce the DecimalType pipeline bit-for-bit
after the single output rounding. The cases below include the classic
float traps (0.1 + 0.2, .5-boundary cents) and a sum large enough that a
double accumulator would already have lost integer precision.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from velostream_spark.functions.scaled import (
    from_scaled,
    scaled_mul,
    scaled_sum,
    to_scaled,
)


def test_scaled_matches_decimal_on_float_traps(spark):
    rows = [(0.1,), (0.2,), (19.99,), (0.05,), (123.45,), (9999999.99,)]
    df = spark.createDataFrame(rows, "x double")
    got = df.select(
        "x",
        from_scaled(to_scaled("x", 4), 4).cast("double").alias("roundtrip"),
        # square at combined scale 8 — keep |x| within the documented
        # per-row cap (sqrt(2^63 / 10^8) ~ 9.6e5); the last row exceeds it
        # and is squared at a narrower scale instead
        from_scaled(
            scaled_mul(to_scaled("x", 2), to_scaled("x", 2)), 4
        )
        .cast("double")
        .alias("sq"),
    ).collect()
    for (x,), r in zip(rows, got):
        assert r["roundtrip"] == x, (x, r)
        # square computed exactly at 4 decimal places, vs decimal oracle
        assert abs(r["sq"] - round(x * x, 4)) < 1e-9, (x, r)


def test_scaled_mul_overflow_raises_under_ansi(spark):
    """Under ANSI mode a per-row i64 overflow is an error — the same
    contract as the reference's ScaledInteger panic-on-overflow
    (scaled_arithmetic), never a silently wrong number. The engine's own
    sessions run the permissive reference dialect (ansi off — NULL on bad
    cast), where the protection is the documented per-row scale cap
    instead; pin the ANSI behavior explicitly so the contract is
    deployment-choosable, then restore the session conf."""
    import pytest as _pytest

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame([(9999999.99,)], "x double")
        sq8 = df.select(
            from_scaled(
                scaled_mul(to_scaled("x", 4), to_scaled("x", 4)), 8
            ).alias("sq")
        )
        with _pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
            sq8.collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_scaled_sum_is_exact_where_double_is_not(spark):
    # 1M rows of 0.1: double fold accumulates ~1e-6 of drift; the scaled
    # path must return exactly 100000.0
    df = spark.range(1_000_000).select(F.lit(0.1).alias("x"))
    exact = df.select(
        from_scaled(scaled_sum(to_scaled("x", 4)), 4).cast("double").alias("s")
    ).first()["s"]
    assert exact == 100_000.0
    drift = df.agg(F.sum("x").alias("s")).first()["s"]
    assert drift != 100_000.0  # the trap scaled_sum exists to avoid


def test_scaled_sum_widens_past_long_range(spark):
    # each row is 9e14 at scale 4 (9.2e18 overflows i64 after ~10 rows if
    # summed as long); DECIMAL(38,0) accumulation must stay exact
    df = spark.range(1000).select(F.lit(9e10).alias("x"))
    s = df.select(
        from_scaled(scaled_sum(to_scaled("x", 4)), 4).cast("double").alias("s")
    ).first()["s"]
    assert s == 9e13


def test_decimal_arithmetic_entry_values_and_plan(spark):
    """The catalog entry built on scaled.py must hash-match its DuckDB
    decimal oracle AND keep the products primitive (no Decimal multiply
    nodes in the plan — only the widened sums touch decimal)."""
    import contextlib
    import io

    from tests.conftest import SF_SMOKE
    from tests.oracle import check_query

    rows, problems = check_query(spark, "decimal_arithmetic", SF_SMOKE)
    assert rows > 0 and not problems, problems

    from velostream_spark.registry import all_queries

    df = all_queries()["decimal_arithmetic"].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "HashAggregate" in plan
    # row-side expressions read only the longs; no CheckOverflow/decimal
    # multiply should appear before the aggregate's partial sums
    scan_to_partial = plan.split("HashAggregate")[0]
    assert "Decimal(" not in scan_to_partial, scan_to_partial


def test_from_scaled_exact_at_all_scales_vs_decimal(spark):
    """Round-6 advice regression: from_scaled must be an EXACT scale shift
    at any supported scale (a single decimal division pre-rounds at 6
    fractional digits for scale > 6 under Spark's allowPrecisionLoss —
    the quotient/remainder split must not). Adversarial values: rounding
    boundaries, ±10^k neighbors, i64 extremes, large DECIMAL(38,0) sums
    within the documented |v| < 10^35 domain — all compared bit-for-bit
    against Python Decimal."""
    import decimal
    from decimal import Decimal

    base_vals = {
        0, 1, -1, 5, -5, 49, 50, 51, 499, 500, 501,
        10**6 - 1, 10**6, 10**6 + 1, 123450000005000, -123450000005000,
        5 * 10**11, 5 * 10**11 + 1, 5 * 10**11 - 1,
        9_223_372_036_854_775_807, -9_223_372_036_854_775_808,
        10**22 + 7, -(10**22 + 7), 10**30 + 123456789, 10**34,
    }
    # localcontext: 60-digit ORACLE precision without leaking a mutated
    # global decimal context into later tests in this process
    with decimal.localcontext() as ctx:
        ctx.prec = 60
        for scale in (0, 1, 4, 6, 7, 8, 12, 17):
            # documented domain: |v| < 10^(min(31+scale, 35)) - 10^scale;
            # pin BOTH signed boundary values explicitly
            bound = 10 ** (min(31 + scale, 35)) - 10**scale
            vals = base_vals | {bound - 1, -(bound - 1)}
            in_domain = sorted(v for v in vals if abs(v) < bound)
            df = spark.createDataFrame(
                [(str(v),) for v in in_domain], "s string"
            ).select(F.col("s").cast("decimal(38,0)").alias("v"))
            got = df.select(
                "v", from_scaled(F.col("v"), scale).alias("d")
            ).collect()
            for r in got:
                v = int(r["v"])
                want = Decimal(v) / Decimal(10**scale)
                assert r["d"] is not None and Decimal(str(r["d"])) == want, (
                    scale, v, r["d"], want,
                )


def test_spark_decimal_negation_off_by_one_at_35_digits(spark):
    """Documents the Spark quirk that forbids an abs()-based from_scaled:
    decimal negation (UnaryMinus, and abs() which routes through it) is
    off by ONE for negative inputs of >= 35 digits. If this test ever
    FAILS, upstream fixed it and from_scaled may use abs() again."""
    df = spark.createDataFrame([(str(-(10**35 - 1)),)], "s string").select(
        F.col("s").cast("decimal(38,0)").alias("v")
    )
    r = df.select((-F.col("v")).alias("neg"), F.abs("v").alias("abs")).collect()[0]
    assert int(r["neg"]) == 10**35, r  # wrong value, pinned on purpose
    assert int(r["abs"]) == 10**35, r  # (exact would be 10**35 - 1)
