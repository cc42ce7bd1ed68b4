"""Catalyst-native Bloom filter pins (operators/bloom.py).

Exact-value correctness of the cross_dedup_bloom entry is oracle-gated in
the parity mirror (plain NOT EXISTS — the bloom is transparent to the
result). These pin the filter's CONTRACTS: zero false negatives, a sane
false-positive rate at the documented sizing, NULL-key semantics, and the
100-TB plan shape (codegen probe, join only on the positive branch).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from velostream_spark.operators import bloom


def _keys(spark, n, prefix="k"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("fp")
    )


def test_bloom_has_zero_false_negatives(spark):
    """Every key that built the bitmap MUST probe positive — the property
    the exact anti-join composition rests on (a false negative would drop
    a duplicate silently)."""
    b = _keys(spark, 2000)
    words = bloom.bloom_build(b, "fp", m_bits=1 << 15, k=5)
    misses = b.where(
        ~bloom.bloom_might_contain(F.col("fp"), words, 1 << 15, 5)
    ).count()
    assert misses == 0


def test_bloom_fpp_within_sizing_formula(spark):
    """On a DISJOINT probe corpus the positive rate is pure false
    positives: with m ≈ 16 bits/key and k=5 the formula gives ~0.1%;
    assert an order-of-magnitude bound (deterministic — xxhash64 is
    seeded), loose enough to survive any hash quirk."""
    b = _keys(spark, 4000, "build")
    probe = _keys(spark, 4000, "probe")
    m = 1 << 16
    words = bloom.bloom_build(b, "fp", m_bits=m, k=5)
    fp = probe.where(
        bloom.bloom_might_contain(F.col("fp"), words, m, 5)
    ).count()
    assert fp / 4000 < 0.02, fp


def test_bloom_anti_join_equals_plain_anti_join(spark):
    """bloom_anti_join == A \\ B exactly, including NULL keys kept and
    duplicate A rows preserved."""
    a = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 17 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("t"), (F.col("id") % 40))
        ).alias("fp"),
    )
    b = spark.range(100).select(
        F.concat(F.lit("t"), (F.col("id") % 13)).alias("fp")
    )
    got = {
        (r["doc_id"], r["fp"])
        for r in bloom.bloom_anti_join(a, b, "fp", m_bits=1 << 12).collect()
    }
    want = {
        (r["doc_id"], r["fp"])
        for r in a.join(b.distinct(), "fp", "left_anti")
        .unionByName(a.where(F.col("fp").isNull()))
        .dropDuplicates(["doc_id"])
        .collect()
    }
    assert got == want and len(got) > 0


def test_cross_dedup_bloom_plan_codegen_probe_no_python(spark):
    """The entry's plan: the probe is pure codegen over the scan (no
    Python nodes anywhere), the exact confirm join exists on ONE branch
    only, and the result is the two-branch union."""
    import contextlib
    import io

    from tests.conftest import SF_SMOKE
    from velostream_spark.registry import all_queries

    df = all_queries()["cross_dedup_bloom"].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan
    assert "Union" in plan, plan
    assert plan.count("LeftAnti") >= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_bloom_anti_join_property_random_corpora(spark):
    """Property: for randomized overlap patterns, bloom_anti_join equals
    the plain anti-join exactly. Hypothesis drives the overlap modulus and
    corpus sizes; one Spark job per example is slow, so examples are few —
    the fixed tests above cover the edges (NULLs, duplicates)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None)
    @given(
        na=st.integers(50, 300),
        nb=st.integers(10, 120),
        mod=st.integers(3, 60),
    )
    def run(na, nb, mod):
        a = spark.range(na).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), (F.col("id") % mod)).alias("fp"),
        )
        b = spark.range(nb).select(
            F.concat(F.lit("t"), (F.col("id") * 3 % mod)).alias("fp")
        )
        got = {
            (r["doc_id"], r["fp"])
            for r in bloom.bloom_anti_join(a, b, "fp", m_bits=1 << 10).collect()
        }
        want = {
            (r["doc_id"], r["fp"])
            for r in a.join(b.distinct(), "fp", "left_anti").collect()
        }
        assert got == want

    run()


def test_bloom_anti_join_empty_sides(spark):
    """Edge contracts: empty B keeps all of A (all-zero bitmap, every
    probe negative — and auto-sizing must not die on n=0); empty A yields
    empty output."""
    a = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("fp"),
    )
    empty_b = a.where(F.lit(False)).select("fp")
    assert bloom.bloom_anti_join(a, empty_b, "fp").count() == 50
    empty_a = a.where(F.lit(False))
    assert bloom.bloom_anti_join(empty_a, a.select("fp"), "fp").count() == 0
