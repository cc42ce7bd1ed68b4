"""Count-min sketch (operators/cms.py) and the sketch-twin pins:
heavy_hitters_cms vs exact heavy_hitters, percentile_aggs_approx vs exact
percentile_aggs. Sketch guarantees are one-sided (CMS only OVERestimates)
or rank-bounded (GK), so the pins encode those contracts, not equality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from velostream_spark.operators import cms


def test_cms_estimate_overestimates_and_is_tight_at_low_collision(spark):
    df = spark.createDataFrame(
        [("a",)] * 100 + [("b",)] * 37 + [("c",)] * 5 + [(None,)],
        "word string",
    )
    grid = cms.cms_build(df, "word", w=1024, d=5)
    truth = {"a": 100, "b": 37, "c": 5}
    est = {
        r["word"]: r["e"]
        for r in spark.createDataFrame([(w,) for w in truth], "word string")
        .select("word", cms.cms_estimate(F.col("word"), grid, 1024).alias("e"))
        .collect()
    }
    for w, t in truth.items():
        assert est[w] >= t, (w, est[w], t)  # CMS never underestimates
        assert est[w] <= t + 2 * 142 // 1024 + 1, (w, est[w], t)  # 2N/w bound
    # NULL keys never enter the grid
    assert sum(sum(row) for row in grid) == 5 * 142


def test_cms_weighted_build(spark):
    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 2)], "k string, wt int")
    grid = cms.cms_build(df, "k", weight_col="wt", w=256, d=3)
    est = {
        r["k"]: r["e"]
        for r in spark.createDataFrame([("a",), ("b",)], "k string")
        .select("k", cms.cms_estimate(F.col("k"), grid, 256).alias("e"))
        .collect()
    }
    assert est["a"] >= 15 and est["b"] >= 2
    assert sum(sum(row) for row in grid) == 3 * 17


def test_heavy_hitters_cms_matches_exact_head(spark):
    """At w=4096 on the smoke corpus, collisions are negligible: the CMS
    ranking's head must contain the exact top-10, every estimate is >=
    its in-row true count, and the entry's own within_bound validation
    column (r13 verdict task 6) is all-true."""
    from velostream_spark.registry import all_queries

    qs = all_queries()
    exact = qs["heavy_hitters"].fn(spark, SF_SMOKE).collect()
    approx = qs["heavy_hitters_cms"].fn(spark, SF_SMOKE).collect()
    assert len(exact) == len(approx) == 20
    got = {r["word"]: r for r in approx}
    exact_top10 = [r["word"] for r in exact[:10]]
    assert set(exact_top10) <= set(got), set(exact_top10) - set(got)
    for r in approx:
        assert r["cnt_est"] >= r["cnt"], r
        assert r["within_bound"], r


def test_percentile_approx_within_tolerance_of_exact(spark):
    """The r14 validation shape: the entry recomputes the exact
    percentiles in the SAME query and emits all-true *_within_bound
    booleans asserting each GK estimate sits between the exact DISC
    percentiles at p±0.001; its exact columns must equal the exact
    twin's bit-for-bit (same fused percentile expression)."""
    from velostream_spark.registry import all_queries

    qs = all_queries()
    exact = {
        r["l_returnflag"]: r.asDict()
        for r in qs["percentile_aggs"].fn(spark, SF_SMOKE).collect()
    }
    approx = {
        r["l_returnflag"]: r.asDict()
        for r in qs["percentile_aggs_approx"].fn(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx) and len(exact) > 0
    for flag, e in exact.items():
        a = approx[flag]
        for c in ("med_price", "p25", "p95", "qty_p50_disc"):
            assert a[c] == e[c], (flag, c, a[c], e[c])
        for b in (
            "p25_within_bound",
            "med_within_bound",
            "p95_within_bound",
            "qty_within_bound",
        ):
            assert a[b] is True, (flag, b)


def test_classifier_bucket_parity_and_guards(spark):
    """bucket_of (Spark conv) == bucket_of_sql (DuckDB strpos arithmetic)
    on real words, and the power-of-16 guard rejects bad bucket counts."""
    import duckdb
    import pytest
    from pyspark.sql import functions as F

    from velostream_spark.operators.classify import (
        bucket_of,
        bucket_of_sql,
        linear_text_score,
    )

    words = ["the", "quick", "brown", "fox", "a", "zebra-42", ""]
    got = (
        spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", bucket_of(F.col("w"), 4096).alias("b"))
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        want = con.execute(
            f"SELECT {bucket_of_sql(repr(r['w']), 4096)}"
        ).fetchone()[0]
        assert r["b"] == want, (r["w"], r["b"], want)
        assert 0 <= r["b"] < 4096
    for bad in (10, 17, 100, 1):
        with pytest.raises(ValueError, match="power of 16"):
            bucket_of(F.lit("x"), bad)
    # empty words array -> NULL score (no division blow-up)
    row = (
        spark.createDataFrame([([],)], "ws array<string>")
        .select(linear_text_score(F.col("ws"), [0.0] * 16))
        .first()
    )
    assert row["score"] is None


def test_cms_grids_merge_by_elementwise_addition(spark):
    """The mergeability claim the continuous-aggregate story rests on:
    grid(A union B) == grid(A) + grid(B) elementwise — per-partition /
    per-chunk sketches combine associatively with no rescan."""
    a = spark.createDataFrame([("x",)] * 8 + [("y",)] * 3, "k string")
    b = spark.createDataFrame([("x",)] * 2 + [("z",)] * 7, "k string")
    w, d = 256, 3
    ga = cms.cms_build(a, "k", w=w, d=d)
    gb = cms.cms_build(b, "k", w=w, d=d)
    gu = cms.cms_build(a.unionByName(b), "k", w=w, d=d)
    merged = [[ga[i][j] + gb[i][j] for j in range(w)] for i in range(d)]
    assert merged == gu


def test_classifier_empty_array_null_under_ansi(spark):
    """ADVICE r11: the documented NULL for an empty words array must hold
    under spark.sql.ansi.enabled too (a bare 0/0 would raise
    DIVIDE_BY_ZERO there; the CaseWhen guard evaluates lazily)."""
    from pyspark.sql import functions as F

    from velostream_spark.operators.classify import linear_text_score

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = (
            spark.createDataFrame([(1, []), (2, ["a", "b"])], "i int, ws array<string>")
            .select("i", linear_text_score(F.col("ws"), [0.0] * 16))
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    got = {r["i"]: r["score"] for r in rows}
    assert got[1] is None
    assert got[2] == 0.5


def test_cms_md5_twin_positions_match_duckdb_and_overestimate(spark):
    """The md5-position CMS twin (the oracle-reproducible one behind
    streaming_cms_gate): Spark and DuckDB compute IDENTICAL positions,
    and estimates are always >= the true counts."""
    import duckdb
    from pyspark.sql import functions as F

    from velostream_spark.operators.cms import (
        _pos_md5,
        cms_build_md5,
        cms_estimate_md5,
        pos_md5_sql,
    )

    keys = [1, 7, 42, 4096, 999983]
    got = (
        spark.createDataFrame([(k,) for k in keys], "k long")
        .select("k", *[_pos_md5(F.col("k"), d, 4096).alias(f"p{d}") for d in range(3)])
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        for d in range(3):
            want = con.execute(
                f"SELECT {pos_md5_sql(str(r['k']), d, 4096)}"
            ).fetchone()[0]
            assert r[f"p{d}"] == want, (r["k"], d)

    df = spark.createDataFrame(
        [(k,) for k in [1] * 30 + [2] * 5 + [3] * 1], "k long"
    )
    grid = cms_build_md5(df, "k", w=4096, d=3)
    est = {
        r["k"]: r["e"]
        for r in df.distinct()
        .select("k", cms_estimate_md5(F.col("k"), grid, 4096).alias("e"))
        .collect()
    }
    assert est[1] >= 30 and est[2] >= 5 and est[3] >= 1


def test_cms_md5_gate_plan_is_literal_probe(spark):
    """Plan pin for the CMS gate shape: the estimate+filter is a literal
    grid probe — zero Python, no join, no exchange introduced by the
    gate itself."""
    from pyspark.sql import functions as F

    from velostream_spark.operators.cms import cms_build_md5, cms_estimate_md5

    df = spark.createDataFrame([(k,) for k in range(100)], "k long")
    grid = cms_build_md5(df, "k", w=4096, d=3)
    gated = df.select(
        "k", cms_estimate_md5(F.col("k"), grid, 4096).alias("e")
    ).where(F.col("e") >= 1)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
