"""skewagg.attach_group_agg: the window|join strategy switch shared by
tfidf_topk_terms and bigram_lm_score. Both strategies must attach
IDENTICAL totals (the parity mirror already pins both against the same
DuckDB oracle at the gate scale; these are the direct, self-contained
equality pins plus the helper's own contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from velostream_spark.operators.skewagg import attach_group_agg


def test_attach_group_agg_strategies_agree(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 5), ("b", 7), ("c", 11)], "k string, v int"
    )
    wrows = sorted(
        map(tuple, attach_group_agg(df, ["k"], F.sum("v"), "tot", "window").collect())
    )
    jrows = sorted(
        map(tuple, attach_group_agg(df, ["k"], F.sum("v"), "tot", "join").collect())
    )
    assert wrows == jrows
    assert wrows == [("a", 1, 4), ("a", 3, 4), ("b", 5, 12), ("b", 7, 12), ("c", 11, 11)]


def test_attach_group_agg_precomputed_totals_and_bad_strategy(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    totals = spark.createDataFrame([("a", 100), ("b", 200)], "k string, tot int")
    rows = sorted(
        map(tuple, attach_group_agg(df, ["k"], F.sum("v"), "tot", "join", totals=totals).collect())
    )
    assert rows == [("a", 1, 100), ("b", 2, 200)]
    with pytest.raises(ValueError, match="strategy"):
        attach_group_agg(df, ["k"], F.sum("v"), "tot", "sort")


def test_bigram_and_tfidf_strategy_twins_bit_equal(spark):
    """The catalog twins produce IDENTICAL collected results at SF_SMOKE —
    the direct form of the shared-oracle guarantee (rounding happens once,
    identically, in both strategies)."""
    from velostream_spark.registry import all_queries

    qs = all_queries()
    for a, b in (
        ("bigram_lm_score", "bigram_lm_grouped"),
        ("tfidf_topk_terms", "tfidf_topk_terms_join"),
    ):
        ra = sorted(map(tuple, qs[a].fn(spark, SF_SMOKE).collect()))
        rb = sorted(map(tuple, qs[b].fn(spark, SF_SMOKE).collect()))
        assert ra == rb and len(ra) > 0, (a, b)


def test_choose_strategy_routes_by_max_posting(spark):
    """r13 verdict task 5: the router probes the hottest key posting —
    open-vocab (every key near-unique) stays on the measured-winner
    window form; a fixed-vocab hot key past the task budget routes to
    the skew-safe join form."""
    from velostream_spark.operators.skewagg import choose_group_attach_strategy

    open_vocab = spark.createDataFrame(
        [(f"w{i}", 1) for i in range(500)], "k string, v int"
    )
    s, mx, _ = choose_group_attach_strategy(open_vocab, ["k"])
    assert (s, mx) == ("window", 1)
    hot = spark.createDataFrame(
        [("the", i) for i in range(400)] + [("rare", 0)], "k string, v int"
    )
    # same frame, two budgets: the regime is the posting-vs-budget ratio
    s_small, mx_hot, _ = choose_group_attach_strategy(hot, ["k"], task_budget_rows=100)
    s_large, _, _ = choose_group_attach_strategy(hot, ["k"], task_budget_rows=1000)
    assert mx_hot == 400
    assert s_small == "join" and s_large == "window"


def _n_joins(df) -> int:
    return df._jdf.queryExecution().optimizedPlan().toString().count("Join")


def test_auto_entries_match_winner_plan_and_rows(spark):
    """The auto entries must produce the SAME rows as both twins (shared
    oracle) and, on this corpus (postings far below the task budget), the
    SAME plan shape as the measured winner — the window twin: no extra
    totals join in the optimized plan."""
    from velostream_spark.registry import all_queries

    qs = all_queries()
    for auto, window_twin, join_twin in (
        ("tfidf_topk_terms_auto", "tfidf_topk_terms", "tfidf_topk_terms_join"),
        ("bigram_lm_auto", "bigram_lm_score", "bigram_lm_grouped"),
    ):
        a = qs[auto].fn(spark, SF_SMOKE)
        w = qs[window_twin].fn(spark, SF_SMOKE)
        j = qs[join_twin].fn(spark, SF_SMOKE)
        assert _n_joins(a) == _n_joins(w) < _n_joins(j), auto
        ra = sorted(map(tuple, a.collect()))
        assert ra == sorted(map(tuple, w.collect())) and len(ra) > 0, auto


def test_bigram_auto_routes_to_join_past_budget(spark):
    """The join regime end-to-end: a replicated hot-context corpus with a
    tiny injected budget routes the SAME pipeline to the grouped form and
    the result still matches the window form bit-for-bit."""
    from velostream_spark.operators.skewagg import (
        attach_group_agg,
        choose_group_attach_strategy,
    )

    tfb = spark.createDataFrame(
        [(d, "the", f"w{d % 7}", 3) for d in range(300)]
        + [(d, f"p{d}", "x", 1) for d in range(20)],
        "doc_id int, prev string, cur string, cnt int",
    )
    s, mx, per_key = choose_group_attach_strategy(tfb, ["prev"], task_budget_rows=100)
    assert s == "join" and mx == 300
    cols = ["doc_id", "prev", "cur", "cnt", "cp"]
    out_j = attach_group_agg(tfb, ["prev"], F.sum("cnt"), "cp", "join").select(*cols)
    out_w = attach_group_agg(tfb, ["prev"], F.sum("cnt"), "cp", "window").select(*cols)
    assert sorted(map(tuple, out_j.collect())) == sorted(map(tuple, out_w.collect()))
