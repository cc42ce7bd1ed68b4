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
