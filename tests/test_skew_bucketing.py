"""Skew/bucketing utilities: correctness of two-phase salted aggregation &
salted joins, and the plan-level guarantee that bucketed joins run with no
exchange (the co-location story at 100 TB)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from velostream_spark.operators.skew import (
    bucketed_write,
    salted_agg,
    salted_join,
)
from velostream_spark.session import load_tables


def test_salted_agg_matches_plain_groupby(spark):
    li = load_tables(spark, SF_SMOKE, register_views=False)["lineitem"]
    got = (
        salted_agg(
            li,
            ["l_returnflag"],
            {
                "total_qty": ("sum", "l_quantity"),
                "n": ("count", "l_quantity"),
                "min_price": ("min", "l_extendedprice"),
                "max_price": ("max", "l_extendedprice"),
                "avg_disc": ("avg", "l_discount"),
            },
            n_salts=8,
        )
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    want = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.count("l_quantity").alias("n"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.avg("l_discount").alias("avg_disc"),
        )
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    assert got["n"].equals(want["n"])
    assert (got["total_qty"] - want["total_qty"]).abs().max() < 1e-6
    assert got["min_price"].equals(want["min_price"])
    assert got["max_price"].equals(want["max_price"])
    assert (got["avg_disc"] - want["avg_disc"]).abs().max() < 1e-9


def test_salted_join_matches_plain_join(spark):
    t = load_tables(spark, SF_SMOKE, register_views=False)
    li, orders = t["lineitem"], t["orders"]
    got = salted_join(
        li.select("l_orderkey", "l_quantity"),
        orders.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"),
        "l_orderkey",
        n_salts=4,
        big_salt_on="l_quantity",
    )
    want = li.select("l_orderkey", "l_quantity").join(
        orders.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"),
        "l_orderkey",
    )
    assert got.count() == want.count()
    g = got.groupBy("o_orderstatus").count().toPandas().set_index("o_orderstatus")
    w = want.groupBy("o_orderstatus").count().toPandas().set_index("o_orderstatus")
    assert g.sort_index()["count"].equals(w.sort_index()["count"])


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    t = load_tables(spark, SF_SMOKE, register_views=False)
    bucketed_write(
        t["orders"].select("o_orderkey", "o_orderstatus"),
        "b_orders", "o_orderkey", 8, sort_by="o_orderkey",
        path=str(tmp_path / "b_orders"),
    )
    bucketed_write(
        t["lineitem"].select("l_orderkey", "l_quantity"),
        "b_lineitem", "l_orderkey", 8, sort_by="l_orderkey",
        path=str(tmp_path / "b_lineitem"),
    )
    a = spark.table("b_lineitem")
    b = spark.table("b_orders")
    joined = a.join(b, a.l_orderkey == b.o_orderkey)
    # disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert joined.count() == t["lineitem"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _hot_band_corpus(spark, n_dups: int, n_unique: int):
    """Documents where `n_dups` docs share one boilerplate text (one hot
    LSH band with n_dups members) plus n_unique distinct docs."""
    hot = [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(n_dups)]
    cold = [
        (n_dups + i, f"unique document number {i} with its own words {i * 7} {i * 13}")
        for i in range(n_unique)
    ]
    return spark.createDataFrame(hot + cold, "doc_id long, text string")


def test_minhash_hot_band_salted_pairs_match_unsalted(spark):
    """A deliberately hot band (200 identical docs → 19 900 pairs in one
    band key) must produce the IDENTICAL pair set through the salted split
    as through the plain join, and the salted plan must (a) join the hot
    subset on (band, salt) and (b) broadcast the hot band keys."""
    from velostream_spark.operators import dedup

    df = _hot_band_corpus(spark, n_dups=200, n_unique=100)
    stage = dedup.minhash_stage(df, "text", "doc_id")
    try:
        plain = dedup.minhash_pairs_from_stage(stage, 0.5, hot_band_threshold=None)
        salted = dedup.minhash_pairs_from_stage(
            stage, 0.5, hot_band_threshold=50, n_salts=8
        )
        p = {(r.id_a, r.id_b) for r in plain.select("id_a", "id_b").collect()}
        s = {(r.id_a, r.id_b) for r in salted.select("id_a", "id_b").collect()}
        assert p == s and len(p) == 200 * 199 // 2

        explained = io.StringIO()
        with contextlib.redirect_stdout(explained):
            salted.explain("formatted")
        plan = explained.getvalue()
        assert "_salt" in plan, "hot-band join not salted"
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
            "hot band keys not broadcast"
        )
    finally:
        stage.unpersist()


def test_minhash_hot_band_salted_wall_within_2x_of_uniform(spark):
    """The salted hot-band path must keep a skewed corpus within ~2× the
    wall of a uniform corpus of the same total pair work (the reducer that
    used to own the whole m² band now owns m²/n_salts)."""
    import time

    from velostream_spark.operators import dedup

    # Uniform: 8 bands × 50 members each ≈ same total pair count as one
    # hot band of ~141 members; both corpora ~400 docs.
    hot_df = _hot_band_corpus(spark, n_dups=141, n_unique=260)
    groups = [
        (g * 1000 + i, f"shared boilerplate text of group {g} repeated through the corpus")
        for g in range(8)
        for i in range(50)
    ]
    uniform_df = spark.createDataFrame(groups, "doc_id long, text string")

    def wall(df, **kw):
        stage = dedup.minhash_stage(df, "text", "doc_id")
        try:
            stage.count()  # materialize the persisted stage outside the clock
            t0 = time.monotonic()
            dedup.minhash_pairs_from_stage(stage, 0.5, **kw).count()
            return time.monotonic() - t0
        finally:
            stage.unpersist()

    uniform = wall(uniform_df, hot_band_threshold=None)
    salted_hot = wall(hot_df, hot_band_threshold=50, n_salts=8)
    # generous 3x bound: local-mode scheduling noise dominates at this size,
    # the structural claim (no single m^2 reducer) is pinned by the plan test
    assert salted_hot <= max(3.0 * uniform, uniform + 2.0), (
        f"salted hot-band wall {salted_hot:.2f}s vs uniform {uniform:.2f}s"
    )
