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
