"""Session-level table memo (session._TABLE_MEMO): repeated load_tables
calls must reuse the analyzed DataFrame (no per-call parquet re-listing),
but a table REWRITTEN in place must be re-read — the memo key carries the
file mtime, so staleness is impossible by construction.
"""

from __future__ import annotations

import os

from velostream_spark.session import load_tables


def test_table_memo_reuses_dataframe(spark, tmp_path):
    d = str(tmp_path)
    spark.range(5).toDF("l_orderkey").write.parquet(
        os.path.join(d, "lineitem.parquet")
    )
    a = load_tables(spark, d, register_views=False)["lineitem"]
    b = load_tables(spark, d, register_views=False)["lineitem"]
    assert a is b  # same analyzed DataFrame — no second listing


def test_table_memo_rereads_after_rewrite(spark, tmp_path):
    d = str(tmp_path)
    p = os.path.join(d, "lineitem.parquet")
    spark.range(5).toDF("l_orderkey").write.parquet(p)
    assert load_tables(spark, d, register_views=False)["lineitem"].count() == 5
    spark.range(9).toDF("l_orderkey").write.mode("overwrite").parquet(p)
    got = load_tables(spark, d, register_views=False)["lineitem"]
    assert got.count() == 9  # rewritten table must not be served stale
