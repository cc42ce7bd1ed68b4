"""Interleaved A/B for approx_count_distinct's EXACT branch (r15 verdict
task 6, guide §2.3): the fused 2-column COUNT DISTINCT plants an Expand
(×3 input rows) under one aggregate; the unfused rewrite runs one
single-distinct aggregation per key column (each planned WITHOUT Expand:
partial dedup map-side) and joins the two 3-row results.

Alternates arms per iteration in one session over the bench's multi-file
lineitem layout (the entry's AMORTIZED rep=1 input); cross-checks rows.

Usage: SPARK_GRAFT_SF_DIR=... python tools/acd_spot.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from velostream_spark.session import get_session, load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_session("acd-spot")
    t = load_tables(spark, SF_DIR, register_views=False)
    li = t["lineitem"].select("l_returnflag", "l_orderkey", "l_partkey")
    # mirror the bench's rep=1 16..32-file layout so the scan parallelizes
    import tempfile

    d = tempfile.mkdtemp(prefix="vs-acd-", dir="/dev/shm")
    li.repartition(32).write.mode("overwrite").parquet(d)
    li = spark.read.parquet(d)
    li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()

    fused = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    two_pass = (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
        .join(
            li.groupBy("l_returnflag").agg(
                F.countDistinct("l_partkey").alias("n_parts")
            ),
            "l_returnflag",
        )
    )
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, two_pass.collect()))
    print(f"rows identical = {a == b} ({a})", flush=True)

    walls = {"fused": [], "two_pass": []}
    for i in range(12):
        arm, df = ("fused", fused) if i % 2 == 0 else ("two_pass", two_pass)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls[arm].append(time.perf_counter() - t0)
    for arm, ws in walls.items():
        ws2 = ws[1:]
        print(
            f"{arm}: med={statistics.median(ws2):.3f} walls={[round(x, 3) for x in ws]}",
            flush=True,
        )
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
