"""Decompose the three approx sketch twins' walls (guide §1: measure first).

Times each sub-branch of approx_count_distinct / hypertable_rollup_approx /
corpus_stats_approx in isolation through the noop sink, comparing the
HyperLogLog++ `approx_count_distinct(rsd=0.01)` branch (p=14 -> a 1536-long
fixed-width aggregation buffer PER SKETCH inside HashAggregate codegen)
against the Datasketches `hll_sketch_agg(col, 14)` equivalent (one growable
BINARY buffer via ObjectHashAggregate).  Identical estimator family and
precision (lgK 14 == rsd 0.0081 <= 0.01), so the 4x-rsd within_bound
validation band is unchanged.

Usage: SPARK_GRAFT_SF_DIR=... python tools/hll_spot.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from velostream_spark.registry import all_queries  # noqa: E402
from velostream_spark.session import get_session, load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bench(spark, name, df, runs=4):
    walls = []
    for _ in range(runs):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    import statistics

    print(
        f"{name:55s} med={statistics.median(walls):6.3f} "
        f"min={walls[0]:6.3f} walls={[round(w, 3) for w in walls]}",
        flush=True,
    )


def main():
    spark = get_session("hll-spot")
    t = load_tables(spark, SF_DIR, register_views=False)
    li = t["lineitem"]
    ev = t["events"]

    # warmup
    li.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()

    # --- approx_count_distinct decomposition -------------------------------
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    bench(spark, "acd/exact 2-col COUNT(DISTINCT) branch", exact)

    hllpp = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("_ao"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("_ap"),
    )
    bench(spark, "acd/HLL++ rsd=0.01 branch (current)", hllpp)

    hllpp1 = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("_ao"),
    )
    bench(spark, "acd/HLL++ rsd=0.01 ONE column", hllpp1)

    ds = li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey", F.lit(14))).alias("_ao"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey", F.lit(14))).alias("_ap"),
    )
    bench(spark, "acd/Datasketches lgK=14 branch (candidate)", ds)

    full = all_queries()["approx_count_distinct"].fn(spark, SF_DIR)
    bench(spark, "acd/FULL entry (current)", full)

    # --- hypertable_rollup_approx sketch branch ----------------------------
    evp = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
        "event_type",
        "user_id",
    )
    sk_pp = evp.rollup("bucket_hour", "event_type").agg(
        F.grouping_id().alias("_gid"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("_ua"),
    )
    bench(spark, "rollup/HLL++ rsd=0.01 sketch branch (current)", sk_pp)

    sk_ds = evp.rollup("bucket_hour", "event_type").agg(
        F.grouping_id().alias("_gid"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("_ua"),
    )
    bench(spark, "rollup/Datasketches lgK=14 sketch branch", sk_ds)

    full = all_queries()["hypertable_rollup_approx"].fn(spark, SF_DIR)
    bench(spark, "rollup/FULL entry (current)", full)

    exact_r = all_queries()["hypertable_rollup"].fn(spark, SF_DIR)
    bench(spark, "rollup/exact twin (reference point)", exact_r)

    # --- corpus_stats_approx sketch branch ---------------------------------
    from velostream_spark.operators import textops

    d = t["documents"].select(
        "lang",
        "source",
        F.md5(textops.normalize(F.col("text"))).alias("fp"),
    )
    cs_pp = d.rollup("lang", "source").agg(
        F.grouping_id().alias("_gid"),
        F.approx_count_distinct("fp", rsd=0.01).alias("_afp"),
    )
    bench(spark, "corpus/HLL++ rsd=0.01 sketch branch (current)", cs_pp)

    cs_ds = d.rollup("lang", "source").agg(
        F.grouping_id().alias("_gid"),
        F.hll_sketch_estimate(F.hll_sketch_agg("fp", F.lit(14))).alias("_afp"),
    )
    bench(spark, "corpus/Datasketches lgK=14 sketch branch", cs_ds)

    full = all_queries()["corpus_stats_approx"].fn(spark, SF_DIR)
    bench(spark, "corpus/FULL entry (current)", full)

    # Estimator agreement check: both must sit inside the 4x-rsd band.
    print("\n--- estimates (sanity) ---")
    for row in (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact"),
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("hllpp"),
            F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey", F.lit(14))).alias("ds"),
        )
        .collect()
    ):
        print(row)
    spark.stop()


if __name__ == "__main__":
    main()
