#!/usr/bin/env python
"""Measure the decontamination gate's BENCHMARK-SET broadcast ceiling
(r12 verdict task 7): the gate broadcasts the benchmark set B to every
task — fine for eval sets (thousands of vectors), but B grows with the
number of eval suites and the broadcast must stop somewhere. This sweep
replicates B (vec_ids shifted, vectors perturbed per replica so cells
stay populated and rows don't collapse) and times the verdict LEFT ANTI
join at each size under BOTH strategies:

- broadcast: the entry's default (F.broadcast(b) — one copy per task,
  zero shuffle of the stream side);
- shuffled: no hint, statistics force a shuffled join on the cell
  equality with the cosine as residual (the at-scale fallback: both
  sides exchange on _cell, candidates stay cell-bounded).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/decontam_ceiling.py [factors...]
Prints one row per factor: |B| rows, est. MB, broadcast wall, shuffled
wall (seconds, steady min of 2 after warm). The measured crossover feeds
DECONTAM_BROADCAST_MAX_ROWS in queries/multimodal_queries.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_sides(spark, sf_dir: str, factor: int):
    from velostream_spark.operators import similarity
    from velostream_spark.session import load_tables

    emb = load_tables(spark, sf_dir, register_views=False)["embeddings"]
    cents = similarity.ivf_centroids(emb, "embedding", "vec_id", 8)
    base_b = emb.where(F.col("vec_id") % 5 == 0)
    n_base = base_b.count()
    if factor > 1:
        reps = spark.range(factor).select(F.col("id").alias("rep"))
        # shift ids; perturb ONE component per replica so replicas are not
        # bit-identical rows (the broadcast hash table stores them all)
        base_b = base_b.crossJoin(F.broadcast(reps)).select(
            (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + F.when(
                    i == F.col("rep") % 64, F.col("rep") * F.lit(1e-6)
                ).otherwise(F.lit(0.0)),
            ).alias("embedding"),
        )
    b = (
        similarity.ivf_assign(base_b, cents, out_id="b_id", out_vec="b_v")
        .withColumnsRenamed({"_cell": "b_cell"})
        .withColumn(
            "b_norm",
            F.sqrt(F.aggregate("b_v", F.lit(0.0), lambda a, x: a + x * x)),
        )
    )
    a = (
        similarity.ivf_assign(
            emb.where(F.col("vec_id") % 5 != 0), cents,
            out_id="vec_id", out_vec="a_v",
        )
        .withColumn(
            "a_norm",
            F.sqrt(F.aggregate("a_v", F.lit(0.0), lambda a_, x: a_ + x * x)),
        )
        # the production stream side is many-partitioned; without this the
        # broadcast plan runs on A's 1-2 input partitions and the sweep
        # would measure task-count skew, not join strategy
        .repartition(32)
    )
    return a, b, n_base * factor


def verdict(a, b, thr: float, strategy: str):
    dot = F.aggregate(
        F.zip_with("a_v", "b_v", lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(
        F.when(F.col("a_norm") * F.col("b_norm") > 0,
               dot / (F.col("a_norm") * F.col("b_norm"))).otherwise(0.0), 6,
    )
    hit = (F.col("_cell") == F.col("b_cell")) & (cos >= F.lit(thr))
    rhs = F.broadcast(b) if strategy == "broadcast" else b
    return a.join(rhs, hit, "left_anti").select("vec_id", "_cell")


def main() -> None:
    from velostream_spark.session import get_session

    factors = [int(x) for x in sys.argv[1:]] or [1, 16, 128, 512, 2048]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("decontam-ceiling")
    dim = 64
    print(f"{'factor':>6s} {'B_rows':>9s} {'est_MB':>7s} "
          f"{'broadcast_s':>11s} {'shuffled_s':>10s} plan_bcast plan_shuf",
          flush=True)
    for f_ in factors:
        a, b, n_b = build_sides(spark, sf_dir, f_)
        b = b.cache()
        b.count()  # index build happens once, outside the timed join
        walls = {}
        plans = {}
        for strat in ("broadcast", "shuffled"):
            v = verdict(a, b, 0.3, strat)
            plan = v._jdf.queryExecution().executedPlan().toString()
            plans[strat] = (
                "BroadcastHashJoin" if "BroadcastHashJoin" in plan
                else "SortMergeJoin" if "SortMergeJoin" in plan
                else "ShuffledHashJoin" if "ShuffledHashJoin" in plan
                else "BroadcastNestedLoop" if "BroadcastNestedLoopJoin" in plan
                else "?"
            )
            v.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            v.write.format("noop").mode("overwrite").save()
            walls[strat] = time.perf_counter() - t0
        est_mb = n_b * dim * 8 / 1e6
        print(f"{f_:>6d} {n_b:>9d} {est_mb:>7.1f} "
              f"{walls['broadcast']:>11.2f} {walls['shuffled']:>10.2f} "
              f"{plans['broadcast']} {plans['shuffled']}", flush=True)
        b.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
