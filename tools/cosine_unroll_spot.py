#!/usr/bin/env python
"""A/B the pair-cosine expression: interpreted higher-order functions
(zip_with + aggregate, CodegenFallback) vs the same math unrolled into
dim explicit GetArrayItem terms summed LEFT-ASSOCIATED from 0.0 — the
identical sequential order of the fold and of DuckDB list_dot_product,
but whole-stage-codegen-able (guide §1.2 per-task work).

Workload: the ann_brute_force shape — corpus x 20 broadcast queries,
exact cosine per pair (40K pairs at sf0.1), timed via noop sink.
Also verifies both expressions produce IDENTICAL rounded values.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from velostream_spark.operators import similarity
from velostream_spark.registry import tables
from velostream_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64


def dot_unrolled(a, b, dim):
    out = F.lit(0.0)
    for i in range(dim):
        out = out + a[i].cast("double") * b[i].cast("double")
    return out


def cosine_unrolled(a, b, dim):
    d = dot_unrolled(a, b, dim)
    n = F.sqrt(dot_unrolled(a, a, dim)) * F.sqrt(dot_unrolled(b, b, dim))
    return F.when(n > 0, d / n).otherwise(F.lit(0.0))


def main() -> None:
    spark = get_session("cosine-unroll-spot")
    emb = tables(spark, SF)["embeddings"]
    emb.count()

    q = emb.orderBy("vec_id").limit(20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cv")
    )
    pairs = c.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    )

    hof = pairs.select(
        "query_id", "neighbor_id",
        F.round(similarity.cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos"),
    )
    unr = pairs.select(
        "query_id", "neighbor_id",
        F.round(cosine_unrolled(F.col("_qv"), F.col("_cv"), DIM), 6).alias("cos"),
    )

    diff = hof.withColumnRenamed("cos", "c1").join(
        unr.withColumnRenamed("cos", "c2"), ["query_id", "neighbor_id"]
    ).where("c1 IS DISTINCT FROM c2").count()
    print("mismatched rounded cosines:", diff)

    for label, df in (("hof", hof), ("unrolled", unr)) * 3:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.perf_counter()-t0:.3f}s")

    spark.stop()


if __name__ == "__main__":
    main()
