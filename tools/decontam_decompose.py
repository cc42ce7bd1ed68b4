#!/usr/bin/env python
"""Decompose streaming_decontam_gate's wall (guide §1): index-build
prologue (fused agg + ivf_centroids jobs) vs the streaming job itself,
and an A/B of the anti-join's pair cosine expressed as interpreted
higher-order functions (zip_with+aggregate) vs the same math unrolled
into 64 codegen-able terms (identical left-to-right summation order).

Run AFTER pytest/bench are idle:  python tools/decontam_decompose.py
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


def main() -> None:
    spark = get_session("decontam-decompose")
    emb = tables(spark, SF)["embeddings"]
    emb.count()  # warm scan

    # -- prologue timing (per fn() invocation today) --------------------
    for trial in range(3):
        t0 = time.perf_counter()
        lo, hi, n_b = emb.agg(
            F.min("vec_id"), F.max("vec_id"),
            F.count(F.when(F.col("vec_id") % 5 == 0, F.lit(1))),
        ).first()
        t1 = time.perf_counter()
        cents = similarity.ivf_centroids(
            emb, "embedding", "vec_id", 8, id_minmax=(lo, hi)
        )
        t2 = time.perf_counter()
        print(f"prologue[{trial}]: agg {t1-t0:.3f}s  centroids {t2-t1:.3f}s")

    # -- full entry wall, decomposed -------------------------------------
    from velostream_spark.queries.multimodal_queries import (
        streaming_decontam_gate,
    )

    for trial in range(3):
        t0 = time.perf_counter()
        out = streaming_decontam_gate(spark, SF)
        t1 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(f"entry[{trial}]: fn(streaming job) {t1-t0:.3f}s  readback {t2-t1:.3f}s")

    spark.stop()


if __name__ == "__main__":
    main()
