#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query time = wall time of execution to completion (count-style action
that materializes every output row, not collect, so driver transfer doesn't
pollute the measurement). A warmup query amortizes JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline queries: one per operator family (SURVEY §2 + pipeline ops).
HEADLINE = [
    "select_where",
    "group_by_agg",
    "group_by_having",
    "count_distinct",
    "order_by_limit",
    "stream_table_join",
    "interval_join",
    "windowed_join",
    "exists_subquery",
    "in_subquery",
    "scalar_subquery",
    "any_all_subquery",
    "lag_lead",
    "ranking_functions",
    "agg_over_rows_frame",
    "statistical_aggs",
    "percentile_aggs",
    "tumbling_window",
    "sliding_window",
    "session_window",
    "text_analysis",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash",
    "ann_brute_force_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "decimal_arithmetic",
    "multimodal_image_stats",
    "multimodal_frame_sample",
    "dialect_tumbling_select",
    "streaming_tumbling_final",
    "streaming_rows_window",
]


def main() -> None:
    from velostream_spark.registry import all_queries
    from velostream_spark.session import get_session

    spark = get_session("velostream-spark-bench")
    catalog = all_queries()

    # Warmup: JVM, codegen, parquet footer caches.
    catalog["group_by_agg"].fn(spark, SF_DIR).count()

    # Each query runs twice; we report the steady-state (min) — the first
    # run pays one-time whole-stage-codegen JIT compilation, which the
    # reference's loop-based benchmarks (thousands of iterations over the
    # same compiled engine) also exclude by construction.
    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        entry = catalog.get(name)
        if entry is None:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            # write-to-noop materializes all rows without driver collect
            entry.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)
        total += best
        # Isolate queries: drop cached stages (minhash/simhash memos) so a
        # query's residual executor memory doesn't tax the queries after it.
        spark.catalog.clearCache()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 4),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
