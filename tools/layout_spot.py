#!/usr/bin/env python
"""Interleaved A/B spot (r15-opt): scan-heavy documents/embeddings entries
against the BASE single-row-group parquet vs a 32-file layout-normalized
copy (the bench pool's rep=1 rewrite — values bit-identical, layout only).

The base sf0.1 files are ONE parquet row group (row groups are Spark's
split unit), so every scan-side stage — regex tokenization, explode,
partial aggregation, Arrow matmuls — runs in a SINGLE task regardless of
cores. Production tables at 100 TB are always many files; the bench
already normalizes 6 lineitem/codec entries this way (AMORTIZED rep=1).
This spot measures which remaining entries the same normalization helps.

Run AFTER pytest/bench are idle:  python tools/layout_spot.py [entry ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_ENTRIES = [
    "bigram_lm_score",
    "bigram_lm_grouped",
    "bpe_encode",
    "bpe_pair_counts",
    "simhash",
    "tfidf_topk_terms",
    "tfidf_topk_terms_join",
    "corpus_stats",
    "corpus_stats_approx",
    "heavy_hitters",
    "heavy_hitters_cms",
    "minhash_lsh_pairs",
    "gopher_quality_filter",
    "doc_chunking",
    "dedup_exact",
    "multimodal_image_stats",
    "multimodal_frame_sample",
    "ann_ivf_topk",
    "ann_brute_force_topk",
    "ann_lsh_topk",
    "pq_encode",
    "semdedup",
    "sequence_packing_ffd",
    "quality_classifier_score",
]

#: entry -> tables to rewrite multi-file (everything else symlinks to base)
TABLES = {"documents", "embeddings"}


def build_norm_dir(spark, sf_dir: str) -> str:
    import tempfile

    from pyspark.sql import functions as F  # noqa: F401

    from velostream_spark.session import TABLE_NAMES, load_tables

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="vs-layout-spot-", dir=shm)
    dfs = load_tables(spark, sf_dir, register_views=False)
    for t in TABLE_NAMES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        dst = os.path.join(root, f"{t}.parquet")
        if t in TABLES:
            dfs[t].repartition(32).write.mode("overwrite").parquet(dst)
        else:
            os.symlink(src, dst)
    return root


def main() -> None:
    from velostream_spark.registry import all_queries
    from velostream_spark.session import get_session

    entries = sys.argv[1:] or DEFAULT_ENTRIES
    spark = get_session("layout-spot")
    catalog = all_queries()
    norm = build_norm_dir(spark, SF)
    print(f"normalized dir: {norm}")

    # warmup
    catalog["group_by_agg"].fn(spark, SF).count()

    for name in entries:
        entry = catalog[name]
        walls: dict[str, list[float]] = {"base": [], "norm": []}
        plans = {}
        for _ in range(4):
            for tag, d in (("base", SF), ("norm", norm)):
                t0 = time.perf_counter()
                df = entry.fn(spark, d)
                df.write.format("noop").mode("overwrite").save()
                walls[tag].append(time.perf_counter() - t0)
                plans[tag] = df
                spark.catalog.clearCache()
        mb = statistics.median(walls["base"])
        mn = statistics.median(walls["norm"])
        print(
            f"{name}: base={mb:.3f} norm={mn:.3f} "
            f"({mb / mn:.2f}x)  walls base={['%.2f' % w for w in walls['base']]} "
            f"norm={['%.2f' % w for w in walls['norm']]}"
        )

    import shutil

    shutil.rmtree(norm, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
