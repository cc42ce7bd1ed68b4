#!/usr/bin/env python
"""Interleaved A/B spot (r15-opt): scan-heavy documents/embeddings entries
against the BASE single-row-group parquet vs a 16-file layout-normalized
copy (the bench pool's rep=1 rewrite — values bit-identical, layout only).

The base sf0.1 files are ONE parquet row group (row groups are Spark's
split unit), so every scan-side stage — regex tokenization, explode,
partial aggregation, Arrow matmuls — runs in a SINGLE task regardless of
cores. Production tables at 100 TB are always many files; the bench
already normalizes lineitem/codec entries this way (AMORTIZED rep=1).
This spot measures which remaining entries the same normalization helps.

Methodology matches bench.py: derive the DataFrame ONCE untimed per
layout (batch entries execute a prebuilt plan there too), then execute
4× to the noop sink and report the median, interleaving layouts so
machine drift hits both arms equally.

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
    "text_analysis",
    "pii_scrub",
    "repetition_filter",
    "span_dedup",
    "curation_pipeline",
    "minhash_lsh_pairs",
    "semdedup",
    "sequence_packing_ffd",
    "tfidf_topk_terms",
    "tfidf_topk_terms_join",
    "tfidf_topk_terms_auto",
    "corpus_stats",
    "corpus_stats_approx",
]

#: entry -> tables to rewrite multi-file (everything else symlinks to base)
TABLES = {"documents", "embeddings"}
N_FILES = 16


def build_norm_dir(spark, sf_dir: str) -> str:
    import tempfile

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
            dfs[t].repartition(N_FILES).write.mode("overwrite").parquet(dst)
        else:
            os.symlink(src, dst)
    return root


def main() -> None:
    from velostream_spark.registry import all_queries
    from velostream_spark.session import get_session, load_tables

    entries = sys.argv[1:] or DEFAULT_ENTRIES
    spark = get_session("layout-spot")
    catalog = all_queries()
    norm = build_norm_dir(spark, SF)
    print(f"normalized dir: {norm}")

    # warmup
    catalog["group_by_agg"].fn(spark, SF).count()

    for name in entries:
        entry = catalog[name]
        walls: dict[str, list[float]] = {"base": [], "n16": []}
        plans = {}
        for tag, d in (("base", SF), ("n16", norm)):
            load_tables(spark, d, register_views=True)
            plans[tag] = entry.fn(spark, d)
        for _ in range(4):
            for tag in ("base", "n16"):
                t0 = time.perf_counter()
                plans[tag].write.format("noop").mode("overwrite").save()
                walls[tag].append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        mb = statistics.median(walls["base"])
        mn = statistics.median(walls["n16"])
        print(
            f"{name}: base={mb:.3f} n16={mn:.3f} "
            f"({mb / mn:.2f}x)  walls base={['%.2f' % w for w in walls['base']]} "
            f"n16={['%.2f' % w for w in walls['n16']]}",
            flush=True,
        )

    import shutil

    shutil.rmtree(norm, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
