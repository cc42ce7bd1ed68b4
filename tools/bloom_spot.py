"""Measure bloom_anti_join's stage_a fast path (PERF.md table).

The cross-corpus dedup entry derives its key as md5(normalize(text)) —
an expression the anti-join's TWO output branches each re-evaluate from
the scan (the documented two-scans-vs-shuffle trade). ``stage_a=True``
localCheckpoints A once so both branches read materialized rows. This
spot times both forms on the scale_spot-replicated corpus and prints the
delta; the result decides the entry's default and the docstring's
100-TB advice (a STORED fingerprint column needs no staging at all).

Usage: python tools/bloom_spot.py [reps ...]   (default: 1 128)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.scale_spot import replicate_docs, steady_min


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 128]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from velostream_spark.operators import bloom
    from velostream_spark.operators import textops
    from velostream_spark.session import get_session, load_tables

    spark = get_session("bloom-spot")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="vs-bloom-spot-", dir=shm)

    def build(d: str, stage_a: bool):
        docs = load_tables(spark, d, register_views=False)["documents"]
        fp = docs.select(
            "doc_id", F.md5(textops.normalize(F.col("text"))).alias("fp")
        )
        a = fp.where(F.col("doc_id") % 7 != 0)
        b = fp.where(F.col("doc_id") % 7 == 0)
        return bloom.bloom_anti_join(a, b, "fp", k=5, stage_a=stage_a)

    def build_stored(d: str):
        # the 100-TB shape: fingerprint already a STORED column — write it
        # once (untimed, below) and anti-join over the materialized table
        stored = os.path.join(d, "documents_fp.parquet")
        docs = spark.read.parquet(stored)
        a = docs.where(F.col("doc_id") % 7 != 0)
        b = docs.where(F.col("doc_id") % 7 == 0)
        return bloom.bloom_anti_join(a, b, "fp", k=5)

    try:
        dirs = {r: replicate_docs(spark, sf_dir, r, root) for r in reps}
        for d in dirs.values():  # untimed fingerprint materialization
            docs = load_tables(spark, d, register_views=False)["documents"]
            docs.select(
                "doc_id", F.md5(textops.normalize(F.col("text"))).alias("fp")
            ).write.mode("overwrite").parquet(
                os.path.join(d, "documents_fp.parquet")
            )
        print(f"{'variant':28s} " + " ".join(f"{r:>3d}x_wall" for r in reps))
        for label, fn in (
            ("derived (two scans)", lambda d: build(d, False)),
            ("derived + stage_a", lambda d: build(d, True)),
            ("stored fp column", build_stored),
        ):
            walls = [steady_min(lambda d=dirs[r]: fn(d)) for r in reps]
            print(f"{label:28s} " + " ".join(f"{w:8.3f}" for w in walls))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
