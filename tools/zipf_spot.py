"""Fixed-vocabulary Zipf corpus spot: the regime scale_spot.py CANNOT show.

scale_spot.py replicates real documents with a unique per-replica suffix,
so the distinct-bigram vocabulary grows ~linearly with the corpus — that
growth flattens the window strategy's hot-key term (postings dilute over
ever more distinct bigrams) and inflates the grouped strategy's
vocabulary-sized model, inverting the 512x crossover at 1024x (PERF.md).

Real text does the opposite: the vocabulary is FIXED while postings grow
with the corpus — a stopword's `SUM(cnt) OVER (PARTITION BY prev)` group
lands in ONE task and grows without bound. This tool synthesizes that
regime deterministically: documents of words drawn log-uniformly (a
Zipf-like rank distribution, exponent ~1) from a CONSTANT 10k vocabulary,
then times bigram_lm_score (window) vs bigram_lm_grouped (join) as the
corpus grows at fixed vocabulary.

The same fixture answers tfidf's regime question (r11 verdict task 6):
tfidf_topk_terms (window form) vs tfidf_topk_terms_join (grouped-join
form) — the df-count hot key here is the stopword's document frequency.

Usage: python tools/zipf_spot.py [query,query] [n_docs ...]
  (defaults: bigram_lm_score,bigram_lm_grouped over 40000 320000 1280000;
   non-integer args are the comma-separated query list)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.scale_spot import steady_min

VOCAB = 10_000
WORDS_PER_DOC = 100


def build_zipf_docs(spark, n_docs: int, root: str) -> str:
    """documents.parquet of n_docs synthetic docs over the FIXED vocab.

    Word ranks are log-uniform: rank = floor(V^u) with u in [0,1) from a
    per-(doc, position) xxhash64 — P(rank <= r) = ln(r)/ln(V), i.e. a
    Zipf(s~=1) head: rank 0 ('w0') appears in ~every doc, the way 'the'
    does. Deterministic, scan-side generation — no data files shipped."""
    d = os.path.join(root, f"zipf_{n_docs}")
    os.makedirs(d)
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.floor(
                            F.pow(
                                F.lit(float(VOCAB)),
                                F.pmod(
                                    F.xxhash64(
                                        F.col("id") * WORDS_PER_DOC + i, F.lit(7)
                                    ),
                                    F.lit(1_000_000),
                                ).cast("double")
                                / 1_000_000.0,
                            )
                        ).cast("long")
                        - 1,
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("zipf"))
        .withColumn("n_chars", F.length("text"))
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    # symlink the remaining tables so session.load_tables resolves them
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from velostream_spark.session import TABLE_NAMES

    for t in TABLE_NAMES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if t != "documents" and os.path.exists(src):
            os.symlink(src, os.path.join(d, f"{t}.parquet"))
    return d


def main() -> None:
    names = ("bigram_lm_score", "bigram_lm_grouped")
    sizes: list[int] = []
    for a in sys.argv[1:]:
        if a.replace("_", "").isdigit():
            sizes.append(int(a))
        else:
            names = tuple(a.split(","))
    sizes = sizes or [40_000, 320_000, 1_280_000]
    from velostream_spark.registry import all_queries
    from velostream_spark.session import get_session

    spark = get_session("zipf-spot")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="vs-zipf-spot-", dir=shm)
    qs = all_queries()
    try:
        dirs = {n: build_zipf_docs(spark, n, root) for n in sizes}
        print(f"{'query':24s} " + " ".join(f"{n:>9d}" for n in sizes))
        for name in names:
            walls = [
                steady_min(lambda d=dirs[n]: qs[name].fn(spark, d)) for n in sizes
            ]
            print(f"{name:24s} " + " ".join(f"{w:9.3f}" for w in walls))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
