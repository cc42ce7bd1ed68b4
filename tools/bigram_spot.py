"""Decompose the bigram_lm family's wall (guide §1).

Stages timed separately through the noop sink at sf0.1:
  1. tokenize only          — words(text) per doc (regex cost)
  2. tokenize+filter twice  — the entry's current token_count filter +
                              re-tokenize shape vs the single-pass
                              size(ws)>=2 shape
  3. bigram explode + tfb   — per-doc (prev,cur) counts
  4. full entries           — window / join strategies

Usage: SPARK_GRAFT_SF_DIR=... python tools/bigram_spot.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from velostream_spark.operators import textops  # noqa: E402
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
    print(
        f"{name:58s} med={statistics.median(walls):6.3f} min={walls[0]:6.3f} "
        f"walls={[round(w, 3) for w in walls]}",
        flush=True,
    )


def main():
    spark = get_session("bigram-spot")
    t = load_tables(spark, SF_DIR, register_views=False)
    docs = t["documents"]
    docs.groupBy("lang").count().write.format("noop").mode("overwrite").save()

    bench(spark, "tokenize only: words(text)", docs.select("doc_id", textops.words(F.col("text")).alias("ws")))
    bench(
        spark,
        "tokenize DIRECT split(lower(trim), \\s+)",
        docs.select("doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("ws")),
    )

    cur = docs.where(textops.token_count(F.col("text")) >= 2).select(
        "doc_id", textops.words(F.col("text")).alias("ws")
    )
    bench(spark, "entry shape: filter token_count>=2 THEN words", cur)

    single = docs.select(
        "doc_id", textops.words(F.col("text")).alias("ws")
    ).where(F.size("ws") >= 2)
    bench(spark, "single-pass: words THEN size(ws)>=2", single)

    def bigrams(staged):
        bg = staged.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("ws"), i).alias("prev"),
                        F.element_at(F.col("ws"), i + 1).alias("cur"),
                    ),
                )
            ).alias("p"),
        ).select("doc_id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
        return bg.groupBy("doc_id", "prev", "cur").agg(F.count(F.lit(1)).alias("cnt"))

    bench(spark, "tfb (entry shape upstream)", bigrams(cur))
    bench(spark, "tfb (single-pass upstream)", bigrams(single))

    qs = all_queries()
    for name in ("bigram_lm_score", "bigram_lm_grouped"):
        bench(spark, f"FULL {name}", qs[name].fn(spark, SF_DIR))
    spark.stop()


if __name__ == "__main__":
    main()
