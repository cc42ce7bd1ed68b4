"""Interleaved A/B for the r16 one-exchange restructures (guide §2.4):

- tfidf window form: OLD = groupBy(doc,word) exchange + full-|tf|
  hash(word) exchange for the df window; NEW = one hash(word)
  repartition of the exploded tokens serving both.
- bigram window form: OLD = groupBy(doc,prev,cur) exchange + (prev,cur)
  + (prev) window exchanges, V from a full tfb re-run; NEW = one
  hash(prev) repartition serving agg + both windows, V from a
  slice-explode distinct.

Alternates arms per iteration in ONE session (machine drift hits both),
times execution of a prebuilt plan (bench methodology: derive once,
noop-sink per run), prints medians. Also cross-checks the two arms'
collected rows are identical.

Usage: SPARK_GRAFT_SF_DIR=... python tools/onex_spot.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from velostream_spark.operators import textops  # noqa: E402
from velostream_spark.session import get_session, load_tables  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def tfidf(spark, docs, new: bool):
    w = (
        docs.select("doc_id", F.explode(textops.words(F.col("text"))).alias("word"))
        .where(F.length("word") > 0)
    )
    base = w.repartition("word") if new else w
    tf = base.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    nd = docs.where(F.trim(F.col("text")) != "").agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("word")))
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("score"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("word"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= 3)
        .select("doc_id", "word", "rank", "score")
    )


def bigram(spark, docs, new: bool):
    staged = docs.select("doc_id", textops.words(F.col("text")).alias("ws"))
    bg = staged.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("ws"), i).alias("prev"),
                        F.element_at(F.col("ws"), i + 1).alias("cur"),
                    ),
                ),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    base = bg.repartition("prev") if new else bg
    tfb = base.groupBy("doc_id", "prev", "cur").agg(F.count(F.lit(1)).alias("cnt"))
    if new:
        v = (
            staged.select(
                F.explode(
                    F.when(F.size("ws") >= 2, F.slice(F.col("ws"), 2, F.size("ws") - 1))
                ).alias("cur")
            ).agg(F.countDistinct("cur").alias("v"))
        )
    else:
        v = tfb.agg(F.countDistinct("cur").alias("v"))
    counted = tfb.withColumn(
        "cb", F.sum("cnt").over(Window.partitionBy("prev", "cur"))
    ).withColumn("cp", F.sum("cnt").over(Window.partitionBy("prev")))
    scored = counted.crossJoin(F.broadcast(v)).select(
        "doc_id",
        "cnt",
        F.log(
            (F.col("cb").cast("double") + F.lit(0.5))
            / (F.col("cp").cast("double") + F.lit(0.5) * F.col("v").cast("double"))
        ).alias("lp"),
    )
    return scored.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        F.round(
            F.sum(F.col("cnt").cast("double") * F.col("lp"))
            / F.sum("cnt").cast("double"),
            6,
        ).alias("logprob"),
    )


def main():
    spark = get_session("onex-spot")
    t = load_tables(spark, SF_DIR, register_views=False)
    docs = t["documents"]
    # $VS_ONEX_FILES=16 rewrites documents to N files first (the bench's
    # rep=1 layout for the bigram entries) so the A/B runs on that shape.
    nfiles = int(os.environ.get("VS_ONEX_FILES", "0"))
    if nfiles:
        import tempfile

        d = tempfile.mkdtemp(prefix="vs-onex-", dir="/dev/shm")
        docs.repartition(nfiles).write.mode("overwrite").parquet(d)
        docs = spark.read.parquet(d)
        print(f"documents rewritten to {nfiles} files", flush=True)
    docs.groupBy("lang").count().write.format("noop").mode("overwrite").save()

    for label, builder in (("tfidf", tfidf), ("bigram", bigram)):
        old_df = builder(spark, docs, new=False)
        new_df = builder(spark, docs, new=True)
        a = sorted(map(tuple, old_df.collect()))
        b = sorted(map(tuple, new_df.collect()))
        print(f"{label}: rows identical = {a == b} (n={len(a)})", flush=True)
        walls = {"old": [], "new": []}
        for i in range(10):  # alternate arms
            arm, df = ("old", old_df) if i % 2 == 0 else ("new", new_df)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            walls[arm].append(time.perf_counter() - t0)
        for arm in ("old", "new"):
            ws = walls[arm][1:]  # drop each arm's first (cold codegen)
            print(
                f"  {label} {arm}: med={statistics.median(ws):.3f} "
                f"walls={[round(x, 3) for x in walls[arm]]}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
