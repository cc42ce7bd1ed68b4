"""Decompose the streaming entries' per-job floor (guide §1: measure first).

Times, at sf0.1 on the tuned session:
 1. a stateless passthrough availableNow job (events -> select -> parquet
    sink) — the irreducible harness floor (source listing, checkpoint,
    micro-batch, sink commit);
 2. the same with a stateful op (dropDuplicates) at the session's shuffle
    partitions vs fewer state partitions — how much of the floor is
    per-state-store-instance overhead (HDFS-backed store: one delta file
    commit per partition per batch);
 3. streaming_curation's batch-side transformation alone (no streaming
    harness) — what the job pays ON TOP of the harness;
 4. streaming_decontam_gate decomposed: the IVF index build alone vs the
    full entry.

Usage: SPARK_GRAFT_SF_DIR=... python tools/stream_floor_spot.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from velostream_spark.session import get_session, load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timeit(name, fn, runs=4):
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    print(
        f"{name:58s} med={statistics.median(walls):6.3f} min={walls[0]:6.3f} "
        f"walls={[round(w, 3) for w in walls]}",
        flush=True,
    )


def main():
    spark = get_session("stream-floor-spot")
    from velostream_spark.queries.streaming_queries import curation_stream
    from velostream_spark.streaming.runner import run_available_now
    from velostream_spark.streaming.source import stream_table

    t = load_tables(spark, SF_DIR, register_views=False)
    # warmup
    t["events"].groupBy("event_type").count().write.format("noop").mode(
        "overwrite"
    ).save()

    def passthrough():
        sdf = stream_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "value"
        )
        run_available_now(sdf, "append", "floor_passthrough").write.format(
            "noop"
        ).mode("overwrite").save()

    timeit("stateless passthrough job (events, append->parquet)", passthrough)

    def dedup_stateful():
        sdf = stream_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "value"
        )
        run_available_now(
            sdf.dropDuplicates(["user_id"]), "append", "floor_dedup"
        ).write.format("noop").mode("overwrite").save()

    timeit(f"stateful dropDuplicates job (shuffle={spark.conf.get('spark.sql.shuffle.partitions')})", dedup_stateful)

    old = spark.conf.get("spark.sql.shuffle.partitions")
    for n in ("8", "4"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        timeit(f"stateful dropDuplicates job (shuffle={n})", dedup_stateful)
    spark.conf.set("spark.sql.shuffle.partitions", old)

    def curation_batch_side():
        df = curation_stream(
            t["documents"].select("doc_id", "lang", "text")
        )
        df.write.format("noop").mode("overwrite").save()

    timeit("curation transformation, BATCH (no streaming harness)", curation_batch_side)

    def curation_full():
        from velostream_spark.registry import all_queries

        all_queries()["streaming_curation"].fn(spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()

    timeit("streaming_curation FULL entry", curation_full)

    # decontam decomposition: the entry's eager prologue (centroid
    # selection + benchmark-count) vs the whole entry
    from velostream_spark.operators import similarity

    def decontam_prologue():
        emb = t["embeddings"]
        cents = similarity.ivf_centroids(emb, "embedding", "vec_id", 8)
        n_b = emb.where(F.col("vec_id") % 5 == 0).count()
        return cents, n_b

    timeit("decontam eager prologue (centroids + count)", decontam_prologue)

    def decontam_full():
        from velostream_spark.registry import all_queries

        all_queries()["streaming_decontam_gate"].fn(spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()

    timeit("streaming_decontam_gate FULL entry", decontam_full)

    spark.stop()


if __name__ == "__main__":
    main()
