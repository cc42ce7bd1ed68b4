"""A/B harness for streaming-floor configs (r16, guide §1/§5).

Runs the stateless passthrough job + a stateful dropDuplicates job under
the session configs named in $VS_FLOOR_CONF (comma-separated k=v pairs),
prints medians and the per-batch durationMs breakdown, plus an equivalent
BATCH parquet write for reference (what addBatch would cost without the
streaming machinery).

Usage: VS_FLOOR_CONF="spark.hadoop.fs.file.impl=org.apache.hadoop.fs.RawLocalFileSystem" \
       python tools/floor_conf_spot.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velostream_spark.session import get_session, load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    conf = {}
    for kv in os.environ.get("VS_FLOOR_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf[k] = v
    print("confs:", conf or "(none)", flush=True)
    spark = get_session("floor-conf-spot", **conf)
    from velostream_spark.streaming.runner import _scratch_dir, run_available_now
    from velostream_spark.streaming.source import stream_table

    t = load_tables(spark, SF_DIR, register_views=False)
    t["events"].groupBy("event_type").count().write.format("noop").mode(
        "overwrite"
    ).save()

    def timeit(name, fn, runs=6):
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        walls_s = sorted(walls[1:])  # drop cold run
        print(
            f"{name:46s} med={statistics.median(walls_s):6.3f} "
            f"min={walls_s[0]:6.3f} walls={[round(w, 3) for w in walls]}",
            flush=True,
        )

    def batch_write_ref():
        out = _scratch_dir("vs-batchref-")
        (
            t["events"]
            .select("event_id", "user_id", "value")
            .write.mode("overwrite")
            .parquet(out)
        )

    timeit("BATCH parquet write (same projection)", batch_write_ref)

    last_q = {}

    def passthrough():
        sdf = stream_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "value"
        )
        from velostream_spark.streaming.runner import _unique

        name = _unique("floor_pass")
        ckpt = _scratch_dir(f"vs-ckpt-{name}-")
        out_dir = _scratch_dir(f"vs-out-{name}-")
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        last_q["durs"] = [dict(p["durationMs"]) for p in q.recentProgress]
        out = spark.read.schema(sdf.schema).parquet(out_dir)
        out.write.format("noop").mode("overwrite").save()

    timeit("stream passthrough (append->parquet)", passthrough)
    print("  last run durationMs:", last_q.get("durs"), flush=True)

    def dedup_stateful():
        sdf = stream_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "value"
        )
        out = run_available_now(
            sdf.dropDuplicates(["user_id"]), "append", "floor_dedup"
        )
        out.write.format("noop").mode("overwrite").save()

    timeit("stream stateful dropDuplicates", dedup_stateful)

    # durationMs of the LAST passthrough run's query for attribution
    for q in spark.streams.active:
        q.stop()
    spark.stop()


if __name__ == "__main__":
    main()
