"""Interleaved A/B: default FileContext-based checkpoint file manager vs
FileSystemBasedCheckpointFileManager (process-cached FileSystem) for the
bounded runner's throwaway local checkpoints (r16, guide §5 — the
streaming-job floor's metadata ops measured ~43 ms EACH: latestOffset /
walCommit / commitOffsets, suspected FileContext construction per log).

Alternates the conf per iteration in ONE session so machine drift hits
both arms equally; prints wall medians and durationMs sums per arm for a
stateless passthrough and a stateful dropDuplicates job.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ckpt_fm_spot.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velostream_spark.session import get_session, load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FM_CONF = "spark.sql.streaming.checkpointFileManagerClass"
FM_FS = (
    "org.apache.spark.sql.execution.streaming.checkpointing."
    "FileSystemBasedCheckpointFileManager"
)


def main():
    spark = get_session("ckpt-fm-spot")
    from velostream_spark.streaming.runner import _scratch_dir, _unique
    from velostream_spark.streaming.source import stream_table

    t = load_tables(spark, SF_DIR, register_views=False)
    t["events"].groupBy("event_type").count().write.format("noop").mode(
        "overwrite"
    ).save()

    def run_one(stateful: bool):
        sdf = stream_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "value"
        )
        if stateful:
            sdf = sdf.dropDuplicates(["user_id"])
        name = _unique("fm")
        ckpt = _scratch_dir(f"vs-ckpt-{name}-")
        out_dir = _scratch_dir(f"vs-out-{name}-")
        t0 = time.perf_counter()
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
        spark.read.schema(sdf.schema).parquet(out_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        durs: dict[str, int] = {}
        for p in q.recentProgress:
            for k, v in dict(p["durationMs"]).items():
                durs[k] = durs.get(k, 0) + v
        return wall, durs

    for stateful in (False, True):
        arms: dict[str, list] = {"default": [], "fsbased": []}
        dursums: dict[str, list] = {"default": [], "fsbased": []}
        # 2 warmups, one per arm
        spark.conf.unset(FM_CONF)
        run_one(stateful)
        spark.conf.set(FM_CONF, FM_FS)
        run_one(stateful)
        for i in range(14):
            arm = "default" if i % 2 == 0 else "fsbased"
            if arm == "default":
                spark.conf.unset(FM_CONF)
            else:
                spark.conf.set(FM_CONF, FM_FS)
            w, d = run_one(stateful)
            arms[arm].append(w)
            dursums[arm].append(d)
        label = "stateful" if stateful else "stateless"
        for arm in ("default", "fsbased"):
            ws = arms[arm]
            keys = sorted({k for d in dursums[arm] for k in d})
            med_d = {
                k: statistics.median([d.get(k, 0) for d in dursums[arm]])
                for k in keys
            }
            print(
                f"{label:10s} {arm:8s} wall med={statistics.median(ws):6.3f} "
                f"min={min(ws):6.3f} walls={[round(w, 3) for w in ws]}",
                flush=True,
            )
            print(f"{'':10s} {'':8s} durMs med: {med_d}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
