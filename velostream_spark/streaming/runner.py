"""Run-to-completion helpers: execute a streaming plan over the (bounded)
test data with the ``availableNow`` trigger and hand back the sink contents
as a DataFrame.

This is the Spark analog of the reference's bounded-source execution path
(velo-sql-batch / engine.rs:1242 ``flush_windows`` on source end): process
everything currently available as a sequence of micro-batches, advance the
watermark, flush what closes, stop.

Append-mode runs go through a parquet *file* sink (a distributed write —
the production-faithful path; the driver never holds the result set) and
the sink directory is handed back as a DataFrame. Update/complete modes
(changelog semantics the file sink can't express) use the memory sink —
their outputs are small aggregates by construction.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_COUNTER = itertools.count()

#: Throwaway checkpoints/sinks (unique per call, never resumed) go to tmpfs
#: when the host has one — state-store commits and sink files then cost
#: memory bandwidth, not disk fsyncs. Production jobs configure their own
#: durable checkpointLocation through the SQL engine; this helper is the
#: run-to-completion path for tests/bench only.
_SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None


def _unique(prefix: str) -> str:
    return f"{prefix}_{next(_COUNTER)}"


def _scratch_dir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH)
    _SCRATCH_DIRS.append(d)
    return d


#: tmpfs holds RAM — sweep every scratch dir at interpreter exit (the old
#: /tmp variant leaked them to disk, harmless; leaking RAM is not).
_SCRATCH_DIRS: list[str] = []


def _sweep_scratch() -> None:  # pragma: no cover — exit hook
    import shutil

    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)


import atexit  # noqa: E402

atexit.register(_sweep_scratch)


def run_available_now(
    sdf: DataFrame,
    output_mode: str,
    query_name: str | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Run a streaming DataFrame to completion; return the sink contents.

    Append mode writes a parquet file sink (distributed — executors write
    their partitions directly, no driver collect) and returns a reader over
    it; update/complete modes use the memory sink. Unique sink name +
    throwaway checkpoint per call, so repeated invocations (driver retries,
    bench steady-state) are independent."""
    name = _unique(query_name or "vs_stream")
    ckpt = _scratch_dir(f"vs-ckpt-{name}-")
    if output_mode == "append":
        out_dir = _scratch_dir(f"vs-out-{name}-")
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        # Explicit schema: a zero-row run leaves no data files to infer from.
        return sdf.sparkSession.read.schema(sdf.schema).parquet(out_dir)
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return sdf.sparkSession.table(name)


def run_foreach_batch(
    sdf: DataFrame,
    func,
    output_mode: str = "update",
    query_name: str | None = None,
    timeout_s: int = 300,
) -> None:
    """Run a streaming DataFrame to completion through ``foreachBatch`` —
    the reference's DataWriter.write_batch loop (datasource/traits.rs:154);
    ``func(batch_df, batch_id)`` is invoked once per micro-batch."""
    name = _unique(query_name or "vs_feb")
    ckpt = _scratch_dir(f"vs-ckpt-{name}-")
    q = (
        sdf.writeStream.foreachBatch(func)
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def max_event_time(spark: SparkSession, batch_df: DataFrame, ts_col: str):
    """Max event time of a bounded input — the final watermark position of
    an availableNow run with 0s delay (windows ending ≤ this emitted)."""
    import pyspark.sql.functions as F

    return batch_df.agg(F.max(ts_col)).collect()[0][0]
