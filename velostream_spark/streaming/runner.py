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

import contextlib
import itertools
import math
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_COUNTER = itertools.count()

#: Size-adaptive shuffle/state partitioning for BOUNDED runs (guide §2:
#: derive partitioning from input size, never a constant). Structured
#: Streaming fixes its state-store partition count to
#: spark.sql.shuffle.partitions at query start and AQE cannot coalesce it
#: afterwards, so a small bounded stream otherwise pays one state-store
#: instance (delta-file commit per micro-batch, maintenance thread) per
#: session shuffle partition — measured 1.18 s vs 0.71 s for an identical
#: dropDuplicates job at 32 vs 8 partitions on this host. The partition
#: count here is ceil(source_bytes / target), CLAMPED ABOVE at the
#: session's own shuffle-partition setting: a corpus-scale input always
#: yields >= the configured parallelism, so cluster behavior is the
#: session default, unchanged — only small bounded runs stop paying for
#: empty state stores. Override the target via
#: $VS_STREAM_TARGET_PART_BYTES (bytes; "-1" disables the sizing).
_TARGET_PART_BYTES = int(
    os.environ.get("VS_STREAM_TARGET_PART_BYTES", str(4 * 1024 * 1024))
)

def _stream_input_bytes(sdf: DataFrame) -> "int | None":
    """Total bytes of the local file sources feeding ``sdf``, read from
    the analyzed plan's StreamingRelation leaves (path + pathGlobFilter
    options). None when any source is not a readable local file/dir —
    callers then keep the session's shuffle-partition setting."""
    import fnmatch

    def _opt(opts, key):
        v = opts.get(key)
        return v.get() if v.isDefined() else None

    try:
        # analyzed, not logical: a bare readStream is an
        # UnresolvedDataSource until analysis resolves the file source
        leaves = sdf._jdf.queryExecution().analyzed().collectLeaves()  # type: ignore[attr-defined]
        total = 0
        seen = False
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if "StreamingRelation" not in leaf.getClass().getName():
                continue
            opts = leaf.dataSource().options()
            path = _opt(opts, "path")
            if not path:
                return None
            seen = True
            glob = _opt(opts, "pathGlobFilter")
            if os.path.isfile(path):
                total += os.path.getsize(path)
            elif os.path.isdir(path):
                for root, _dirs, files in os.walk(path, followlinks=True):
                    # pathGlobFilter matches each listed LEAF file's name
                    # (Spark applies the glob to file names during
                    # listing, at any depth) — match every file's own
                    # name; an approximation only in that Spark's
                    # non-recursive listing may not descend where this
                    # walk does, which over-counts, never under-counts
                    for f in files:
                        if glob and not fnmatch.fnmatch(f, glob):
                            continue
                        with contextlib.suppress(OSError):
                            total += os.path.getsize(os.path.join(root, f))
            else:
                return None
    except Exception:
        return None
    return total if seen and total > 0 else None


@contextlib.contextmanager
def _sized_shuffle_partitions(sdf: DataFrame):
    """Set spark.sql.shuffle.partitions from the stream's source size for
    the duration of a bounded run (state partition count is captured at
    query start), then restore the session value.

    Assumes the session runs bounded streams SEQUENTIALLY (the bench and
    tests do): the override is session-global while the run starts, so a
    query planned concurrently on the same session would pick it up. Scope
    via a cloned session (spark.newSession()) if that ever changes."""
    spark = sdf.sparkSession
    if _TARGET_PART_BYTES <= 0:
        yield
        return
    n_bytes = _stream_input_bytes(sdf)
    if n_bytes is None:
        yield
        return
    try:
        session_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        yield
        return
    n = min(session_n, max(1, math.ceil(n_bytes / _TARGET_PART_BYTES)))
    # Hysteresis: only act when the sizing at least HALVES the partition
    # count — a 29-for-32 rewrite cannot win anything but still perturbs
    # the plan; the target of this sizing is the small-input regime where
    # n collapses to a handful.
    if n > session_n // 2:
        yield
        return
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(session_n))

#: Checkpoint file manager for the runner's throwaway LOCAL checkpoints
#: (r16, guide §5 — driver-side per-run fixed costs). Spark's default
#: FileContext-based manager constructs a fresh FileContext +
#: AbstractFileSystem per metadata log AND per state-store provider
#: (FileContext has no instance cache), which a long-lived production
#: query pays once but a bounded run-to-completion pays on EVERY run:
#: measured ~40 ms per metadata op (latestOffset / walCommit /
#: commitOffsets) and a large share of the stateful addBatch wall.
#: FileSystemBasedCheckpointFileManager — Spark's own fallback manager —
#: goes through the process-wide FileSystem CACHE instead: interleaved
#: same-session A/B (tools/ckpt_fm_spot.py) measured the metadata trio
#: 42/41/42 → 9/9/9 ms and whole-job walls 0.57 → 0.40 s (stateless) /
#: 1.10 → 0.71 s (stateful dropDuplicates). The FileContext manager's
#: stronger rename-without-overwrite atomicity exists to protect DURABLE
#: checkpoints from concurrent zombie drivers; a fresh single-driver
#: scratch dir per run (never resumed, deleted at exit) has no such
#: writer, so this is scoped HERE — production jobs with their own
#: checkpointLocation (streaming/jobs.py) keep Spark's default. Disable
#: via $VS_STREAM_LOCAL_CKPT_FM=0.
_FM_CONF = "spark.sql.streaming.checkpointFileManagerClass"
_FM_FS_BASED = (
    "org.apache.spark.sql.execution.streaming.checkpointing."
    "FileSystemBasedCheckpointFileManager"
)
_LOCAL_CKPT_FM = os.environ.get("VS_STREAM_LOCAL_CKPT_FM", "1") != "0"


@contextlib.contextmanager
def _local_ckpt_file_manager(spark):
    """Apply the FileSystem-based checkpoint manager for the duration of
    one bounded run over a runner-owned local scratch checkpoint, then
    restore the session value. Same sequential-session assumption as
    :func:`_sized_shuffle_partitions`."""
    if not _LOCAL_CKPT_FM:
        yield
        return
    try:
        prev = spark.conf.get(_FM_CONF, None)
    except Exception:
        yield
        return
    spark.conf.set(_FM_CONF, _FM_FS_BASED)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_FM_CONF)
        else:
            spark.conf.set(_FM_CONF, prev)


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
        with _sized_shuffle_partitions(sdf), _local_ckpt_file_manager(
            sdf.sparkSession
        ):
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
    with _sized_shuffle_partitions(sdf), _local_ckpt_file_manager(
        sdf.sparkSession
    ):
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
    with _sized_shuffle_partitions(sdf), _local_ckpt_file_manager(
        sdf.sparkSession
    ):
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
