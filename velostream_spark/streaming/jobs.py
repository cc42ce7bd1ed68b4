"""Multi-job server analog — the reference's `velo-sql` job layer
(src/velostream/server/stream_job_server.rs; job lifecycle statements
START/STOP/PAUSE/RESUME JOB, ast.rs:302-365; SHOW JOBS/STREAMS,
ast.rs:471-497) as a thin registry over ``spark.streams``.

Spark already provides what the reference's server hand-builds: per-query
lifecycle (``StreamingQuery.stop``), checkpoint-based recovery (stronger
than the reference's at-least-once transactional processor,
server/processors/transactional.rs:36-40), and progress metrics
(``lastProgress`` ≈ the reference's @metric annotations). PAUSE maps to
stop-with-checkpoint; RESUME restarts the writer from the same checkpoint —
exactly-once resumes where it left off.
"""

from __future__ import annotations

import os
import tempfile
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

#: build() -> streaming DataFrame; re-invoked on RESUME (plans are not
#: serializable across stop/start, so jobs are declared by a builder fn).
PlanBuilder = Callable[[], DataFrame]


@dataclass
class StreamJob:
    name: str
    build: PlanBuilder
    sink_format: str
    sink_options: dict[str, str]
    output_mode: str
    checkpoint: str
    trigger: dict[str, Any]
    query: StreamingQuery | None = None
    state: str = "defined"  # defined | running | paused | stopped | failed
    deployed_at: float = field(default_factory=time.time)


class StreamJobManager:
    """Named streaming jobs with deploy/stop/pause/resume/show."""

    def __init__(self, spark: SparkSession, checkpoint_root: str | None = None):
        self.spark = spark
        self.checkpoint_root = checkpoint_root or tempfile.mkdtemp(prefix="vs-jobs-")
        self.jobs: dict[str, StreamJob] = {}

    # -- lifecycle ---------------------------------------------------------

    def deploy(
        self,
        name: str,
        build: PlanBuilder,
        sink_format: str = "memory",
        sink_options: dict[str, str] | None = None,
        output_mode: str = "append",
        trigger: dict[str, Any] | None = None,
        start: bool = True,
    ) -> StreamJob:
        """DEPLOY JOB — register and (by default) start a named job."""
        if name in self.jobs and self.jobs[name].state == "running":
            raise ValueError(f"job {name!r} is already running")
        job = StreamJob(
            name=name,
            build=build,
            sink_format=sink_format,
            sink_options=dict(sink_options or {}),
            output_mode=output_mode,
            checkpoint=os.path.join(self.checkpoint_root, name),
            trigger=dict(trigger or {"availableNow": True}),
        )
        self.jobs[name] = job
        if start:
            self._start(job)
        return job

    def _start(self, job: StreamJob) -> None:
        writer = (
            job.build()
            .writeStream.format(job.sink_format)
            .queryName(job.name)
            .outputMode(job.output_mode)
            .option("checkpointLocation", job.checkpoint)
        )
        for k, v in job.sink_options.items():
            writer = writer.option(k, v)
        if job.trigger:
            writer = writer.trigger(**job.trigger)
        job.query = writer.start()
        job.state = "running"

    def start(self, name: str) -> StreamJob:
        """START JOB — (re)start a defined/stopped job."""
        job = self._get(name)
        if job.state == "running":
            return job
        self._start(job)
        return job

    def stop(self, name: str) -> StreamJob:
        """STOP JOB — terminate; checkpoint retained (restart = recovery)."""
        job = self._get(name)
        if job.query is not None and job.query.isActive:
            job.query.stop()
        job.state = "stopped"
        return job

    def pause(self, name: str) -> StreamJob:
        """PAUSE JOB — stop processing, keep the checkpoint; RESUME continues
        exactly where the offsets log left off."""
        job = self.stop(name)
        job.state = "paused"
        return job

    def resume(self, name: str) -> StreamJob:
        """RESUME JOB — restart from the job's checkpoint."""
        job = self._get(name)
        if job.state == "running":
            return job
        self._start(job)
        return job

    def wait(self, name: str, timeout_s: int = 300) -> None:
        job = self._get(name)
        if job.query is not None:
            job.query.awaitTermination(timeout_s)
            if not job.query.isActive and job.state == "running":
                job.state = "stopped"

    # -- introspection (SHOW JOBS / SHOW STREAMS / DESCRIBE) ---------------

    def show_jobs(self) -> list[dict[str, Any]]:
        """SHOW JOBS (ast.rs:471-497) — name/state/progress per job."""
        out = []
        for job in self.jobs.values():
            q = job.query
            active = bool(q is not None and q.isActive)
            if job.state == "running" and not active:
                job.state = "stopped"
            prog = (q.lastProgress or {}) if q is not None else {}
            out.append(
                {
                    "name": job.name,
                    "state": job.state,
                    "active": active,
                    "sink": job.sink_format,
                    "output_mode": job.output_mode,
                    "run_id": str(q.runId) if q is not None else None,
                    "input_rows": prog.get("numInputRows"),
                    "batch_id": prog.get("batchId"),
                }
            )
        return out

    def show_streams(self) -> list[dict[str, Any]]:
        """SHOW STREAMS — every active streaming query in the session
        (including ones not deployed through this manager)."""
        return [
            {"name": q.name, "id": str(q.id), "run_id": str(q.runId), "active": True}
            for q in self.spark.streams.active
        ]

    def describe(self, name: str) -> dict[str, Any]:
        """DESCRIBE <job> — full status + last progress."""
        job = self._get(name)
        q = job.query
        return {
            "name": job.name,
            "state": job.state,
            "checkpoint": job.checkpoint,
            "sink": job.sink_format,
            "output_mode": job.output_mode,
            "trigger": job.trigger,
            "last_progress": (q.lastProgress if q is not None else None),
        }

    def _get(self, name: str) -> StreamJob:
        if name not in self.jobs:
            raise KeyError(f"unknown job: {name!r}")
        return self.jobs[name]
