"""Structured-Streaming layer: the streaming semantics of the reference
engine (SURVEY.md §2.6, §3) re-expressed on Spark Structured Streaming.

Modules:

- ``source``  — streaming readers over files (parquet/CSV/JSONL) mirroring
  the reference's file/Kafka ``DataSource`` surface.
- ``runner``  — run-to-completion helpers (``availableNow`` trigger + memory
  sink) turning a streaming plan into a DataFrame the driver can collect.
- ``emit``    — EMIT CHANGES / EMIT FINAL → Spark ``outputMode`` mapping
  (reference select.rs:490-501 defaults).
- ``rows_window`` — the reference's ``ROWS WINDOW BUFFER n ROWS`` per-record
  analytic window as a custom stateful op (``applyInPandasWithState``).
- ``jobs``    — multi-job server analog (deploy/stop/pause/resume/SHOW) over
  ``spark.streams`` (reference server/stream_job_server.rs).
- ``late_data`` — late-data strategies: Drop (watermark), UpdatePreviousWindow
  (update mode), DeadLetterQueue (foreachBatch side-output)
  (reference watermarks.rs:113-130).
"""
