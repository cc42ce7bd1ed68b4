"""Streaming sources over files — the reference's file ``DataSource``
(src/velostream/datasource/file/data_source.rs, config.rs:8-18: CSV,
CSV-no-header, JSONL, JSON-array) plus the parquet test tables.

Spark's file stream source natively supports "tailing" a directory (the
reference needs a watcher thread — file/watcher.rs); here new files are
picked up per micro-batch, and ``maxFilesPerTrigger`` shards a backlog into
multiple batches (how tests simulate multi-batch arrival).

Scale: the file stream source lists directories on the driver — at 100 TB
use fewer/larger files (or Kafka); each micro-batch is a normal distributed
parquet/CSV scan with pushdown and pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_parquet(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    max_files_per_trigger: int | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Streaming read of a parquet file or directory.

    Spark's file stream source requires a *directory*; for a single-file
    path (the driver's ``<table>.parquet`` layout) we read the parent with a
    ``pathGlobFilter`` pinned to that file name. ``recursive`` turns on
    recursiveFileLookup for per-batch-subdir layouts (the idempotent
    foreachBatch sink, engine._write_batch_idempotent) — late-appearing
    subdirectories are picked up like any new file."""
    if schema is None:
        from velostream_spark.session import apply_runtime_confs

        # Schema inference must survive a vanilla session (driver harness):
        # nanosAsLong etc. are applied here just like session.load_tables.
        apply_runtime_confs(spark)
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming view of a driver test table, with the same column types as
    ``session.load_tables`` (events.ts: TIMESTAMP(NANOS) parquet → read as
    long nanos, truncated to micros)."""
    from pyspark.sql.types import LongType

    path = os.path.join(sf_dir, f"{name}.parquet")
    df = stream_parquet(spark, path, max_files_per_trigger=max_files_per_trigger)
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def stream_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Streaming CSV source (reference FileFormat::Csv / CsvNoHeader,
    file/config.rs:8-18). ``header=False`` maps to CsvNoHeader — columns
    come from the supplied schema."""
    reader = spark.readStream.schema(schema).option("header", str(header).lower())
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def stream_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Streaming JSON-lines source (reference FileFormat::JsonLines)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)
