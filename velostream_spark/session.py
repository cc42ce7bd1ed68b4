"""SparkSession factory tuned for the velostream-spark engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime re-planning, skew-join splitting, partition coalescing), shuffle
partitions sized to the machine rather than the 200 default, UTC session
timezone (the DuckDB oracle compares timestamps as UTC-naive), and Arrow
enabled for the Pandas-UDF slow path.

At 100 TB scale the same knobs apply with different values:
``spark.sql.shuffle.partitions`` ~ 2-3x total cores (or left to AQE
coalescing from a high initial value), ``spark.sql.files.maxPartitionBytes``
sized so a scan task fits comfortably in executor memory, and broadcast
threshold raised so dimension tables (region/nation/supplier at TPC-H scale)
always broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: All driver-generated test tables (TESTDATA.md).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


def get_session(app_name: str = "velostream-spark", **extra_conf: str) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    ``extra_conf`` entries override the defaults, letting tests shrink
    parallelism or bench runs raise memory.
    """
    par = _default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{par}]")
        .appName(app_name)
        # Shuffle sized to cores, AQE coalesces the rest at runtime.
        .config("spark.sql.shuffle.partitions", str(par))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Deterministic timestamp semantics vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas_udf / applyInPandas / toPandas.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ANSI off: the reference dialect is permissive (NULL on bad cast,
        # reference src/velostream/sql/execution/types.rs cast rules).
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        # The driver's events table stores TIMESTAMP(NANOS) parquet, which
        # Spark refuses natively; read as long and convert in load_tables
        # (truncation to micros matches DuckDB's ns→us conversion).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load every test table from ``sf_dir`` as a DataFrame.

    Parquet scans get predicate pushdown + column pruning from Catalyst for
    free; nothing is cached here — each query's plan prunes its own columns.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name == "events":
            # ts is TIMESTAMP(NANOS) in parquet → read as long nanos
            # (nanosAsLong), truncate to micros like DuckDB does.
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    if not out:
        raise FileNotFoundError(
            f"no test tables (*.parquet) found in {sf_dir!r} — expected e.g. "
            f"{os.path.join(sf_dir, 'lineitem.parquet')}"
        )
    return out
