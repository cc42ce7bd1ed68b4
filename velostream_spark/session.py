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
        # Read isAdjustedToUTC=false parquet timestamps as LTZ (UTC session),
        # not TIMESTAMP_NTZ — see RUNTIME_CONFS.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input arrives with too few
    splits to use the machine (r15-opt, guide §2/§6).

    The bench's base tables are ONE parquet row group (row groups are the
    split unit), so every scan-side stage — regex tokenization, explode,
    Arrow matmuls — otherwise runs in a single task; the text entries
    spread that scan across cores with ``repartition``. But a production
    100-TB table (and the bench pool's layout-normalized rep=1 tables)
    already arrives as many files, where the same repartition is a pure
    full-payload shuffle for nothing — measured 0.57-0.86× on the
    normalized layout. This helper keeps the single-file escape hatch and
    skips the exchange when the scan already has splits: hysteresis at
    target/2, because 16 splits on 32 cores parallelize the scan fine
    while a blanket ``>= target`` check would re-shuffle a 16-file table
    into 32 partitions for a marginal (measured: negative) return.

    The split probe is ``df.inputFiles()`` — driver-side file-index
    metadata, no execution (r16, ADVICE: probing ``df.rdd`` under AQE
    eagerly materializes any upstream shuffle stages at plan-build time,
    and byte-range splits of one single-row-group file count as splits
    that each decode zero rows). One big MULTI-row-group file now takes
    the repartition path too — for the row-group-per-file layouts every
    caller uses, file count IS the split count; when no file source backs
    the frame (empty list), repartition is the safe pre-r15 behavior.
    """
    spark = df.sparkSession
    n = target or spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) >= max(2, n // 2):
        return df
    return df.repartition(n)


#: Runtime session confs the whole catalog's semantics assume.  These are
#: applied inside ``load_tables`` (all runtime-settable) so queries behave
#: identically in ANY SparkSession — including a vanilla one the correctness
#: harness builds itself — not just sessions from :func:`get_session`.
RUNTIME_CONFS = {
    # events.parquet stores TIMESTAMP(NANOS), which Spark refuses natively;
    # read as long nanos and truncate to micros (matches DuckDB ns→us).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Reference dialect is permissive (NULL on bad cast —
    # reference src/velostream/sql/execution/types.rs cast rules).
    "spark.sql.ansi.enabled": "false",
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # pyarrow writes parquet timestamps with isAdjustedToUTC=false, which
    # Spark ≥4 infers as TIMESTAMP_NTZ by default.  The catalog's timestamp
    # arithmetic (unix_micros/unix_millis, window() bucketing) assumes LTZ
    # with a UTC session zone — identical instants, and what the DuckDB
    # oracle comparison was verified against — so pin inference off.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def apply_runtime_confs(spark: SparkSession) -> None:
    """Apply the catalog's required runtime confs to an arbitrary session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable at runtime in this Spark build — the
            # session-factory default (get_session) is the fallback.
            pass
    try:
        # Perf only (no semantics): a vanilla session's 200 shuffle
        # partitions are oversized for local mode — right-size to cores,
        # but never override a value the user chose deliberately.
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(_default_parallelism())
            )
    except Exception:
        pass


#: (applicationId, realpath(sf_dir), table) → analyzed DataFrame. A fresh
#: ``spark.read.parquet`` runs a file-listing + schema job per call; the
#: catalog's SQL entries call views() per invocation, so without a memo
#: every query derivation re-lists all ~10 tables (~0.5 s + 10 metadata
#: jobs). A warm engine caches catalog metadata — the memoized DataFrame's
#: InMemoryFileIndex is reused; execution plans still prune/push per query.
#: Test data dirs are immutable (written once, read many); entries from
#: other applicationIds are evicted on insert, mirroring registry._PLAN_MEMO.
_TABLE_MEMO: dict[tuple, DataFrame] = {}


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    path = os.path.join(sf_dir, f"{name}.parquet")
    # mtime in the key: a table REWRITTEN in place within one application
    # (tmp dirs in tests) must not be served from the stale file index —
    # rewriting the file/dir updates its mtime and misses the memo.
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = -1
    key = (app_id, os.path.realpath(sf_dir), name, mtime)
    memo = _TABLE_MEMO.get(key)
    if memo is not None:
        return memo
    df = spark.read.parquet(path)
    if name == "events":
        # The driver's events.parquet stores ts as TIMESTAMP(NANOS), which
        # nanosAsLong surfaces as long nanos → truncate to micros like
        # DuckDB does. Only applies when ts actually read back as a long
        # (an events table re-written by Spark is already micros).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # evict other sessions' entries, superseded versions of THIS table
    # (same dir+name, older mtime), and — as a growth bound for long
    # multi-dir pytest apps — everything beyond 256 entries (FIFO).
    stale = [
        k
        for k in _TABLE_MEMO
        if k[0] != app_id or (k[1], k[2]) == (key[1], key[2])
    ]
    for k in stale:
        del _TABLE_MEMO[k]
    while len(_TABLE_MEMO) >= 256:
        del _TABLE_MEMO[next(iter(_TABLE_MEMO))]
    _TABLE_MEMO[key] = df
    return df


class LazyTables(dict):
    """Dict of table-name → DataFrame that reads each parquet on first access.

    Queries index only the tables they use, so a malformed or missing file in
    ``sf_dir`` can never break an unrelated query (round-1 failure mode:
    every query died on events.parquet at eager-load time).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir

    def __missing__(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(name)
        df = _read_table(self._spark, self._sf_dir, name)
        self[name] = df
        return df

    def _load_existing(self) -> None:
        for name in TABLE_NAMES:
            if name not in self and os.path.exists(
                os.path.join(self._sf_dir, f"{name}.parquet")
            ):
                self[name]  # noqa: B018 — triggers __missing__

    # Iteration-style access implies "all tables" — load what exists first.
    def keys(self):  # type: ignore[override]
        self._load_existing()
        return super().keys()

    def items(self):  # type: ignore[override]
        self._load_existing()
        return super().items()

    def values(self):  # type: ignore[override]
        self._load_existing()
        return super().values()

    def __iter__(self):
        self._load_existing()
        return super().__iter__()


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load test tables from ``sf_dir``.

    With ``register_views=False`` (the catalog's DataFrame path) the result
    is a :class:`LazyTables` that reads each parquet only on first access.
    With ``register_views=True`` every existing table is read and registered
    as a temp view (SQL-expressed queries may reference any of them).

    Parquet scans get predicate pushdown + column pruning from Catalyst for
    free; nothing is cached here — each query's plan prunes its own columns.
    """
    apply_runtime_confs(spark)
    if not register_views:
        return LazyTables(spark, sf_dir)
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = _read_table(spark, sf_dir, name)
        out[name] = df
        df.createOrReplaceTempView(name)
    if not out:
        raise FileNotFoundError(
            f"no test tables (*.parquet) found in {sf_dir!r} — expected e.g. "
            f"{os.path.join(sf_dir, 'lineitem.parquet')}"
        )
    return out
