"""Query registry: the operator-coverage catalog for the engine.

Every operator from SURVEY.md §2 (plus the 100-TB pipeline operators) is
declared here as a named entry pairing:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation
  (DataFrame API / Spark SQL, Catalyst-optimized), and
- ``oracle`` — an equivalent ANSI-SQL string DuckDB can run on the same
  parquet tables (or ``None`` for non-SQL-expressible ops, which the driver
  checks rows-only).

The driver's correctness gate runs both sides at sf=0.01 and compares
row-count + schema + order-insensitive value hashes, so every computed
column is aliased identically on both sides and floating-point aggregates
are rounded identically on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryEntry:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QueryEntry] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a catalog query with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryEntry(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryEntry]:
    _load_catalog()
    return dict(_REGISTRY)


def queries_dict() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in all_queries().items()}


def oracles_dict() -> dict[str, str]:
    return {name: e.oracle for name, e in all_queries().items() if e.oracle}


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load test tables lazily for a query implementation."""
    from velostream_spark.session import load_tables

    return load_tables(spark, sf_dir, register_views=False)


def views(spark: SparkSession, sf_dir: str) -> None:
    """Register all test tables as temp views (for SQL-expressed queries)."""
    from velostream_spark.session import load_tables

    load_tables(spark, sf_dir, register_views=True)


_LOADED = False


def _load_catalog() -> None:
    """Import every catalog module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    import velostream_spark.queries.core  # noqa: F401
    import velostream_spark.queries.scalar_functions  # noqa: F401
    import velostream_spark.queries.joins  # noqa: F401
    import velostream_spark.queries.subqueries  # noqa: F401
    import velostream_spark.queries.window_functions  # noqa: F401
    import velostream_spark.queries.time_windows  # noqa: F401
    import velostream_spark.queries.pipeline  # noqa: F401
    import velostream_spark.queries.streaming_queries  # noqa: F401
    import velostream_spark.queries.dialect_queries  # noqa: F401
    import velostream_spark.queries.multimodal_queries  # noqa: F401
    import velostream_spark.queries.codec_queries  # noqa: F401

    _LOADED = True


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")
