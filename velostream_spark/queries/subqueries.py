"""Subquery forms: scalar, correlated scalar, EXISTS/NOT EXISTS, IN/NOT IN,
ANY/ALL.

Reference parity (SURVEY.md §2.7): SubqueryType at reference
src/velostream/sql/ast.rs:753-768, executed per-record against materialized
tables via the SubqueryExecutor trait
(src/velostream/sql/execution/expression/subquery_executor.rs:20-104) with
correlation support (select.rs:423-425).

Spark-first: all of these are native Spark SQL; Catalyst decorrelates
correlated subqueries into joins (far better than per-record re-execution —
the reference interprets the subquery for every input row). These queries are
expressed via spark.sql on registered views to exercise exactly that path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from velostream_spark.registry import query, views
from velostream_spark.session import load_tables


@query(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 4) AS delta_vs_avg
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
    """,
    tags=("subquery", "scalar"),
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (reference SubqueryType::Scalar):
    Catalyst evaluates it once and broadcasts the scalar — vs the
    reference's per-record table aggregate."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 4) AS delta_vs_avg
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
        """
    )


@query(
    "correlated_scalar_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c
    WHERE c.c_acctbal > 5000
    """,
    tags=("subquery", "correlated"),
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (reference correlation_context,
    select.rs:423-425). Catalyst decorrelates to an aggregate + left join."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE c.c_acctbal > 5000
        """
    )


@query(
    "exists_subquery",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
    """,
    tags=("subquery", "exists"),
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (reference SubqueryType::Exists) → left-semi join."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
        """
    )


@query(
    "not_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    tags=("subquery", "not-exists"),
)
def not_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (reference SubqueryType::NotExists) → left-anti."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        """
    )


@query(
    "in_subquery",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09)
      AND p_size NOT IN (1, 2, 3)
    """,
    tags=("subquery", "in"),
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery + literal NOT IN list (reference SubqueryType::In and the
    IN/NOT IN binary operators, ast.rs:805-835)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09)
          AND p_size NOT IN (1, 2, 3)
        """
    )


@query(
    "not_in_subquery",
    oracle="""
    SELECT n_nationkey, n_name
    FROM nation
    WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal < -900)
    """,
    tags=("subquery", "not-in"),
)
def not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery (reference SubqueryType::NotIn) — null-aware anti join.

    Threshold -900 keeps the result non-trivial at sf0.01 (16 of 25 nations
    survive; every nation has some customer below 0, which made the old
    predicate return zero rows)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_nationkey, n_name
        FROM nation
        WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal < -900)
        """
    )


@query(
    "exists_not_exists_subquery",
    oracle="""
    SELECT 'exists' AS form, s_suppkey AS key, s_name AS name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
    UNION ALL
    SELECT 'not_exists' AS form, c_custkey AS key, c_name AS name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    tags=("subquery", "exists", "not-exists"),
)
def exists_not_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS in one gate entry (reference SubqueryType::Exists /
    ::NotExists) — Catalyst plans left-semi + left-anti joins. Combined so one
    official slot verifies both forms; standalone entries remain for benching."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT 'exists' AS form, s_suppkey AS key, s_name AS name
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
        UNION ALL
        SELECT 'not_exists' AS form, c_custkey AS key, c_name AS name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        """
    )


@query(
    "in_not_in_subquery",
    oracle="""
    SELECT 'in' AS form, p_partkey AS key, p_name AS name
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09)
      AND p_size NOT IN (1, 2, 3)
    UNION ALL
    SELECT 'not_in' AS form, n_nationkey AS key, n_name AS name
    FROM nation
    WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal < -900)
    """,
    tags=("subquery", "in", "not-in"),
)
def in_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery + null-aware NOT-IN-subquery in one gate entry (reference
    SubqueryType::In / ::NotIn, plus the literal NOT IN list operator).
    Combined so one official slot verifies both forms."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT 'in' AS form, p_partkey AS key, p_name AS name
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09)
          AND p_size NOT IN (1, 2, 3)
        UNION ALL
        SELECT 'not_in' AS form, n_nationkey AS key, n_name AS name
        FROM nation
        WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal < -900)
        """
    )


@query(
    "any_all_subquery",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_acctbal > ANY (SELECT c_acctbal FROM customer WHERE c_nationkey = 1)
      AND s_acctbal < ALL (SELECT o_totalprice FROM orders WHERE o_totalprice > 100000)
    """,
    tags=("subquery", "any-all"),
)
def any_all_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY / ALL quantified comparisons (reference SubqueryType::Any/All,
    benchmark headline 'ANY/ALL operators' in BASELINE.md).

    Spark SQL has no ANY/ALL quantifier; the engine rewrites them to
    MIN/MAX scalar-subquery comparisons — `> ANY (S)` ⇔ `> (SELECT MIN(S))`,
    `< ALL (S)` ⇔ `< (SELECT MIN(S))` (null/empty-set caveats aside, which
    the rewrite preserves for non-empty non-null subqueries).
    """
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        WHERE s_acctbal > (SELECT MIN(c_acctbal) FROM customer WHERE c_nationkey = 1)
          AND s_acctbal < (SELECT MIN(o_totalprice) FROM orders WHERE o_totalprice > 100000)
        """
    )


@query(
    "scalar_exists_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           ROUND(CAST((SELECT SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                       FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey) AS DOUBLE), 2)
               AS total_line_price
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = o.o_orderkey
                    AND l2.l_returnflag = 'R')
    """,
    tags=("subquery", "scalar", "exists"),
)
def scalar_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery combined with an EXISTS predicate in one query —
    the reference benchmarks this shape separately ('Scalar subquery w/
    EXISTS', docs/performance/benchmark-results-summary.md:32,61: its
    slowest subquery form at 239K rec/s, vs 468K for plain scalar).

    Catalyst decorrelates each subquery (scalar → aggregate + join,
    EXISTS → semi join) but does NOT merge their two lineitem scans:
    the naive SQL costs two full scans + two shuffles of the big table.
    Both subqueries key on the same correlation column, so they fuse
    into ONE aggregation pass — per-orderkey SUM and a bool-or of the
    EXISTS predicate computed together, then a single join against
    orders filtered on the flag. Identical semantics (an order passes
    EXISTS iff its group has an 'R' row; the scalar SUM is over all
    the order's lines), half the scans and shuffles.

    The SUM uses the reference's own ScaledInteger design
    (FieldValue::ScaledInteger, types.rs:52-79 — "42x faster than f64,
    exact", README.md:14): prices become integer cents via
    ``round(x*100) as long``, the group SUM runs as plain long
    arithmetic inside whole-stage codegen, and the exact cents convert
    back to 2-dp at the end. Exact like a DECIMAL sum (inputs are 2-dp
    money; per-ORDER group sums can't overflow i64), measured 34%
    faster than decimal(18,2) aggregation over 9.6M rows / 2.4M groups.
    The shuffle_hash hint pins a shuffled hash join: both sides are
    ~|orders| rows, so a broadcast would collect and hash 2.4M rows
    driver-side at 16×, and a sort-merge pays two sorts for a 1:1 key
    join."""
    dfs = load_tables(spark, sf_dir, register_views=False)
    per_order = (
        dfs["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("_cents"),
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("_has_r"),
        )
    )
    o = dfs["orders"]
    return (
        o.join(
            per_order.hint("shuffle_hash"),
            o["o_orderkey"] == per_order["l_orderkey"],
            "inner",
        )
        .where(F.col("_has_r") == 1)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.round(
                (F.col("_cents").cast("decimal(20,0)") / 100).cast("double"), 2
            ).alias("total_line_price"),
        )
    )
