"""Reference-specific analytic functions as Catalyst rewrites.

DELTA(col): difference between consecutive values of a column within a
partition — reference src/velostream/sql/execution/expression/functions.rs:3148-3160
(aggregation path src/velostream/sql/execution/aggregation/functions.rs:52).

Spark-first design: DELTA is not a custom UDAF — it is rewritten to
``col - lag(col, 1) OVER (PARTITION BY ... ORDER BY ...)`` (SURVEY §4.3.6),
which stays inside whole-stage codegen and costs one window sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def delta(
    col: str | Column,
    partition_by: Sequence[str | Column] = (),
    order_by: Sequence[str | Column] = (),
) -> Column:
    """DELTA(col) → col - lag(col, 1) over the given window."""
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    c = F.col(col) if isinstance(col, str) else col
    return c - F.lag(c, 1).over(w)
