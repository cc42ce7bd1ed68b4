"""As-of join — Spark-first, no UDF, ONE keyed shuffle.

Spark has no ASOF JOIN operator (DuckDB, Pandas, kdb and most
time-series stores do): for each left row (key, t) attach the LATEST
right row (key, rt) with rt <= t. The naive formulations are all scale
traps — a range-condition join is a BroadcastNestedLoop/cartesian per
key, and a per-key subquery max is a correlated join.

The Spark-native shape is the union + fill-forward window:

1. tag and union both sides on a common (key, ts) spine — right rows
   carry their payload, left rows carry NULL payload;
2. one window per key ordered by (ts, side) with
   ``last(payload, ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT:
   every left row sees exactly the latest right payload at-or-before its
   timestamp (right sorts BEFORE left at equal ts, so rt == t matches);
3. filter back to the left rows.

Cost: ONE hash exchange on the key + a per-partition sort — the same
shape as any windowed aggregation, no matter how skewed the time ranges
are; payload width is the only extra shuffle weight. At 100 TB this is
the difference between a windowed pass and an exploding interval join.

The DuckDB oracle is its NATIVE ``ASOF LEFT JOIN`` — the semantics
cross-check is against an independent first-class implementation, not a
SQL re-statement of the same trick.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """LEFT AS-OF join: every ``left`` row + the latest ``right`` payload
    columns at-or-before its timestamp (NULLs when no right row precedes),
    as ``asof_<payload>`` columns appended to the left schema. ``key``
    may be one column name or a sequence (compound-key as-of; all key
    columns must exist under the same names on both sides).
    ``inclusive=False`` switches to the STRICT form (latest right
    strictly before t — "the quote known when the trade printed"; in the
    fill-forward union, right rows then sort AFTER left rows at equal
    ts so an equal-ts right is invisible to that left row). The strict
    form is what the stream-stream operator finalizes incrementally
    (streaming/asof_stream.py).

    ``right`` must be unique per (key, right_ts) — the same well-formed
    input DuckDB's ASOF JOIN assumes; dedupe with ``max_by`` first if it
    isn't. Left column names must not collide with the ``_k*/_ts/_side``
    spine (underscore-prefixed deliberately).

    NULL-timestamp and NULL-key right rows are dropped up front: under
    SQL comparison semantics (``l.ts >= NULL`` is never true, ``l.key =
    NULL`` never matches) they can match nothing, but the fill-forward
    window would group NULL keys together / sort NULL ts FIRST and leak
    their payload — the two spots where the window trick and the
    comparison semantics disagree without the guard. NULL-key LEFT rows
    then land in a partition with no right rows and correctly get NULL
    payload, matching DuckDB's ASOF LEFT JOIN."""
    keys = [key] if isinstance(key, str) else list(key)
    guard = F.col(right_ts).isNotNull()
    for kc in keys:
        guard = guard & F.col(kc).isNotNull()
    right = right.where(guard)
    lcols = left.columns
    spine = [f"_k{i}" for i in range(len(keys))]
    l_side = left.select(
        *[F.col(kc).alias(s) for kc, s in zip(keys, spine)],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[
            F.lit(None).cast(right.schema[p].dataType).alias(f"_p_{p}")
            for p in payload
        ],
    )
    r_side = right.select(
        *[F.col(kc).alias(s) for kc, s in zip(keys, spine)],
        F.col(right_ts).alias("_ts"),
        F.lit(0 if inclusive else 2).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(p).alias(f"_p_{p}") for p in payload],
    )
    u = l_side.unionByName(r_side)
    w = (
        Window.partitionBy(*spine)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_p_{p}", ignorenulls=True).over(w).alias(f"_f_{p}")
            for p in payload
        ],
    )
    return filled.where(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_f_{p}").alias(f"asof_{p}") for p in payload]
    )
