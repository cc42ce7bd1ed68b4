"""Range join (point-in-interval) — bucketized to an equi-join.

Spark has no range-join operator: ``points JOIN ranges ON v BETWEEN lo
AND hi`` plans as a BroadcastNestedLoopJoin when the ranges side is small
and a full cartesian otherwise — O(|points|·|ranges|) comparisons either
way (Databricks' closed-source runtime ships a "range join optimization"
for exactly this; open-source Spark does not).

The classic fix makes it an equi-join on BUCKETS:

1. pick a bucket width ``w`` (≈ the typical range length);
2. each range row explodes into one row per w-bucket it overlaps
   (``sequence(floor(lo/w), floor(hi/w))`` — short for ranges ~w long);
3. each point computes its single bucket ``floor(v/w)``;
4. equi-join on the bucket id, then re-check the exact predicate.

Each (point, range) match is produced EXACTLY once — the point's bucket
is unique, so the pair meets only on the range's replica for that bucket
— hence no dedup pass. Cost: a keyed shuffle of points + ranges×(len/w)
replicas instead of an all-pairs loop; AQE handles hot buckets like any
skewed equi-join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    inclusive_hi: bool = True,
) -> DataFrame:
    """INNER join of ``points`` to every ``ranges`` row whose
    [lo, hi] (or [lo, hi) with ``inclusive_hi=False``) contains the
    point's value. NULL values/bounds never match (standard comparison
    semantics). Output = point columns + range columns."""
    w = float(bucket_width)
    # guard, not silent degeneration: w<=0 (or NaN) makes value/w
    # NULL-or-infinite, every bucket NULL, and the equi-join EMPTY
    if not w > 0.0:  # catches 0, negatives, and NaN in one comparison
        raise ValueError(f"bucket_width must be a positive number, got {bucket_width!r}")
    p = points.withColumn(
        "_bucket", F.floor(F.col(value_col) / F.lit(w)).cast("long")
    )
    # drop inverted/NULL-bounded ranges up front: they can never match
    # (BETWEEN semantics), and Spark's sequence(a, b) DESCENDS when a > b,
    # so an inverted range would otherwise explode into useless replicas
    ranges = ranges.where(F.col(lo_col) <= F.col(hi_col))
    r = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    hi_ok = (
        F.col(value_col) <= F.col(hi_col)
        if inclusive_hi
        else F.col(value_col) < F.col(hi_col)
    )
    return (
        p.join(r, "_bucket")
        .where((F.col(value_col) >= F.col(lo_col)) & hi_ok)
        .drop("_bucket")
    )
