"""Catalyst-native count-min sketch: distributed build, codegen estimate.

The heavy-hitters problem at corpus scale: exact per-key counts need one
row per distinct key through a shuffle (fine into the billions, but the
count table itself is vocabulary-sized state). A count-min sketch
(Cormode & Muthukrishnan 2005) replaces it with a FIXED d x w counter
grid: each key increments one counter per row (position = hash_d(key)
mod w), and the estimate is the MIN over the d counters — always an
OVERESTIMATE (collisions only add), with error <= 2N/w at probability
1 - (1/2)^d. Sketches merge by element-wise addition, so per-partition
grids combine associatively — exactly what a continuous aggregate wants.

Spark-first mechanics (the bloom.py pattern — no JVM sketch API needed):

- **build**: one map-side-combined ``groupBy(key)`` collapses occurrences
  to (key, cnt) per map task, then each distinct key explodes to its d
  (depth, pos) cells and a ``groupBy(depth, pos).sum(cnt)`` reduces to
  AT MOST d*w rows — the only full shuffle carries one row per distinct
  key per map task, and the second is bounded by the grid size however
  large the corpus. Only the d*w grid reaches the driver (5 x 8192
  longs = 320 KB).
- **estimate**: the grid ships as d ``array<long>`` literals; the lookup
  is ``least(element_at(row_i, pmod(xxhash64(key, i), w) + 1), ...)`` —
  pure whole-stage codegen, zero Python, usable in any projection or
  filter (e.g. "keep rows whose key is estimated-frequent" scan-side).

Hashing: ``xxhash64(key, seed=depth)`` — the same JVM hash family as
bloom.py, so build and estimate can never drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_build",
    "cms_estimate",
    "cms_build_md5",
    "cms_estimate_md5",
    "pos_md5_sql",
]


def _pos(key: Column, depth: int, w: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(depth)), F.lit(w))


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    w: int = 8192,
    d: int = 5,
) -> list[list[int]]:
    """Build the d x w counter grid distributed; returns d rows of w longs.

    ``weight_col`` aggregates a measure instead of occurrence counts
    (e.g. bytes per key). Error bound: estimate - true <= 2 * total / w
    with probability 1 - 2^-d; size w to ~10x the heavy-hitter count
    you care about."""
    cnt = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(
            (
                F.sum(weight_col) if weight_col else F.count(F.lit(1))
            ).alias("_cnt")
        )
    )
    cells = cnt.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        _pos(F.col(key_col), i, w).alias("pos"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("cell"),
        "_cnt",
    )
    rows = (
        cells.groupBy("cell.depth", "cell.pos")
        .agg(F.sum("_cnt").alias("c"))
        .collect()
    )
    grid = [[0] * w for _ in range(d)]
    for r in rows:
        grid[r["depth"]][r["pos"]] = r["c"]
    return grid


def cms_estimate(key: Column, grid: list[list[int]], w: int) -> Column:
    """Pure-codegen frequency estimate: MIN over the d depth rows of the
    key's counter — >= the true count ALWAYS (collisions only add)."""
    lookups = [
        F.element_at(_row_lit(row), (_pos(key, i, w) + 1).cast("int"))
        for i, row in enumerate(grid)
    ]
    return lookups[0] if len(lookups) == 1 else F.least(*lookups)


def _row_lit(row: list[int]) -> Column:
    """ONE array<long> Literal node for a grid row (r16, guide §5 driver
    cost): ``F.lit(list)`` builds a CreateArray with one child Literal PER
    CELL — 4096 nodes per depth row, 12K+ per estimate expression that
    Catalyst re-walks on every pass. functions/litarray.py bulk-transfers
    the row and wraps it in a SINGLE Literal of ArrayType — same values,
    same element_at plan shape, millisecond build."""
    from velostream_spark.functions.litarray import long_array_lit

    return long_array_lit(row)


# ---------------------------------------------------------------------------
# md5-hashed twin — engine-independent positions (classify.bucket_of's
# nibble parse), so DuckDB can rebuild the IDENTICAL grid and estimates in
# plain SQL: the gate built on this sketch gets an EXACT oracle, collisions
# included. xxhash64 (above) is the faster JVM-only production hash; the
# md5 twin is the cross-checkable one (same trade as classify.py documents).
# ---------------------------------------------------------------------------


def _pos_md5(key: Column, depth: int, w: int) -> Column:
    from velostream_spark.operators.classify import bucket_of

    return bucket_of(F.concat(key.cast("string"), F.lit(f"#{depth}")), w)


def pos_md5_sql(key_expr: str, depth: int, w: int) -> str:
    """The DuckDB spelling of :func:`_pos_md5` — value-identical (pinned
    in tests/test_cms.py via classify's bucket parity)."""
    from velostream_spark.operators.classify import bucket_of_sql

    return bucket_of_sql(f"concat(CAST({key_expr} AS VARCHAR), '#{depth}')", w)


def cms_build_md5(
    df: DataFrame,
    key_col: str,
    w: int = 4096,
    d: int = 3,
    weight_col: str | None = None,
) -> list[list[int]]:
    """:func:`cms_build` with md5-nibble positions (``w`` a power of 16).
    Same distributed shape: map-side-combined per-key counts, cell
    explode, grid-bounded reduce, d*w longs to the driver."""
    cnt = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(
            (
                F.sum(weight_col) if weight_col else F.count(F.lit(1))
            ).alias("_cnt")
        )
    )
    cells = cnt.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        _pos_md5(F.col(key_col), i, w).alias("pos"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("cell"),
        "_cnt",
    )
    rows = (
        cells.groupBy("cell.depth", "cell.pos")
        .agg(F.sum("_cnt").alias("c"))
        .collect()
    )
    grid = [[0] * w for _ in range(d)]
    for r in rows:
        grid[r["depth"]][r["pos"]] = r["c"]
    return grid


def cms_estimate_md5(key: Column, grid: list[list[int]], w: int) -> Column:
    """Codegen estimate over an md5-position grid (literal lookup, MIN
    over depths — zero Python, zero shuffle)."""
    lookups = [
        F.element_at(_row_lit(row), (_pos_md5(key, i, w) + 1).cast("int"))
        for i, row in enumerate(grid)
    ]
    return lookups[0] if len(lookups) == 1 else F.least(*lookups)
