"""Window vs grouped-join strategies for attaching group totals to rows.

The recurring shape in the text-statistics operators (tfidf df counts,
bigram LM context counts): a frame that is already one row per distinct
(group, member) needs each group's TOTAL attached to every row. Two
Spark-native forms with opposite scaling behavior:

- ``window`` — ``agg OVER (PARTITION BY keys)``: ONE pass, no second
  execution of the input subplan, but window functions have NO partial
  aggregation — a hot key's entire posting lands in one task (the
  stopword ceiling), and the whole frame is sorted inside the exchange.
  Fastest at moderate scale (measured 1.7x faster than the join form at
  the 128x spot on this corpus); superlinear once a key's posting
  outgrows a task (bigram_lm_score measured 5.2x wall for the last 4x
  data at the 512x spot).
- ``join`` — ``groupBy(keys).agg(...)`` then an equi-join back: the
  totals aggregation is map-side combined (the shuffle carries one row
  per distinct key PER MAP TASK, not per input row) and the join is
  AQE-skew-splittable, so no single task ever owns a hot key's posting.
  Costs a re-execution of the input subplan (the totals branch) and one
  more exchange — the price of unbounded-skew safety.

Pick per regime: window while every key's posting fits a task, join
beyond. Both produce identical rows (same totals attached), so the
oracle never changes — the parity tests pin both strategies against the
same SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F  # noqa: F401  (conventional import for callers)
from pyspark.sql.window import Window

__all__ = ["attach_group_agg", "choose_group_attach_strategy"]


def choose_group_attach_strategy(
    df: DataFrame,
    keys: Sequence[str],
    task_budget_rows: int | None = None,
) -> tuple[str, int, DataFrame]:
    """Measure-don't-guess router between the two strategies (r13 verdict
    task 5): ONE map-side-combined probe — ``groupBy(keys).count()`` then
    a global max/sum — yields the LARGEST key posting exactly. The window
    form is the measured winner while every posting fits a task (PERF.md
    1x/128x spots); it goes superlinear once a hot key's posting outgrows
    one (the bigram 512x spot), so the router returns ``window`` below
    the task budget and ``join`` above it. The probe's shuffle is
    vocabulary-bounded (one row per distinct key per map task — the same
    shape as the join strategy's own totals aggregation, so the probe
    costs a fraction of either strategy run).

    ``task_budget_rows`` defaults to max(2M, 4·rows/shuffle-partitions):
    2M rows of ~30 B postings ≈ 60 MB in one task — comfortably inside an
    executor; the measured boundary sits between the 128x spots (hot
    postings ~1.5M, window still 1.7x faster) and the bigram 512x spot
    (postings past the budget, window 5.2x superlinear). Returns
    ``(strategy, max_posting, per_key_counts)`` — when the router picks
    ``join`` and the caller's attach IS a row count over the same keys
    (tfidf's df attach), the counts frame doubles as the join strategy's
    ``totals``, so the probe's pass is reused instead of recomputed."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_c"))
    row = per_key.agg(
        F.max("_c").alias("mx"), F.sum("_c").alias("n")
    ).first()
    mx = int(row["mx"] or 0)
    n = int(row["n"] or 0)
    if task_budget_rows is None:
        parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        task_budget_rows = max(2_000_000, 4 * n // max(parts, 1))
    return ("join" if mx > task_budget_rows else "window"), mx, per_key


def attach_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    expr: Column,
    out_col: str,
    strategy: str = "window",
    totals: DataFrame | None = None,
) -> DataFrame:
    """``df`` + one column ``out_col`` = ``expr`` aggregated over all rows
    sharing ``keys`` (every input row kept, INNER-join semantics are safe
    because each row's own group trivially exists).

    ``totals`` (join strategy only) substitutes a precomputed per-key
    totals frame — ``keys`` plus one or MORE total columns (a merged
    model frame attaches them all in the single join; ``expr``/``out_col``
    are ignored then) — for the derived ``df.groupBy(keys)``: callers
    that already materialized the totals (e.g. a checkpointed model frame
    reused by several attaches) skip the input-subplan re-execution that
    is the join form's documented cost."""
    if strategy == "window":
        return df.withColumn(
            out_col, expr.over(Window.partitionBy(*[F.col(k) for k in keys]))
        )
    if strategy == "join":
        if totals is None:
            totals = df.groupBy(*keys).agg(expr.alias(out_col))
        return df.join(totals, list(keys))
    raise ValueError(f"strategy must be 'window' or 'join', got {strategy!r}")
