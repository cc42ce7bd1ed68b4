"""Skew & co-location utilities — the 100-TB levers the engine reaches for
when AQE alone isn't enough.

The reference runs single-process and routes records to partition workers
by hash (server/v2/partitioner_selector.rs) — hot keys simply saturate one
worker. In Spark the same hot keys saturate one reducer; these utilities
are the distributed fixes:

- ``salted_agg``: two-phase aggregation — partial aggregate on
  (key, salt), then final aggregate on key. Hot keys fan out over
  ``n_salts`` reducers in phase 1; phase 2 combines ``n_salts`` rows per
  key. Works for any algebraic aggregate (sum/count/min/max, and avg via
  sum+count recombination).
- ``salted_join``: replicate the small side ``n_salts``× with an exploded
  salt column, salt the big side randomly-but-deterministically (hash of a
  unique column), join on (key, salt). For hot FK keys that AQE's skew
  split can't fix (single huge *partition value*, not partition).
- ``bucketed_write`` / co-located joins: persist both join sides bucketed
  by the join key → joins become Exchange-free (proven in test_plans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregates that recombine by the same function (partial == final)
_REAGG = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs``: out_col → (fn, col) with fn ∈ {sum, count, min, max, avg}.
    ``salt_on``: column/expression whose hash spreads rows of one key
    across salts (default: per-row random-free spread via all columns'
    hash — deterministic given the data).
    """
    if salt_on is None:
        salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    else:
        s = F.col(salt_on) if isinstance(salt_on, str) else salt_on
        salt = F.pmod(F.hash(s), F.lit(n_salts))
    salted = df.withColumn("_salt", salt)

    partials, finals = [], []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partials.append(F.count(col).alias(f"_p_{out}"))
            finals.append(F.sum(f"_p_{out}").cast("long").alias(out))
        elif fn == "avg":
            partials.append(F.sum(col).alias(f"_ps_{out}"))
            partials.append(F.count(col).alias(f"_pc_{out}"))
            finals.append(
                (F.sum(f"_ps_{out}") / F.sum(f"_pc_{out}")).alias(out)
            )
        elif fn in _REAGG:
            partials.append(_REAGG[fn](col).alias(f"_p_{out}"))
            finals.append(_REAGG[fn](f"_p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported salted agg fn: {fn!r}")
    phase1 = salted.groupBy(*keys, "_salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    big_salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: small side replicated n_salts×, big side salted
    deterministically; join on (key, salt). Shuffle of the big side spreads
    each hot key over n_salts reducers."""
    if big_salt_on is None:
        spread = F.hash(*[F.col(c) for c in big.columns])
    else:
        spread = F.hash(F.col(big_salt_on))
    b = big.withColumn("_salt", F.pmod(spread, F.lit(n_salts)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")


def bucketed_write(
    df: DataFrame,
    table_name: str,
    bucket_by: str | list[str],
    n_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.
    Two tables bucketed the same way join with ZERO exchanges — the
    pre-partitioning is reused across every downstream join/agg on that
    key (the Spark analog of the reference's keyed-table locality).
    ``path`` makes it an external table (data outside the warehouse dir)."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *cols)
    if sort_by:
        sc = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sc)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)
