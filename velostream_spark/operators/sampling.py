"""Dataset-curation operators for training-data pipelines: deterministic
sampling and sequence packing.

Beyond the reference's operator set (its pipelines stop at SQL analytics);
these are the selection/batching stages a 100-TB pretraining corpus needs
between dedup and tokenization. Both are pure Catalyst expressions — no
UDFs, no shuffles beyond the declared window/group keys, and reproducible
across engines (the sampling hash is plain modular arithmetic, not an
engine-specific hash(), so a DuckDB oracle computes bit-identical
decisions).

- Deterministic sampling: keep a row iff
  ``((id % P) * KNUTH) % 1000 < fraction*1000`` — P a prime below 2^30 and
  KNUTH the multiplicative-hash constant 2654435761; the product stays
  under 2^62 so int64 arithmetic never overflows on either engine. A
  stable sample: re-running, or running on another engine, selects the
  same rows (sampleBy/rand() cannot promise either).
- Stratified sampling: per-stratum fractions (e.g. downsample English,
  keep all low-resource languages) via one CASE over the same hash.
- Sequence packing: greedy linear packing of documents into
  fixed-token-budget bins per stratum — pack boundaries from a prefix sum
  over a deterministic order, entirely inside WindowExec codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sample_hash", "deterministic_sample", "stratified_sample", "pack_sequences"]

_P = 999999937  # prime < 2^30
_KNUTH = 2654435761  # 2^32 / golden ratio — Knuth multiplicative hashing


def sample_hash(id_col: Column) -> Column:
    """Deterministic per-row bucket in [0, 1000) from an integer id."""
    return ((id_col % _P) * F.lit(_KNUTH)) % 1000


def sample_hash_sql(id_expr: str) -> str:
    """The identical bucket computation as ANSI SQL (for oracles/other
    engines)."""
    return f"(({id_expr} % {_P}) * {_KNUTH}) % 1000"


def deterministic_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Keep a reproducible ``fraction`` of rows, decided per-row from the
    id alone (no RNG state, no engine dependence)."""
    return df.where(sample_hash(F.col(id_col)) < int(fraction * 1000))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps stratum value
    → keep-fraction; unlisted strata keep ``default_fraction``."""
    threshold = F.lit(int(default_fraction * 1000))
    for value, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(frac * 1000))
        ).otherwise(threshold)
    return df.where(sample_hash(F.col(id_col)) < threshold)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    strata_col: str | None = None,
) -> DataFrame:
    """Assign each document a ``pack_id`` such that consecutive documents
    (in deterministic ``id_col`` order, per stratum) share a pack until the
    token budget is exhausted — greedy linear packing, the standard
    streaming construction for fixed-context-window batches.

    ``pack_id = floor((prefix_tokens - tokens) / budget)``: a pack may
    overflow by at most one document (documents longer than the budget get
    their own pack). One WindowExec pass; the only shuffle is on the
    stratum key (or a single partition without strata — callers at scale
    should always pass a stratum/shard column).
    """
    keys = [strata_col] if strata_col else []
    w = (
        Window.partitionBy(*keys).orderBy(id_col)
        if keys
        else Window.orderBy(id_col)
    )
    prefix = F.sum(token_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "pack_id", F.floor((prefix - F.col(token_col)) / F.lit(budget))
    )


def pack_sequences_ffd(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    strata_col: str | None = None,
) -> DataFrame:
    """First-fit-decreasing bin packing per stratum: documents sorted by
    (tokens desc, id asc) are placed into the first open pack with room —
    the classic near-optimal (≤ 11/9 OPT + 1) packing that cuts padding
    waste vs ``pack_sequences``' greedy sequential split. Oversized
    documents (> budget) get singleton packs, like the greedy form.

    Scale shape: ONE shuffle on the stratum key, then each stratum packs
    independently inside an ``applyInPandas`` cell — bin state never
    crosses strata, so parallelism is the stratum count (callers at scale
    pass a stratum/shard column, exactly as for pack_sequences). The
    in-cell first-fit scan short-circuits on a running max remainder
    (documents that open a new pack skip the scan entirely); worst case
    is O(n·packs) — strata bound n. Deterministic: same input ⇒ same
    packs, any arrival order
    (the in-cell sort is total). Iterative state makes this inherently
    non-SQL-expressible — exactness is pinned in tests/test_curation.py
    against invariants + an independent reference implementation.
    """
    import pandas as pd

    # Derive the id column's type from the input schema (as semdedup does)
    # rather than hardcoding long: string/uuid doc ids must pass through
    # the Arrow boundary unchanged (round-8 advice).
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, _stratum string, {token_col} long, pack_id long"
    )

    def pack_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True], kind="mergesort"
        )
        toks = pdf[token_col].to_numpy()
        assign = _ffd_assign(toks, budget)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "_stratum": pdf["_stratum"].to_numpy(),
                token_col: toks,
                "pack_id": assign,
            }
        )

    staged = df.withColumn(
        "_stratum",
        F.col(strata_col).cast("string") if strata_col else F.lit("all"),
    ).select(id_col, "_stratum", F.col(token_col).cast("long").alias(token_col))
    return staged.groupBy("_stratum").applyInPandas(pack_cell, out_schema)


def _ffd_assign(toks, budget: int) -> list[int]:
    """First-fit-decreasing pack assignment for one stratum's token sizes
    (already sorted descending). Open packs live in OPEN ORDER and each
    document takes the FIRST-OPENED pack that fits — true first-fit, not
    best-fit; a running max of remainders short-circuits the scan for
    documents that must open a new pack. Worst case O(n·packs)."""
    remaining: list[int] = []  # remainder per pack, in open order
    max_rem = -1
    assign = []
    for t in toks:
        t = int(t)
        placed = -1
        if t <= max_rem:
            for j, r in enumerate(remaining):
                if r >= t:
                    placed = j
                    break
        if placed < 0:
            remaining.append(budget - t)
            placed = len(remaining) - 1
        else:
            remaining[placed] -= t
        assign.append(placed)
        max_rem = max(remaining)
    return assign


def pack_sequences_ffd_summary(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    strata_col: str | None = None,
) -> DataFrame:
    """:func:`pack_sequences_ffd` reduced to PER-PACK summary rows in the
    SAME single Arrow pass — for validation/reporting consumers that never
    need the per-document assignment (r15 verdict task 8: the FFD query
    consumed the packed frame twice — a per-pack aggregate branch and a
    per-stratum distinct-id branch — and Spark has no CSE across join
    branches, so the whole explode+pack subtree ran TWICE). Each stratum
    cell runs the identical :func:`_ffd_assign` and emits one row per
    pack: doc count, token sum, oversized count — plus the stratum's
    distinct-id count repeated on every row, so coverage checks need no
    second pass. One groupBy(stratum) exchange, one Python subtree."""
    import numpy as np
    import pandas as pd

    out_schema = (
        "_stratum string, pack_id long, n_docs long, pack_tokens long, "
        "n_over long, stratum_distinct_ids long"
    )

    def summarize_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n_distinct = int(pdf[id_col].nunique())
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True], kind="mergesort"
        )
        toks = pdf[token_col].to_numpy()
        assign = np.asarray(_ffd_assign(toks, budget), dtype=np.int64)
        n_packs = int(assign.max()) + 1 if len(assign) else 0
        return pd.DataFrame(
            {
                "_stratum": pdf["_stratum"].iloc[:1].repeat(n_packs).to_numpy()
                if n_packs
                else pdf["_stratum"].iloc[:0].to_numpy(),
                "pack_id": np.arange(n_packs, dtype=np.int64),
                "n_docs": np.bincount(assign, minlength=n_packs).astype(np.int64),
                "pack_tokens": np.bincount(
                    assign, weights=toks, minlength=n_packs
                ).astype(np.int64),
                "n_over": np.bincount(
                    assign, weights=(toks > budget), minlength=n_packs
                ).astype(np.int64),
                "stratum_distinct_ids": np.full(n_packs, n_distinct, dtype=np.int64),
            }
        )

    staged = df.withColumn(
        "_stratum",
        F.col(strata_col).cast("string") if strata_col else F.lit("all"),
    ).select(id_col, "_stratum", F.col(token_col).cast("long").alias(token_col))
    return staged.groupBy("_stratum").applyInPandas(summarize_cell, out_schema)
