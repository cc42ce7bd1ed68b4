"""Mirror of the driver's DuckDB-oracle correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and order-insensitive
values (rows sorted by every column, columns sorted by name) — the same
shape of check the driver performs, applied strictly (exact equality, with a
tiny absolute epsilon for float columns to allow for last-ulp accumulation
differences; catalog queries round aggregates so this epsilon is ~never
exercised).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from velostream_spark.session import TABLE_NAMES

FLOAT_ATOL = 1e-9


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    sort_cols = list(df.columns)
    if sort_cols:
        df = df.sort_values(sort_cols, na_position="first", kind="mergesort")
    return df.reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty ⇒ match)."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver hashes stringified values, so an integer column on one
        # side vs a float column on the other ("107" vs "107.0") is a real
        # failure even when the numbers are equal — most commonly DuckDB's
        # HUGEINT result of SUM(int) arriving as float64 while Spark returns
        # int64. Flag the dtype-class divergence itself instead of coercing.
        a_int, b_int = (pd.api.types.is_integer_dtype(x) for x in (av, bv))
        a_flt, b_flt = (pd.api.types.is_float_dtype(x) for x in (av, bv))
        if (a_int and b_flt) or (a_flt and b_int):
            problems.append(
                f"col {c}: dtype class mismatch (spark={av.dtype} vs "
                f"oracle={bv.dtype}) — driver hashes '1' vs '1.0' differently; "
                f"CAST the oracle (or Spark side) so both are the same class"
            )
            continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av_f = av.astype("float64").to_numpy()
            bv_f = bv.astype("float64").to_numpy()
            both_nan = np.isnan(av_f) & np.isnan(bv_f)
            close = np.isclose(av_f, bv_f, rtol=0.0, atol=FLOAT_ATOL, equal_nan=True)
            bad = ~(close | both_nan)
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {int(bad.sum())} float mismatches, first at row {i}: "
                    f"spark={av_f[i]!r} oracle={bv_f[i]!r}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at row {i}: "
                    f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
                )
    return problems


def check_query(spark, name: str, sf_dir: str) -> tuple[int, list[str]]:
    """Run catalog query `name` on Spark + DuckDB; return (rows, problems)."""
    from velostream_spark.registry import all_queries

    entry = all_queries()[name]
    sdf = entry.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if entry.oracle is None:
        ok = len(spark_pdf) >= 0 and not math.isnan(len(spark_pdf))
        return len(spark_pdf), [] if ok else ["rows-only check failed"]
    oracle_pdf = run_oracle(entry.oracle, sf_dir)
    return len(spark_pdf), compare_frames(spark_pdf, oracle_pdf)
