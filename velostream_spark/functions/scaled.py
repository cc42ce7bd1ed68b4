"""ScaledInteger arithmetic — the reference's flagship exact-money type
(FieldValue::ScaledInteger(i64, u8), types.rs:52-79; "42x faster than f64,
exact", README.md:14) re-expressed as Spark Column combinators.

The idea is identical to the reference's: a fixed-point value is an i64 of
``value x 10^scale``; add/multiply/compare run as plain integer machine ops
instead of decimal software arithmetic. In Spark the same trick matters for
a different reason: DecimalType with result precision <= 18 is a compact
long internally, but any product of two (18,s) decimals has precision 37+
and falls back to JavaBigDecimal allocation per row inside the codegen
loop. Scaled longs keep the whole expression in primitive i64 codegen.

Overflow discipline (the part the reference handles by panicking —
scaled_arithmetic.rs): per-ROW products must fit i64, so combined scales
are capped at 10^18/max|value| BY THE CALLER (each use site documents its
bound); per-GROUP sums are accumulated as DECIMAL(38,0) of the scaled
longs — exact at any group size (a 100-TB group of 10^13 cent-rows sums
to ~10^18x10^4, far under 10^38), while the row-side arithmetic stays
primitive. Under ANSI mode a row-side overflow raises (the reference's
panic contract, pinned in tests); the engine's own sessions run the
permissive reference dialect (ansi off), where the scale cap is the
protection — same as the reference choosing scales for its i64.
``from_scaled`` shifts back via exact decimal division by 10^scale, so no
float rounding enters until the caller explicitly casts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_scaled(col: Column | str, scale: int) -> Column:
    """DOUBLE/DECIMAL column -> scaled i64 (``round(x * 10^scale)``).

    Matches ``CAST(x AS DECIMAL(p, scale))`` rounding (HALF_UP) for values
    within i64 range; exact for inputs that carry <= ``scale`` decimal
    digits (money columns by construction).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(10 ** scale)).cast("long")


def scaled_mul(a: Column, b: Column) -> Column:
    """Product of two scaled longs — result scale is the SUM of the input
    scales; caller tracks scales (as the reference does in its
    ScaledInteger ops). Pure i64 multiply in codegen; combined scale must
    keep per-row magnitude under 2^63."""
    return a * b


def scaled_sum(col: Column) -> Column:
    """Group SUM of a scaled-long column, exact at any group size: the
    scaled longs are widened to DECIMAL(38,0) so the aggregate cannot
    overflow, while every per-row op stays primitive."""
    return F.sum(col.cast("decimal(38,0)"))


def from_scaled(col: Column, scale: int) -> Column:
    """Scaled value (long or the DECIMAL(38,0) of ``scaled_sum``) back to
    an exact decimal of the given scale: decimal division by 10^scale is
    an exact scale shift, so casting the result to double afterwards
    rounds once — the same single rounding a DECIMAL engine performs."""
    return col.cast("decimal(38,0)") / F.lit(10 ** scale).cast("decimal(19,0)")
