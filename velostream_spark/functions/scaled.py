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
    an EXACT decimal of at least the given scale, so casting the result to
    double afterwards rounds once — the same single rounding a DECIMAL
    engine performs.

    A single decimal division can't do this: Spark's default
    ``allowPrecisionLoss`` turns decimal(38,0)/decimal(p,0) into
    decimal(38,6), pre-rounding at 6 fractional digits for scales > 6.
    Instead the shift is a quotient/remainder split — both integer-exact:
    ``q = floor(v / 10^s)`` (a ±1 error from the rounded division is
    harmless, the remainder absorbs it exactly), ``r = v - q*10^s``
    (pure integer ops), and ``q + r/10^s`` where the remainder division
    IS exact because r's precision is small (0 <= r < 10^s plus the ±1
    floor slack, so the result decimal((s+2)+fs, fs) fits under 38
    without precision loss). The identity q + (v - q*10^s)/10^s == v/10^s
    holds for ANY q, so floor's round-toward-negative-infinity on
    negative values costs nothing — the remainder absorbs it exactly.
    (Deliberately NOT computed via abs()/unary-minus: Spark's decimal
    negation is off by one for negative values of 35+ digits —
    UnaryMinus(-(10^35-1)) returns 10^35; pinned in
    tests/test_scaled_integer.py so an eventual upstream fix is visible.)
    Domain: |scaled value| < 10^(min(31+scale, 35)) - 10^scale — Spark's
    division rule caps the quotient at 31 integer digits when the result
    scale floors at 6 (scales <= 4), the exact final addition caps the
    unscaled result at 10^(35-scale) above that, and the last 10^scale is
    floor's ±1 headroom on negatives. All far above any reachable
    ``scaled_sum`` (i64 per-row values × 10^13-row groups ≈ 10^32 at
    scale 12). Out-of-domain values overflow (raise under ANSI, NULL
    under the permissive reference dialect — the same contract as
    scaled_mul). Exactness vs Python Decimal pinned across scales 0-17 at
    both signed domain boundaries in tests/test_scaled_integer.py.
    """
    if scale == 0:
        return col.cast("decimal(38,0)")
    d = col.cast("decimal(38,0)")
    pow10 = F.lit(10 ** scale).cast(f"decimal({scale + 1},0)")
    q = F.floor(d / pow10)
    r = (d - q.cast("decimal(38,0)") * pow10).cast(f"decimal({scale + 2},0)")
    fs = max(6, scale + 2)  # Spark's division result scale: max(6, s1+p2+1)
    frac = r / pow10
    return q.cast(f"decimal({38 - fs - 1},0)") + frac
