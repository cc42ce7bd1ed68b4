"""Hashing-trick linear text classifier — model inference as a projection.

The fastText/VW-style quality classifier every curation pipeline runs over
100 TB of documents: featurize each word by HASHING it into a fixed bucket
space (no vocabulary table, no OOV problem), look the bucket's weight up
in a trained dense vector, and score the document as sigmoid(mean weight).
The training happens offline; INFERENCE is the at-scale operation, and
the whole point of this operator is its plan shape:

- the weight vector ships as an ``array<double>`` LITERAL (a 4096-bucket
  model is 32 KB — it rides the task closure like a broadcast);
- featurize + lookup + mean run inside ``F.aggregate`` over the staged
  words array — scan-side, whole-stage codegen, ZERO shuffle, zero
  Python: scoring a petabyte is embarrassingly parallel and this plan
  keeps it that way (one row per document in, one out, no exchange).

Bucket hash: the first ``k`` hex nibbles of ``md5(word)`` parsed as an
integer — ``n_buckets`` must be a power of 16 so the parse IS the modulo.
md5 keeps the engine-independent oracle story (DuckDB computes the same
nibbles via strpos arithmetic; xxhash64 would be faster but exists only
on the JVM side — the swap is one line if oracle parity is not needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bucket_of", "bucket_of_sql", "linear_text_score"]

_HEX = "0123456789abcdef"


def bucket_of(word: Column, n_buckets: int) -> Column:
    """Feature bucket of ``word``: the first k nibbles of md5 as an int."""
    k = _nibbles(n_buckets)
    return F.conv(F.substring(F.md5(word), 1, k), 16, 10).cast("int")


def bucket_of_sql(word_expr: str, n_buckets: int) -> str:
    """The DuckDB spelling of :func:`bucket_of` (nibble arithmetic —
    DuckDB has no hex-string-to-int cast), guaranteed value-identical."""
    k = _nibbles(n_buckets)
    terms = [
        f"(strpos('{_HEX}', substr(md5({word_expr}), {i + 1}, 1)) - 1) * {16 ** (k - 1 - i)}"
        for i in range(k)
    ]
    return "(" + " + ".join(terms) + ")"


def _nibbles(n_buckets: int) -> int:
    k = 0
    b = n_buckets
    while b > 1:
        if b % 16:
            raise ValueError(f"n_buckets must be a power of 16, got {n_buckets}")
        b //= 16
        k += 1
    if k == 0:
        raise ValueError(f"n_buckets must be a power of 16 and >= 16, got {n_buckets}")
    return k


def linear_text_score(
    words_array: Column, weights: list[float], score_col: str = "score"
) -> Column:
    """``round(sigmoid(mean(weights[bucket(word)])), 6)`` over a STAGED
    words-array column (stage it first — an expression rebuilt inside the
    lambda would re-evaluate per element, the lambda-CSE trap). NULL when
    the array is empty. The aggregate runs scan-side: no explode, no
    shuffle, one weight lookup per word inside codegen."""
    n = len(weights)
    # ONE bulk-transferred array<double> Literal node, not a CreateArray
    # with n child literals — the 4096-element list form cost ~0.5 s of
    # Catalyst analysis per plan build (r16, guide §5 —
    # functions/litarray.py).
    from velostream_spark.functions.litarray import double_array_lit

    w = double_array_lit([float(x) for x in weights])
    total = F.aggregate(
        words_array,
        F.lit(0.0),
        lambda acc, word: acc + F.element_at(w, bucket_of(word, n) + 1),
    )
    # the empty-array branch must be explicit: under spark.sql.ansi.enabled
    # the bare 0/0 raises DIVIDE_BY_ZERO instead of yielding the documented
    # NULL (CaseWhen evaluates the division branch lazily, so the guard
    # holds in ANSI mode too)
    mean = F.when(F.size(words_array) > 0, total / F.size(words_array))
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean)), 6).alias(score_col)
