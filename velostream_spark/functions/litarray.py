"""Single-node array literals, transferred in bulk (r16, guide §5 — the
driver is single-process work; plan-build time is part of every query's
latency).

Two separate costs made big constant arrays (CMS grids, Bloom bitmaps,
classifier weight vectors, LSH hyperplanes) expensive to put in a plan:

1. ``F.lit(list)`` builds a ``CreateArray`` with one child Literal per
   element — a 3×4096 grid is 12K+ expression nodes that Catalyst
   re-walks on every analysis/optimization pass (measured ~2 s of the
   heavy_hitters_cms derive wall; the Bloom probe references its bitmap
   at k=5 sites, multiplying the tree).
2. ``F.lit(np.ndarray)`` produces ONE Literal node — but py4j's array
   converter transfers it element-by-element over the gateway
   (~140 µs/element: 0.57 s per 4096-long array, measured).

The helpers here do both cheaply: the values cross py4j ONCE as a byte
buffer (py4j ships ``bytearray`` in a single binary frame), a JVM-side
``ByteBuffer.asLongBuffer().get(long[])`` bulk-copies them, and
``functions.lit(long[])`` wraps the primitive array in ONE Literal of
``array<long>`` / ``array<double>`` — byte-identical values, the same
``element_at`` plan shape, microsecond transfer (3×4096 longs: 1.78 s as
np-lit → 0.035 s here, measured on this host).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

__all__ = ["long_array_lit", "double_array_lit"]


def _np_fallback(vals, dtype) -> Column:
    # no active session (plan built before any SparkSession exists):
    # still ONE Literal node, just the slower element-wise transfer
    return F.lit(np.asarray(vals, dtype=dtype))


def long_array_lit(vals: Sequence[int]) -> Column:
    """ONE ``array<long>`` Literal from ``vals``, bulk-transferred."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return _np_fallback(vals, np.int64)
    sc = spark.sparkContext
    jvm = sc._jvm
    buf = jvm.java.nio.ByteBuffer.wrap(
        bytearray(np.asarray(vals, dtype=">i8").tobytes())
    ).asLongBuffer()
    dst = sc._gateway.new_array(jvm.long, len(vals))
    buf.get(dst)
    return Column(jvm.org.apache.spark.sql.functions.lit(dst))


def double_array_lit(vals: Sequence[float]) -> Column:
    """ONE ``array<double>`` Literal from ``vals``, bulk-transferred."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return _np_fallback(vals, np.float64)
    sc = spark.sparkContext
    jvm = sc._jvm
    buf = jvm.java.nio.ByteBuffer.wrap(
        bytearray(np.asarray(vals, dtype=">f8").tobytes())
    ).asDoubleBuffer()
    dst = sc._gateway.new_array(jvm.double, len(vals))
    buf.get(dst)
    return Column(jvm.org.apache.spark.sql.functions.lit(dst))
