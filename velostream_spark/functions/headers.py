"""Kafka-header functions — reference functions.rs:3747-3783 (HEADER,
HEADER_KEYS, HAS_HEADER, SET_HEADER, REMOVE_HEADER; mutations flow through
ProcessorResult.header_mutations).

Spark's Kafka source/sink exchange headers as `ARRAY<STRUCT<key: string,
value: binary>>` (`includeHeaders=true`); these are pure Column expressions
over that layout — mutations produce a NEW headers column to pass to the
sink, which is exactly how the reference applies header_mutations at write
time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def header(headers: Column, key: str | Column) -> Column:
    """HEADER(key) → header value (string; NULL if absent)."""
    k = F.lit(key) if isinstance(key, str) else key
    return F.try_element_at(
        F.map_from_entries(
            F.transform(headers, lambda h: F.struct(h.key, h.value.cast("string")))
        ),
        k,
    )


def header_keys(headers: Column) -> Column:
    """HEADER_KEYS() → array of header keys."""
    return F.transform(headers, lambda h: h.key)


def has_header(headers: Column, key: str | Column) -> Column:
    """HAS_HEADER(key) → boolean."""
    return header(headers, key).isNotNull()


def set_header(headers: Column, key: str, value: Column | str) -> Column:
    """SET_HEADER(key, value) → new headers array with key upserted."""
    v = F.lit(value) if isinstance(value, str) else value
    cleaned = F.filter(headers, lambda h: h.key != F.lit(key))
    entry = F.array(
        F.struct(F.lit(key).alias("key"), v.cast("binary").alias("value"))
    )
    return F.concat(F.coalesce(cleaned, F.array()), entry)


def remove_header(headers: Column, key: str) -> Column:
    """REMOVE_HEADER(key) → new headers array without key."""
    return F.filter(headers, lambda h: h.key != F.lit(key))
