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


# --- FR-090 header propagation policies (docs/feature/FR-090-header-prop) ---

#: Header injected by the Kafka writer carrying the record's event time; a
#: grouped output's value would be stale, so the reference strips it before
#: re-emit (types.rs:1658-1659 ``headers.remove(system_columns::EVENT_TIME)``).
EVENT_TIME_HEADER = "_event_time"


def agg_headers(headers: Column, order: Column) -> Column:
    """Group-level header propagation for N:1 aggregations (FR-090).

    The reference attaches the group's ``sample_record`` headers to every
    aggregate output row, stripping the stale ``_event_time`` header so the
    sink can inject a fresh one (``with_headers_from``, types.rs:1657-1670;
    applied at engine.rs:1457-1461 for GROUP BY and window_v2/adapter.rs:
    1084-1089 for windowed aggregations).

    ADJUDICATION — first-event-wins, not last. FR-090's README and the
    engine.rs:1456 comment say "last-event-wins", but every LIVE assignment
    of ``sample_record`` keeps the FIRST record of the group
    (aggregation/accumulator.rs:66-68, processors/select.rs:1574-1576,
    internal.rs:363-365 "Store first values"); the always-overwrite
    ``set_sample_record`` (internal.rs:370) has zero callers. First-record
    sampling is also what feeds ungrouped bare SELECT columns under GROUP
    BY — a semantics this repo already mirrors (any_value over the same
    arrival order). We mirror the EXECUTED behavior: ``min_by(headers,
    order)`` per group, ``order`` being the stream arrival proxy
    ``struct(_timestamp, _offset)`` (Kafka delivery order per partition).
    """
    return remove_header(F.min_by(headers, order), EVENT_TIME_HEADER)


def join_headers(left_headers: Column) -> Column:
    """Join header policy: LEFT side's headers, unchanged (FR-090;
    processors/join.rs:425-426 "Use left-side headers by default (matches
    Kafka Streams behavior)")."""
    return left_headers


def join_timestamp(left_ts: Column, right_ts: Column) -> Column:
    """Joined record's ``_timestamp`` is the max of the two sides
    (processors/join.rs:422 ``left_record.timestamp.max(right_record
    .timestamp)``)."""
    return F.greatest(left_ts, right_ts)
