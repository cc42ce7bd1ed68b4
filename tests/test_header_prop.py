"""FR-090 header propagation policies (docs/feature/FR-090-header-prop).

The reference's executed policy matrix (README status table, verified
against the live code paths):

- SELECT / WHERE / projection / ROWS OVER: preserve (1:1) — in Spark the
  headers column simply flows through the plan, pinned here.
- GROUP BY / windowed aggregation (N:1): the group's sample_record headers
  with `_event_time` stripped (with_headers_from, types.rs:1657-1670).
  ADJUDICATION: FR-090 says "last-event-wins" but every live sample_record
  assignment keeps the FIRST record (accumulator.rs:66-68, select.rs:
  1574-1576, internal.rs:363-365); set_sample_record (internal.rs:370) is
  dead code. We mirror the executed first-event behavior.
- JOIN: left-side headers (join.rs:425-426), output timestamp =
  max(left, right) (join.rs:422).
- Sink: headers column passes through to the producer wire.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velostream_spark.functions.headers import (
    EVENT_TIME_HEADER,
    agg_headers,
    has_header,
    header,
    join_headers,
    join_timestamp,
    remove_header,
    set_header,
)
from velostream_spark.sources.kafka import sink_frame


def _hdrs(*pairs: tuple[str, str]):
    return [{"key": k, "value": v.encode()} for k, v in pairs]


@pytest.fixture(scope="module")
def traded(spark):
    """A mock decoded Kafka stream: per-record headers + arrival order."""
    rows = [
        ("AAPL", 10.0, 1000, 0, _hdrs(("trace-id", "A"), (EVENT_TIME_HEADER, "999"))),
        ("AAPL", 11.0, 1000, 1, _hdrs(("trace-id", "B"))),
        ("AAPL", 12.0, 2000, 2, _hdrs(("trace-id", "C"))),
        ("MSFT", 20.0, 1500, 3, _hdrs(("trace-id", "D"), ("corr-id", "x"))),
    ]
    return spark.createDataFrame(
        rows,
        "symbol string, price double, _timestamp long, _offset long, "
        "headers array<struct<key:string,value:binary>>",
    )


def test_agg_headers_first_event_wins_and_strips_event_time(spark, traded):
    out = (
        traded.groupBy("symbol")
        .agg(
            F.sum("price").alias("total"),
            agg_headers(F.col("headers"), F.struct("_timestamp", "_offset")).alias(
                "headers"
            ),
        )
        .select(
            "symbol",
            header(F.col("headers"), "trace-id").alias("trace"),
            has_header(F.col("headers"), EVENT_TIME_HEADER).alias("has_et"),
        )
    )
    got = {r["symbol"]: (r["trace"], r["has_et"]) for r in out.collect()}
    # AAPL's FIRST record (ts=1000, offset=0) carried trace A and a stale
    # _event_time header; the propagated set keeps A and drops _event_time.
    assert got["AAPL"] == ("A", False)
    assert got["MSFT"] == ("D", False)


def test_join_headers_left_side_and_max_timestamp(spark):
    left = spark.createDataFrame(
        [("AAPL", 1000, _hdrs(("trace-id", "L")))],
        "symbol string, _timestamp long, headers array<struct<key:string,value:binary>>",
    )
    right = spark.createDataFrame(
        [("AAPL", 2500, _hdrs(("trace-id", "R")))],
        "symbol string, r_ts long, r_headers array<struct<key:string,value:binary>>",
    )
    out = (
        left.join(right, "symbol")
        .select(
            join_headers(F.col("headers")).alias("headers"),
            join_timestamp(F.col("_timestamp"), F.col("r_ts")).alias("_timestamp"),
        )
        .select(header(F.col("headers"), "trace-id").alias("trace"), "_timestamp")
        .collect()[0]
    )
    assert out["trace"] == "L"
    assert out["_timestamp"] == 2500


def test_sink_frame_passes_headers_to_the_wire(spark, traded):
    mutated = traded.withColumn(
        "headers", set_header(F.col("headers"), "stage", F.lit("enriched"))
    ).withColumn("headers", remove_header(F.col("headers"), EVENT_TIME_HEADER))
    out = sink_frame(mutated, key_fields=["symbol"])
    assert set(out.columns) == {"key", "value", "headers"}
    row = out.filter(F.col("key") == "MSFT").collect()[0]
    hdrs = {h["key"]: bytes(h["value"]).decode() for h in row["headers"]}
    assert hdrs == {"trace-id": "D", "corr-id": "x", "stage": "enriched"}
    # headers never leak into the JSON value payload
    assert "trace-id" not in row["value"]


def test_sink_frame_confluent_path_keeps_headers(spark, tmp_path, traded):
    import json

    reg = tmp_path / "registry"
    (reg / "trades").mkdir(parents=True)
    schema = {
        "type": "record",
        "name": "Trade",
        "fields": [
            {"name": "symbol", "type": "string"},
            {"name": "price", "type": "double"},
            {"name": "_timestamp", "type": "long"},
            {"name": "_offset", "type": "long"},
        ],
    }
    (reg / "trades" / "1.avsc").write_text(json.dumps(schema))
    out = sink_frame(
        traded,
        key_fields=["symbol"],
        cfg={
            "value.format": "avro_confluent",
            "avro.schema.registry.path": str(reg),
            "avro.schema.subject": "trades",
        },
    )
    assert {"key", "value", "headers"} <= set(out.columns)
    row = out.filter(F.col("key") == "MSFT").collect()[0]
    hdrs = {h["key"] for h in row["headers"]}
    assert {"trace-id", "corr-id"} <= hdrs
    assert bytes(row["value"])[0] == 0  # Confluent magic byte intact
