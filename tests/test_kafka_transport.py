"""Kafka pipeline logic, end-to-end over a broker-free mock transport.

The spark-sql-kafka connector jar is absent from this environment (verified:
no kafka jar under /opt/spark/jars or pyspark/jars, no network to fetch one),
so `readStream.format("kafka")` can never execute here. What CAN be tested
end-to-end is everything velostream-spark adds on top of the connector —
system-column projection, JSON/Avro value decode, PRIMARY-KEY message keys,
tombstones — by building DataFrames with the connector's exact output schema
(key/value binary, headers array<struct<key,value>>, topic/partition/offset/
timestamp) and running the real pipeline functions over them.

Mirrors reference tests/integration/kafka/kafka_consumer_integration_test.rs
at the same seam: the reference mocks the consumer, we mock the wire frame.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from velostream_spark.sources.avro_binary import AvroBinaryCodec
from velostream_spark.sources.kafka import (
    decode_avro_value,
    decode_json_value,
    message_key,
    sink_frame,
    tombstones,
    with_system_columns,
)
from velostream_spark.sources.schema_registry import FileSchemaRegistry

# Spark's Kafka connector output schema, verbatim
KAFKA_FRAME = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField(
            "headers",
            ArrayType(
                StructType(
                    [
                        StructField("key", StringType()),
                        StructField("value", BinaryType()),
                    ]
                )
            ),
        ),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def _mock_topic(spark, values: list[bytes], topic="orders"):
    rows = [
        (
            f"k{i}".encode(),
            v,
            [("trace", f"t{i}".encode())],
            topic,
            i % 2,
            i,
            dt.datetime(2026, 8, 13, 9, 0, i),
            0,
        )
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, KAFKA_FRAME)


def test_json_value_pipeline_end_to_end(spark):
    payloads = [
        json.dumps({"order_id": i, "symbol": f"S{i % 3}", "amount": i * 1.5}).encode()
        for i in range(6)
    ]
    raw = _mock_topic(spark, payloads)
    sys_df = with_system_columns(raw)
    assert {"_timestamp", "_offset", "_partition", "_topic", "_key"} <= set(
        sys_df.columns
    )
    decoded = decode_json_value(
        sys_df, "order_id long, symbol string, amount double"
    ).orderBy("order_id")
    rows = decoded.collect()
    assert [r.order_id for r in rows] == list(range(6))
    assert rows[4]._key == "k4" and rows[4]._offset == 4
    assert rows[4]._topic == "orders" and rows[4]._partition == 0


def test_avro_value_pipeline_with_registry(spark, tmp_path):
    schema = json.dumps(
        {
            "type": "record",
            "name": "Order",
            "fields": [
                {"name": "order_id", "type": "long"},
                {"name": "symbol", "type": "string"},
            ],
        }
    )
    reg = FileSchemaRegistry(tmp_path / "reg")
    reg.register("orders-value", schema)
    codec = AvroBinaryCodec(schema)
    payloads = [
        codec.encode({"order_id": i, "symbol": f"S{i}"}) for i in range(4)
    ]
    raw = with_system_columns(_mock_topic(spark, payloads))
    cfg = {
        "avro.schema.registry.path": str(tmp_path / "reg"),
        "avro.schema.subject": "orders-value",
    }
    out = decode_avro_value(raw, cfg).orderBy("order_id")
    rows = out.collect()
    assert [(r.order_id, r.symbol) for r in rows] == [(i, f"S{i}") for i in range(4)]
    # system columns pass through the mapInPandas decode
    assert rows[2]._key == "k2" and rows[2]._offset == 2


def test_sink_frame_key_and_value(spark):
    df = spark.createDataFrame(
        [(1, "us", 9.5), (2, "eu", 3.25)], "id int, region string, amt double"
    )
    out = sink_frame(df, ["id", "region"]).orderBy("key").collect()
    assert [r.key for r in out] == ["1|us", "2|eu"]
    v = json.loads(out[0].value)
    assert v == {"id": 1, "region": "us", "amt": 9.5}

    # sink → source round trip through the mock wire frame
    wire = _mock_topic(
        spark, [r.value.encode() for r in out]
    )
    back = decode_json_value(
        with_system_columns(wire), "id int, region string, amt double"
    ).orderBy("id")
    assert [(r.id, r.region) for r in back.collect()] == [(1, "us"), (2, "eu")]


def test_tombstones_null_value(spark):
    df = spark.createDataFrame([(7, "x")], "id int, name string")
    t = tombstones(df, ["id"]).collect()
    assert t[0].key == "7" and t[0].value is None
