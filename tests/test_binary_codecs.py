"""Pure-Python Avro/Protobuf binary codecs + file schema registry.

The runtime half of the reference's serialization layer
(serialization/avro_codec.rs:1-1148, protobuf_codec.rs:1-535,
config/schema_registry.rs:201) — executable here without any connector jar:
wire-format round-trips, schema evolution (reader/writer resolution),
decimal logical types, and the Arrow-batched mapInPandas decode paths.
"""

from __future__ import annotations

import datetime as dt
import decimal
import json

import pytest
from pyspark.sql import functions as F

from velostream_spark.sources.avro_binary import (
    AvroBinaryCodec,
    df_decode_avro,
    df_encode_avro,
)
from velostream_spark.sources.proto_binary import (
    ProtobufCodec,
    df_decode_protobuf,
    parse_proto,
)
from velostream_spark.sources.schema_registry import (
    FileSchemaRegistry,
    can_read,
    decode_with_registry,
)

WRITER_V1 = json.dumps(
    {
        "type": "record",
        "name": "Order",
        "fields": [
            {"name": "order_id", "type": "long"},
            {"name": "symbol", "type": "string"},
            {"name": "qty", "type": ["null", "int"], "default": None},
            {
                "name": "price",
                "type": {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 18,
                    "scale": 4,
                },
            },
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
            {"name": "tags", "type": {"type": "array", "items": "string"}},
        ],
    }
)

# v2 evolution: qty promoted int→long, `venue` added with default, tags dropped
READER_V2 = json.dumps(
    {
        "type": "record",
        "name": "Order",
        "fields": [
            {"name": "order_id", "type": "long"},
            {"name": "symbol", "type": "string"},
            {"name": "qty", "type": ["null", "long"], "default": None},
            {
                "name": "price",
                "type": {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 18,
                    "scale": 4,
                },
            },
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
            {"name": "venue", "type": "string", "default": "NASDAQ"},
        ],
    }
)


def _orders(n=5):
    return [
        {
            "order_id": i,
            "symbol": f"SYM{i % 3}",
            "qty": None if i % 4 == 0 else i * 10,
            "price": decimal.Decimal(i * 100).scaleb(-2) + decimal.Decimal("0.0001"),
            "ts": dt.datetime(2026, 8, 13, 10, 0, i),
            "tags": [f"t{i}", "x"] if i % 2 else [],
        }
        for i in range(n)
    ]


# ---------------------------------------------------------------------------
# pure-Python wire format
# ---------------------------------------------------------------------------


def test_avro_roundtrip_exact():
    codec = AvroBinaryCodec(WRITER_V1)
    for rec in _orders():
        assert codec.decode(codec.encode(rec)) == rec


def test_avro_varint_edges():
    schema = json.dumps(
        {"type": "record", "name": "R", "fields": [{"name": "n", "type": "long"}]}
    )
    codec = AvroBinaryCodec(schema)
    for n in (0, -1, 1, 63, 64, -64, -65, 2**31 - 1, -(2**31), 2**62, -(2**62)):
        assert codec.decode(codec.encode({"n": n}))["n"] == n


def test_avro_schema_evolution():
    writer = AvroBinaryCodec(WRITER_V1)
    evolved = AvroBinaryCodec(WRITER_V1, READER_V2)
    rec = _orders(1)[0]
    out = evolved.decode(writer.encode(rec))
    assert out["venue"] == "NASDAQ"  # reader-only field takes default
    assert "tags" not in out  # writer-only field skipped
    assert out["qty"] is None  # null branch survives promotion
    out2 = evolved.decode(writer.encode(dict(rec, qty=7)))
    assert out2["qty"] == 7  # int → long promotion


def test_avro_negative_decimal_fixed():
    schema = json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {
                    "name": "p",
                    "type": {
                        "type": "fixed",
                        "name": "d8",
                        "size": 8,
                        "logicalType": "decimal",
                        "precision": 18,
                        "scale": 2,
                    },
                }
            ],
        }
    )
    codec = AvroBinaryCodec(schema)
    for v in ("-0.01", "-12345678.90", "0", "99999999.99"):
        got = codec.decode(codec.encode({"p": decimal.Decimal(v)}))["p"]
        assert got == decimal.Decimal(v)


PROTO = """
syntax = "proto3";
message Trade {
  int64 id = 1;
  string sym = 2;
  double price = 3;
  sint32 delta = 4;
  bool active = 5;
  repeated int32 lots = 6;
  Venue venue = 7;
  repeated string tags = 8;
}
message Venue { string name = 1; int32 code = 2; }
"""


def test_proto_parse():
    spec = parse_proto(PROTO)
    assert set(spec) == {"Trade", "Venue"}
    assert spec["Trade"][7] == ("venue", "Venue", False)
    assert spec["Trade"][6] == ("lots", "int32", True)


def test_proto_roundtrip():
    codec = ProtobufCodec(PROTO, "Trade")
    rec = {
        "id": -5,
        "sym": "MSFT",
        "price": 412.75,
        "delta": -17,
        "active": True,
        "lots": [1, -2, 300],
        "venue": {"name": "NYSE", "code": 7},
        "tags": ["a", "b"],
    }
    assert codec.decode(codec.encode(rec)) == rec


def test_proto_unknown_field_skipped_and_defaults():
    wide = PROTO.replace("repeated string tags = 8;", "repeated string tags = 8;\n  string extra = 99;")
    narrow = ProtobufCodec(PROTO, "Trade")
    enc = ProtobufCodec(wide, "Trade").encode(
        {"id": 1, "sym": "A", "price": 0.0, "delta": 0, "active": False,
         "lots": [], "venue": None, "tags": [], "extra": "dropped"}
    )
    out = narrow.decode(enc)
    assert out["id"] == 1 and "extra" not in out
    empty = narrow.decode(b"")
    assert empty == {
        "id": 0, "sym": "", "price": 0.0, "delta": 0, "active": False,
        "lots": [], "venue": None, "tags": [],
    }


# ---------------------------------------------------------------------------
# schema registry
# ---------------------------------------------------------------------------


def test_registry_versions_and_compat(tmp_path):
    reg = FileSchemaRegistry(tmp_path / "registry")
    v1 = reg.register("orders-value", WRITER_V1)
    assert v1 == 1
    # duplicate registration dedups
    assert reg.register("orders-value", WRITER_V1) == 1
    v2 = reg.register("orders-value", READER_V2)
    assert v2 == 2
    assert reg.versions("orders-value") == [1, 2]
    assert reg.latest_version("orders-value") == 2
    assert json.loads(reg.get_schema("orders-value", 1)) == json.loads(WRITER_V1)
    assert json.loads(reg.get_schema("orders-value")) == json.loads(READER_V2)
    assert reg.subjects() == ["orders-value"]

    # incompatible: new required field without default cannot read old data
    bad = json.loads(READER_V2)
    bad["fields"].append({"name": "must_have", "type": "string"})
    with pytest.raises(ValueError, match="cannot read"):
        reg.register("orders-value", json.dumps(bad))


def test_can_read_rules():
    assert can_read(READER_V2, WRITER_V1)
    assert can_read('"long"', '"int"')  # promotion
    assert not can_read('"int"', '"long"')  # demotion is not allowed
    assert can_read('["null", "string"]', '"string"')  # union widening


# ---------------------------------------------------------------------------
# Spark decode paths (mapInPandas — the scale path)
# ---------------------------------------------------------------------------


def test_df_avro_roundtrip_with_evolution(spark, tmp_path):
    codec = AvroBinaryCodec(WRITER_V1)
    rows = [(codec.encode(r), i) for i, r in enumerate(_orders(20))]
    df = spark.createDataFrame(rows, "value binary, seq int")
    out = df_decode_avro(df, "value", WRITER_V1, READER_V2).orderBy("order_id")
    pdf = out.toPandas()
    assert list(pdf.columns) == ["order_id", "symbol", "qty", "price", "ts", "venue", "seq"]
    assert pdf["venue"].unique().tolist() == ["NASDAQ"]
    assert pdf["order_id"].tolist() == list(range(20))
    assert pdf["price"].iloc[3] == decimal.Decimal("3.0001")
    # null-union qty survives, promoted to long
    assert pdf["qty"].isna().tolist() == [i % 4 == 0 for i in range(20)]
    assert out.schema["qty"].dataType.simpleString() == "bigint"


def test_df_avro_encode_decode_inverse(spark):
    schema = json.dumps(
        {
            "type": "record",
            "name": "E",
            "fields": [
                {"name": "k", "type": "string"},
                {"name": "v", "type": "double"},
            ],
        }
    )
    src = spark.createDataFrame([("a", 1.5), ("b", -2.25)], "k string, v double")
    encoded = df_encode_avro(src, schema)
    assert encoded.schema.simpleString() == "struct<value:binary>"
    back = df_decode_avro(encoded, "value", schema).orderBy("k").collect()
    assert [(r.k, r.v) for r in back] == [("a", 1.5), ("b", -2.25)]


def test_df_protobuf_decode(spark):
    codec = ProtobufCodec(PROTO, "Trade")
    recs = [
        {"id": i, "sym": f"S{i}", "price": i * 1.5, "delta": -i, "active": i % 2 == 0,
         "lots": [i, i + 1], "venue": {"name": "X", "code": i}, "tags": ["t"]}
        for i in range(10)
    ]
    df = spark.createDataFrame([(codec.encode(r),) for r in recs], "value binary")
    out = df_decode_protobuf(df, "value", PROTO, "Trade").orderBy("id")
    rows = out.collect()
    assert [r.id for r in rows] == list(range(10))
    assert rows[3].venue.code == 3 and rows[3].lots == [3, 4]
    assert rows[2].delta == -2


def test_decode_with_registry_end_to_end(spark, tmp_path):
    reg = FileSchemaRegistry(tmp_path / "reg")
    reg.register("orders-value", WRITER_V1)
    reg.register("orders-value", READER_V2)
    codec = AvroBinaryCodec(WRITER_V1)
    df = spark.createDataFrame(
        [(codec.encode(r),) for r in _orders(8)], "value binary"
    )
    cfg = {
        "avro.schema.registry.path": str(tmp_path / "reg"),
        "avro.schema.subject": "orders-value",
        "avro.schema.version": "1",  # writer pinned to what produced the bytes
        # reader defaults to latest (v2) → evolution applies
    }
    out = decode_with_registry(df, cfg).orderBy("order_id").toPandas()
    assert "venue" in out.columns and "tags" not in out.columns
    assert len(out) == 8


def test_multi_branch_union_constructs_and_roundtrips():
    """Regression (r4 advice): a schema whose union has 2+ non-null branches
    must still CONSTRUCT a codec (decode-only paths — df_decode_avro,
    decode_with_registry — broke when _compile_write ran eagerly), and the
    encoder now dispatches such unions by the Python value's type."""
    import json

    from velostream_spark.sources.avro_binary import AvroBinaryCodec

    schema = json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {"name": "a", "type": ["null", "string", "long"]},
                {"name": "b", "type": ["int", "string"]},
            ],
        }
    )
    codec = AvroBinaryCodec(schema)  # must not raise at construction
    for rec in [{"a": None, "b": 5}, {"a": "hi", "b": "x"}, {"a": 42, "b": 0}]:
        assert codec.decode(codec.encode(rec)) == rec
    with pytest.raises(ValueError, match="no branch"):
        codec.encode({"a": 1.5, "b": 1})
