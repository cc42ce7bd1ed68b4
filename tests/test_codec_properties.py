"""Property-based round-trip tests for the pure-Python Avro/Protobuf wire
codecs — hypothesis drives values across the encodings' edge cases (varint
boundaries, zigzag signs, unicode, subnormal doubles, empty/None branches,
packed repeated fields) that example-based tests under-sample.
"""

from __future__ import annotations

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from velostream_spark.sources.avro_binary import AvroBinaryCodec
from velostream_spark.sources.proto_binary import ProtobufCodec

_INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_INT32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
_TEXT = st.text(max_size=80)
# exclude NaN (NaN != NaN breaks equality); keep infinities and subnormals
_DOUBLE = st.floats(allow_nan=False, width=64)

AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "d", "type": "double"},
            {"name": "o", "type": ["null", "long"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "b", "type": "bytes"},
            {"name": "flag", "type": "boolean"},
        ],
    }
)

AVRO_READER = json.dumps(
    {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "d", "type": "double"},
            {"name": "o", "type": ["null", "long"], "default": None},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "flag", "type": "boolean"},
            {"name": "added", "type": "string", "default": "dflt"},
        ],
    }
)

avro_records = st.fixed_dictionaries(
    {
        "i": _INT64,
        "s": _TEXT,
        "d": _DOUBLE,
        "o": st.one_of(st.none(), _INT64),
        "arr": st.lists(_INT64, max_size=8),
        "m": st.dictionaries(st.text(max_size=10), _TEXT, max_size=5),
        "b": st.binary(max_size=40),
        "flag": st.booleans(),
    }
)


@settings(max_examples=200, deadline=None)
@given(avro_records)
def test_avro_roundtrip_property(rec):
    codec = AvroBinaryCodec(AVRO_SCHEMA)
    out = codec.decode(codec.encode(rec))
    assert out == rec


@settings(max_examples=100, deadline=None)
@given(avro_records)
def test_avro_evolution_property(rec):
    evolved = AvroBinaryCodec(AVRO_SCHEMA, AVRO_READER)
    out = evolved.decode(AvroBinaryCodec(AVRO_SCHEMA).encode(rec))
    assert out["added"] == "dflt" and "arr" not in out and "b" not in out
    for k in ("i", "s", "d", "o", "m", "flag"):
        assert out[k] == rec[k]


PROTO = """
syntax = "proto3";
message M {
  int64 i = 1;
  sint64 z = 2;
  string s = 3;
  double d = 4;
  bool flag = 5;
  repeated sint32 xs = 6;
  bytes b = 7;
  fixed32 u = 8;
  sfixed64 f = 9;
}
"""

proto_records = st.fixed_dictionaries(
    {
        "i": _INT64,
        "z": _INT64,
        "s": _TEXT,
        "d": _DOUBLE,
        "flag": st.booleans(),
        "xs": st.lists(_INT32, max_size=8),
        "b": st.binary(max_size=40),
        "u": st.integers(min_value=0, max_value=2**32 - 1),
        "f": _INT64,
    }
)


@settings(max_examples=200, deadline=None)
@given(proto_records)
def test_proto_roundtrip_property(rec):
    codec = ProtobufCodec(PROTO, "M")
    out = codec.decode(codec.encode(rec))
    for k, v in rec.items():
        got = out[k]
        if isinstance(v, float):
            assert got == v or (math.isinf(v) and math.isinf(got))
        else:
            assert got == v, k


@settings(max_examples=100, deadline=None)
@given(st.lists(_INT32, min_size=1, max_size=10))
def test_proto_packed_vs_unpacked_decode(xs):
    """proto3 encoders may emit repeated numerics packed or unpacked;
    decode accepts both representations identically."""
    import io

    from velostream_spark.sources.proto_binary import (
        _write_varint,
        _zigzag,
        buf_write_tag,
    )

    codec = ProtobufCodec(PROTO, "M")
    packed = codec.encode({"xs": xs})
    buf = io.BytesIO()
    for x in xs:  # unpacked: one tagged varint per element
        buf_write_tag(buf, 6, 0)
        _write_varint(buf, _zigzag(x))
    unpacked = buf.getvalue()
    assert codec.decode(packed)["xs"] == xs
    assert codec.decode(unpacked)["xs"] == xs


def test_proto_encode_accepts_numpy_repeated():
    """Arrow batches hand repeated fields to the codec as numpy arrays —
    the emptiness test must not trip on ndarray truthiness (review
    finding: compiled encoder raised 'truth value ... is ambiguous')."""
    import numpy as np

    codec = ProtobufCodec(PROTO, "M")
    rec = {"i": 1, "z": -1, "s": "x", "d": 0.5, "flag": True,
           "xs": np.array([1, -2, 3]), "b": b"", "u": 7, "f": -9}
    out = codec.decode(codec.encode(rec))
    assert out["xs"] == [1, -2, 3]
    rec["xs"] = np.array([], dtype="int64")
    assert codec.decode(codec.encode(rec))["xs"] == []
