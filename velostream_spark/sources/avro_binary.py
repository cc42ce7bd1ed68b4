"""Pure-Python Avro *binary* codec — the runtime half of the reference's
``serialization/avro_codec.rs`` (1,148 LoC: decimal logical types, schema
evolution via reader/writer resolution, nullable unions).

Why pure Python: this environment ships neither the spark-avro connector jar
nor a Python avro library, so ``from_avro`` can never execute here.  The Avro
binary encoding is a small, fully-public specification (Avro 1.11.x spec,
"Binary encoding"): zigzag-varint longs, length-prefixed bytes/strings,
records as field concatenation, 1-byte union branch indexes, block-encoded
arrays/maps.  Implementing it directly gives a *real*, testable decode path:

- driver/executor-side ``AvroBinaryCodec.encode/decode`` for single records;
- Arrow-batched ``decode_avro_frame`` / Spark-level ``df_decode_avro`` via
  ``mapInPandas`` — the scale path (no per-row Python UDF, one Python entry
  per partition batch).

Schema resolution follows the spec's rules (the reference's "schema
evolution" feature): fields are matched by name; reader-only fields take
their default; writer-only fields are decoded and discarded; numeric
promotions int→long→float→double and string↔bytes apply.

Logical types mirror the reference codec: ``decimal`` (bytes/fixed,
two's-complement big-endian unscaled int → ``Decimal`` — the ScaledInteger
exact-arithmetic path), ``date`` (days), ``timestamp-millis/micros``.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import io
import json
import struct
from typing import Any, Iterator

__all__ = [
    "AvroBinaryCodec",
    "decode_avro_frame",
    "df_decode_avro",
    "df_encode_avro",
]

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH = _dt.datetime(1970, 1, 1)


# ---------------------------------------------------------------------------
# primitive wire format
# ---------------------------------------------------------------------------


def _write_long(buf: io.BytesIO, n: int) -> None:
    # zigzag then base-128 varint, little-endian 7-bit groups.
    # Python ints are unbounded: n >> 127 is 0 for n >= 0 and -1 for n < 0,
    # so this is the spec's (n << 1) ^ (n >> 63) without a fixed width.
    z = (n << 1) ^ (n >> 127)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# ---------------------------------------------------------------------------
# schema helpers
# ---------------------------------------------------------------------------


def _type_name(schema: Any) -> str:
    """Canonical type name for resolution matching."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema.get("type", "")


def _non_null_branch(union: list) -> Any:
    branches = [b for b in union if _type_name(b) != "null"]
    if len(branches) != 1:
        raise ValueError(f"unsupported non-nullable union: {union!r}")
    return branches[0]


_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


class AvroBinaryCodec:
    """Encode/decode dict records against an Avro record schema.

    ``reader_schema_json`` enables schema-resolution decoding (evolution):
    data written with ``writer`` is decoded into the shape of ``reader``.
    """

    def __init__(self, writer_schema_json: str, reader_schema_json: str | None = None):
        self.writer = json.loads(writer_schema_json)
        self.reader = (
            json.loads(reader_schema_json) if reader_schema_json else self.writer
        )
        if _type_name(self.writer) != "record" or _type_name(self.reader) != "record":
            raise ValueError("top-level avro schema must be a record")

    # -- encode ------------------------------------------------------------

    def encode(self, record: dict) -> bytes:
        buf = io.BytesIO()
        self._encode_value(buf, self.writer, record)
        return buf.getvalue()

    def _encode_value(self, buf: io.BytesIO, schema: Any, value: Any) -> None:
        t = _type_name(schema)
        if t == "union":
            # spec: long branch index, then value per branch schema
            if value is None:
                for i, b in enumerate(schema):
                    if _type_name(b) == "null":
                        _write_long(buf, i)
                        return
                raise ValueError("None for non-nullable union")
            branch = _non_null_branch(schema)
            _write_long(buf, schema.index(branch))
            self._encode_value(buf, branch, value)
            return
        if t == "null":
            return
        if t == "boolean":
            buf.write(b"\x01" if value else b"\x00")
            return
        if t in ("int", "long"):
            logical = isinstance(schema, dict) and schema.get("logicalType")
            if logical == "date" and isinstance(value, _dt.date):
                value = (value - _EPOCH_DATE).days
            elif logical == "timestamp-millis" and isinstance(value, _dt.datetime):
                value = int((value - _EPOCH).total_seconds() * 1_000)
            elif logical == "timestamp-micros" and isinstance(value, _dt.datetime):
                value = int((value - _EPOCH).total_seconds() * 1_000_000)
            _write_long(buf, int(value))
            return
        if t == "float":
            buf.write(struct.pack("<f", float(value)))
            return
        if t == "double":
            buf.write(struct.pack("<d", float(value)))
            return
        if t == "bytes":
            if isinstance(schema, dict) and schema.get("logicalType") == "decimal":
                _write_bytes(buf, _decimal_to_bytes(value, schema.get("scale", 0)))
                return
            _write_bytes(buf, bytes(value))
            return
        if t == "string":
            _write_bytes(buf, str(value).encode("utf-8"))
            return
        if t == "record":
            for f in schema["fields"]:
                if f["name"] in value:
                    fv = value[f["name"]]
                elif "default" in f:
                    fv = f["default"]
                else:
                    raise ValueError(f"missing field {f['name']!r} with no default")
                self._encode_value(buf, f["type"], fv)
            return
        if t == "enum":
            _write_long(buf, schema["symbols"].index(value))
            return
        if t == "array":
            items = list(value)
            if items:
                _write_long(buf, len(items))
                for it in items:
                    self._encode_value(buf, schema["items"], it)
            _write_long(buf, 0)
            return
        if t == "map":
            entries = dict(value)
            if entries:
                _write_long(buf, len(entries))
                for k, v in entries.items():
                    _write_bytes(buf, str(k).encode("utf-8"))
                    self._encode_value(buf, schema["values"], v)
            _write_long(buf, 0)
            return
        if t == "fixed":
            data = _decimal_to_fixed(value, schema) if (
                isinstance(schema, dict) and schema.get("logicalType") == "decimal"
            ) else bytes(value)
            if len(data) != schema["size"]:
                raise ValueError("fixed size mismatch")
            buf.write(data)
            return
        raise ValueError(f"unsupported avro type for encode: {schema!r}")

    # -- decode (with resolution) ------------------------------------------

    def decode(self, data: bytes) -> dict:
        buf = io.BytesIO(data)
        return self._decode_resolved(buf, self.writer, self.reader)

    def _decode_resolved(self, buf: io.BytesIO, writer: Any, reader: Any) -> Any:
        wt, rt = _type_name(writer), _type_name(reader)
        if wt == "union":
            idx = _read_long(buf)
            wbranch = writer[idx]
            if rt == "union":
                rbranch = self._match_branch(reader, wbranch)
            else:
                rbranch = reader
            return self._decode_resolved(buf, wbranch, rbranch)
        if rt == "union":
            return self._decode_resolved(buf, writer, self._match_branch(reader, writer))
        if wt == "record":
            if rt != "record":
                raise ValueError(f"cannot resolve record into {rt}")
            rfields = {f["name"]: f for f in reader["fields"]}
            out: dict[str, Any] = {}
            seen: set[str] = set()
            for wf in writer["fields"]:
                val = self._decode_resolved(
                    buf,
                    wf["type"],
                    rfields[wf["name"]]["type"] if wf["name"] in rfields else wf["type"],
                )
                if wf["name"] in rfields:
                    out[wf["name"]] = val
                    seen.add(wf["name"])
                # else: writer-only field — decoded to advance, discarded
            for rf in reader["fields"]:
                if rf["name"] not in seen:
                    if "default" not in rf:
                        raise ValueError(
                            f"reader field {rf['name']!r} missing from writer and has no default"
                        )
                    out[rf["name"]] = _coerce_default(rf["default"], rf["type"])
            return out
        return self._decode_primitive(buf, writer, reader)

    @staticmethod
    def _match_branch(reader_union: list, writer_branch: Any) -> Any:
        wname = _type_name(writer_branch)
        for b in reader_union:
            if _type_name(b) == wname:
                return b
        for b in reader_union:  # promotion match
            if _type_name(b) in _PROMOTIONS.get(wname, ()):
                return b
        raise ValueError(f"no reader branch for writer type {wname!r}")

    def _decode_primitive(self, buf: io.BytesIO, writer: Any, reader: Any) -> Any:
        wt, rt = _type_name(writer), _type_name(reader)
        if wt != rt and rt not in _PROMOTIONS.get(wt, ()):
            raise ValueError(f"cannot promote {wt!r} to {rt!r}")
        if wt == "null":
            return None
        if wt == "boolean":
            byte = buf.read(1)
            if not byte:
                raise EOFError("truncated boolean")
            return byte[0] == 1
        if wt in ("int", "long"):
            n = _read_long(buf)
            if rt in ("float", "double"):
                return float(n)
            logical = isinstance(reader, dict) and reader.get("logicalType")
            if logical == "date":
                return _EPOCH_DATE + _dt.timedelta(days=n)
            if logical == "timestamp-millis":
                return _EPOCH + _dt.timedelta(milliseconds=n)
            if logical == "timestamp-micros":
                return _EPOCH + _dt.timedelta(microseconds=n)
            return n
        if wt == "float":
            v = struct.unpack("<f", buf.read(4))[0]
            return v
        if wt == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if wt == "bytes":
            raw = _read_bytes(buf)
            if isinstance(reader, dict) and reader.get("logicalType") == "decimal":
                return _bytes_to_decimal(raw, reader.get("scale", 0))
            return raw.decode("utf-8") if rt == "string" else raw
        if wt == "string":
            raw = _read_bytes(buf)
            return raw if rt == "bytes" else raw.decode("utf-8")
        if wt == "enum":
            idx = _read_long(buf)
            sym = writer["symbols"][idx]
            if rt == "enum" and sym not in reader["symbols"]:
                raise ValueError(f"enum symbol {sym!r} not in reader schema")
            return sym
        if wt == "array":
            out = []
            while True:
                count = _read_long(buf)
                if count == 0:
                    return out
                if count < 0:  # block with byte-size prefix
                    count = -count
                    _read_long(buf)  # block byte size — unused, we decode items
                for _ in range(count):
                    out.append(
                        self._decode_resolved(buf, writer["items"], reader["items"])
                    )
        if wt == "map":
            out_m: dict[str, Any] = {}
            while True:
                count = _read_long(buf)
                if count == 0:
                    return out_m
                if count < 0:
                    count = -count
                    _read_long(buf)
                for _ in range(count):
                    k = _read_bytes(buf).decode("utf-8")
                    out_m[k] = self._decode_resolved(
                        buf, writer["values"], reader["values"]
                    )
        if wt == "fixed":
            raw = buf.read(writer["size"])
            if isinstance(reader, dict) and reader.get("logicalType") == "decimal":
                return _bytes_to_decimal(raw, reader.get("scale", 0))
            return raw
        raise ValueError(f"unsupported avro type for decode: {writer!r}")


def _coerce_default(default: Any, schema: Any) -> Any:
    """Apply a reader-schema default (spec: defaults are JSON-typed)."""
    t = _type_name(schema)
    if t == "union":
        # spec: default corresponds to the FIRST branch
        return _coerce_default(default, schema[0])
    if t == "null":
        return None
    if t == "bytes" and isinstance(default, str):
        return default.encode("latin-1")  # spec: bytes defaults are \u00XX strings
    if t in ("int", "long") and isinstance(schema, dict):
        logical = schema.get("logicalType")
        if logical == "date":
            return _EPOCH_DATE + _dt.timedelta(days=int(default))
        if logical == "timestamp-millis":
            return _EPOCH + _dt.timedelta(milliseconds=int(default))
        if logical == "timestamp-micros":
            return _EPOCH + _dt.timedelta(microseconds=int(default))
    if t in ("bytes", "fixed") and isinstance(schema, dict) and schema.get(
        "logicalType"
    ) == "decimal":
        raw = default.encode("latin-1") if isinstance(default, str) else bytes(default)
        return _bytes_to_decimal(raw, schema.get("scale", 0))
    return default


# ---------------------------------------------------------------------------
# decimal logical type — two's-complement big-endian unscaled int
# ---------------------------------------------------------------------------


def _bytes_to_decimal(raw: bytes, scale: int) -> _decimal.Decimal:
    unscaled = int.from_bytes(raw, "big", signed=True) if raw else 0
    return _decimal.Decimal(unscaled).scaleb(-scale)


def _decimal_unscaled_bytes(value, scale: int) -> bytes:
    d = _decimal.Decimal(str(value)).scaleb(scale).to_integral_value(
        rounding=_decimal.ROUND_HALF_UP
    )
    n = int(d)
    length = max(1, (n.bit_length() + 8) // 8)  # +8 keeps the sign bit
    return n.to_bytes(length, "big", signed=True)


def _decimal_to_bytes(value, scale: int) -> bytes:
    return _decimal_unscaled_bytes(value, scale)


def _decimal_to_fixed(value, schema: dict) -> bytes:
    raw = _decimal_unscaled_bytes(value, schema.get("scale", 0))
    size = schema["size"]
    pad = b"\xff" if raw[0] & 0x80 else b"\x00"
    return pad * (size - len(raw)) + raw


# ---------------------------------------------------------------------------
# Spark integration — Arrow-batched decode via mapInPandas
# ---------------------------------------------------------------------------


def decode_avro_frame(pdf, value_col: str, writer_json: str, reader_json: str | None):
    """Decode one pandas batch of Avro-binary bytes into record columns.

    Used inside ``mapInPandas`` — one codec instance per batch, plain loop
    over the byte values (the decode itself is the work; no per-row Spark
    round-trip).
    """
    import pandas as pd

    codec = AvroBinaryCodec(writer_json, reader_json)
    records = [codec.decode(v) if v is not None else None for v in pdf[value_col]]
    fields = [f["name"] for f in codec.reader["fields"]]
    cols = {
        f: [None if r is None else r.get(f) for r in records] for f in fields
    }
    out = pd.DataFrame(cols)
    passthrough = [c for c in pdf.columns if c != value_col]
    for c in passthrough:
        out[c] = pdf[c].values
    return out


def df_decode_avro(
    df,
    value_col: str,
    writer_schema_json: str,
    reader_schema_json: str | None = None,
):
    """DataFrame with a binary ``value_col`` → DataFrame of decoded record
    columns (plus the other input columns passed through).

    Scale path: ``mapInPandas`` — Arrow-batched, one Python entry per
    partition batch; the shuffle-free analog of ``from_avro`` for
    environments without the spark-avro jar.
    """
    from pyspark.sql.types import StructField, StructType

    from .codecs import avro_to_spark_type, _is_nullable

    reader = json.loads(reader_schema_json or writer_schema_json)
    out_fields = [
        StructField(f["name"], avro_to_spark_type(f["type"]), nullable=True)
        for f in reader["fields"]
    ]
    passthrough = [f for f in df.schema.fields if f.name != value_col]
    schema = StructType(out_fields + passthrough)

    def gen(batches) -> Iterator:
        for pdf in batches:
            yield decode_avro_frame(
                pdf, value_col, writer_schema_json, reader_schema_json
            )

    return df.mapInPandas(gen, schema=schema)


def df_encode_avro(df, writer_schema_json: str, out_col: str = "value"):
    """Encode every row of ``df`` into one Avro-binary bytes column."""
    import pandas as pd

    from pyspark.sql.types import BinaryType, StructField, StructType

    writer = json.loads(writer_schema_json)
    field_names = [f["name"] for f in writer["fields"]]

    def gen(batches) -> Iterator:
        codec = AvroBinaryCodec(writer_schema_json)
        for pdf in batches:
            vals = [
                codec.encode({k: _py(v) for k, v in zip(pdf.columns, row)})
                for row in pdf.itertuples(index=False, name=None)
            ]
            yield pd.DataFrame({out_col: vals})

    _ = field_names  # encode uses column order via dict; names validated by codec
    return df.mapInPandas(gen, schema=StructType([StructField(out_col, BinaryType())]))


def _py(v):
    """numpy scalar → plain Python for the codec."""
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return v.item()
    except ImportError:  # pragma: no cover
        pass
    return v


def df_roundtrip_avro(
    df,
    writer_schema_json: str,
    reader_schema_json: str | None = None,
):
    """Encode every row to Avro-binary wire bytes and decode them straight
    back (with reader-schema resolution) in ONE Arrow stage.

    Same computation as ``df_encode_avro`` ∘ ``df_decode_avro`` but a single
    ``mapInPandas`` pass, so the per-stage Arrow/Python-worker overhead is
    paid once — the right shape when the wire bytes don't need to cross a
    stage boundary (codec verification, re-serialization pipelines). The
    two-stage forms remain the path when bytes genuinely leave the plan
    (Kafka sink, binary files).
    """
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    from .codecs import avro_to_spark_type

    reader = json.loads(reader_schema_json or writer_schema_json)
    fields = [f["name"] for f in reader["fields"]]
    schema = StructType(
        [
            StructField(f["name"], avro_to_spark_type(f["type"]), nullable=True)
            for f in reader["fields"]
        ]
    )

    def gen(batches) -> Iterator:
        enc = AvroBinaryCodec(writer_schema_json)
        dec = AvroBinaryCodec(writer_schema_json, reader_schema_json)
        for pdf in batches:
            wire = [
                enc.encode({k: _py(v) for k, v in zip(pdf.columns, row)})
                for row in pdf.itertuples(index=False, name=None)
            ]
            recs = [dec.decode(w) for w in wire]
            yield pd.DataFrame({f: [r.get(f) for r in recs] for f in fields})

    return df.mapInPandas(gen, schema=schema)
