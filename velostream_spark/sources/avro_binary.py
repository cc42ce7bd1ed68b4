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


# ---------------------------------------------------------------------------
# compiled codec — schema walked ONCE into per-field closures
# ---------------------------------------------------------------------------

_S_F4 = struct.Struct("<f")
_S_D8 = struct.Struct("<d")


def _append_zlong(buf: bytearray, n: int) -> None:
    """Zigzag varint append (spec (n<<1)^(n>>63); Python ints are unbounded
    so >>127 yields the same 0/-1 sign mask)."""
    z = (n << 1) ^ (n >> 127)
    while z > 0x7F:
        buf.append((z & 0x7F) | 0x80)
        z >>= 7
    buf.append(z)


def _zlong_bytes(n: int) -> bytes:
    buf = bytearray()
    _append_zlong(buf, n)
    return bytes(buf)


def _read_zlong_at(data: bytes, pos: int) -> tuple[int, int]:
    b = data[pos]
    if b < 0x80:
        return (b >> 1) ^ -(b & 1), pos + 1
    acc = b & 0x7F
    shift = 7
    pos += 1
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if b < 0x80:
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7


def _branch_accepts(schema: Any):
    """Python-type predicate for selecting a union branch at encode time."""
    t = _type_name(schema)
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if t == "boolean":
        return lambda v: isinstance(v, bool)
    if t in ("int", "long"):
        if logical == "date":
            return lambda v: isinstance(v, _dt.date) and not isinstance(
                v, _dt.datetime
            ) or (isinstance(v, int) and not isinstance(v, bool))
        if logical in ("timestamp-millis", "timestamp-micros"):
            return lambda v: isinstance(v, _dt.datetime) or (
                isinstance(v, int) and not isinstance(v, bool)
            )
        return lambda v: isinstance(v, int) and not isinstance(v, bool)
    if t in ("float", "double"):
        return lambda v: isinstance(v, float)
    if t in ("string", "enum"):
        return lambda v: isinstance(v, str)
    if t in ("bytes", "fixed"):
        if logical == "decimal":
            return lambda v: isinstance(v, (_decimal.Decimal, bytes, bytearray))
        return lambda v: isinstance(v, (bytes, bytearray))
    if t in ("record", "map"):
        return lambda v: isinstance(v, dict)
    if t == "array":
        return lambda v: isinstance(v, (list, tuple))
    return lambda v: False


def _compile_write(schema: Any):
    """Schema → ``write(buf: bytearray, value)`` closure. All type/logical
    dispatch happens here, once; the closure does no schema inspection."""
    t = _type_name(schema)
    if t == "union":
        null_idx = next(
            (i for i, b in enumerate(schema) if _type_name(b) == "null"), None
        )
        null_head = _zlong_bytes(null_idx) if null_idx is not None else None
        non_null = [(i, b) for i, b in enumerate(schema) if _type_name(b) != "null"]
        if len(non_null) == 1:
            idx, branch = non_null[0]
            branch_head = _zlong_bytes(idx)
            wb = _compile_write(branch)

            def w(buf, v, nh=null_head, bh=branch_head, wb=wb):
                if v is None:
                    if nh is None:
                        raise ValueError("None for non-nullable union")
                    buf += nh
                else:
                    buf += bh
                    wb(buf, v)
            return w
        # Multi-branch union: pick the branch by the Python value's type, in
        # schema order (the spec leaves selection to the writer; first
        # type-compatible branch mirrors fastavro's validate-in-order).
        table = [
            (_branch_accepts(b), _zlong_bytes(i), _compile_write(b))
            for i, b in non_null
        ]

        def w(buf, v, nh=null_head, table=table, schema=schema):
            if v is None:
                if nh is None:
                    raise ValueError("None for non-nullable union")
                buf += nh
                return
            for accepts, head, wb in table:
                if accepts(v):
                    buf += head
                    wb(buf, v)
                    return
            raise ValueError(
                f"value {v!r} matches no branch of union {schema!r}"
            )
        return w
    if t == "null":
        def w(buf, v):
            if v is not None:
                raise ValueError("non-null value for null schema")
        return w
    if t == "boolean":
        def w(buf, v):
            buf.append(1 if v else 0)
        return w
    if t in ("int", "long"):
        logical = schema.get("logicalType") if isinstance(schema, dict) else None
        if logical == "date":
            def w(buf, v):
                if isinstance(v, _dt.date):
                    v = (v - _EPOCH_DATE).days
                _append_zlong(buf, int(v))
        elif logical == "timestamp-millis":
            def w(buf, v):
                if isinstance(v, _dt.datetime):
                    v = int((v - _EPOCH).total_seconds() * 1_000)
                _append_zlong(buf, int(v))
        elif logical == "timestamp-micros":
            def w(buf, v):
                if isinstance(v, _dt.datetime):
                    v = int((v - _EPOCH).total_seconds() * 1_000_000)
                _append_zlong(buf, int(v))
        else:
            def w(buf, v):
                _append_zlong(buf, int(v))
        return w
    if t == "float":
        def w(buf, v, pk=_S_F4.pack):
            buf += pk(float(v))
        return w
    if t == "double":
        def w(buf, v, pk=_S_D8.pack):
            buf += pk(float(v))
        return w
    if t == "bytes":
        if isinstance(schema, dict) and schema.get("logicalType") == "decimal":
            scale = schema.get("scale", 0)

            def w(buf, v, scale=scale):
                data = _decimal_to_bytes(v, scale)
                _append_zlong(buf, len(data))
                buf += data
        else:
            def w(buf, v):
                data = bytes(v)
                _append_zlong(buf, len(data))
                buf += data
        return w
    if t == "string":
        def w(buf, v):
            data = str(v).encode("utf-8")
            _append_zlong(buf, len(data))
            buf += data
        return w
    if t == "record":
        fields = [
            (f["name"], "default" in f, f.get("default"), _compile_write(f["type"]))
            for f in schema["fields"]
        ]

        def w(buf, v, fields=tuple(fields)):
            for name, has_d, d, wf in fields:
                if name in v:
                    wf(buf, v[name])
                elif has_d:
                    wf(buf, d)
                else:
                    raise ValueError(f"missing field {name!r} with no default")
        return w
    if t == "enum":
        heads = {sym: _zlong_bytes(i) for i, sym in enumerate(schema["symbols"])}

        def w(buf, v, heads=heads):
            h = heads.get(v)
            if h is None:
                raise ValueError(f"{v!r} is not in enum symbols")
            buf += h
        return w
    if t == "array":
        wi = _compile_write(schema["items"])

        def w(buf, v, wi=wi):
            items = list(v)
            if items:
                _append_zlong(buf, len(items))
                for it in items:
                    wi(buf, it)
            buf.append(0)
        return w
    if t == "map":
        wv = _compile_write(schema["values"])

        def w(buf, v, wv=wv):
            entries = dict(v)
            if entries:
                _append_zlong(buf, len(entries))
                for k, mv in entries.items():
                    data = str(k).encode("utf-8")
                    _append_zlong(buf, len(data))
                    buf += data
                    wv(buf, mv)
            buf.append(0)
        return w
    if t == "fixed":
        size = schema["size"]
        is_dec = isinstance(schema, dict) and schema.get("logicalType") == "decimal"

        def w(buf, v, size=size, is_dec=is_dec, schema=schema):
            data = _decimal_to_fixed(v, schema) if is_dec else bytes(v)
            if len(data) != size:
                raise ValueError("fixed size mismatch")
            buf += data
        return w
    raise ValueError(f"unsupported avro type for encode: {schema!r}")


def _match_branch(reader_union: list, writer_branch: Any) -> Any:
    wname = _type_name(writer_branch)
    for b in reader_union:
        if _type_name(b) == wname:
            return b
    for b in reader_union:  # promotion match
        if _type_name(b) in _PROMOTIONS.get(wname, ()):
            return b
    raise ValueError(f"no reader branch for writer type {wname!r}")


def _error_reader(msg: str):
    def rd(data, pos, msg=msg):
        raise ValueError(msg)
    return rd


def _compile_read(writer: Any, reader: Any):
    """(writer, reader) schemas → ``read(data, pos) -> (value, pos)``
    closure implementing the spec's schema-resolution rules, decided at
    compile time (a writer branch the reader can't resolve errors only if
    that branch actually occurs in the data — per spec)."""
    wt, rt = _type_name(writer), _type_name(reader)
    if wt == "union":
        branches = []
        for wbranch in writer:
            try:
                rbranch = _match_branch(reader, wbranch) if rt == "union" else reader
                branches.append(_compile_read(wbranch, rbranch))
            except ValueError as e:
                branches.append(_error_reader(str(e)))

        def rd(data, pos, branches=tuple(branches)):
            idx, pos = _read_zlong_at(data, pos)
            return branches[idx](data, pos)
        return rd
    if rt == "union":
        return _compile_read(writer, _match_branch(reader, writer))
    if wt == "record":
        if rt != "record":
            raise ValueError(f"cannot resolve record into {rt}")
        rfields = {f["name"]: f for f in reader["fields"]}
        entries = []
        seen: set = set()
        for wf in writer["fields"]:
            name = wf["name"]
            if name in rfields:
                entries.append((name, _compile_read(wf["type"], rfields[name]["type"])))
                seen.add(name)
            else:  # writer-only: decoded to advance the stream, discarded
                entries.append((None, _compile_read(wf["type"], wf["type"])))
        defaults = []
        for rf in reader["fields"]:
            if rf["name"] not in seen:
                if "default" not in rf:
                    raise ValueError(
                        f"reader field {rf['name']!r} missing from writer "
                        "and has no default"
                    )
                defaults.append(
                    (rf["name"], _coerce_default(rf["default"], rf["type"]))
                )

        def rd(data, pos, entries=tuple(entries), defaults=tuple(defaults)):
            out = {}
            for name, fr in entries:
                v, pos = fr(data, pos)
                if name is not None:
                    out[name] = v
            for name, dv in defaults:
                out[name] = dv
            return out, pos
        return rd
    # primitives / named types
    if wt != rt and rt not in _PROMOTIONS.get(wt, ()):
        raise ValueError(f"cannot promote {wt!r} to {rt!r}")
    if wt == "null":
        return lambda data, pos: (None, pos)
    if wt == "boolean":
        def rd(data, pos):
            return data[pos] == 1, pos + 1
        return rd
    if wt in ("int", "long"):
        if rt in ("float", "double"):
            def rd(data, pos):
                n, pos = _read_zlong_at(data, pos)
                return float(n), pos
            return rd
        logical = reader.get("logicalType") if isinstance(reader, dict) else None
        if logical == "date":
            def rd(data, pos):
                n, pos = _read_zlong_at(data, pos)
                return _EPOCH_DATE + _dt.timedelta(days=n), pos
        elif logical == "timestamp-millis":
            def rd(data, pos):
                n, pos = _read_zlong_at(data, pos)
                return _EPOCH + _dt.timedelta(milliseconds=n), pos
        elif logical == "timestamp-micros":
            def rd(data, pos):
                n, pos = _read_zlong_at(data, pos)
                return _EPOCH + _dt.timedelta(microseconds=n), pos
        else:
            rd = _read_zlong_at
        return rd
    if wt == "float":
        def rd(data, pos, up=_S_F4.unpack_from):
            if pos + 4 > len(data):
                raise EOFError("truncated float")
            return up(data, pos)[0], pos + 4
        return rd
    if wt == "double":
        def rd(data, pos, up=_S_D8.unpack_from):
            if pos + 8 > len(data):
                raise EOFError("truncated double")
            return up(data, pos)[0], pos + 8
        return rd
    if wt in ("bytes", "string"):
        dec_scale = (
            reader.get("scale", 0)
            if wt == "bytes"
            and isinstance(reader, dict)
            and reader.get("logicalType") == "decimal"
            else None
        )
        to_str = (wt == "string" and rt != "bytes") or (
            wt == "bytes" and rt == "string" and dec_scale is None
        )

        def rd(data, pos, scale=dec_scale, to_str=to_str):
            n, pos = _read_zlong_at(data, pos)
            end = pos + n
            if end > len(data):
                raise EOFError("truncated bytes")
            raw = data[pos:end]
            if scale is not None:
                return _bytes_to_decimal(raw, scale), end
            return (raw.decode("utf-8") if to_str else raw), end
        return rd
    if wt == "enum":
        symbols = writer["symbols"]
        allowed = set(reader["symbols"]) if rt == "enum" else None

        def rd(data, pos, symbols=symbols, allowed=allowed):
            idx, pos = _read_zlong_at(data, pos)
            sym = symbols[idx]
            if allowed is not None and sym not in allowed:
                raise ValueError(f"enum symbol {sym!r} not in reader schema")
            return sym, pos
        return rd
    if wt == "array":
        ri = _compile_read(writer["items"], reader["items"])

        def rd(data, pos, ri=ri):
            out = []
            while True:
                count, pos = _read_zlong_at(data, pos)
                if count == 0:
                    return out, pos
                if count < 0:  # block with byte-size prefix
                    count = -count
                    _, pos = _read_zlong_at(data, pos)
                for _i in range(count):
                    v, pos = ri(data, pos)
                    out.append(v)
        return rd
    if wt == "map":
        rv = _compile_read(writer["values"], reader["values"])

        def rd(data, pos, rv=rv):
            out = {}
            while True:
                count, pos = _read_zlong_at(data, pos)
                if count == 0:
                    return out, pos
                if count < 0:
                    count = -count
                    _, pos = _read_zlong_at(data, pos)
                for _i in range(count):
                    n, pos = _read_zlong_at(data, pos)
                    k = data[pos : pos + n].decode("utf-8")
                    pos += n
                    out[k], pos = rv(data, pos)
        return rd
    if wt == "fixed":
        size = writer["size"]
        dec_scale = (
            reader.get("scale", 0)
            if isinstance(reader, dict) and reader.get("logicalType") == "decimal"
            else None
        )

        def rd(data, pos, size=size, scale=dec_scale):
            end = pos + size
            if end > len(data):
                raise EOFError("truncated fixed")
            raw = data[pos:end]
            return (_bytes_to_decimal(raw, scale) if scale is not None else raw), end
        return rd
    raise ValueError(f"unsupported avro type for decode: {writer!r}")


class AvroBinaryCodec:
    """Encode/decode dict records against an Avro record schema.

    ``reader_schema_json`` enables schema-resolution decoding (evolution):
    data written with ``writer`` is decoded into the shape of ``reader``.

    The schema pair is COMPILED ONCE into per-field closures (type dispatch,
    logical-type conversions, union branch tables, resolution matching all
    decided at construction); the per-record encode/decode loop reads bytes
    by index and appends to one bytearray — no BytesIO, no per-value schema
    inspection.
    """

    def __init__(self, writer_schema_json: str, reader_schema_json: str | None = None):
        self.writer = json.loads(writer_schema_json)
        self.reader = (
            json.loads(reader_schema_json) if reader_schema_json else self.writer
        )
        if _type_name(self.writer) != "record" or _type_name(self.reader) != "record":
            raise ValueError("top-level avro schema must be a record")
        # Compile the write closure lazily: encode support rejects some
        # schema shapes (unions with 2+ non-null branches) that the decoder
        # handles fine, and decode-only codecs must still construct.
        self._write = None
        self._read = _compile_read(self.writer, self.reader)

    def encode(self, record: dict) -> bytes:
        if self._write is None:
            self._write = _compile_write(self.writer)
        buf = bytearray()
        self._write(buf, record)
        return bytes(buf)

    def decode(self, data: bytes) -> dict:
        try:
            value, _pos = self._read(bytes(data), 0)
        except IndexError:
            raise EOFError("truncated avro datum") from None
        return value



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
