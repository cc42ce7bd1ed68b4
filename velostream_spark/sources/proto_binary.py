"""Pure-Python Protobuf wire-format codec — the runtime half of the
reference's ``serialization/protobuf_codec.rs`` (535 LoC).

Neither spark-protobuf nor the ``google.protobuf`` Python package exists in
this environment, so ``from_protobuf`` can never execute here.  The proto3
wire format is a small public specification (varint tags ``(field_no << 3) |
wire_type``; wire types 0=varint, 1=64-bit, 2=length-delimited, 5=32-bit),
so we implement it directly:

- a minimal ``.proto`` text parser (``parse_proto``) covering ``message``
  blocks with scalar / string / bytes / enum-as-int32 / nested-message /
  ``repeated`` fields — the registry analog of the reference's compiled
  descriptors;
- ``ProtobufCodec.encode/decode`` for single messages (unknown fields are
  skipped by wire type, proto3 default semantics: missing scalar → 0/""/
  empty, missing message → None);
- Arrow-batched ``df_decode_protobuf`` via ``mapInPandas`` — the scale path.

The codec COMPILES each message spec once into per-field closures keyed by
the full wire tag (the standard pure-Python protobuf technique): the decode
loop is one dict hit per field, varints read by direct byte indexing (no
BytesIO), fixed-width fields through precompiled ``struct.Struct``s, and
encoders append to one ``bytearray`` with the tag bytes pre-rendered.
Schema work happens once per executor batch stream; the per-record loop
does no type dispatch.

Supported scalar types: int32 int64 uint32 uint64 sint32 sint64 bool
fixed64 sfixed64 double fixed32 sfixed32 float string bytes.  ``repeated``
numeric fields accept both packed (proto3 default) and unpacked encodings
and encode packed.
"""

from __future__ import annotations

import re
import struct
from typing import Any, Callable, Iterator

__all__ = ["parse_proto", "ProtobufCodec", "df_decode_protobuf", "proto_to_spark_type"]

_VARINT = {"int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool", "enum"}
_FIXED64 = {"fixed64", "sfixed64", "double"}
_FIXED32 = {"fixed32", "sfixed32", "float"}
_LEN = {"string", "bytes"}
_NUMERIC = _VARINT | _FIXED64 | _FIXED32

_MASK64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# .proto subset parser → {message: {field_no: (name, type, repeated)}}
# ---------------------------------------------------------------------------

_MSG_RE = re.compile(r"message\s+(\w+)\s*\{")
# no line anchor: fields may share a line (`message V { string a = 1; int32 b = 2; }`)
_FIELD_RE = re.compile(r"(repeated\s+)?([\w.]+)\s+(\w+)\s*=\s*(\d+)\s*;")


def parse_proto(text: str) -> dict[str, dict[int, tuple[str, str, bool]]]:
    """Parse a proto3 subset into message specs.

    Returns ``{message_name: {field_no: (field_name, type_name, repeated)}}``
    where ``type_name`` is a scalar type or another message name.
    """
    text = re.sub(r"//[^\n]*", "", text)
    messages: dict[str, dict[int, tuple[str, str, bool]]] = {}
    for m in _MSG_RE.finditer(text):
        name = m.group(1)
        depth, i = 1, m.end()
        while i < len(text) and depth:
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
            i += 1
        body = text[m.end() : i - 1]
        # strip nested message bodies so their fields don't leak into ours
        flat = _strip_nested(body)
        fields: dict[int, tuple[str, str, bool]] = {}
        for fm in _FIELD_RE.finditer(flat):
            repeated, ftype, fname, fno = fm.groups()
            fields[int(fno)] = (fname, ftype, bool(repeated))
        messages[name] = fields
    return messages


def _strip_nested(body: str) -> str:
    out, depth = [], 0
    for ch in body:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            continue
        if depth == 0:
            out.append(ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# wire primitives (index-based — no stream objects in the hot path)
# ---------------------------------------------------------------------------


def _read_varint_at(data: bytes, pos: int) -> tuple[int, int]:
    """Varint at ``pos`` → (value, next_pos)."""
    try:
        b = data[pos]
    except IndexError:
        raise EOFError("truncated varint") from None
    if b < 0x80:
        return b, pos + 1
    acc = b & 0x7F
    shift = 7
    pos += 1
    while True:
        try:
            b = data[pos]
        except IndexError:
            raise EOFError("truncated varint") from None
        pos += 1
        acc |= (b & 0x7F) << shift
        if b < 0x80:
            return acc, pos
        shift += 7


def _append_varint(buf: bytearray, n: int) -> None:
    if n < 0:
        n &= _MASK64  # two's-complement 64-bit (proto int32/int64 negatives)
    while n > 0x7F:
        buf.append((n & 0x7F) | 0x80)
        n >>= 7
    buf.append(n)


def _varint_bytes(n: int) -> bytes:
    buf = bytearray()
    _append_varint(buf, n)
    return bytes(buf)


def _skip_at(data: bytes, pos: int, wtype: int) -> int:
    if wtype == 0:
        return _read_varint_at(data, pos)[1]
    if wtype == 1:
        return pos + 8
    if wtype == 5:
        return pos + 4
    if wtype == 2:
        n, pos = _read_varint_at(data, pos)
        return pos + n
    raise ValueError(f"cannot skip wire type {wtype}")


def _write_varint(buf, n: int) -> None:
    """BytesIO-style varint writer (kept for wire-crafting tests/tools;
    the compiled encoders use ``_append_varint`` on bytearrays)."""
    tmp = bytearray()
    _append_varint(tmp, n)
    buf.write(bytes(tmp))


def buf_write_tag(buf, fno: int, wtype: int) -> None:
    _write_varint(buf, (fno << 3) | wtype)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 127)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _conv_signed(raw: int) -> int:
    return raw - (1 << 64) if raw >= (1 << 63) else raw


_S_D = struct.Struct("<d")
_S_F = struct.Struct("<f")
_S_Q = struct.Struct("<Q")
_S_q = struct.Struct("<q")
_S_I = struct.Struct("<I")
_S_i = struct.Struct("<i")

_FIXED_STRUCTS = {
    "double": _S_D,
    "float": _S_F,
    "fixed64": _S_Q,
    "sfixed64": _S_q,
    "fixed32": _S_I,
    "sfixed32": _S_i,
}

_VARINT_CONV: dict[str, Callable[[int], Any]] = {
    "sint32": _unzigzag,
    "sint64": _unzigzag,
    "bool": bool,
    "int32": _conv_signed,
    "int64": _conv_signed,
}


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


class ProtobufCodec:
    """Encode/decode dicts against a parsed message spec (compiled once)."""

    def __init__(
        self,
        messages: dict[str, dict[int, tuple[str, str, bool]]] | str,
        root: str | None = None,
    ):
        if isinstance(messages, str):
            messages = parse_proto(messages)
        self.messages = messages
        if root is None:
            if len(messages) != 1:
                raise ValueError("root message name required when proto has several")
            root = next(iter(messages))
        self.root = root
        if root not in messages:
            raise ValueError(f"unknown root message {root!r}")
        # compiled per-message entry points; nested-message closures resolve
        # through these dicts at call time, so mutual recursion just works
        self._decoders: dict[str, Callable[[bytes], dict]] = {}
        self._encoders: dict[str, Callable[[dict], bytes]] = {}
        for name in messages:
            self._decoders[name] = self._compile_decoder(name)
            self._encoders[name] = self._compile_encoder(name)

    # -- decode compile ----------------------------------------------------

    def _compile_decoder(self, message: str) -> Callable[[bytes], dict]:
        spec = self.messages[message]
        decoders = self._decoders  # late-bound for nested messages
        rv = _read_varint_at

        #: full wire tag → handler(data, pos, out) -> next_pos
        handlers: dict[int, Callable] = {}
        scalar_defaults: dict[str, Any] = {}
        repeated_names: list[str] = []

        for fno, (fname, ftype, repeated) in spec.items():
            if repeated:
                repeated_names.append(fname)
            elif ftype in self.messages:
                scalar_defaults[fname] = None
            elif ftype in _LEN:
                scalar_defaults[fname] = "" if ftype == "string" else b""
            elif ftype == "bool":
                scalar_defaults[fname] = False
            elif ftype in ("float", "double"):
                scalar_defaults[fname] = 0.0
            else:
                scalar_defaults[fname] = 0

            if ftype in _VARINT:
                conv = _VARINT_CONV.get(ftype)
                if repeated:
                    if conv is None:
                        def h_one(d, p, out, fn=fname, rv=rv):
                            raw, p = rv(d, p)
                            out[fn].append(raw)
                            return p

                        def h_packed(d, p, out, fn=fname, rv=rv):
                            n, p = rv(d, p)
                            end = p + n
                            lst = out[fn]
                            while p < end:
                                raw, p = rv(d, p)
                                lst.append(raw)
                            return p
                    else:
                        def h_one(d, p, out, fn=fname, cv=conv, rv=rv):
                            raw, p = rv(d, p)
                            out[fn].append(cv(raw))
                            return p

                        def h_packed(d, p, out, fn=fname, cv=conv, rv=rv):
                            n, p = rv(d, p)
                            end = p + n
                            lst = out[fn]
                            while p < end:
                                raw, p = rv(d, p)
                                lst.append(cv(raw))
                            return p
                    handlers[(fno << 3) | 0] = h_one
                    handlers[(fno << 3) | 2] = h_packed
                else:
                    if conv is None:
                        def h(d, p, out, fn=fname, rv=rv):
                            raw, p = rv(d, p)
                            out[fn] = raw
                            return p
                    else:
                        def h(d, p, out, fn=fname, cv=conv, rv=rv):
                            raw, p = rv(d, p)
                            out[fn] = cv(raw)
                            return p
                    handlers[(fno << 3) | 0] = h
            elif ftype in _FIXED64 or ftype in _FIXED32:
                st = _FIXED_STRUCTS[ftype]
                width = 8 if ftype in _FIXED64 else 4
                wt = 1 if ftype in _FIXED64 else 5
                if repeated:
                    def h_one(d, p, out, fn=fname, up=st.unpack_from, w=width):
                        if p + w > len(d):
                            raise EOFError("truncated fixed field")
                        out[fn].append(up(d, p)[0])
                        return p + w

                    def h_packed(d, p, out, fn=fname, up=st.unpack_from, w=width, rv=rv):
                        n, p = rv(d, p)
                        end = p + n
                        if end > len(d):
                            raise EOFError("truncated packed field")
                        lst = out[fn]
                        while p < end:
                            lst.append(up(d, p)[0])
                            p += w
                        return p
                    handlers[(fno << 3) | wt] = h_one
                    handlers[(fno << 3) | 2] = h_packed
                else:
                    def h(d, p, out, fn=fname, up=st.unpack_from, w=width):
                        if p + w > len(d):
                            raise EOFError("truncated fixed field")
                        out[fn] = up(d, p)[0]
                        return p + w
                    handlers[(fno << 3) | wt] = h
            elif ftype in _LEN:
                is_str = ftype == "string"
                if repeated:
                    def h(d, p, out, fn=fname, s=is_str, rv=rv):
                        n, p = rv(d, p)
                        end = p + n
                        if end > len(d):
                            raise EOFError("truncated length-delimited field")
                        payload = d[p:end]
                        out[fn].append(payload.decode("utf-8") if s else payload)
                        return end
                else:
                    def h(d, p, out, fn=fname, s=is_str, rv=rv):
                        n, p = rv(d, p)
                        end = p + n
                        if end > len(d):
                            raise EOFError("truncated length-delimited field")
                        payload = d[p:end]
                        out[fn] = payload.decode("utf-8") if s else payload
                        return end
                handlers[(fno << 3) | 2] = h
            elif ftype in self.messages:
                if repeated:
                    def h(d, p, out, fn=fname, ft=ftype, dec=decoders, rv=rv):
                        n, p = rv(d, p)
                        end = p + n
                        if end > len(d):
                            raise EOFError("truncated nested message")
                        out[fn].append(dec[ft](d[p:end]))
                        return end
                else:
                    def h(d, p, out, fn=fname, ft=ftype, dec=decoders, rv=rv):
                        n, p = rv(d, p)
                        end = p + n
                        if end > len(d):
                            raise EOFError("truncated nested message")
                        out[fn] = dec[ft](d[p:end])
                        return end
                handlers[(fno << 3) | 2] = h
            else:
                raise ValueError(f"unsupported proto type {ftype!r}")

        def decode_bytes(
            data: bytes,
            handlers=handlers,
            defaults=scalar_defaults,
            rep=tuple(repeated_names),
            rv=rv,
            skip=_skip_at,
        ) -> dict:
            out = defaults.copy()
            for nm in rep:
                out[nm] = []
            pos, dlen = 0, len(data)
            get = handlers.get
            while pos < dlen:
                b = data[pos]
                if b < 0x80:
                    tag = b
                    pos += 1
                else:
                    tag, pos = rv(data, pos)
                h = get(tag)
                if h is None:
                    pos = skip(data, pos, tag & 7)
                else:
                    pos = h(data, pos, out)
            return out

        return decode_bytes

    # -- encode compile ----------------------------------------------------

    def _compile_encoder(self, message: str) -> Callable[[dict], bytes]:
        spec = self.messages[message]
        encoders = self._encoders  # late-bound for nested messages
        av = _append_varint

        #: ordered (fname, repeated, field_encoder(buf, value))
        compiled: list[tuple[str, bool, Callable]] = []

        for fno, (fname, ftype, repeated) in sorted(spec.items()):
            if ftype in _VARINT:
                tag = _varint_bytes((fno << 3) | 0)
                if ftype in ("sint32", "sint64"):
                    def sc(buf, v, av=av):
                        av(buf, _zigzag(int(v)))
                elif ftype == "bool":
                    def sc(buf, v, av=av):
                        buf.append(1 if v else 0)
                else:
                    def sc(buf, v, av=av):
                        av(buf, int(v))
                if repeated:  # packed (proto3 default) → length-delimited tag
                    ptag = _varint_bytes((fno << 3) | 2)

                    def enc(buf, vals, tag=ptag, sc=sc, av=av):
                        inner = bytearray()
                        for v in vals:
                            sc(inner, v)
                        buf += tag
                        av(buf, len(inner))
                        buf += inner
                else:
                    def enc(buf, v, tag=tag, sc=sc):
                        buf += tag
                        sc(buf, v)
            elif ftype in _FIXED64 or ftype in _FIXED32:
                st = _FIXED_STRUCTS[ftype]
                wt = 1 if ftype in _FIXED64 else 5
                tag = _varint_bytes((fno << 3) | wt)
                caster = float if ftype in ("float", "double") else int
                if repeated:  # packed → length-delimited tag
                    ptag = _varint_bytes((fno << 3) | 2)

                    def enc(buf, vals, tag=ptag, pk=st.pack, cast=caster, av=av):
                        inner = bytearray()
                        for v in vals:
                            inner += pk(cast(v))
                        buf += tag
                        av(buf, len(inner))
                        buf += inner
                else:
                    def enc(buf, v, tag=tag, pk=st.pack, cast=caster):
                        buf += tag
                        buf += pk(cast(v))
            elif ftype in _LEN:
                tag = _varint_bytes((fno << 3) | 2)
                is_str = ftype == "string"
                def one(buf, v, tag=tag, s=is_str, av=av):
                    data = v.encode("utf-8") if s else bytes(v)
                    buf += tag
                    av(buf, len(data))
                    buf += data
                if repeated:
                    def enc(buf, vals, one=one):
                        for v in vals:
                            one(buf, v)
                else:
                    enc = one
            elif ftype in self.messages:
                tag = _varint_bytes((fno << 3) | 2)
                def one(buf, v, tag=tag, ft=ftype, es=encoders, av=av):
                    nested = es[ft](v)
                    buf += tag
                    av(buf, len(nested))
                    buf += nested
                if repeated:
                    def enc(buf, vals, one=one):
                        for v in vals:
                            one(buf, v)
                else:
                    enc = one
            else:
                raise ValueError(f"unsupported proto type {ftype!r}")
            compiled.append((fname, repeated, enc))

        def encode_record(record: dict, compiled=tuple(compiled)) -> bytes:
            buf = bytearray()
            for fname, repeated, enc in compiled:
                v = record.get(fname)
                if v is None:
                    continue
                if repeated:
                    # listify BEFORE the emptiness test: numpy arrays (what
                    # Arrow batches hand over) are ambiguous under `not v`
                    v = list(v)
                    if not v:
                        continue
                enc(buf, v)
            return bytes(buf)

        return encode_record

    # -- public API --------------------------------------------------------

    def encode(self, record: dict, message: str | None = None) -> bytes:
        return self._encoders[message or self.root](record)

    def decode(self, data: bytes, message: str | None = None) -> dict:
        return self._decoders[message or self.root](bytes(data))


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

_SPARK_SCALAR = {
    "int32": "int",
    "sint32": "int",
    "sfixed32": "int",
    "uint32": "long",
    "fixed32": "long",
    "int64": "long",
    "sint64": "long",
    "sfixed64": "long",
    "uint64": "long",  # caution: top bit loses sign; reference maps the same way
    "fixed64": "long",
    "bool": "boolean",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
    "enum": "int",
}


def proto_to_spark_type(codec: ProtobufCodec, message: str | None = None):
    """Message spec → Spark StructType (nested messages → nested structs)."""
    from pyspark.sql.types import ArrayType, StructField, StructType
    from pyspark.sql.types import _parse_datatype_string as _dt

    spec = codec.messages[message or codec.root]
    fields = []
    for _, (fname, ftype, repeated) in sorted(spec.items()):
        if ftype in codec.messages:
            t = proto_to_spark_type(codec, ftype)
        else:
            t = _dt(_SPARK_SCALAR[ftype])
        fields.append(StructField(fname, ArrayType(t) if repeated else t, True))
    return StructType(fields)


def df_decode_protobuf(df, value_col: str, proto_text: str, message: str | None = None):
    """Binary ``value_col`` → decoded message columns via ``mapInPandas``
    (Arrow-batched; the no-jar analog of ``from_protobuf``)."""
    import pandas as pd

    from pyspark.sql.types import StructType

    probe = ProtobufCodec(proto_text, message)
    out_struct = proto_to_spark_type(probe, message)
    passthrough = [f for f in df.schema.fields if f.name != value_col]
    schema = StructType(list(out_struct.fields) + passthrough)
    field_names = [f.name for f in out_struct.fields]

    def gen(batches) -> Iterator:
        codec = ProtobufCodec(proto_text, message)
        decode = codec._decoders[codec.root]
        for pdf in batches:
            records = [
                decode(v) if v is not None else None for v in pdf[value_col]
            ]
            cols = {
                fn: [None if r is None else r.get(fn) for r in records]
                for fn in field_names
            }
            out = pd.DataFrame(cols)
            for c in pdf.columns:
                if c != value_col:
                    out[c] = pdf[c].values
            yield out

    return df.mapInPandas(gen, schema=schema)


def df_roundtrip_protobuf(df, proto_text: str, message: str | None = None):
    """Encode every row to protobuf wire bytes and decode them straight back
    in ONE Arrow stage (see ``df_roundtrip_avro`` for rationale: one
    mapInPandas pass instead of two, per-stage worker overhead paid once)."""
    import pandas as pd

    probe = ProtobufCodec(proto_text, message)
    schema = proto_to_spark_type(probe, message)
    fields = [f.name for f in schema.fields]

    def gen(batches) -> Iterator:
        codec = ProtobufCodec(proto_text, message)
        enc = codec._encoders[codec.root]
        dec = codec._decoders[codec.root]
        for pdf in batches:
            cols = list(pdf.columns)
            wire = [
                enc(dict(zip(cols, row)))
                for row in pdf.itertuples(index=False, name=None)
            ]
            recs = [dec(w) for w in wire]
            yield pd.DataFrame({f: [r.get(f) for r in recs] for f in fields})

    return df.mapInPandas(gen, schema=schema)
