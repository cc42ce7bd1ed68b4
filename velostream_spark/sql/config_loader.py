"""WITH-clause ``config_file`` loading — the reference's hierarchical
source-configuration surface (``sql/config/with_clause_parser.rs`` 1384 LoC
+ ``yaml_loader.rs``): a WITH property may point at a YAML file describing
the data source (type/path/format), an explicit field schema, and
processing hints; YAML files may inherit from one another via ``extends:``.

The loader flattens a config document into the same flat cfg-key dict the
engine's WITH-clause wiring consumes (``type``, ``path``, ``format``,
``delimiter`` …) plus a parsed ``schema.fields`` list the file reader turns
into an explicit Spark schema (no inference — the reference declares its
schemas the same way, ``file/config.rs``).
"""

from __future__ import annotations

import os
from typing import Any

import yaml

__all__ = ["load_config_file", "schema_from_fields"]


def _deep_merge(parent: dict, child: dict) -> dict:
    out = dict(parent)
    for k, v in child.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_doc(path: str, _seen: frozenset[str] = frozenset()) -> dict:
    real = os.path.realpath(path)
    if real in _seen:
        chain = " -> ".join(sorted(_seen)) + f" -> {real}"
        raise ValueError(f"cyclic 'extends' chain in config files: {chain}")
    with open(path) as fh:
        doc = yaml.safe_load(fh) or {}
    ext = doc.pop("extends", None)
    if ext:
        parent_path = ext if os.path.isabs(ext) else os.path.join(
            os.path.dirname(path), ext
        )
        doc = _deep_merge(_load_doc(parent_path, _seen | {real}), doc)
    return doc


def load_config_file(path: str) -> dict[str, Any]:
    """YAML source config → flat engine cfg keys.

    Recognized document shape (the reference's source configs):
    ``data_source: {type, path, format, has_headers, delimiter, topic, …}``
    plus ``schema: {fields: [{name, type, precision, scale, format}, …]}``.
    """
    doc = _load_doc(path)
    ds = doc.get("data_source", {}) or {}
    flat: dict[str, Any] = {}
    dtype = (ds.get("type") or "").lower()
    if dtype == "file":
        flat["type"] = "file_source"
        # path may live in data_source.path or in the sibling `file:`
        # section (the reference's table configs split them — e.g.
        # configs/regulatory_watchlist_table.yaml keeps only format keys
        # under data_source and the path under `file:`)
        data_path = ds.get("path") or (doc.get("file") or {}).get("path")
        if not data_path:
            raise ValueError(f"file source config {path!r} missing a path")
        flat["path"] = data_path
        fmt = (ds.get("format") or "csv").lower()
        if fmt == "csv" and ds.get("has_headers") is False:
            fmt = "csv_no_header"
        flat["format"] = fmt
        if "delimiter" in ds:
            flat["delimiter"] = ds["delimiter"]
    elif dtype == "kafka":
        flat["type"] = "kafka_source"
        for k in ("topic", "brokers", "bootstrap.servers", "group.id"):
            if k in ds:
                flat[k] = ds[k]
    fields = (doc.get("schema") or {}).get("fields")
    if fields:
        flat["schema.fields"] = fields
        ts_formats = {
            f["name"]: f["format"]
            for f in fields
            if f.get("type") == "timestamp" and "format" in f
        }
        if len(set(ts_formats.values())) == 1 and ts_formats:
            # Spark CSV readers take ONE timestampFormat per read
            flat["timestampFormat"] = next(iter(ts_formats.values()))
    return flat


_SIMPLE_TYPES = {
    "string": "string",
    "integer": "long",  # reference Integer is i64 (types.rs:52)
    "int": "long",
    "long": "long",
    "float": "double",  # reference Float is f64
    "double": "double",
    "boolean": "boolean",
    "timestamp": "timestamp",
    "date": "date",
}


def schema_from_fields(fields: list[dict]):
    """Config schema fields → explicit Spark StructType (decimal keeps its
    declared precision/scale — the reference's ScaledInteger path)."""
    from pyspark.sql.types import StructField, StructType
    from pyspark.sql.types import _parse_datatype_string as _dt

    out = []
    for f in fields:
        t = f.get("type", "string")
        if t == "decimal":
            p, s = f.get("precision", 18), f.get("scale", 4)
            ddl = f"decimal({p},{s})"
        else:
            ddl = _SIMPLE_TYPES[t]
        out.append(StructField(f["name"], _dt(ddl), f.get("nullable", True)))
    return StructType(out)
