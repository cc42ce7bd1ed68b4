"""File-based schema registry — the data-schema half of the reference's
registry surface (``config/schema_registry.rs:201`` ``HierarchicalSchemaRegistry``
plus ``src/velostream/schema/``): subjects hold ordered schema versions,
consumers resolve writer vs reader versions, and compatibility is checked
before registration.

Layout: ``<root>/<subject>/<N>.avsc`` (N = 1-based version).  This is the
same subject/version model as Confluent's registry, kept on the filesystem
so it works in air-gapped environments; at scale the root lives on shared
storage (HDFS/S3 via a mounted path) and reads are cached per-session.

Feeds the pure-Python Avro codec (`avro_binary`): ``decode_with_registry``
resolves the writer's schema version and the latest (or pinned) reader
version and hands both to the Arrow-batched ``df_decode_avro`` — giving
schema-evolution decode end-to-end without any connector jar.

WITH-clause keys honored (mirroring the reference's source config surface):
``avro.schema.registry.path``, ``avro.schema.subject``,
``avro.schema.version`` (writer version; default latest),
``avro.schema.reader.version`` (default latest).
"""

from __future__ import annotations

import json
from pathlib import Path

from .avro_binary import _PROMOTIONS, _type_name

__all__ = ["FileSchemaRegistry", "can_read", "decode_with_registry"]


class SchemaCompatibilityError(ValueError):
    pass


class FileSchemaRegistry:
    """Subject → ordered Avro schema versions on the filesystem."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._cache: dict[tuple[str, int], str] = {}

    # -- write path --------------------------------------------------------

    def register(
        self, subject: str, schema_json: str, *, check_compat: bool = True
    ) -> int:
        """Register a schema under ``subject``; returns its version.

        Identical-to-latest schemas are deduplicated (returns the existing
        version).  With ``check_compat`` (default), the new schema must be
        able to READ data written with the current latest (backward
        compatibility — the reference's evolution contract).
        """
        canonical = json.dumps(json.loads(schema_json), sort_keys=True)
        versions = self.versions(subject)
        if versions:
            latest = self.get_schema(subject, versions[-1])
            if json.dumps(json.loads(latest), sort_keys=True) == canonical:
                return versions[-1]
            if check_compat and not can_read(schema_json, latest):
                raise SchemaCompatibilityError(
                    f"schema for {subject!r} cannot read version {versions[-1]} data"
                )
        version = (versions[-1] + 1) if versions else 1
        subj_dir = self.root / subject
        subj_dir.mkdir(parents=True, exist_ok=True)
        (subj_dir / f"{version}.avsc").write_text(schema_json)
        self._cache[(subject, version)] = schema_json
        return version

    # -- read path ---------------------------------------------------------

    def subjects(self) -> list[str]:
        return sorted(p.name for p in self.root.iterdir() if p.is_dir())

    def versions(self, subject: str) -> list[int]:
        subj_dir = self.root / subject
        if not subj_dir.is_dir():
            return []
        return sorted(int(p.stem) for p in subj_dir.glob("*.avsc"))

    def latest_version(self, subject: str) -> int:
        versions = self.versions(subject)
        if not versions:
            raise KeyError(f"unknown subject: {subject!r}")
        return versions[-1]

    def get_schema(self, subject: str, version: int | None = None) -> str:
        if version is None:
            version = self.latest_version(subject)
        key = (subject, version)
        if key not in self._cache:
            path = self.root / subject / f"{version}.avsc"
            if not path.is_file():
                raise KeyError(f"no version {version} for subject {subject!r}")
            self._cache[key] = path.read_text()
        return self._cache[key]


# ---------------------------------------------------------------------------
# static resolution check (spec "Schema Resolution" rules, no data needed)
# ---------------------------------------------------------------------------


def can_read(reader_json_or_schema, writer_json_or_schema) -> bool:
    """True if data written with ``writer`` can be decoded as ``reader``."""
    return _resolvable(_load(reader_json_or_schema), _load(writer_json_or_schema))


def _load(schema):
    """Accept a parsed schema, a JSON string, or a bare type name."""
    if not isinstance(schema, str):
        return schema
    try:
        return json.loads(schema)
    except json.JSONDecodeError:
        return schema  # bare primitive name like "long"


def _resolvable(reader, writer) -> bool:
    rt, wt = _type_name(reader), _type_name(writer)
    if wt == "union":
        return all(_resolvable(reader, b) for b in writer)
    if rt == "union":
        return any(_resolvable(b, writer) for b in reader)
    if rt == "record" and wt == "record":
        wfields = {f["name"]: f for f in writer["fields"]}
        for rf in reader["fields"]:
            if rf["name"] in wfields:
                if not _resolvable(rf["type"], wfields[rf["name"]]["type"]):
                    return False
            elif "default" not in rf:
                return False
        return True
    if rt == "array" and wt == "array":
        return _resolvable(reader["items"], writer["items"])
    if rt == "map" and wt == "map":
        return _resolvable(reader["values"], writer["values"])
    if rt == "enum" and wt == "enum":
        return set(writer["symbols"]) <= set(reader["symbols"])
    if rt == "fixed" and wt == "fixed":
        return reader.get("size") == writer.get("size")
    return rt == wt or rt in _PROMOTIONS.get(wt, set())


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def decode_with_registry(df, cfg: dict[str, str], value_col: str = "value"):
    """Decode an Avro-binary ``value_col`` using WITH-clause registry config.

    The writer version is what produced the data (``avro.schema.version``,
    default latest); the reader version is what the query wants
    (``avro.schema.reader.version``, default latest).  Evolution — added
    fields with defaults, dropped fields, promotions — happens inside the
    codec's schema resolution, executor-side.
    """
    registry = FileSchemaRegistry(cfg["avro.schema.registry.path"])
    subject = cfg["avro.schema.subject"]
    writer_v = cfg.get("avro.schema.version")
    reader_v = cfg.get("avro.schema.reader.version")
    writer = registry.get_schema(subject, int(writer_v) if writer_v else None)
    reader = registry.get_schema(subject, int(reader_v) if reader_v else None)

    from .avro_binary import df_decode_avro

    return df_decode_avro(df, value_col, writer, reader)
