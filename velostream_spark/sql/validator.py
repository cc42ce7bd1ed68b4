"""Pre-flight statement validation — the Spark analog of the reference's
`SqlValidator::validate` (src/velostream/sql/validator.rs:92,154 — syntax /
configuration / feature checks emitting non-blocking warnings) and
`QueryAnalyzer::analyze` (query_analyzer.rs:189-410 — source/sink
requirements derived from FROM/JOIN/WITH clauses).

Catalyst performs real name/type resolution at execution; this layer catches
the *configuration-level* problems the reference's validator exists for —
a FROM table with no registered view and no WITH-clause source, a file
source without a path, EMIT FINAL on a stateless query — before any job is
deployed, with the same error/warning split (errors block, warnings don't).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from velostream_spark.sql.dialect import Statement, parse_statement

#: WITH-clause option keys understood per source/sink type
_KNOWN_OPTS = {
    "type", "path", "format", "delimiter", "has_headers", "topic",
    "bootstrap.servers", "brokers", "group.id", "auto.offset.reset",
    "watermark.delay", "config_file", "topic.name",
}
_SOURCE_TYPES = {"file_source", "file_source_mmap", "kafka_source"}
_SINK_TYPES = {"file_sink", "kafka_sink", "stdout_sink", "memory"}
_FILE_FORMATS = {"csv", "csv_no_header", "csvnoheader", "jsonl", "jsonlines",
                 "json_lines", "json", "parquet"}


@dataclass
class ValidationReport:
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    sources: dict[str, dict[str, str]] = field(default_factory=dict)
    sinks: dict[str, dict[str, str]] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return not self.errors


def _referenced_tables(select_sql: str) -> set[str]:
    """Table identifiers in FROM/JOIN clauses (skips subquery parens)."""
    out = set()
    for m in re.finditer(r"(?is)\b(?:FROM|JOIN)\s+([a-zA-Z_]\w*)", select_sql):
        out.add(m.group(1).lower())
    return out


def validate_statement(
    sql: str,
    registered: set[str] | None = None,
    time_col: str = "_event_time",
) -> ValidationReport:
    """Validate one statement; never raises for content problems — parse
    failures land in .errors like the reference's syntax check."""
    rep = ValidationReport()
    try:
        st = parse_statement(sql, time_col)
    except ValueError as e:
        rep.errors.append(f"parse error: {e}")
        return rep
    return _validate_parsed(st, rep, registered or set())


def _validate_parsed(
    st: Statement, rep: ValidationReport, registered: set[str]
) -> ValidationReport:
    #: statement-level WITH properties the reference accepts without a
    #: '<name>.' prefix (with_clause_parser.rs table/statement props)
    _STMT_PROPS = {
        "config_file", "table_model", "retention", "compression",
        "refresh_interval",
    }

    cfgs: dict[str, dict[str, str]] = {}
    for k, v in st.with_props.items():
        if "." not in k:
            if k not in _STMT_PROPS:
                rep.warnings.append(f"WITH property {k!r} has no '<name>.' prefix")
            continue
        name, _, opt = k.partition(".")
        cfgs.setdefault(name, {})[opt] = v

    # a statement-level config_file supplies ONLY the driving FROM
    # source's config (the engine binds it exactly that way —
    # engine._resolve_config_files); other unregistered tables still error
    from velostream_spark.sql.dialect import first_from_table

    stmt_config_tbl = (
        (first_from_table(st.select_sql or "") or "").lower()
        if "config_file" in st.with_props
        else None
    )

    # requirement analysis (query_analyzer.rs): every FROM/JOIN table needs
    # a registered view or a WITH source config
    if st.select_sql:
        for tbl in _referenced_tables(st.select_sql):
            if tbl in registered or tbl == st.name:
                continue
            if tbl in {v.lower() for v in st.uri_sources}:
                continue  # FR-047 URI FROM source — self-configuring
            cfg = cfgs.get(tbl)
            if cfg is None and tbl == stmt_config_tbl:
                continue
            if cfg is not None and "config_file" in cfg and "type" not in cfg:
                continue  # type comes from the YAML at execution time
            if cfg is None:
                rep.errors.append(
                    f"table {tbl!r} is not registered and has no WITH-clause "
                    f"source config ('{tbl}.type' = ...)"
                )
            elif cfg.get("type") not in _SOURCE_TYPES:
                rep.errors.append(
                    f"source {tbl!r} has unknown type {cfg.get('type')!r} "
                    f"(expected one of {sorted(_SOURCE_TYPES)})"
                )

    # per-config checks (validator.rs config validation)
    for name, cfg in cfgs.items():
        typ = cfg.get("type", "")
        if typ in _SOURCE_TYPES:
            rep.sources[name] = cfg
        elif typ in _SINK_TYPES:
            rep.sinks[name] = cfg
        elif typ:
            rep.warnings.append(f"{name!r}: unrecognized type {typ!r}")
        if typ.startswith("file_"):
            if "path" not in cfg:
                rep.errors.append(f"{name!r}: file {typ} requires a 'path'")
            fmt = cfg.get("format", "csv").lower()
            if fmt not in _FILE_FORMATS:
                rep.errors.append(f"{name!r}: unknown file format {fmt!r}")
        if typ.startswith("kafka_") and "topic" not in cfg:
            rep.errors.append(f"{name!r}: kafka {typ} requires a 'topic'")
        if name == "kafka" and "type" not in cfg:
            continue  # 'kafka.*' statement props = client passthrough
        for opt in cfg:
            if opt not in _KNOWN_OPTS and not opt.startswith("kafka."):
                rep.warnings.append(f"{name!r}: unknown option {opt!r}")

    # AggregateWithoutGrouping (parser/validator.rs:36-64): aggregates in
    # SELECT with neither GROUP BY nor WINDOW. The reference DEFINES this
    # as an error but its enforcement call is commented out
    # (parser/mod.rs:486) — and this engine's batch execution handles
    # global aggregates fine — so it surfaces as the same non-blocking
    # warning tier the reference effectively ships with, aimed at
    # CONTINUOUS kinds where an unbounded global aggregate never closes.
    if st.select_sql and st.kind in ("create_stream", "start_job", "deploy_job"):
        # the lookahead skips simple windowed forms (AGG(...) OVER ...),
        # which the reference's extractor also exempts (they carry their
        # own frame); nested-paren OVER forms are rare enough for a lint
        aggs = {
            m.group(1).upper()
            for m in re.finditer(
                r"(?is)\b(COUNT|SUM|AVG|MIN|MAX|STDDEV(?:_POP|_SAMP)?|"
                r"VAR(?:IANCE|_POP|_SAMP)|MEDIAN|PERCENTILE(?:_CONT|_DISC)?|"
                r"STRING_AGG|GROUP_CONCAT|LISTAGG|COLLECT|FIRST|LAST|"
                r"APPROX_COUNT_DISTINCT|COUNT_DISTINCT)\s*\((?![^()]*\)\s*OVER\b)",
                st.select_sql,
            )
        }
        has_grouping = (
            re.search(r"(?is)\bGROUP\s+BY\b", st.select_sql) is not None
            or st.window is not None
            or bool(st.rows_window_aggs)
        )
        if aggs and not has_grouping:
            rep.warnings.append(
                f"aggregate functions {sorted(aggs)} without GROUP BY or "
                f"WINDOW clause: on a continuous stream this aggregate "
                f"never closes (reference AggregateWithoutGrouping, "
                f"parser/validator.rs:53)"
            )

    # feature checks (validator.rs feature validation)
    if st.select_sql:
        has_agg = bool(
            re.search(r"(?is)\b(GROUP\s+BY|COUNT|SUM|AVG|MIN|MAX)\s*\(?", st.select_sql)
        )
        if st.emit == "final" and not has_agg and st.window is None:
            rep.warnings.append(
                "EMIT FINAL on a stateless query behaves like EMIT CHANGES "
                "(nothing accumulates to flush)"
            )
        if st.window is not None and st.window.time_column is None:
            rep.warnings.append(
                f"WINDOW clause has no explicit time column; the engine "
                f"default ({'_event_time'!r}-configurable) will be used"
            )
    if st.kind == "create_table" and not st.key_fields:
        # key_fields covers BOTH the inline PRIMARY KEY annotation and the
        # implicit GROUP BY key (KEY_CONFIGURATION.md:69-117) — only a
        # table with neither is keyless.
        rep.warnings.append(
            "CTAS without a PRIMARY KEY column or GROUP BY key: point "
            "lookups (UnifiedTable.get_record) will be unavailable"
        )
    return rep


def validate_app(sql_app: str, registered: set[str] | None = None) -> ValidationReport:
    """Validate a multi-statement application in dependency order: names
    created by earlier statements count as registered for later ones (the
    reference's app_parser dependency ordering)."""
    from velostream_spark.sql.dialect import split_statements

    reg = set(registered or set())
    combined = ValidationReport()
    for stmt in split_statements(sql_app):
        rep = validate_statement(stmt, reg)
        combined.errors.extend(rep.errors)
        combined.warnings.extend(rep.warnings)
        combined.sources.update(rep.sources)
        combined.sinks.update(rep.sinks)
        try:
            st = parse_statement(stmt)
            if st.name:
                reg.add(st.name.lower())
        except ValueError:
            pass
    return combined
