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


#: The reference's validation function registry
#: (validation/function_registry.rs:117-350), split the way its semantic
#: validator needs: aggregates may appear bare or with OVER; window
#: functions require OVER; everything else must NOT take an OVER clause.
_REF_AGGREGATES = {
    "COUNT", "SUM", "AVG", "MIN", "MAX", "STDDEV", "STDDEV_SAMP",
    "STDDEV_POP", "VARIANCE", "VAR_SAMP", "VAR_POP", "MEDIAN",
    "PERCENTILE_CONT", "PERCENTILE_DISC", "CORR", "COVAR_POP", "COVAR_SAMP",
    "REGR_SLOPE", "REGR_INTERCEPT", "COUNT_DISTINCT",
    "APPROX_COUNT_DISTINCT", "FIRST_VALUE", "LAST_VALUE", "LISTAGG",
    "STRING_AGG",
}
_REF_WINDOW_FNS = {
    "ROW_NUMBER", "RANK", "DENSE_RANK", "PERCENT_RANK", "CUME_DIST",
    "NTILE", "LAG", "LEAD", "NTH_VALUE", "FIRST_VALUE", "LAST_VALUE",
}
_REF_SCALARS = {
    "HEADER", "HEADER_KEYS", "HAS_HEADER", "SET_HEADER", "REMOVE_HEADER",
    "COALESCE", "NULLIF", "CAST",
    "UPPER", "LOWER", "SUBSTRING", "SUBSTR", "LEFT", "RIGHT", "REPLACE",
    "TRIM", "LTRIM", "RTRIM", "LENGTH", "LEN", "POSITION", "CONCAT",
    "CONCAT_WS", "JOIN", "REGEXP", "REGEXP_REPLACE", "SPLIT",
    "ABS", "MOD", "ROUND", "CEIL", "CEILING", "FLOOR", "POWER", "POW",
    "SQRT", "EXP", "LN", "LOG", "LOG10", "LEAST", "GREATEST",
    "NOW", "CURRENT_TIMESTAMP", "CURRENT_TIME", "CURRENT_DATE", "TIMESTAMP",
    "DATE", "TIME", "EXTRACT", "DATE_FORMAT", "DATE_TRUNC", "DATE_ADD",
    "DATE_SUB", "DATE_DIFF", "DATEDIFF", "YEAR", "MONTH", "DAY", "HOUR",
    "MINUTE", "SECOND", "WEEK", "QUARTER", "DOW", "DOY", "EPOCH",
    "MILLISECOND", "MICROSECOND", "NANOSECOND", "UNIX_TIMESTAMP",
    "FROM_UNIXTIME", "TO_TIMESTAMP", "TO_DATE", "TUMBLE_START", "TUMBLE_END",
    "IF", "CASE", "WHEN", "ELSE", "END",
    "JSON_VALUE", "JSON_QUERY", "JSON_OBJECT", "JSON_ARRAY", "JSON_EXTRACT",
    "ARRAY_LENGTH", "ARRAY_CONTAINS", "ARRAY_DISTINCT", "MAP_KEYS",
    "MAP_VALUES", "ARRAY", "MAP", "STRUCT",
}
#: Names the RUNTIME registry (functions.rs) supports beyond the validation
#: registry, all exercised by the 89-name conformance sweep.
_DIALECT_EXTRAS = {
    "GROUP_CONCAT", "COLLECT", "DELTA", "SPLIT_PART", "SESSION_DURATION",
    "SESSION_START", "SESSION_END", "FIRST", "LAST", "TRY_CAST",
}
_REF_SUPPORTED = _REF_AGGREGATES | _REF_WINDOW_FNS | _REF_SCALARS
#: SQL keywords that can precede '(' without being function calls
_NOT_FUNCTIONS = {
    "AND", "OR", "NOT", "IN", "EXISTS", "VALUES", "ON", "USING", "OVER",
    "BETWEEN", "SELECT", "WHERE", "FROM", "AS", "BY", "THEN", "ANY", "ALL",
    "SOME", "DISTINCT", "INTERVAL", "PARTITION", "WITHIN", "LIKE",
    "TUMBLING", "SLIDING", "SESSION", "WITH", "HAVING", "UNION", "EXCEPT",
    "INTERSECT", "JOIN", "LIMIT", "EMIT",
    "GROUP", "ORDER",  # WITHIN GROUP (ORDER BY ...) / GROUP BY (expr)
}

_spark_builtin_names: set[str] | None = None


def _spark_builtins() -> set[str]:
    """Python-side pyspark.sql.functions names (session-free probe) — the
    documented permissive superset: this engine passes unrecognized names
    through to Spark, so a Spark builtin is not 'unknown' here even though
    the reference's strict validator would reject it."""
    global _spark_builtin_names
    if _spark_builtin_names is None:
        from pyspark.sql import functions as _F

        _spark_builtin_names = {n.upper() for n in dir(_F) if not n.startswith("_")}
    return _spark_builtin_names


def _validate_function_names(sql: str, rep: ValidationReport, strict: bool) -> None:
    """Semantic function validation (semantic_validator.rs:155-207): an
    unknown function name is an error in strict mode (the reference's
    default) with did-you-mean suggestions, a warning otherwise; a known
    non-window, non-aggregate function with an OVER clause is always an
    error. Scans the ORIGINAL statement text (pre-translation names)."""
    import difflib

    from velostream_spark.sql.dialect import _match_paren, _skip_string

    known = _REF_SUPPORTED | _DIALECT_EXTRAS
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch in ("'", '"'):
            i = _skip_string(sql, i)
            continue
        m = re.match(r"([A-Za-z_]\w*)\s*\(", sql[i:])
        if not m or (i > 0 and (sql[i - 1].isalnum() or sql[i - 1] in "_.")):
            i += 1
            continue
        name = m.group(1).upper()
        close = _match_paren(sql, i + m.end())
        if name in _NOT_FUNCTIONS:
            i += m.end(1)
            continue
        has_over = re.match(r"(?is)\s*OVER\b", sql[close:]) is not None
        if name not in known:
            if name not in _spark_builtins():
                similar = difflib.get_close_matches(name, sorted(known), 3, 0.6)
                hint = f" — did you mean {', '.join(similar)}?" if similar else ""
                msg = f"unknown function {name!r}{hint}"
                (rep.errors if strict else rep.warnings).append(msg)
        elif has_over and name in _REF_SUPPORTED and not (
            name in _REF_WINDOW_FNS or name in _REF_AGGREGATES
        ):
            rep.errors.append(
                f"function {name!r} cannot be used in OVER clauses — only "
                f"window functions (ROW_NUMBER, LAG, ...) and aggregates "
                f"(COUNT, SUM, ...) are allowed "
                f"(semantic_validator.rs:185-207)"
            )
        i += m.end(1)


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
    strict_functions: bool = True,
) -> ValidationReport:
    """Validate one statement; never raises for content problems — parse
    failures land in .errors like the reference's syntax check.
    ``strict_functions`` mirrors SemanticValidator::new (errors) vs
    new_lenient (warnings) for unknown function names."""
    rep = ValidationReport()
    try:
        st = parse_statement(sql, time_col)
    except ValueError as e:
        rep.errors.append(f"parse error: {e}")
        return rep
    fn_scan_sql = sql
    if st.schema_columns is not None:
        # a column-definition block (`CREATE TABLE t2 (a BIGINT, ...)`)
        # looks like a call `t2 (...)` to the function scanner — scan only
        # the query after AS (registration-only DDL has no functions)
        am = re.search(r"(?is)\bAS\b(.*)$", sql)
        fn_scan_sql = am.group(1) if am else ""
    _validate_function_names(fn_scan_sql, rep, strict_functions)
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

    # Registration-only CREATE (no AS): bare keys ARE the documented form
    # (`topic = ...`, quickstart docs) — the prefix advice is for queries
    registration_only = (
        st.kind in ("create_stream", "create_table") and st.select_sql is None
    )
    cfgs: dict[str, dict[str, str]] = {}
    for k, v in st.with_props.items():
        if "." not in k:
            if k not in _STMT_PROPS and not registration_only:
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
    if st.key_fields and st.into:
        # PRIMARY KEY on a file sink: file sinks have no message-key wire,
        # so the annotation silently does nothing in the reference — its
        # own FR-094 doc flags the missing warning as the "quick win"
        # (docs/feature/FR-094-primary-key-semantics/README.md:9,199-205).
        into_cfg = dict(st.with_props).get(f"{st.into}.type", "")
        if into_cfg == "file_sink" or st.into.startswith("file://"):
            rep.warnings.append(
                f"PRIMARY KEY fields {st.key_fields} target file sink "
                f"{st.into!r}: file sinks have no message key — the "
                f"annotation has no effect (FR-094)"
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
