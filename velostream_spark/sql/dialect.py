"""Velostream SQL dialect → Spark SQL translation.

The reference parses its dialect with a hand-written recursive-descent
parser (src/velostream/sql/parser/{tokenizer,select,expressions,clauses}.rs)
into a `StreamingQuery` AST that is interpreted per record. Here the heavy
lifting — expression parsing, name resolution, optimization — belongs to
Spark's own SQL parser + Catalyst, so this layer only handles what the
velostream dialect adds ON TOP of ANSI SQL:

- statement wrappers: CREATE STREAM/TABLE ... AS SELECT (ast.rs:260-290),
  `WITH ('k'='v', ...)` source/sink config (with_clause_parser.rs),
  `EMIT CHANGES|FINAL` (ast.rs:152-163), `-- @key: value` annotations
  (parser/annotations.rs), SQL-application files (app_parser.rs).
- the `WINDOW TUMBLING/SLIDING/SESSION(...)` clause (ast.rs:596-611) →
  an injected `window(<time_col>, ...)` grouping key.
- the `ROWS WINDOW BUFFER n ROWS ...` OVER-spec (ast.rs:617-652) → a
  standard `ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW` frame.
- `PRIMARY KEY` select-item annotations (FR-089) → extracted key fields.
- function-name deltas between the reference catalog (functions.rs:3040+)
  and Spark built-ins (JSON_EXTRACT → get_json_object, COUNT_DISTINCT →
  COUNT(DISTINCT ...), EXTRACT('EPOCH', x) → unix_timestamp, ...).

Everything else (expressions, CASE, BETWEEN, IN, subqueries, joins,
aggregates, window functions) is already valid Spark SQL and passes through
untouched — by design, not omission.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# tokens & helpers
# ---------------------------------------------------------------------------

_UNIT_TO_SPARK = {
    "MS": "milliseconds",
    "MILLISECOND": "milliseconds",
    "MILLISECONDS": "milliseconds",
    "SECOND": "seconds",
    "SECONDS": "seconds",
    "MINUTE": "minutes",
    "MINUTES": "minutes",
    "HOUR": "hours",
    "HOURS": "hours",
    "DAY": "days",
    "DAYS": "days",
}


def _skip_string(s: str, i: int) -> int:
    """``i`` points at an opening quote; return the index just past the
    closing quote (SQL ``''`` doubling treated as an escaped quote)."""
    q = s[i]
    i += 1
    while i < len(s):
        if s[i] == q:
            if i + 1 < len(s) and s[i + 1] == q:
                i += 2
                continue
            return i + 1
        i += 1
    return i


def _match_paren(s: str, i: int) -> int:
    """``i`` = index just past an opening paren; return the index just past
    its matching close. String literals are skipped, so an unbalanced paren
    inside a quoted argument (e.g. ``regexp_extract(x, '([', 1)``) can't
    corrupt the depth match."""
    depth = 1
    while i < len(s) and depth:
        ch = s[i]
        if ch in ("'", '"'):
            i = _skip_string(s, i)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    return i


def _blank_nested(s: str) -> str:
    """Copy of ``s`` with every character inside parens (depth ≥ 1) or a
    string literal replaced by a space — length-preserving, so positions in
    the blanked text map 1:1 onto the original. Lets clause-level regexes
    (GROUP BY, EMIT, ...) match ONLY the outer query, never a subquery."""
    out = list(s)
    depth = 0
    in_str: str | None = None
    for i, ch in enumerate(s):
        if in_str:
            out[i] = " "
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
            out[i] = " "
        elif ch == "(":
            depth += 1
            out[i] = " "
        elif ch == ")":
            depth -= 1
            out[i] = " "
        elif depth > 0:
            out[i] = " "
    return "".join(out)


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at paren/quote depth 0."""
    out, depth, cur, i = [], 0, [], 0
    in_str: str | None = None
    while i < len(s):
        ch = s[i]
        if in_str:
            cur.append(ch)
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur))
    return out


def strip_comments(sql: str) -> tuple[str, dict[str, str]]:
    """Remove `--` comments (string-literal aware); collect `-- @k: v`
    annotations (reference parser/annotations.rs: @job_mode, @batch_size,
    @num_partitions, @partitioning_strategy, @metric...)."""
    annotations: dict[str, str] = {}
    out_lines = []
    for line in sql.splitlines():
        buf, in_str, i = [], None, 0
        while i < len(line):
            ch = line[i]
            if in_str:
                buf.append(ch)
                if ch == in_str:
                    in_str = None
            elif ch in ("'", '"'):
                in_str = ch
                buf.append(ch)
            elif ch == "-" and i + 1 < len(line) and line[i + 1] == "-":
                comment = line[i + 2 :].strip()
                # hyphenated spellings are accepted alongside underscores
                # (annotations.rs header documents @sticky-partition-id /
                # @partition-count; the parser reads both) — normalized to
                # underscores so the engine reads one key.
                m = re.match(r"@([\w.-]+)\s*:\s*(.+)$", comment)
                if m:
                    annotations[m.group(1).replace("-", "_")] = m.group(2).strip()
                break
            else:
                buf.append(ch)
            i += 1
        out_lines.append("".join(buf))
    return "\n".join(out_lines), annotations


def parse_duration(text: str) -> str:
    """Duration syntax → Spark interval string: `INTERVAL '5' MINUTE`,
    `5 MINUTE`, `100ms`, `30s`/`5m`/`1h`/`1d` → '5 minutes' etc."""
    t = text.strip()
    # quotes around the count are optional: the reference's parser (and its
    # own docs, e.g. comprehensive-sql-ctas-guide.md `WINDOW
    # TUMBLING(INTERVAL 5 MINUTES)`) accept both INTERVAL '5' MINUTE and
    # INTERVAL 5 MINUTES
    m = re.match(r"(?i)^INTERVAL\s+'?(\d+)'?\s+(\w+)$", t)
    if not m:
        m = re.match(r"(?i)^(\d+)\s+(\w+)$", t)
    if m:
        n, u = int(m.group(1)), m.group(2).upper().rstrip("S") + "S"
        # Fixed-duration units per the reference's interval_to_millis
        # (types.rs:1402-1414): WEEK=7d, MONTH=30d, YEAR=365d; nanos and
        # micros truncate to whole milliseconds. Spark window durations
        # must be fixed anyway (no calendar months in window()).
        fixed = {"WEEKS": (7, "days"), "MONTHS": (30, "days"),
                 "YEARS": (365, "days"),
                 "NANOSECONDS": (1, None), "MICROSECONDS": (1, None)}
        if u in fixed:
            if u == "NANOSECONDS":
                return f"{n // 1_000_000} milliseconds"
            if u == "MICROSECONDS":
                return f"{n // 1000} milliseconds"
            mult, base = fixed[u]
            return f"{n * mult} {base}"
        unit = _UNIT_TO_SPARK.get(m.group(2).upper())
        if not unit:
            raise ValueError(f"unknown time unit in duration: {text!r}")
        return f"{m.group(1)} {unit}"
    m = re.match(r"(?i)^(\d+)\s*(ms|s|m|h|d)$", t)
    if m:
        unit = {"ms": "milliseconds", "s": "seconds", "m": "minutes",
                "h": "hours", "d": "days"}[m.group(2).lower()]
        return f"{m.group(1)} {unit}"
    raise ValueError(f"cannot parse duration: {text!r}")


# ---------------------------------------------------------------------------
# statement model
# ---------------------------------------------------------------------------


@dataclass
class WindowClause:
    kind: str                     # tumbling | sliding | session
    size: str                     # Spark interval string ("5 minutes")
    advance: str | None = None    # sliding only
    time_column: str | None = None
    partition_by: list[str] = field(default_factory=list)  # session only
                                  # (WindowSpec::Session, ast.rs:607-611)


@dataclass
class RowsWindowAgg:
    """One `FN(col) OVER (ROWS WINDOW BUFFER n ROWS ...)` select item,
    captured before the batch-frame rewrite so streaming execution can
    route it to the stateful op (streaming.rows_window)."""

    out: str           # output column name (alias or generated)
    fn: str            # rows_window fn name (avg/sum/min/max/count/lag/...)
    col: str | None    # argument column (None for ROW_NUMBER())
    buffer: int
    partition_by: list[str] = field(default_factory=list)
    order_by: list[str] = field(default_factory=list)


_ROWS_FN_MAP = {
    "AVG": "avg", "SUM": "sum", "MIN": "min", "MAX": "max", "COUNT": "count",
    "LAG": "lag", "ROW_NUMBER": "row_number", "FIRST_VALUE": "first",
    "LAST_VALUE": "last",
}


def extract_rows_window_aggs(select_sql: str) -> list[RowsWindowAgg]:
    """Collect ROWS WINDOW OVER-specs from a (pre-rewrite) SELECT body."""
    out: list[RowsWindowAgg] = []
    pat = re.compile(
        r"(?is)\b(\w+)\s*\(\s*([\w.]*)\s*\)\s*OVER\s*\(\s*ROWS\s+WINDOW\s+"
        r"BUFFER\s+(\d+)\s+ROWS\s*(.*?)\)\s*(?:AS\s+(\w+))?"
    )
    for m in pat.finditer(select_sql):
        fn = m.group(1).upper()
        if fn not in _ROWS_FN_MAP:
            continue
        rest = m.group(4) or ""
        pm = re.search(r"(?is)PARTITION\s+BY\s+(.*?)(?:ORDER\s+BY|ROWS\s+BETWEEN|EMIT|$)", rest)
        om = re.search(r"(?is)ORDER\s+BY\s+(.*?)(?:ROWS\s+BETWEEN|EMIT|$)", rest)
        out.append(
            RowsWindowAgg(
                out=m.group(5) or f"{fn.lower()}_{m.group(2) or 'row'}",
                fn=_ROWS_FN_MAP[fn],
                col=m.group(2) or None,
                buffer=int(m.group(3)),
                partition_by=[c.strip() for c in pm.group(1).split(",")] if pm else [],
                order_by=[
                    c.strip().split()[0] for c in om.group(1).split(",")
                ] if om else [],
            )
        )
    return out


@dataclass
class Statement:
    """One parsed velostream statement."""

    kind: str                     # select | create_stream | create_table |
                                  # insert | update | delete | show | job
    name: str | None = None       # created stream/table name
    select_sql: str | None = None # translated Spark SQL for the SELECT body
    emit: str | None = None       # "changes" | "final" | None
    window: WindowClause | None = None
    rows_window_aggs: list = field(default_factory=list)  # RowsWindowAgg
    key_fields: list[str] = field(default_factory=list)
    with_props: dict[str, str] = field(default_factory=dict)
    annotations: dict[str, str] = field(default_factory=dict)
    raw: str = ""
    # insert/update/delete/show/job specifics
    target: str | None = None
    set_clause: dict[str, str] | None = None
    where_sql: str | None = None
    show_what: str | None = None
    #: SHOW ... ['pat%'|LIKE 'pat%'] filter (commands.rs:312, show.rs:406)
    show_pattern: str | None = None
    job_action: str | None = None
    #: STOP JOB name FORCE (ast.rs StopJob.force; parser commands.rs:373).
    #: The reference's processor is metadata-only about it (job.rs:84-115:
    #: logs + echoes the flag); here it is recorded on the job.
    job_force: bool = False
    insert_select: str | None = None
    insert_columns: list[str] | None = None
    insert_values: list[list[str]] | None = None
    # DEPLOY JOB / ROLLBACK JOB (ast.rs:340-365)
    job_version: str | None = None
    job_strategy: str | None = None
    canary_pct: int | None = None
    # CREATE STREAM ... INTO sink (ast.rs:889 IntoClause): named sink whose
    # WITH-props configure the output; defaults to the stream name.
    into: str | None = None
    # FR-047 URI FROM sources (ast.rs:518 StreamSource::Uri): view name in
    # the translated SQL → original URI; the engine wires each to a reader.
    uri_sources: dict[str, str] = field(default_factory=dict)
    # CREATE ... (column definitions) — reference clauses.rs:440 ColumnDef
    # (name, data_type, NOT NULL); plus the FR-094 doc form's table-level
    # PRIMARY KEY (cols) [NOT ENFORCED], which lands in key_fields.
    # Each entry: (name, type_sql, nullable).
    schema_columns: list | None = None
    # Doc-faithful modifiers (the reference's own docs use them though its
    # parser rejects them — same precedent as SESSION_START):
    if_not_exists: bool = False
    or_replace: bool = False


# ---------------------------------------------------------------------------
# WITH clause (reference config/with_clause_parser.rs)
# ---------------------------------------------------------------------------


def _pop_trailing_with(sql: str) -> tuple[str, dict[str, str]]:
    """Pop the RIGHTMOST trailing `WITH ('k' = 'v', ...)` off the statement.
    (A statement may carry several: `... WITH (src props) INTO sink WITH
    (sink props)` — with_clause_parser.rs accepts one per clause position.)"""
    last = None
    # property keys may be single- or double-quoted (the reference's demos
    # use both spellings), or BARE identifiers (`topic = '...'`,
    # `config_file = '...'` — the quickstart/hello-world doc form; the
    # reference's parse_with_properties demands quoted keys,
    # clauses.rs:510, but its own docs are the user contract). The bare
    # form needs the `ident =` lookahead so a CTE's `WITH name AS (` can
    # never match.
    for m in re.finditer(r"(?is)\bWITH\s*\(\s*(?:['\"]|[A-Za-z_][\w.]*\s*=)", sql):
        last = m
    if last is None:
        return sql, {}
    open_paren = sql.index("(", last.start())
    j = _match_paren(sql, open_paren + 1)
    if sql[j:].strip().rstrip(";").strip():
        return sql, {}  # not trailing — e.g. WITH inside a subquery/CTE
    props: dict[str, str] = {}
    # bracket-aware item split: array-literal values (`partition_by =
    # ['year', 'month']`, data-sources docs) hold commas the plain
    # top-level splitter would break on
    inner = sql[open_paren + 1 : j - 1]
    items, buf, depth = [], [], 0
    k = 0
    while k < len(inner):
        ch = inner[k]
        if ch in ("'", '"'):
            end = _skip_string(inner, k)
            buf.append(inner[k:end])
            k = end
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append("".join(buf))
            buf = []
            k += 1
            continue
        buf.append(ch)
        k += 1
    items.append("".join(buf))
    for item in items:
        item = item.strip()
        if not item:
            continue
        pm = re.match(
            r"(?s)^(?:'([^']+)'|\"([^\"]+)\"|([A-Za-z_][\w.]*))\s*=\s*"
            # value: quoted either style, or a bare scalar — the reference's
            # config parser takes the raw text after '=' and unquotes only
            # if quoted (with_clause_parser.rs:296-308; booleans validated
            # as bare true/false/yes/no at :406, and the user guides write
            # e.g. "skip.reason.logging" = true)
            # ... or an array literal (['year', 'month']) kept verbatim
            r"(?:'((?:[^']|'')*)'|\"((?:[^\"]|\"\")*)\"|(\[[^\]]*\]|[^'\"\s]\S*))$",
            item,
        )
        if not pm:
            raise ValueError(f"bad WITH property: {item!r}")
        key = next(g for g in pm.group(1, 2, 3) if g is not None)
        if pm.group(4) is not None:
            val = pm.group(4).replace("''", "'")
        elif pm.group(5) is not None:
            val = pm.group(5).replace('""', '"')
        else:
            val = pm.group(6)
        props[key] = val
    return sql[: last.start()].rstrip(), props


def _extract_with_props(sql: str) -> tuple[str, dict[str, str], str | None]:
    """Pop trailing `[WITH (...)] [INTO sink] [WITH (...)]` clauses
    (ast.rs:889 IntoClause; examples/test_simple_validation.sql uses
    `FROM src WITH (src cfg) INTO sink WITH (sink cfg)`). Returns
    (body, merged props, INTO sink name or None)."""
    props: dict[str, str] = {}
    into: str | None = None
    while True:
        sql2, p = _pop_trailing_with(sql)
        if p:
            props = {**p, **props}
            sql = sql2
        # sink name, quoted sink URI, or bare sink URI (FR-047:
        # clauses.rs:534 "INTO sink_name or INTO 'kafka://broker/topic'")
        im = re.search(
            r"(?is)\bINTO\s+('[^']*://[^']*'|[\w.\-+]+://[^\s;]+|[\w.]+)"
            r"\s*;?\s*$",
            sql,
        )
        if im:
            into = im.group(1).strip("'")
            sql = sql[: im.start()].rstrip()
            continue
        if not p:
            return sql, props, into


# ---------------------------------------------------------------------------
# EMIT clause (ast.rs:152-163)
# ---------------------------------------------------------------------------


def _extract_emit(sql: str) -> tuple[str, str | None]:
    m = re.search(r"(?is)\bEMIT\s+(CHANGES|FINAL)\s*;?\s*$", sql)
    if not m:
        return sql, None
    return sql[: m.start()].rstrip(), m.group(1).lower()


# ---------------------------------------------------------------------------
# WINDOW clause (time windows, ast.rs:596-611)
# ---------------------------------------------------------------------------

_WINDOW_RE = re.compile(
    r"(?is)\bWINDOW\s+(TUMBLING|SLIDING|SESSION)\s*\((.*?)\)"
    r"(?=\s*(?:ORDER\s+BY|LIMIT|EMIT|WITH\s*\(|HAVING|INTO\s|$))"
)


def _is_duration(text: str) -> bool:
    try:
        parse_duration(text)
        return True
    except ValueError:
        return False


def _extract_window(sql: str) -> tuple[str, WindowClause | None]:
    m = _WINDOW_RE.search(sql)
    if not m:
        return sql, None
    kind = m.group(1).lower()
    args = [a.strip() for a in _split_top_level(m.group(2))]
    # doc-contract sugar: `SLIDING(INTERVAL 10 MINUTES, ADVANCE BY
    # INTERVAL 1 MINUTE)` (comprehensive-sql-ctas-guide.md) — the ADVANCE
    # BY prefix just names the second argument
    args = [re.sub(r"(?i)^ADVANCE\s+BY\s+", "", a) for a in args]
    time_column: str | None = None
    if kind == "session":
        # SESSION(gap) | SESSION(time_expr, gap[, partition_key...])
        # (clauses.rs:141-198). Classify by position of the duration arg:
        # everything before it is the time column (any expression — the
        # reference only takes identifiers, clauses.rs:219-246, but its
        # examples use GREATEST(...)), everything after is partition keys.
        durs = [i for i, a in enumerate(args) if _is_duration(a)]
        if not durs:
            raise ValueError(f"SESSION needs a gap duration: {m.group(0)!r}")
        gi = durs[0]
        if gi > 1:
            raise ValueError(f"SESSION takes one time column: {m.group(0)!r}")
        time_column = args[0] if gi == 1 else None
        wc = WindowClause(kind, parse_duration(args[gi]), None, time_column,
                          partition_by=[a for a in args[gi + 1:]])
        return (sql[: m.start()] + sql[m.end():]).strip(), wc
    # optional leading time-column arg: WINDOW TUMBLING(ts_col, INTERVAL..)
    if args and re.match(r"(?i)^[\w.]+$", args[0]) and not re.match(r"^\d", args[0]):
        time_column = args.pop(0)
    # optional trailing time-column arg
    if len(args) > (2 if kind == "sliding" else 1) and re.match(
        r"(?i)^[\w.]+$", args[-1]
    ) and not re.match(r"^\d", args[-1]):
        time_column = args.pop()
    if kind == "sliding":
        if len(args) != 2:
            raise ValueError(f"SLIDING needs (size, advance): {m.group(0)!r}")
        wc = WindowClause(kind, parse_duration(args[0]), parse_duration(args[1]),
                          time_column)
    else:
        if len(args) != 1:
            raise ValueError(f"{kind.upper()} needs (duration): {m.group(0)!r}")
        wc = WindowClause(kind, parse_duration(args[0]), None, time_column)
    return (sql[: m.start()] + sql[m.end():]).strip(), wc


# ---------------------------------------------------------------------------
# ROWS WINDOW OVER-spec (ast.rs:617-652) → standard frame
# ---------------------------------------------------------------------------

_ROWS_WINDOW_RE = re.compile(
    r"(?is)ROWS\s+WINDOW\s+BUFFER\s+(\d+)\s+ROWS\s*(.*)$"
)


#: functions Spark forbids an explicit frame on (offset/ranking family)
_NO_FRAME_FNS = {
    "LAG", "LEAD", "ROW_NUMBER", "RANK", "DENSE_RANK", "PERCENT_RANK",
    "CUME_DIST", "NTILE",
}


def _rewrite_rows_window_spec(spec: str, fn_name: str | None = None) -> str:
    """`ROWS WINDOW BUFFER n ROWS [PARTITION BY ..] [ORDER BY ..] [frame]
    [EMIT ..]` → `[PARTITION BY ..] [ORDER BY ..] ROWS BETWEEN n-1 PRECEDING
    AND CURRENT ROW`. In batch execution the bounded buffer IS the frame;
    the per-record streaming form is streaming.rows_window. Offset/ranking
    functions (``fn_name``) get no frame — Spark forbids one, and their
    buffer semantics don't depend on it."""
    m = _ROWS_WINDOW_RE.match(spec.strip())
    if not m:
        return spec
    n = int(m.group(1))
    rest = m.group(2) or ""
    rest = re.sub(r"(?is)\bEMIT\s+(CHANGES|FINAL)\b", "", rest)
    fm = re.search(r"(?is)\b(ROWS|RANGE)\s+BETWEEN\s+.*", rest)
    if fm:
        # explicit inner frame wins (bounded by the buffer in the reference;
        # equivalent when frame ⊆ buffer, the only supported layout)
        frame = fm.group(0).strip()
        rest = rest[: fm.start()]
    else:
        frame = f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW"
    rest = rest.strip()
    if not re.search(r"(?is)\bORDER\s+BY\b", rest):
        # No ORDER BY ⇒ the reference buffers in ARRIVAL order
        # (ast.rs:617-652; grammar: ORDER_BY_CLAUSE optional). Spark
        # requires an explicit ordering for ROWS frames and for the
        # offset/ranking family (a bare `LAG(x) OVER ()` is an analysis
        # error) — monotonically_increasing_id() is the arrival-order
        # surrogate: partition-local and increasing in input order.
        rest = f"{rest} ORDER BY monotonically_increasing_id()".strip()
    if fn_name and fn_name.upper() in _NO_FRAME_FNS:
        # Spark forbids an explicit frame on offset/ranking functions,
        # and their buffer semantics don't depend on one.
        frame = ""
    return f"{rest} {frame}".strip()


_QUANT_RE = re.compile(r"(?is)(=|<>|!=|<=|>=|<|>)\s*(ANY|SOME|ALL)\s*\(")


def _rewrite_quantified_comparisons(sql: str) -> str:
    """``lhs op ANY/SOME/ALL (subquery)`` → correlated EXISTS.

    The reference supports quantified comparisons as first-class syntax
    (SubqueryType::Any/All, ast.rs:753-768; docs/sql/subquery-support.md
    lists ANY/SOME/ALL as production features) but Spark's parser rejects
    them outright. Rewrite:

    - ``x op ANY (S)``  → ``EXISTS (SELECT 1 FROM (S) AS v(_v) WHERE x op _v)``
    - ``x op ALL (S)``  → ``NOT EXISTS (... WHERE NOT (x op _v))``

    The table-alias column list names the subquery's single output column
    without having to parse it. Correlation with non-equality predicates
    is decorrelated by Catalyst into a semi/anti join (plan-pinned in
    tests). NULL elements of S make the counterexample predicate UNKNOWN
    (row not matched), mirroring the reference's per-record evaluation
    loop rather than the three-valued ANSI refinement. The lhs capture
    takes the immediately preceding identifier/literal or parenthesized
    expression (optionally a function call) — the shapes the reference's
    own parser produces on the left of a quantifier."""
    n = 0
    pos = 0
    while True:
        m = _QUANT_RE.search(sql, pos)
        if m is None:
            return sql
        j = _match_paren(sql, m.end())
        subq = sql[m.end() : j - 1].strip()
        if not re.match(r"(?is)^(SELECT|WITH)\b", subq):
            pos = j
            continue
        i = m.start()
        while i > 0 and sql[i - 1].isspace():
            i -= 1
        if i > 0 and sql[i - 1] == ")":
            k, depth = i - 1, 0
            while k >= 0:
                if sql[k] == ")":
                    depth += 1
                elif sql[k] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                k -= 1
            e = k
            while e > 0 and (sql[e - 1].isalnum() or sql[e - 1] in "_."):
                e -= 1
            lhs_start = e
        else:
            e = i
            while e > 0 and (sql[e - 1].isalnum() or sql[e - 1] in "_.'"):
                e -= 1
            lhs_start = e
        lhs = sql[lhs_start:i].strip()
        if not lhs:
            pos = j
            continue
        # The capture takes only the token/paren-group immediately left of
        # the operator. An unparenthesized compound lhs (x + 1 > ALL (S),
        # a || b = ANY (S)) would rewrite to e.g. `x + EXISTS(...)` —
        # arithmetic forms fail analysis loudly but || implicitly casts
        # the boolean and silently filters wrong rows. Reject loudly;
        # the user parenthesizes the lhs instead.
        k = lhs_start
        while k > 0 and sql[k - 1].isspace():
            k -= 1
        if k > 0 and sql[k - 1] in "+-*/%|&^":
            raise ValueError(
                "quantified comparison with a compound left-hand side is "
                f"not supported — parenthesize it: ...{sql[max(0, k - 12):j]}"
            )
        n += 1
        alias = f"_vq{n}"
        subq = _rewrite_quantified_comparisons(subq)  # nested quantifiers
        op = m.group(1)
        if m.group(2).upper() in ("ANY", "SOME"):
            repl = (
                f"EXISTS (SELECT 1 FROM ({subq}) AS {alias}({alias}_v) "
                f"WHERE ({lhs}) {op} {alias}.{alias}_v)"
            )
        else:
            repl = (
                f"NOT EXISTS (SELECT 1 FROM ({subq}) AS {alias}({alias}_v) "
                f"WHERE NOT (({lhs}) {op} {alias}.{alias}_v))"
            )
        sql = sql[:lhs_start] + repl + sql[j:]
        pos = lhs_start + len(repl)


def _implicit_group_by_keys(sql: str) -> list[str]:
    """GROUP BY implicit message key (docs/sql/KEY_CONFIGURATION.md:69-117):
    with no inline PRIMARY KEY annotation, the GROUP BY columns become the
    Kafka message key (single column = raw value; multiple = pipe-delimited
    — same format message_key() builds). Only plain identifier items
    qualify (an expression or positional GROUP BY has no addressable output
    column; qualified names take their final segment). PRIMARY KEY wins
    when both are present (the caller only falls back when keys is empty).

    Only the OUTER query's GROUP BY counts: the scan runs over a
    paren-depth-0 blanked copy (subqueries/derived tables erased), so a
    grouped subquery never donates a bogus key and a real outer GROUP BY
    after a grouped derived table is still found.
    """
    blanked = _blank_nested(sql)
    m = re.search(
        r"(?is)\bGROUP\s+BY\s+(.*?)(?:\b(HAVING|ORDER\s+BY|LIMIT|WINDOW|"
        r"EMIT)\b|$)",
        blanked,
    )
    if not m:
        return []
    keys = []
    # The clause SPAN comes from the blanked text (so only the outer
    # query's GROUP BY matches); the ITEMS come from the ORIGINAL text at
    # the same positions (length-preserving blanking), so an expression
    # item like UPPER(name) keeps its parens and is correctly rejected by
    # the identifier filter instead of surviving as a bogus 'UPPER' key.
    for item in _split_top_level(sql[m.start(1) : m.end(1)]):
        item = item.strip()
        if re.match(r"^[A-Za-z_][\w]*(\.[A-Za-z_][\w]*)*$", item):
            keys.append(item.rsplit(".", 1)[-1])
    return keys


def _call_name_before(prefix: str) -> str | None:
    """Name of the function call whose closing paren ends ``prefix``.

    A single forward scan pairs parens while skipping string literals
    (a quoted ``(`` or ``)`` in an argument can't break the match — a
    backwards walk can't know quote context), then the identifier
    immediately before the opening paren of the final pair is taken.
    """
    end = len(prefix) - 1
    while end >= 0 and prefix[end].isspace():
        end -= 1
    if end < 0 or prefix[end] != ")":
        return None
    stack: list[int] = []
    open_idx: int | None = None
    i = 0
    while i <= end:
        ch = prefix[i]
        if ch in ("'", '"'):
            i = _skip_string(prefix, i)
            continue
        if ch == "(":
            stack.append(i)
        elif ch == ")":
            if not stack:
                return None
            o = stack.pop()
            if i == end:
                open_idx = o
        i += 1
    if open_idx is None:
        return None
    # allow whitespace between the identifier and its opening paren
    e = open_idx
    while e > 0 and prefix[e - 1].isspace():
        e -= 1
    k = e
    while k > 0 and (prefix[k - 1].isalnum() or prefix[k - 1] == "_"):
        k -= 1
    name = prefix[k:e]
    return name or None


def _rewrite_over_clauses(sql: str) -> str:
    """Find every OVER (...) and rewrite ROWS WINDOW specs inside."""
    out, i = [], 0
    pat = re.compile(r"(?is)\bOVER\s*\(")
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        # function name of the call preceding OVER (for frame legality):
        # scan backwards with paren-depth matching so nested parens in the
        # call's arguments (e.g. LAG(CAST(x AS DOUBLE))) are handled.
        fn_name = _call_name_before(sql[: m.start()])
        out.append(sql[i : m.end()])
        j = _match_paren(sql, m.end())
        inner = sql[m.end() : j - 1]
        out.append(_rewrite_rows_window_spec(inner, fn_name))
        out.append(")")
        i = j
    return "".join(out)


# ---------------------------------------------------------------------------
# PRIMARY KEY select-item annotations (FR-089)
# ---------------------------------------------------------------------------


def _extract_primary_keys(sql: str) -> tuple[str, list[str]]:
    m = re.search(r"(?is)^\s*SELECT\s+(DISTINCT\s+)?(.*?)\s+FROM\s", sql)
    if not m:
        return sql, []
    select_list = m.group(2)
    items = _split_top_level(select_list)
    keys, new_items, changed = [], [], False
    for item in items:
        im = re.search(r"(?is)\s+PRIMARY\s+KEY\s*$", item)
        if im:
            body = item[: im.start()]
            am = re.search(r"(?is)\s+AS\s+(\w+)\s*$", body)
            if am:
                keys.append(am.group(1))
            else:
                keys.append(body.strip().split(".")[-1])
            new_items.append(body)
            changed = True
        else:
            new_items.append(item)
    if not changed:
        return sql, []
    rebuilt = sql[: m.start(2)] + ",".join(new_items) + sql[m.end(2):]
    return rebuilt, keys


# ---------------------------------------------------------------------------
# function-name rewrites (reference functions.rs:3040-3791 → Spark builtins)
# ---------------------------------------------------------------------------

_SIMPLE_FN_RENAMES = {
    "JSON_EXTRACT_SCALAR": "get_json_object",  # doc-only (phase-4 examples)
    "JSON_EXTRACT": "get_json_object",
    "JSON_VALUE": "get_json_object",
    "JSON_QUERY": "get_json_object",
    "GROUP_CONCAT": "listagg",
    "STRING_AGG": "listagg",
    "LISTAGG": "listagg",
    "COLLECT": "listagg",  # reference alias (functions.rs:3122)
    "LEN": "length",
}


#: Sub-second EXTRACT parts (reference functions.rs:1921-1923:
#: timestamp_subsec_{millis,micros,nanos} — the sub-second component, never
#: negative).  Spark's native extract has no such fields; pmod keeps the
#: 0..999[999] range for pre-epoch timestamps too.  NANOSECOND is micros*1000
#: because Spark timestamps carry microsecond precision.
_SUBSECOND_EXTRACT = {
    "MILLISECOND": "pmod(unix_millis({x}), 1000)",
    "MICROSECOND": "pmod(unix_micros({x}), 1000000)",
    "NANOSECOND": "(pmod(unix_micros({x}), 1000000) * 1000)",
}


def _epoch_extract(x: str) -> str:
    """EXTRACT(EPOCH FROM x) for both operand shapes.

    ``x`` a timestamp → unix_timestamp. ``x`` a timestamp DIFFERENCE
    (``a - b``, interval-typed — unix_timestamp can't accept it) →
    ``(unix_millis(a) - unix_millis(b)) / 1000.0``, which is also
    sub-second precise (epoch-of-interval is fractional seconds, and the
    shipped financial app buckets latencies at 1 ms). The shape test is a
    single TOP-LEVEL minus whose right side is not an INTERVAL literal
    (``ts - INTERVAL '1' HOUR`` stays timestamp-typed)."""
    inner = x.strip()
    while inner.startswith("(") and _match_paren(inner, 1) == len(inner):
        inner = inner[1:-1].strip()
    i = _top_level_find(inner, r"-")
    if 0 < i < len(inner) - 1:
        left, right = inner[:i].strip(), inner[i + 1 :].strip()
        if left and right and not re.match(r"(?i)^INTERVAL\b", right):
            if _top_level_find(right, r"-") == -1:
                # CAST keeps the quotient DOUBLE (a bare 1000.0 literal is
                # DECIMAL in Spark, which would make the whole result decimal)
                return (
                    f"(CAST(unix_millis({left}) - unix_millis({right}) "
                    f"AS DOUBLE) / 1000.0)"
                )
    return f"unix_timestamp({inner})"


#: chrono strftime directive → Java DateTimeFormatter pattern (the subset
#: the reference corpus uses plus the common rest of chrono's table).
#: Unmapped directives stay literal (quoted) rather than guessing.
_STRFTIME_MAP = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "I": "hh", "l": "h", "M": "mm", "S": "ss",
    "a": "EEE", "A": "EEEE", "b": "MMM", "h": "MMM", "B": "MMMM",
    "p": "a", "P": "a", "j": "DDD", "Z": "zzz", "z": "xx",
    "f": "SSSSSSSSS", "3f": "SSS", "6f": "SSSSSS", "9f": "SSSSSSSSS",
    "F": "yyyy-MM-dd", "T": "HH:mm:ss", "R": "HH:mm",
}


def _strftime_to_java(fmt: str) -> str:
    """chrono strftime → Java DateTimeFormatter pattern, with literal runs
    containing ASCII letters single-quoted (Java treats bare letters as
    pattern letters; strftime treats them as literals)."""
    out: list[str] = []
    lit: list[str] = []

    def flush() -> None:
        if not lit:
            return
        run = "".join(lit)
        lit.clear()
        if re.search(r"[A-Za-z]", run):
            out.append("'" + run.replace("'", "''") + "'")
        else:
            out.append(run)

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c != "%":
            lit.append(c)
            i += 1
            continue
        if i + 1 >= len(fmt):
            lit.append("%")
            break
        nxt = fmt[i + 1]
        if nxt == "%":
            lit.append("%")
            i += 2
            continue
        key = fmt[i + 1 : i + 3] if nxt in "369" else nxt
        mapped = _STRFTIME_MAP.get(key)
        if mapped is None:
            lit.append("%" + key)  # unknown directive: keep literal
        else:
            flush()
            out.append(mapped)
        i += 1 + len(key)
    flush()
    return "".join(out)


def _extract_unit_fixups(part: str, x: str) -> str | None:
    """EXTRACT units whose Spark spelling or origin differs from the
    reference (docs/sql/functions/enhanced-date-functions.md:24-32):
    DOW/DAYOFWEEK is 0=Sunday..6=Saturday in the reference but Spark's
    DOW field is 1=Sunday..7=Saturday; DAYOFYEAR is not a valid Spark
    extract field (its Spark spelling is DOY). Emitted as the plain
    dayofweek()/dayofyear() functions — an emitted extract( would be
    re-matched by the rewrite loop's re-scan and wrapped forever."""
    if part in ("DOW", "DAYOFWEEK"):
        return f"(dayofweek({x}) - 1)"
    if part == "DAYOFYEAR":
        return f"dayofyear({x})"
    return None


def _rewrite_call(name: str, args: list[str]) -> str | None:
    """Call-shape rewrites (argument-aware). Return None to keep as-is."""
    u = name.upper()
    if u in ("GROUP_CONCAT", "STRING_AGG", "LISTAGG", "COLLECT") and len(args) == 1:
        # the reference's default separator is ',' when none is given
        # (aggregation/functions.rs:272-285); Spark's listagg default is ''
        return f"listagg({args[0]}, ',')"
    if u in _SIMPLE_FN_RENAMES:
        return f"{_SIMPLE_FN_RENAMES[u]}({', '.join(args)})"
    if u == "COUNT_DISTINCT":
        return f"count(DISTINCT {', '.join(args)})"
    if u == "JSON_EXISTS":
        return f"(get_json_object({', '.join(args)}) IS NOT NULL)"
    if u == "NOW":
        return "current_timestamp()"
    if u == "DATEDIFF" and len(args) == 3:
        # reference signature DATEDIFF('unit', start, end)
        # (functions.rs:1943-2027 datediff_function). Units are the
        # reference's six (plural, case-insensitive; singular accepted as a
        # courtesy) and the semantics are CALENDAR-BOUNDARY diffs, not
        # elapsed intervals: years = year(end)-year(start), days = date-only
        # diff, hours = truncated millis/3.6e6 — so timestampdiff() would be
        # wrong. Each maps to codegen'd builtins below.
        part = args[0].strip().strip("'\"").lower().rstrip("s")
        s, e = args[1], args[2]
        if part == "year":
            return f"(year({e}) - year({s}))"
        if part == "month":
            return f"((year({e}) - year({s})) * 12 + (month({e}) - month({s})))"
        if part == "quarter":
            return f"((year({e}) - year({s})) * 4 + (quarter({e}) - quarter({s})))"
        if part == "week":
            # ISO week number + ISO week-year, matching chrono iso_week()
            return (
                f"((extract(YEAROFWEEK FROM {e}) - extract(YEAROFWEEK FROM {s})) * 52"
                f" + (weekofyear({e}) - weekofyear({s})))"
            )
        if part == "day":
            return f"datediff(to_date({e}), to_date({s}))"
        if part == "hour":
            # Rust i64 `/` truncates toward zero; Spark `div` matches.
            return f"((unix_millis({e}) - unix_millis({s})) div 3600000)"
        # Extension: the reference ERRORS on sub-hour units
        # (functions.rs:2008-2016) yet its own shipped example
        # (examples/iot_monitoring.sql) calls DATEDIFF('minutes', ...) —
        # accept them with the same elapsed-truncated semantics as 'hours'.
        if part == "minute":
            return f"((unix_millis({e}) - unix_millis({s})) div 60000)"
        if part == "second":
            return f"((unix_millis({e}) - unix_millis({s})) div 1000)"
        if part in ("millisecond", "m"):
            # "MS" (docs/sql/functions/enhanced-date-functions.md:74) —
            # rstrip('s') above leaves "m"
            return f"(unix_millis({e}) - unix_millis({s}))"
        raise ValueError(
            f"Unsupported DATEDIFF unit: {args[0]}. Supported units: "
            "years, months, quarters, weeks, days, hours, minutes, "
            "seconds, milliseconds"
        )
    if u == "EXTRACT" and len(args) == 2:
        # EXTRACT('EPOCH', x) string-part variant (parser/expressions.rs:577-598)
        part = args[0].strip().strip("'\"").upper()
        if part == "EPOCH":
            return _epoch_extract(args[1])
        sub = _SUBSECOND_EXTRACT.get(part)
        if sub is not None:
            return sub.format(x=args[1])
        mapped = _extract_unit_fixups(part, args[1])
        if mapped is not None:
            return mapped
        return f"extract({part} FROM {args[1]})"
    if u == "EXTRACT" and len(args) == 1:
        fm = re.match(r"(?is)^\s*(\w+)\s+FROM\s+(.*)$", args[0])
        if fm:
            part, x = fm.group(1).upper(), fm.group(2)
            if part == "EPOCH":
                return _epoch_extract(x)
            sub = _SUBSECOND_EXTRACT.get(part)
            if sub is not None:
                return sub.format(x=x)
            mapped = _extract_unit_fixups(part, x)
            if mapped is not None:
                return mapped
        return None
    if u == "DELTA" and len(args) == 1:
        # velostream-specific (functions.rs:3148): diff vs previous row —
        # only rewritable inside an OVER context; handled by engine-level
        # rewrite_delta(). Leave marker untouched here.
        return None
    if u == "HEADER" and len(args) == 1:
        # header values are bytes on the wire; HEADER() returns string
        # (functions.rs:3747 → FieldValue::String)
        return (
            f"CAST(try_element_at(map_from_entries(headers), {args[0]}) AS STRING)"
        )
    if u == "HAS_HEADER" and len(args) == 1:
        return f"(try_element_at(map_from_entries(headers), {args[0]}) IS NOT NULL)"
    if u == "HEADER_KEYS" and len(args) == 0:
        return "transform(headers, h -> h.key)"
    if u == "SET_HEADER" and len(args) == 2:
        # upsert: drop any existing entry for the key, append the new one
        # (processor_types.rs header_mutations Set). array_append, not
        # concat: the rewrite loop re-scans replacements, and an emitted
        # concat( would be re-rewritten by the CONCAT → concat_ws rule.
        return (
            f"array_append(coalesce(filter(headers, h -> h.key != {args[0]}), "
            f"array()), named_struct('key', {args[0]}, 'value', "
            f"CAST({args[1]} AS BINARY)))"
        )
    if u == "REMOVE_HEADER" and len(args) == 1:
        return f"filter(headers, h -> h.key != {args[0]})"
    if u == "CONCAT":
        # The reference's CONCAT IGNORES NULL arguments and stringifies
        # scalars (functions.rs:1419-1437: "NULL values are ignored in
        # CONCAT") — Spark's concat() returns NULL if ANY argument is
        # NULL. concat_ws('') reproduces the skip-NULLs fold; explicit
        # CASTs admit non-string args. (DuckDB's CONCAT also skips NULLs,
        # so oracles agree.) Zero args → '' (functions.rs:1421).
        if not args:
            return "''"
        casted = ", ".join(f"CAST({a} AS STRING)" for a in args)
        return f"concat_ws('', {casted})"
    if (
        u in ("TRIM", "LTRIM", "RTRIM")
        and len(args) == 1
        and not re.match(r"(?i)\s*(BOTH|LEADING|TRAILING)\b", args[0])
    ):
        # The reference trims ALL whitespace — Rust str::trim /
        # trim_start / trim_end (functions.rs:731-744,870-895) — while
        # Spark's 1-arg trim family strips ONLY the space character.
        # Rewritten to the explicit trim-set form with the ASCII
        # whitespace set (tab, LF, VT, FF, CR, space); the reference's
        # Unicode-whitespace tail (U+00A0 etc.) is not mirrored —
        # documented superset gap. Explicit BOTH/LEADING/TRAILING forms
        # (including this rewrite's own output) pass through.
        mode = {"TRIM": "BOTH", "LTRIM": "LEADING", "RTRIM": "TRAILING"}[u]
        ws = " \t\n\r\x0b\x0c"
        return f"trim({mode} '{ws}' FROM {args[0]})"
    if u == "STRING_TO_ARRAY" and len(args) == 2:
        # Doc-only function (phase-4 examples; absent from the reference's
        # registry like SESSION_START) — PostgreSQL semantics: split on a
        # LITERAL delimiter returning the array. Same literal-quoting as
        # the SPLIT arm below.
        if args[1].lstrip().startswith("'\\\\Q' ||"):
            return None
        return f"split({args[0]}, '\\\\Q' || {args[1]} || '\\\\E')"
    if u == "UNNEST" and len(args) == 1:
        # Doc-only (social_media_analytics_phase4.sql:229) — SELECT-position
        # array flattening = Spark's explode (one output row per element).
        return f"explode({args[0]})"
    if u == "SPLIT" and len(args) == 2:
        # The reference splits on a LITERAL delimiter (functions.rs
        # split_function: s.split(&d)); Spark's split() treats the
        # delimiter as a Java regex, so SPLIT(s, '.') or '|' would
        # explode per character. \Q...\E quotes the delimiter literally
        # and works for non-literal (column) delimiters too. Assembled
        # with || (null-propagating like the reference, and not a
        # function call the rewrite loop's re-scan could re-match); the
        # guard keeps the already-rewritten form stable on re-scan.
        if args[1].lstrip().startswith("'\\\\Q' ||"):
            return None
        return f"split({args[0]}, '\\\\Q' || {args[1]} || '\\\\E')"
    if u == "REGEXP_REPLACE" and len(args) in (3, 4):
        # The reference's REGEXP_REPLACE (functions.rs:784-867) replaces
        # the FIRST match by default and takes a 4th FLAGS argument
        # ('g' = global, 'i' = case-insensitive) — its corpus always
        # writes REGEXP_REPLACE(x, p, r, 'g'). Spark's regexp_replace
        # always replaces ALL matches and its 4th argument is a START
        # POSITION int, so the corpus form silently returned NULL ('g'
        # cast to int) and the 3-arg form replaced all instead of first.
        s_, p_, r_ = args[0], args[1], args[2]
        # Already-rewritten forms must pass through on the loop's re-scan.
        # The guard matches the FULL emitted prefix shape (not just "'^(",
        # which a user pattern like '^(foo)' can legitimately begin with),
        # and only for 3-arg calls — every rewrite below emits 3-arg, so a
        # 4-arg call is never ours and always gets flag processing.
        a1 = p_.lstrip()
        if len(args) == 3 and (
            a1.startswith("'' ||")
            or a1.startswith("'(?i)' ||")
            or a1.startswith("'^([\\\\s\\\\S]*?)(?:' ||")
            or a1.startswith("'^(?i)([\\\\s\\\\S]*?)(?:' ||")
        ):
            return None
        flags = ""
        if len(args) == 4:
            fm = re.match(r"^'((?:[^']|'')*)'$", args[3])
            if fm is None:
                # a literal int IS Spark's position form — pass through;
                # only string flags get the reference treatment
                if re.match(r"^\d+$", args[3]):
                    return None
                raise ValueError(
                    "REGEXP_REPLACE flags must be a string literal: "
                    f"{args[3]!r}"
                )
            flags = fm.group(1)
        ci = "(?i)" if "i" in flags else ""
        if "g" in flags:
            if ci:
                return f"regexp_replace({s_}, '(?i)' || {p_}, {r_})"
            return f"regexp_replace({s_}, '' || {p_}, {r_})"
        # First-match-only: anchor a reluctant head at ^ so the pattern
        # can match at most ONCE (replaceAll's later attempts start past
        # position 0, where ^ fails) and paste the head back with $1.
        # (NOT named groups: Spark substitutes ${...} in SQL text as
        # config variables before parsing.) A LITERAL replacement's $N
        # backrefs shift by one (the head becomes group 1).
        #
        # Pattern-side \N backreferences would also be renumbered by the
        # injected head group, silently changing what matches — and the
        # reference's regex engine (Rust `regex` crate, functions.rs)
        # rejects backreferences outright, so there is no conformant
        # meaning to preserve. Reject them loudly (conservative: any
        # backslash-run + digit, since Spark's own literal unescaping can
        # collapse doubled backslashes back into a backref).
        pm = re.match(r"^'((?:[^']|'')*)'$", a1)
        if pm is not None and re.search(r"\\+\d", pm.group(1)):
            raise ValueError(
                "REGEXP_REPLACE first-match rewrite does not support "
                "backreferences in the pattern (the reference's regex "
                "engine rejects them too) — use the 'g' flag or rewrite "
                f"the pattern: {p_}"
            )
        rm = re.match(r"^'((?:[^']|'')*)'$", r_)
        if rm is not None and "$" in rm.group(1):
            shifted = re.sub(
                r"\$(\d+)", lambda m: f"${int(m.group(1)) + 1}", rm.group(1)
            )
            r_ = f"'{shifted}'"
        return (
            f"regexp_replace({s_}, "
            f"'^{ci}([\\\\s\\\\S]*?)(?:' || {p_} || ')', "
            f"'$1' || {r_})"
        )
    if u == "JOIN" and len(args) >= 2:
        # The reference's JOIN is DELIMITER-FIRST and variadic
        # (functions.rs:1001-1043 join_function): JOIN(sep, v1, ..., vn)
        # stringifies every value (NULL becomes the literal 'NULL',
        # functions.rs:1029) and joins with sep. concat_ws would SKIP
        # NULLs, so each value is coalesced to 'NULL' first. A non-string
        # delimiter errors in the reference ("JOIN delimiter must be a
        # string") and fails Spark analysis here the same way. Guarded in
        # _rewrite_functions against JOIN-clause parentheses.
        vals = ", ".join(
            f"coalesce(CAST({a} AS STRING), 'NULL')" for a in args[1:]
        )
        return f"concat_ws({args[0]}, {vals})"
    if u == "SPLIT_PART" and len(args) == 3:
        # functions.rs:989-991: index < 1 returns '' ("PostgreSQL
        # semantics"); Spark's split_part ERRORS on index 0 and counts
        # from the END on negatives. Literal indexes >= 1 (the only shape
        # in the reference corpus, e.g. transform-data.md:494) pass
        # through to Spark's split_part unguarded (same semantics there:
        # literal delimiter, out-of-bounds ''). Anything else gets a
        # runtime guard built WITHOUT split_part (the rewrite loop
        # re-scans replacements; split+\Q is re-scan-stable via the SPLIT
        # arm's guard): NULL in any argument propagates NULL
        # (functions.rs:968,980), index < 1 → '', out-of-bounds → ''.
        if re.fullmatch(r"\+?\d+", args[2].strip()) and int(
            args[2].strip().lstrip("+")
        ) >= 1:
            return None
        s3, d3, i3 = args[0], args[1], args[2]
        return (
            f"CASE WHEN {s3} IS NULL OR {d3} IS NULL OR ({i3}) IS NULL "
            f"THEN CAST(NULL AS STRING) WHEN ({i3}) < 1 THEN '' "
            f"ELSE coalesce(try_element_at("
            f"split({s3}, '\\\\Q' || {d3} || '\\\\E'), "
            f"CAST({i3} AS INT)), '') END"
        )
    if u == "ARRAY_LENGTH" and len(args) == 1:
        return f"size({args[0]})"
    if u == "DATE_FORMAT" and len(args) == 2:
        # The reference formats through chrono's strftime (functions.rs:
        # 2377-2403: dt.format(&format)), so its corpus writes
        # DATE_FORMAT(ts, '%Y-%m-%d %H:%M:%S') — Spark's date_format takes
        # Java DateTimeFormatter patterns, where % + pattern-letter either
        # throws or formats garbage. Translate literal strftime formats;
        # Java-style literals (no %) pass through unchanged.
        lit = re.match(r"^'((?:[^']|'')*)'$", args[1])
        if lit and "%" in lit.group(1):
            return (
                f"date_format({args[0]}, "
                f"'{_strftime_to_java(lit.group(1))}')"
            )
        return None
    if u == "TIMESTAMP" and len(args) == 0:
        # zero-arg TIMESTAMP() = the record's processing timestamp
        # (functions.rs:3533, StreamRecord.timestamp) — wall clock at
        # processing time in the batch engine. ADJUDICATED type: the
        # reference returns Integer millis (functions.rs:1301), but its
        # own doc examples subtract INTERVALs from it and pass it to
        # DATEDIFF (sql-enhancements-summary.md:30,189) — timestamp-typed
        # here so those pasted examples execute; the INT64-millis contract
        # lives on `_timestamp` (system-columns.md).
        return "current_timestamp()"
    if u == "TUMBLE_START" and len(args) <= 2:
        # 0-arg inside a WINDOW TUMBLING query; the 2-arg spelling
        # TUMBLE_START(time_col, INTERVAL ...) (demo/trading/apps/
        # app_market_data.sql) names the same bounds the WINDOW clause
        # already defines — both resolve to the grouping window struct.
        # INT64 epoch-MILLIS, not a timestamp: the reference reads the
        # _WINDOW_START metadata field (functions.rs:2347), which the
        # window processor populates as FieldValue::Integer millis
        # (window_v2/adapter.rs:971-975), and system-columns.md documents
        # the same INT64-ms contract its doc examples depend on
        # (FROM_UNIXTIME(_window_start / 1000), end - start arithmetic).
        return "unix_millis(window.start)"
    if u == "TUMBLE_END" and len(args) <= 2:
        return "unix_millis(window.end)"
    if u == "SESSION_DURATION" and len(args) == 0:
        # Extension: examples/iot_monitoring_phase4.sql uses it, but the
        # reference registry has no such function (grep functions.rs) —
        # under a SESSION window the Spark grouping key is the
        # `session_window` struct, so duration = end - start (an interval,
        # comparable to INTERVAL literals).
        return "(session_window.end - session_window.start)"
    if u in ("SESSION_START", "SESSION_END") and len(args) == 0:
        # Extension: the phase-4 social/ecommerce examples use these, but
        # like SESSION_DURATION they exist NOWHERE in the reference's
        # registry (its engine would reject them — doc-only functions).
        # Mapped to the session_window bounds as TIMESTAMPS, not the
        # TUMBLE_START INT64-millis contract: there is no reference
        # metadata contract to honor here, and the examples' own
        # arithmetic (`EXTRACT(EPOCH FROM (SESSION_END() -
        # SESSION_START()))`, social_media_analytics_phase4.sql:198)
        # requires timestamp operands for the difference shape.
        return f"session_window.{'start' if u == 'SESSION_START' else 'end'}"
    return None


_FN_CALL_RE = re.compile(
    r"(?i)\b(JSON_EXTRACT_SCALAR|JSON_EXTRACT|JSON_VALUE|JSON_QUERY|"
    r"JSON_EXISTS|STRING_TO_ARRAY|UNNEST|TRIM|LTRIM|RTRIM|COUNT_DISTINCT|"
    r"GROUP_CONCAT|STRING_AGG|LISTAGG|COLLECT|NOW|LEN|EXTRACT|DATEDIFF|HEADER_KEYS|"
    r"HAS_HEADER|HEADER|TUMBLE_START|TUMBLE_END|SESSION_DURATION|"
    r"SESSION_START|SESSION_END|SET_HEADER|"
    r"REMOVE_HEADER|JOIN|ARRAY_LENGTH|TIMESTAMP|CONCAT|DATE_FORMAT|SPLIT_PART|"
    r"SPLIT|REGEXP_REPLACE)\s*\("
)


#: CAST target-type conformance (reference types.rs cast_to arms, CAST
#: dispatch functions.rs:1269-1289). Each entry exists because Spark's
#: reading of the type NAME diverges from the reference's:
#: - FLOAT is f64 in the reference (types.rs:781 "FLOAT" | "DOUBLE" → f64)
#:   but float32 in Spark — silent precision loss on the corpus's 8
#:   CAST(... AS FLOAT) sites.
#: - TEXT / bare VARCHAR (types.rs:817) are STRING; Spark errors
#:   (DATATYPE_MISSING_SIZE) on bare VARCHAR and rejects TEXT. VARCHAR(n)
#:   is left untouched (Spark accepts it).
#: - DATETIME (types.rs:878 "TIMESTAMP" | "DATETIME") → TIMESTAMP; Spark
#:   has no DATETIME.
#: - bare DECIMAL/NUMERIC is arbitrary-precision rust_decimal in the
#:   reference (types.rs:914, keeps the fraction) but DECIMAL(10,0) in
#:   Spark (CAST(1.5 AS DECIMAL) = 2) → DECIMAL(38,18). Explicit
#:   DECIMAL(p,s) is untouched.
#: - SCALED_INTEGER defaults to scale 4 "financial standard"
#:   (types.rs:950) → DECIMAL(38,4) (both round half-up for positives).
#: NOT mirrored (documented divergences, tests in test_function_catalog):
#: - CAST(NULL AS STRING) returns the literal string 'NULL' in the
#:   reference (types.rs:823) — a reference bug (mirroring would corrupt
#:   data); Spark/DuckDB return SQL NULL.
#: - Spark's string→boolean accepts 'y'/'yes'/'n'/'no' beyond the
#:   reference's TRUE/T/1/FALSE/F/0 set (types.rs:838) — permissive
#:   superset, never wrong on reference-accepted inputs.
_CAST_TARGET_REWRITES = [
    (r"(?i)\bAS\s+FLOAT\s*\)", "AS DOUBLE)"),
    (r"(?i)\bAS\s+DATETIME\s*\)", "AS TIMESTAMP)"),
    (r"(?i)\bAS\s+(?:TEXT|VARCHAR)\s*\)", "AS STRING)"),
    (r"(?i)\bAS\s+(?:DECIMAL|NUMERIC)\s*\)", "AS DECIMAL(38,18))"),
    (r"(?i)\bAS\s+SCALED_INTEGER\s*\)", "AS DECIMAL(38,4))"),
]


#: String→DATE formats the reference's cast_to tries IN ORDER
#: (types.rs:857-861): ISO, Y/m/d, m/d/Y, d-m-Y. Spark's ANSI cast only
#: parses ISO-ish strings, so LITERAL date/timestamp strings in non-ISO
#: reference formats are normalized statically (column-valued strings
#: can't be — documented; they error in Spark just as malformed strings
#: error in the reference).
_DATE_FORMATS = ("%Y-%m-%d", "%Y/%m/%d", "%m/%d/%Y", "%d-%m-%Y")
#: String→TIMESTAMP formats (types.rs:881-895): the only non-ISO one
#: Spark can't read is Y/m/d with time.
_TS_FORMATS = (
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S",
    "%Y/%m/%d %H:%M:%S",
)

_CAST_DT_LITERAL_RE = (
    r"(?i)\b(CAST|TRY_CAST)\s*\(\s*'([^']+)'\s+AS\s+(DATE|TIMESTAMP)\s*\)"
)


def _normalize_datetime_literal_casts(sql: str) -> str:
    import datetime as _dt

    def conv(m: re.Match) -> str:
        fn, lit, target = m.group(1), m.group(2), m.group(3).upper()
        if target == "DATE":
            for fmt in _DATE_FORMATS:
                try:
                    d = _dt.datetime.strptime(lit, fmt).date()
                except ValueError:
                    continue
                return f"{fn}('{d.isoformat()}' AS DATE)"
        else:
            base, _, frac = lit.partition(".")
            for fmt in _TS_FORMATS:
                try:
                    ts = _dt.datetime.strptime(base, fmt)
                except ValueError:
                    continue
                out = ts.strftime("%Y-%m-%d %H:%M:%S") + (
                    f".{frac}" if frac else ""
                )
                return f"{fn}('{out}' AS TIMESTAMP)"
        return m.group(0)  # unparseable → Spark errors, like the reference

    return _sub_outside_strings(sql, _CAST_DT_LITERAL_RE, conv)


def _rewrite_cast_targets(sql: str) -> str:
    """Normalize CAST/TRY_CAST target type names to the reference's
    semantics (see _CAST_TARGET_REWRITES), then non-ISO date/timestamp
    LITERALS to ISO (see _DATE_FORMATS), then COLUMN-valued string casts
    to the reference's multi-format trial chain (see
    _rewrite_multiformat_column_casts). The ``AS <type>)`` shape only
    occurs inside CAST-family calls — a SELECT alias is never directly
    followed by ``)``."""
    for pat, repl in _CAST_TARGET_REWRITES:
        sql = _sub_outside_strings(sql, pat, repl)
    sql = _normalize_datetime_literal_casts(sql)
    return _rewrite_multiformat_column_casts(sql)


_CAST_FAMILY_RE = re.compile(r"(?i)\b(CAST|TRY_CAST)\s*\(")
#: Spark format strings for the reference's NON-ISO trial formats. Spark's
#: plain cast (arm 1) already covers chrono's ISO arms; `M`/`d`/`H` parse
#: 1-2 digits like chrono's `%m`/`%d`/`%H` (a padded-only `MM` would
#: reject '2/3/2024', which the reference accepts).
_DATE_TRIAL_FMTS = ("yyyy/M/d", "M/d/yyyy", "d-M-yyyy")
_TS_TRIAL_FMT = "yyyy/M/d H:m:s"


def _rewrite_multiformat_column_casts(sql: str) -> str:
    """``CAST(col AS DATE|TIMESTAMP)`` on a NON-literal argument → the
    reference's multi-format trial chain (types.rs:859-895): string→DATE
    tries ISO, Y/m/d, m/d/Y, d-m-Y in order; string→TIMESTAMP tries the
    ISO space/T forms (with or without millis), Y/m/d H:M:S, then
    date-only promoted to midnight. Spark's bare cast parses only the ISO
    arms, so column values like '10/14/2023' would error (ANSI) or go
    NULL (non-ANSI) where the reference succeeds. Emitted shape:

        coalesce(try_cast(e AS DATE), try_to_date(e,'yyyy/M/d'), ...,
                 to_date(e))

    - arm 1 covers every ISO string plus DATE/TIMESTAMP/Integer inputs
      (Integer→TIMESTAMP = Unix seconds in BOTH engines, types.rs:899);
    - the final ``to_date``/``to_timestamp`` arm reproduces the
      reference's ERROR on an all-formats-miss string under ANSI (and is
      deliberately NOT spelled CAST, keeping this rewrite idempotent);
      for TRY_CAST the final arm is dropped — all-miss is NULL.
    Documented permissive supersets (not mirrored): Spark's arm-1 cast
    accepts trailing time in string→DATE and flexible fraction digits
    where chrono's `%.3f` wants exactly 3. Pure string LITERALS are the
    literal normalizer's job (statically parsed, above) and are skipped.
    """
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch in ("'", '"'):
            i = _skip_string(sql, i)
            continue
        m = _CAST_FAMILY_RE.match(sql, i)
        if not m:
            i += 1
            continue
        j = _match_paren(sql, m.end())
        inner = sql[m.end() : j - 1]
        mm = re.search(r"(?is)\sAS\s+(DATE|TIMESTAMP)\s*$", _blank_nested(inner))
        if not mm:
            i = m.end()  # scan inside: the argument may hold a nested cast
            continue
        fn = m.group(1).upper()
        if fn == "TRY_CAST" and re.match(
            r"(?is)\s*,\s*try_to_(date|timestamp)\s*\(", sql[j:]
        ):
            i = j  # first arm of an already-emitted chain — don't re-wrap
            continue
        # argument text from the ORIGINAL string (blanked text truncates
        # call arguments); recurse so nested casts are rewritten once
        expr = _rewrite_multiformat_column_casts(inner[: mm.start()].strip())
        if re.fullmatch(r"'[^']*'", expr):
            i = j  # literal — normalized statically above
            continue
        target = mm.group(1).upper()
        # trial args are cast to STRING explicitly: try_to_timestamp does
        # NOT implicitly coerce numerics (Spark INTERNAL_ERROR on bigint)
        s_expr = f"CAST({expr} AS STRING)"
        if target == "DATE":
            trials = ", ".join(
                f"try_to_date({s_expr}, '{f}')" for f in _DATE_TRIAL_FMTS
            )
            final = f"to_date({expr})"
        else:
            trials = f"try_to_timestamp({s_expr}, '{_TS_TRIAL_FMT}')"
            final = f"to_timestamp({expr})"
        arms = f"try_cast({expr} AS {target}), {trials}"
        repl = (
            f"coalesce({arms})"
            if fn == "TRY_CAST"
            else f"coalesce({arms}, {final})"
        )
        sql = sql[: m.start()] + repl + sql[j:]
        i = m.start() + len(repl)
    return sql


#: INTERVAL units whose Spark semantics diverge from the reference's.
#: The reference converts EVERY interval to fixed MILLISECONDS
#: (types.rs:1402-1414 interval_to_millis): WEEK = 7 days (Spark agrees —
#: pinned in tests, no rewrite), MONTH = 30 days and YEAR = 365 days
#: ("Approximate" by design — Spark's are calendar-aware: Jan 31 + 1 MONTH
#: = Feb 29 in Spark but Mar 1 in the reference), NANOSECOND and
#: MICROSECOND truncate to whole milliseconds (value/1_000_000 and
#: value/1000, integer division — record timestamps are millis).
_INTERVAL_FIXED_RE = (
    r"(?i)\bINTERVAL\s+'?(\d+)'?\s+(MONTHS?|YEARS?|NANOSECONDS?|MICROSECONDS?)\b"
)


def _rewrite_interval_units(sql: str) -> str:
    def conv(m: re.Match) -> str:
        n = int(m.group(1))
        unit = m.group(2).upper().rstrip("S")
        if unit == "MONTH":
            return f"INTERVAL '{n * 30}' DAY"
        if unit == "YEAR":
            return f"INTERVAL '{n * 365}' DAY"
        if unit == "NANOSECOND":
            return f"INTERVAL '{n // 1_000_000}' MILLISECOND"
        return f"INTERVAL '{n // 1000}' MILLISECOND"  # MICROSECOND

    return _sub_outside_strings(sql, _INTERVAL_FIXED_RE, conv)


def _rewrite_functions(sql: str) -> str:
    sql = _rewrite_cast_targets(sql)
    sql = _rewrite_interval_units(sql)
    # Track a search offset: when _rewrite_call declines a match (repl None,
    # e.g. EXTRACT(YEAR FROM ts) passed through to Spark's native extract, or
    # 2-arg DATEDIFF), advance past it — restarting from 0 on an unchanged
    # string loops forever (round-1 ADVICE: hard hang on EXTRACT/DATEDIFF).
    pos = 0
    while True:
        m = _FN_CALL_RE.search(sql, pos)
        if not m:
            return sql
        j = _match_paren(sql, m.end())
        inner = sql[m.end() : j - 1]
        if m.group(1).upper() == "JOIN" and re.match(
            r"(?is)^\s*(SELECT|WITH|VALUES)\b", inner
        ):
            # a JOIN *clause* followed by a parenthesized subquery, not the
            # reference's JOIN(array, sep) function — leave untouched
            pos = j
            continue
        args = [a.strip() for a in _split_top_level(inner)] if inner.strip() else []
        # recurse into args first (nested rewritable calls)
        args = [_rewrite_functions(a) for a in args]
        repl = _rewrite_call(m.group(1), args)
        if repl is None:
            repl = f"{m.group(1)}({', '.join(args)})"
            sql = sql[: m.start()] + repl + sql[j:]
            pos = m.start() + len(repl)
        else:
            new_sql = sql[: m.start()] + repl + sql[j:]
            if new_sql == sql:
                # Idempotent rewrite (e.g. listagg(...) → listagg(...) after
                # LISTAGG was lowercased on the previous pass): re-scanning
                # from m.start() would loop forever — advance past it.
                pos = m.start() + len(repl)
            else:
                sql = new_sql
                # re-scan the replacement (it may itself contain a rewritable
                # name, e.g. EXTRACT('YEAR', x) → extract(YEAR FROM x), which
                # then passes through via the None branch above — terminating).
                pos = m.start()


_NOW_DIFF_RE = re.compile(
    r"(?is)\(\s*current_timestamp\(\)\s*-\s*(?!INTERVAL\b)([^()]+?)\s*\)"
    r"(?=\s*[/*])"
)
_DIFF_NOW_RE = re.compile(
    r"(?is)\(\s*((?:[^()](?!INTERVAL))+?)\s*-\s*current_timestamp\(\)\s*\)"
    r"(?=\s*[/*])"
)


def _rewrite_now_diff(sql: str) -> str:
    """Reference timestamps are i64 epoch millis, so `NOW() - ts` in a
    NUMERIC context (divided/multiplied — the shipped apps compute
    latency as `(NOW() - _event_time) / 1000.0`) is a millisecond
    difference. Spark's timestamp minus yields an INTERVAL, which cannot
    coalesce with numerics — rewrite the parenthesized difference to
    `(unix_millis(a) - unix_millis(b))`. `NOW() - INTERVAL ...` window
    predicates keep timestamp typing (guarded), as do bare differences
    not followed by / or *."""
    sql = _NOW_DIFF_RE.sub(
        lambda m: f"(unix_millis(current_timestamp()) - unix_millis({m.group(1)}))",
        sql,
    )
    return _DIFF_NOW_RE.sub(
        lambda m: f"(unix_millis({m.group(1)}) - unix_millis(current_timestamp()))",
        sql,
    )


_DELTA_RE = re.compile(r"(?is)\bDELTA\s*\(")


_SET_OP_RE = re.compile(r"(?i)\b(?:UNION(?:\s+ALL)?|INTERSECT|EXCEPT)\b")


def _set_op_branch(seg: str, rel: int) -> str:
    """The set-operation branch of ``seg`` containing offset ``rel``:
    ``seg`` truncated at the nearest top-depth UNION/UNION ALL/INTERSECT/
    EXCEPT keywords on either side. A sibling branch's GROUP BY must not
    classify this branch's DELTA (each SELECT of a set operation is its
    own grouping scope)."""
    blanked = _blank_nested(seg)
    start, end = 0, len(seg)
    for m in _SET_OP_RE.finditer(blanked):
        if m.end() <= rel:
            start = m.end()
        elif m.start() >= rel:
            end = m.start()
            break
    return seg[start:end]


def _scope_grouped(sql: str, pos: int) -> bool:
    """True if the innermost SELECT scope enclosing ``pos`` has its OWN
    GROUP BY (at that scope's top paren depth, within the same set-op
    branch). A statement-level probe misclassifies DELTA inside
    subqueries both ways: a grouped subquery under an ungrouped outer
    statement needs the aggregate form, and an ungrouped subquery under a
    grouped outer statement needs the per-record form (round-8 advice,
    medium). The scope segment is truncated at top-depth UNION/INTERSECT/
    EXCEPT boundaries around the occurrence, so a GROUP BY in a sibling
    set-op branch never leaks in (round-9 advice)."""
    blanked = _blank_strings(sql)
    stack: list[int] = []
    for i in range(pos):
        ch = blanked[i]
        if ch == "(":
            stack.append(i)
        elif ch == ")" and stack:
            stack.pop()
    # Walk outward to the innermost enclosing paren that opens a SELECT
    # (a subquery scope); intermediate parens — function args, arithmetic
    # grouping — don't form a grouping scope.
    for open_i in reversed(stack):
        if re.match(r"\s*SELECT\b", blanked[open_i + 1 :], re.IGNORECASE):
            close = _match_paren(sql, open_i + 1)
            seg = _set_op_branch(sql[open_i + 1 : close - 1], pos - (open_i + 1))
            return re.search(r"(?i)\bGROUP\s+BY\b", _blank_nested(seg)) is not None
    branch = _set_op_branch(sql, pos)
    return re.search(r"(?i)\bGROUP\s+BY\b", _blank_nested(branch)) is not None


def _rewrite_delta(sql: str) -> str:
    """DELTA in its three reference contexts:

    - ``DELTA(x) OVER (spec)`` → ``(x - lag(x, 1) OVER (spec))`` — the
      consecutive-difference form (functions.rs:3148-3160; SURVEY §4.3).
    - Aggregate context (the statement has a depth-0 GROUP BY): ``DELTA(x)``
      → ``(MAX(x) - MIN(x))`` — the reference's compute_delta_aggregate is
      literally max − min per group (aggregation/functions.rs:320-331; the
      CTAS docs alias it ``price_range``).
    - Per-record with no grouping: ``(x - x)`` — the expression-level
      handler returns a typed zero for a single value and NULL for NULL
      (functions.rs:1809-1828); ``x - x`` reproduces both.

    Aggregate-vs-per-record is decided PER OCCURRENCE from the grouping of
    the SELECT scope enclosing that occurrence (``_scope_grouped``), so a
    DELTA inside a grouped subquery aggregates even when the outer
    statement is ungrouped, and vice versa.
    """
    while True:
        m = _DELTA_RE.search(sql)
        if not m:
            return sql
        j = _match_paren(sql, m.end())
        arg = sql[m.end() : j - 1].strip()
        om = re.match(r"(?is)\s*OVER\s*\(", sql[j:])
        if not om:
            repl = (
                f"(MAX({arg}) - MIN({arg}))"
                if _scope_grouped(sql, m.start())
                else f"({arg} - {arg})"
            )
            sql = sql[: m.start()] + repl + sql[j:]
            continue
        k = _match_paren(sql, j + om.end())
        over = sql[j + om.end() : k - 1]
        sql = (
            sql[: m.start()]
            + f"({arg} - lag({arg}, 1) OVER ({over}))"
            + sql[k:]
        )


# ---------------------------------------------------------------------------
# WINDOW clause injection into GROUP BY
# ---------------------------------------------------------------------------


def _inject_time_window(sql: str, wc: WindowClause, time_col: str) -> str:
    """Add the `window(...)`/`session_window(...)` grouping key for an
    extracted WINDOW clause, creating the GROUP BY if absent (reference:
    windowed SELECT without GROUP BY = one group per window)."""
    if wc.kind == "tumbling":
        key = f"window({time_col}, '{wc.size}')"
    elif wc.kind == "sliding":
        key = f"window({time_col}, '{wc.size}', '{wc.advance}')"
    else:
        key = f"session_window({time_col}, '{wc.size}')"
        if wc.partition_by:
            # SESSION(ts, gap, key): sessionize per partition key
            # (WindowSpec::Session.partition_by, ast.rs:607-611)
            key += ", " + ", ".join(wc.partition_by)
    gm = re.search(r"(?is)\bGROUP\s+BY\s+", sql)
    if gm:
        return sql[: gm.end()] + key + ", " + sql[gm.end():]
    hm = re.search(r"(?is)\b(HAVING|ORDER\s+BY|LIMIT)\b", sql)
    pos = hm.start() if hm else len(sql)
    return f"{sql[:pos].rstrip()} GROUP BY {key} {sql[pos:]}".rstrip()


# ---------------------------------------------------------------------------
# JOIN ... WITHIN (time-bounded stream-stream join, ast.rs:552-559 JoinWindow;
# grammar parser/select.rs:1141: JOIN stream ON cond WITHIN duration
# [GRACE PERIOD duration])
# ---------------------------------------------------------------------------

_JOIN_WITHIN_RE = re.compile(
    r"(?is)\bJOIN\s+([\w.]+)"
    r"(?:\s+(?:AS\s+)?(?!ON\b)(\w+))?"
    r"\s+ON\s+(.*?)"
    r"\s+WITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)"
    r"(?:\s+GRACE\s+PERIOD\s+INTERVAL\s+'(\d+)'\s+(\w+))?"
)

_FROM_ALIAS_RE = re.compile(
    r"(?is)\bFROM\s+([\w.]+)"
    r"(?:\s+(?:AS\s+)?(?!JOIN\b|INNER\b|LEFT\b|RIGHT\b|FULL\b|CROSS\b|WHERE\b|"
    r"GROUP\b|ORDER\b|ON\b|WINDOW\b|HAVING\b|LIMIT\b|EMIT\b|WITH\b)(\w+))?"
)


def _rewrite_join_within(sql: str, time_col: str) -> str:
    """`JOIN b ON cond WITHIN INTERVAL 'n' UNIT [GRACE PERIOD ...]` →
    standard join with symmetric time bounds:
    ``b.ts BETWEEN a.ts - n AND a.ts + n`` (JoinWindow.time_window —
    records match iff their event times lie within the duration of each
    other). GRACE PERIOD widens state retention for late rows, not the
    match window; Spark's analog is the watermark delay, which the engine
    configures — the predicate is unchanged."""
    m = _JOIN_WITHIN_RE.search(sql)
    if not m:
        return sql
    right = m.group(2) or m.group(1)
    fm = _FROM_ALIAS_RE.search(sql[: m.start()])
    if fm is None:
        raise ValueError("JOIN ... WITHIN without a FROM clause")
    left = fm.group(2) or fm.group(1)
    n, unit = m.group(4), m.group(5)
    bounds = (
        f"{right}.{time_col} >= {left}.{time_col} - INTERVAL '{n}' {unit} "
        f"AND {right}.{time_col} <= {left}.{time_col} + INTERVAL '{n}' {unit}"
    )
    alias = f" {m.group(2)}" if m.group(2) else ""
    replaced = f"JOIN {m.group(1)}{alias} ON ({m.group(3)}) AND {bounds}"
    return _rewrite_join_within(
        sql[: m.start()] + replaced + sql[m.end():], time_col
    )


# ---------------------------------------------------------------------------
# ASOF JOIN (DuckDB-style time-series join syntax, routed to
# operators/asof.py by the engine — Spark SQL has no ASOF operator)
# ---------------------------------------------------------------------------

_ASOF_JOIN_RE = re.compile(
    r"(?is)\bFROM\s+([\w.]+)"
    r"(?:\s+(?:AS\s+)?(?!ASOF\b)(\w+))?"
    r"\s+ASOF\s+(?:(LEFT)\s+)?JOIN\s+([\w.]+)"
    r"(?:\s+(?:AS\s+)?(?!ON\b)(\w+))?"
    r"\s+ON\s+(.*?)"
    r"(?=\s+(?:WHERE|GROUP|ORDER|HAVING|LIMIT|WINDOW|EMIT|UNION|QUALIFY|"
    r"JOIN|INNER|LEFT|RIGHT|FULL|CROSS)\b|\s*$|\s*\))"
)

_ASOF_EQ_RE = re.compile(r"(?s)^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$")
_ASOF_GE_RE = re.compile(r"(?s)^\s*(\w+)\.(\w+)\s*(>=|<=|>|<)\s*(\w+)\.(\w+)\s*$")


@dataclass
class AsofJoinSpec:
    """One parsed ``FROM l [la] ASOF [LEFT] JOIN r [ra] ON eqs AND ineq``."""

    left_table: str
    left_alias: str
    right_table: str
    right_alias: str
    keys: list[tuple[str, str]]  # (left col, right col) per equality
    left_ts: str
    right_ts: str
    inner: bool  # ASOF JOIN (no LEFT) drops unmatched left rows, DuckDB-style
    span: tuple[int, int]  # [start, end) of the FROM..cond text to replace
    #: strict form (``l.ts > r.ts``): latest right STRICTLY before t — the
    #: shape the stream-stream operator can finalize against a watermark
    #: (DuckDB's ASOF JOIN accepts > as well as >=)
    strict: bool = False


def parse_asof_join(sql: str) -> AsofJoinSpec | None:
    """Recognize DuckDB-syntax ``ASOF [LEFT] JOIN`` between two named
    relations. The ON clause must be a top-level conjunction of
    alias-qualified equalities (the join keys, >= 1) plus exactly one
    timestamp inequality ``l.ts >= r.ts`` (or ``>`` for the STRICT form,
    or the mirrored ``r.ts <=/< l.ts``) — the DuckDB grammar's own
    requirement (DuckDB accepts both inclusive and strict operators).
    Returns None when no ASOF JOIN is present; raises on an ASOF JOIN
    whose ON shape is outside this contract (silent misreads of a
    time-series join are worse than a parse error)."""
    m = _ASOF_JOIN_RE.search(sql)
    if m is None:
        if re.search(r"(?i)\bASOF\s+(LEFT\s+)?JOIN\b", sql):
            raise ValueError(
                "ASOF JOIN must name two plain relations: "
                "FROM l [alias] ASOF [LEFT] JOIN r [alias] ON ..."
            )
        return None
    lt, la, left_kw, rt, ra, cond = m.groups()
    la = la or lt
    ra = ra or rt
    keys: list[tuple[str, str]] = []
    ts: tuple[str, str] | None = None
    strict = False
    for conjunct in re.split(r"(?i)\s+AND\s+", cond):
        eq = _ASOF_EQ_RE.match(conjunct)
        if eq:
            a, ac, b, bc = eq.groups()
            if a.lower() == la.lower() and b.lower() == ra.lower():
                keys.append((ac, bc))
            elif a.lower() == ra.lower() and b.lower() == la.lower():
                keys.append((bc, ac))
            else:
                raise ValueError(
                    f"ASOF JOIN equality must relate the two join sides: {conjunct!r}"
                )
            continue
        ge = _ASOF_GE_RE.match(conjunct)
        if ge:
            a, ac, op, b, bc = ge.groups()
            fwd = op in (">=", ">") and a.lower() == la.lower() and b.lower() == ra.lower()
            rev = op in ("<=", "<") and a.lower() == ra.lower() and b.lower() == la.lower()
            if not (fwd or rev):
                raise ValueError(
                    "ASOF JOIN inequality must be left.ts >= right.ts "
                    "(or > for the strict form, or the mirrored right.ts "
                    f"<=/< left.ts): {conjunct!r}"
                )
            if ts is not None:
                raise ValueError("ASOF JOIN takes exactly one timestamp inequality")
            ts = (ac, bc) if fwd else (bc, ac)
            strict = op in (">", "<")
            continue
        raise ValueError(f"unsupported ASOF JOIN condition term: {conjunct!r}")
    if ts is None:
        raise ValueError("ASOF JOIN requires a timestamp inequality (l.ts >= r.ts)")
    return AsofJoinSpec(
        left_table=lt,
        left_alias=la,
        right_table=rt,
        right_alias=ra,
        keys=keys,
        left_ts=ts[0],
        right_ts=ts[1],
        inner=left_kw is None,
        span=(m.start(), m.end()),
        strict=strict,
    )


# ---------------------------------------------------------------------------
# Range join (point-in-interval joins, routed to operators/rangejoin.py —
# Spark plans an equality-free BETWEEN join as a BroadcastNestedLoopJoin)
# ---------------------------------------------------------------------------

_RANGE_JOIN_RE = re.compile(
    r"(?is)\bFROM\s+([\w.]+)"
    r"(?:\s+(?:AS\s+)?(?!JOIN\b|INNER\b|ASOF\b)(\w+))?"
    r"\s+(?:INNER\s+)?JOIN\s+([\w.]+)"
    r"(?:\s+(?:AS\s+)?(?!ON\b)(\w+))?"
    r"\s+ON\s+(.*?)"
    r"(?=\s+(?:WHERE|GROUP|ORDER|HAVING|LIMIT|WINDOW|EMIT|UNION|QUALIFY|"
    r"JOIN|INNER|LEFT|RIGHT|FULL|CROSS)\b|\s*$|\s*\))"
)

_RANGE_BETWEEN_RE = re.compile(
    r"(?s)^\s*(\w+)\.(\w+)\s+BETWEEN\s+(\w+)\.(\w+)\s+AND\s+(\w+)\.(\w+)\s*$",
    re.IGNORECASE,
)
_RANGE_INEQ_RE = re.compile(r"(?s)^\s*(\w+)\.(\w+)\s*(>=|<=|<|>)\s*(\w+)\.(\w+)\s*$")


@dataclass
class RangeJoinSpec:
    """``FROM l [a] JOIN r [b] ON a.v BETWEEN b.lo AND b.hi`` (or the
    two-inequality spelling) — an EQUALITY-FREE interval containment
    join, the shape Spark can only nested-loop."""

    left_table: str
    left_alias: str
    right_table: str
    right_alias: str
    value_col: str
    lo_col: str
    hi_col: str
    inclusive_hi: bool
    span: tuple[int, int]


def parse_range_join(sql: str, pos: int = 0) -> RangeJoinSpec | None:
    """Recognize a point-in-interval join between two named relations:
    the ON clause is exactly one BETWEEN (or a >=/<= pair) relating ONE
    left column to two right columns. Joins with any equality conjunct
    are left alone — Catalyst plans those as hash joins with the range
    as a post-filter, which is already the right shape. Returns None
    for anything else (unlike ASOF, plain JOIN text is never an error).

    Every ``FROM x JOIN y ON ...`` position at-or-after ``pos`` is tried
    (subqueries/CTEs have their own FROM), so a non-range equi-join
    earlier in the text never shadows a later range join; the caller can
    pass ``pos`` past a span it could not route (e.g. a CTE-named
    relation) to reach the next candidate. One documented limitation
    remains: in a single multi-join FROM
    (``FROM a JOIN b ON a.x=b.x JOIN c ON a.v BETWEEN c.lo AND c.hi``)
    only the first JOIN segment follows the FROM keyword, so the trailing
    range join is left to Spark (correct results via
    BroadcastNestedLoopJoin, without the bucketized speedup) — split the
    equi-join into a CTE to get the operator."""
    for m in _RANGE_JOIN_RE.finditer(sql, pos):
        spec = _try_range_spec(m)
        if spec is not None:
            return spec
    return None


def _try_range_spec(m: re.Match) -> RangeJoinSpec | None:
    lt, la, rt, ra, cond = m.groups()
    la, ra = la or lt, ra or rt
    bounds: dict[str, tuple[str, bool]] = {}  # "lo"/"hi" -> (col, inclusive)
    value: str | None = None

    def note(vcol: str, side: str, rcol: str, inclusive: bool) -> bool:
        nonlocal value
        if value is not None and value != vcol:
            return False
        value = vcol
        if side in bounds:
            return False
        bounds[side] = (rcol, inclusive)
        return True

    # split top-level ANDs, re-joining the AND that belongs to a BETWEEN
    pieces = re.split(r"(?i)\s+AND\s+", cond)
    conjuncts: list[str] = []
    for piece in pieces:
        if conjuncts and re.search(r"(?i)\bBETWEEN\s+\S+\s*$", conjuncts[-1]):
            conjuncts[-1] += " AND " + piece
        else:
            conjuncts.append(piece)
    for conjunct in conjuncts:
        b = _RANGE_BETWEEN_RE.match(conjunct)
        if b:
            a, ac, r1, r1c, r2, r2c = b.groups()
            if not (
                a.lower() == la.lower()
                and r1.lower() == ra.lower()
                and r2.lower() == ra.lower()
                and note(ac, "lo", r1c, True)
                and note(ac, "hi", r2c, True)
            ):
                return None
            continue
        q = _RANGE_INEQ_RE.match(conjunct)
        if not q:
            return None
        a, ac, op, b2, bc = q.groups()
        if a.lower() == la.lower() and b2.lower() == ra.lower():
            side = "lo" if op in (">=", ">") else "hi"
            ok = note(ac, side, bc, op in (">=", "<="))
        elif a.lower() == ra.lower() and b2.lower() == la.lower():
            side = "lo" if op in ("<=", "<") else "hi"
            ok = note(bc, side, ac, op in (">=", "<="))
        else:
            return None
        if not ok:
            return None
    if value is None or set(bounds) != {"lo", "hi"}:
        return None
    if not bounds["lo"][1]:
        return None  # exclusive lo not supported by the operator; leave to Spark
    return RangeJoinSpec(
        left_table=lt,
        left_alias=la,
        right_table=rt,
        right_alias=ra,
        value_col=value,
        lo_col=bounds["lo"][0],
        hi_col=bounds["hi"][0],
        inclusive_hi=bounds["hi"][1],
        span=(m.start(), m.end()),
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# URI-based FROM sources (FR-047)
# ---------------------------------------------------------------------------

#: scheme://rest — schemes per reference ConnectionString.parse
#: (datasource/config/types.rs:381: "Simple URI parsing"). The unquoted
#: token ends at whitespace / clause punctuation; globs (`*`, `?` query
#: strings) are part of the URI.
_URI_TOKEN_RE = re.compile(r"[A-Za-z][A-Za-z0-9+.\-]*://[^\s,;()']+")
_FROM_JOIN_RE = re.compile(r"(?is)\b(FROM|JOIN)\s+")


def uri_view_name(uri: str) -> str:
    """Deterministic identifier for a URI source — the reference's own
    sanitization (processors/select.rs:543: ``uri.replace("://", "_")
    .replace("/", "_")``) widened to every non-word char so globs and
    query strings stay addressable as one SQL identifier."""
    return "uri_" + re.sub(r"_+", "_", re.sub(r"\W", "_", uri)).strip("_")


def _extract_uri_sources(sql: str) -> tuple[str, dict[str, str]]:
    """FR-047: URI data sources directly in FROM/JOIN (reference
    ast.rs:518 ``StreamSource::Uri``; parser/select.rs:163-180 accepts
    both a quoted ``'file://…'`` string and a bare ``scheme://…`` token;
    user examples in docs/sql/create-table-wildcard.md:30-58).

    Each URI is replaced by a deterministic view name; the caller wires
    the view to a Spark reader via ``parse_uri_source``. Scans outside
    string literals, so a quoted URI is only recognized immediately
    after FROM/JOIN (the reference's parser position), never inside an
    unrelated literal."""
    uris: dict[str, str] = {}
    out: list[str] = []
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch in ("'", '"'):
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        m = _FROM_JOIN_RE.match(sql, i)
        if not m:
            out.append(ch)
            i += 1
            continue
        uri = None
        end = m.end()
        if sql[end : end + 1] == "'":
            j = _skip_string(sql, end)
            candidate = sql[end + 1 : j - 1]
            if "://" in candidate:
                uri, end = candidate, j
        else:
            um = _URI_TOKEN_RE.match(sql, end)
            if um:
                uri, end = um.group(0), um.end()
        if uri is None:
            out.append(sql[i : m.end()])
            i = m.end()
            continue
        view = uri_view_name(uri)
        uris[view] = uri
        out.append(f"{m.group(1)} {view}")
        i = end
    return "".join(out), uris


def parse_uri_source(uri: str, props: dict[str, str] | None = None) -> dict[str, str]:
    """URI → engine source cfg — the ConnectionString.parse +
    to_source_config analog (reference datasource/config/types.rs:
    374-448 parse, :451-560 per-scheme configs). Query params configure
    the source (``?format=json&header=true``); statement-level WITH
    props override them (docs write both ``"file.format"`` and bare
    ``"format"`` — both accepted, WITH wins over the URI).

    - ``file://`` → file_source; format default **json** (types.rs:507
      ``_ => FileFormat::Json``), csv header default true.
    - ``kafka://host[:port]/topic`` → kafka_source; port default 9092
      (types.rs:456); params pass through as consumer properties.
    - ``s3:// hdfs:// gs:// abfs://`` → file_source with the URI kept as
      the read path (Spark/Hadoop filesystems resolve these natively;
      ``s3://`` is mapped to ``s3a://``, the Hadoop connector scheme);
      format default **parquet** (types.rs:553: "Default for S3").
    - ``postgresql:// mysql://`` (+clickhouse) → jdbc_source with a
      ``jdbc:`` url and ``dbtable`` from the ``?table=`` param
      (create-table-wildcard.md:64-77).
    """
    props = dict(props or {})
    scheme, _, rest = uri.partition("://")
    scheme = scheme.lower()
    path_part, _, query = rest.partition("?")
    params: dict[str, str] = {}
    for kv in query.split("&") if query else []:
        k, _, v = kv.partition("=")
        if k:
            params[k] = v
    # WITH-prop override layer: bare keys and `file.`-scoped spellings
    for k, v in props.items():
        base = k.partition(".")[2] if k.startswith("file.") else k
        if base in ("format", "header", "delimiter", "quote", "watch"):
            params[base] = v

    if scheme == "kafka":
        host_port, _, topic = path_part.partition("/")
        if not host_port or not topic:
            raise ValueError(
                f"kafka:// URI needs host[:port]/topic: {uri!r}"
            )
        if ":" not in host_port:
            host_port = f"{host_port}:9092"
        # WITH props pass through as consumer properties (the doc's
        # `WITH ("auto.offset.reset" = "latest")` form), URI query params
        # on top (in-URI config wins over statement-level).
        cfg = dict(props)
        cfg.update(params)
        cfg.update(
            {
                "type": "kafka_source",
                "bootstrap.servers": host_port,
                "topic": topic,
            }
        )
        return cfg
    if scheme == "file":
        fmt = params.get("format", "json")
        if fmt == "csv" and params.get("header", "true").lower() == "false":
            fmt = "csv_no_header"
        cfg = {"type": "file_source", "path": path_part, "format": fmt}
        if "delimiter" in params:
            cfg["delimiter"] = params["delimiter"]
        if params.get("watch", "").lower() == "true":
            cfg["watch"] = "true"
        return cfg
    if scheme in ("s3", "s3a", "hdfs", "gs", "abfs", "abfss", "wasbs"):
        hadoop_scheme = "s3a" if scheme == "s3" else scheme
        cfg = {
            "type": "file_source",
            "path": f"{hadoop_scheme}://{path_part}",
            "format": params.get("format", "parquet"),
        }
        if "delimiter" in params:
            cfg["delimiter"] = params["delimiter"]
        return cfg
    if scheme in ("postgresql", "mysql", "clickhouse"):
        table = params.pop("table", None)
        if not table:
            raise ValueError(
                f"{scheme}:// URI needs a ?table= parameter: {uri!r}"
            )
        cfg = {
            "type": "jdbc_source",
            "url": f"jdbc:{scheme}://{path_part}",
            "dbtable": table,
        }
        cfg.update(params)
        return cfg
    raise ValueError(f"unsupported URI source scheme {scheme!r}: {uri!r}")


def parse_uri_sink(uri: str, props: dict[str, str] | None = None) -> dict[str, str]:
    """Sink half of FR-047 (clauses.rs:534: ``INTO 'kafka://broker/topic'``):
    the same URI grammar mapped to sink cfgs — ``file://`` → file_sink
    (format from ?format= / WITH, csv default like the engine's file
    sink), ``kafka://`` → kafka_sink (PRIMARY KEY → message key as with
    named kafka sinks)."""
    cfg = parse_uri_source(uri, props)
    t = cfg.pop("type")
    if t == "kafka_source":
        cfg["type"] = "kafka_sink"
    elif t == "file_source":
        cfg["type"] = "file_sink"
        explicit = "format=" in uri or any(
            k in ("format", "file.format") for k in (props or {})
        )
        if not explicit:
            # parse_uri_source defaults file format to json (source rule,
            # types.rs:507); for SINKS infer from the path extension and
            # fall back to the engine's file-sink default (csv)
            fmt = uri.partition("?")[0].rsplit(".", 1)[-1].lower()
            cfg["format"] = (
                fmt if fmt in ("csv", "json", "jsonl", "parquet") else "csv"
            )
    else:
        raise ValueError(f"unsupported URI sink scheme: {uri!r}")
    return cfg


def translate_select(
    select_sql: str, time_col: str = "_event_time"
) -> tuple[str, WindowClause | None, str | None, list[str]]:
    """Translate a velostream SELECT body → (spark_sql, window, emit, keys)."""
    sql, wc, emit, keys, _, _ = translate_select_full(select_sql, time_col)
    return sql, wc, emit, keys


def translate_select_full(
    select_sql: str, time_col: str = "_event_time"
) -> tuple[
    str,
    WindowClause | None,
    str | None,
    list[str],
    list[RowsWindowAgg],
    dict[str, str],
]:
    """translate_select + the captured ROWS WINDOW OVER-specs (for the
    streaming execution path, which routes them to the stateful op) +
    the FR-047 URI FROM sources (view name → URI, for source wiring)."""
    sql, uri_sources = _extract_uri_sources(select_sql.strip().rstrip(";"))
    sql, emit = _extract_emit(sql)
    sql, wc = _extract_window(sql)
    sql, keys = _extract_primary_keys(sql)
    if not keys:
        keys = _implicit_group_by_keys(sql)
    rw = extract_rows_window_aggs(sql)
    sql = _rewrite_join_within(sql, time_col)
    sql = _rewrite_over_clauses(sql)
    sql = _rewrite_value_fn_frames(sql)
    sql = _rewrite_delta(sql)
    sql = _rewrite_functions(sql)
    sql = _rewrite_interval_frames(sql)
    sql = _rewrite_quantified_comparisons(sql)
    sql = _rewrite_now_diff(sql)
    sql = _wrap_ungrouped_bare_columns(sql)
    if wc is not None:
        sql = _inject_time_window(sql, wc, wc.time_column or time_col)
        # `_window_start` / `_window_end` system columns (reference
        # docs/sql/system-columns.md:14-36, types.rs:1625-1627) → the
        # grouping window struct's bounds as INT64 epoch-MILLIS
        # (FieldValue::Integer, window_v2/adapter.rs:971-981; the doc's
        # examples do FROM_UNIXTIME(_window_start/1000) and end-start
        # millisecond arithmetic). Identifier positions only — quoted
        # string literals are left untouched.
        wkey = "session_window" if wc.kind == "session" else "window"
        sql = _sub_outside_strings(
            sql, r"(?i)\b_window_start\b", f"unix_millis({wkey}.start)"
        )
        sql = _sub_outside_strings(
            sql, r"(?i)\b_window_end\b", f"unix_millis({wkey}.end)"
        )
    sql = promote_epoch_millis_comparisons(sql)
    return sql.strip(), wc, emit, keys, rw, uri_sources


def _wrap_ungrouped_bare_columns(sql: str) -> str:
    """`SELECT symbol, price, COUNT(*) FROM t GROUP BY symbol` — the
    reference resolves a NON-aggregate, NON-grouped select field to the
    group's FIRST-arrival value (accumulator.rs:268+ stores first/last
    per expression; functions.rs:56-74,241-250 emits first_values), where
    Spark raises MISSING_AGGREGATION. Bare-identifier items (optionally
    qualified / aliased) that match no GROUP BY item are wrapped in
    `first(...)` so pasted reference queries run with the reference's
    semantics. Scoped deliberately narrow: complex ungrouped EXPRESSIONS
    still error (adjudicated — wrapping arbitrary expressions risks
    capturing grouped computations like CASE over aggregates), and
    system columns (leading `_`, rewritten later against the window key)
    are left alone. Arrival order is deterministic in the reference's
    single stream; in Spark `first()` is per-group arrival under one
    partition and pinned as such in tests."""
    blank = _blank_nested(sql)
    gm = re.search(r"(?i)\bGROUP\s+BY\s+", blank)
    sm = re.match(r"(?i)\s*SELECT\s+(DISTINCT\s+)?", blank)
    fm = re.search(r"(?i)\sFROM\s", blank)
    if not (gm and sm and fm) or fm.start() <= sm.end():
        return sql
    g_end = len(blank)
    for ge in re.finditer(
        r"(?i)\b(HAVING|WINDOW|ORDER\s+BY|LIMIT|EMIT)\b", blank[gm.end() :]
    ):
        if ge.group(1).upper() == "WINDOW" and re.match(
            r"\s*\(", sql[gm.end() + ge.end() :]
        ):
            continue  # the injected window(...) grouping call, not a clause
        g_end = gm.end() + ge.start()
        break
    gitems = {
        re.sub(r"\s+", "", x).lower()
        for x in _split_top_level(sql[gm.end() : g_end])
    }
    gsegs = {g.split(".")[-1] for g in gitems} | gitems
    items = _split_top_level(sql[sm.end() : fm.start()])
    out: list[str] = []
    changed = False
    for it in items:
        m = re.fullmatch(
            r"\s*([A-Za-z_][\w.]*)\s*(?:(?i:AS)\s+([A-Za-z_]\w*))?\s*",
            it,
        )
        name = m.group(1) if m else None
        if (
            not name
            or name.startswith("_")
            # fields of the injected grouping-window struct ARE grouped
            or name.lower().split(".")[0] in ("window", "session_window")
            or name.lower() in ("true", "false", "null", "distinct")
            or name.lower() in gsegs
            or name.split(".")[-1].lower() in gsegs
            # grouped under its alias: SELECT symbol AS s ... GROUP BY s
            or (m.group(2) and m.group(2).lower() in gsegs)
        ):
            out.append(it)
            continue
        alias = (m.group(2) or name.split(".")[-1]) if m else ""
        out.append(f" first({name}) AS {alias}")
        changed = True
    if not changed:
        return sql
    return sql[: sm.end()] + ",".join(out) + sql[fm.start() :]


_VALUE_FN_OVER_RE = re.compile(r"(?i)\b(LAST_VALUE|NTH_VALUE)\s*\(")


def _rewrite_value_fn_frames(sql: str) -> str:
    """Frameless `LAST_VALUE(x) OVER (...)` / `NTH_VALUE(x, n) OVER (...)`
    get `ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING`: the
    reference's value functions read the WHOLE PARTITION, not a frame
    (window_functions.rs:625-652 last_value takes partition_bounds' end;
    :654-711 nth_value indexes from partition start; frame bounds are
    never consulted), and its own doc examples spell the full-partition
    frame out (advanced-query-features.md:437, COPY_PASTE_EXAMPLES.md).
    Spark's DEFAULT frame ends at CURRENT ROW, so a frameless pasted
    query would return the running-last (= current row's value) instead
    of the partition's last. FIRST_VALUE needs no rewrite — partition
    first is inside Spark's default frame already. ADJUDICATED: an
    EXPLICIT user frame is honored (standard SQL); the reference
    ignoring even explicit frames is an implementation accident we do
    not mirror."""
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch in ("'", '"'):
            i = _skip_string(sql, i)
            continue
        m = _VALUE_FN_OVER_RE.match(sql, i)
        if not m:
            i += 1
            continue
        j = _match_paren(sql, m.end())  # past the call's args
        mo = re.match(r"(?is)\s*OVER\s*\(", sql[j:])
        if not mo:
            i = j
            continue
        body_start = j + mo.end()
        body_end = _match_paren(sql, body_start)  # just past OVER's ')'
        body = sql[body_start : body_end - 1]
        if re.search(r"(?i)\b(ROWS|RANGE)\b", _blank_nested(body)):
            i = body_end  # explicit frame — honored as written
            continue
        frame = " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
        sql = sql[: body_end - 1] + frame + sql[body_end - 1 :]
        i = body_end + len(frame)
    return sql


#: Fixed-duration millis per frame-bound interval unit — exactly the
#: TimeUnit set the reference's frame parser accepts
#: (parser/window_functions.rs:470-476; months/years are rejected there).
_FRAME_UNIT_MS = {
    "MILLISECOND": 1, "MILLISECONDS": 1,
    "SECOND": 1_000, "SECONDS": 1_000,
    "MINUTE": 60_000, "MINUTES": 60_000,
    "HOUR": 3_600_000, "HOURS": 3_600_000,
    "DAY": 86_400_000, "DAYS": 86_400_000,
}

#: INT64 epoch-millis system columns (docs/sql/system-columns.md): a RANGE
#: frame over these needs NUMERIC millis bounds — Spark's native interval
#: frames require a timestamp-typed ORDER BY.
_MILLIS_INT_ORDER = re.compile(
    r"(?i)\bORDER\s+BY\s+(?:\w+\.)?(?:_timestamp|_window_start|_window_end)\b"
)

_FRAME_INTERVAL = re.compile(
    r"(?i)\bINTERVAL\s+'(\d+)'\s+"
    r"(MILLISECONDS?|SECONDS?|MINUTES?|HOURS?|DAYS?)\s+"
    r"(PRECEDING|FOLLOWING)"
)


def _rewrite_interval_frames(sql: str) -> str:
    """Temporal RANGE-frame bounds — ``RANGE BETWEEN INTERVAL '10' MINUTE
    PRECEDING AND CURRENT ROW`` (parser/window_functions.rs:459-504,
    FrameBound::IntervalPreceding/Following; window_frame_validator.rs:86
    admits them for RANGE frames only).

    Spark executes interval frames natively when the ORDER BY column is a
    timestamp (so those pass through untouched); over the INT64
    epoch-millis system columns the bound is rewritten to its fixed
    millisecond count, which is exactly the reference's own
    ``interval_to_millis`` arithmetic for these units.

    ADJUDICATION — implemented with TRUE temporal semantics, diverging
    from the reference's EXECUTED behavior: its frame-offset computation
    has no (Range, IntervalPreceding) arm, so every interval bound falls
    to the ``_ => 0`` default (expression/window_functions.rs:328-331,
    354-357) and the frame silently collapses to CURRENT ROW. Its numeric
    RANGE bounds likewise reuse the ROWS row-offset arms (":322-325, the
    code's own comment admits 'you'd need to look at ORDER BY values for
    true RANGE semantics'). Both are execution gaps contradicting the
    parser/validator's documented contract; mirroring them would corrupt
    every windowed aggregate the syntax promises, so we implement what
    the syntax declares (pinned in test_sql_dialect)."""

    out: list[str] = []
    i = 0
    rx_over = re.compile(r"(?i)\bOVER\s*\(")
    while i < len(sql):
        m = rx_over.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        body_start = m.end()
        body_end = _match_paren(sql, body_start)  # just past close paren
        body = sql[body_start : body_end - 1]
        if _MILLIS_INT_ORDER.search(body) and re.search(r"(?i)\bRANGE\b", body):
            body = _FRAME_INTERVAL.sub(
                lambda fm: f"{int(fm.group(1)) * _FRAME_UNIT_MS[fm.group(2).upper()]}"
                f" {fm.group(3)}",
                body,
            )
        out.append(sql[i : body_start] + body + ")")
        i = body_end
    return "".join(out)


def promote_epoch_millis_comparisons(
    sql: str, cols: tuple[str, ...] = ("_event_time",)
) -> str:
    """`<temporal col> <op> <integer>` — the reference compares temporal
    values against Integers as EPOCH MILLIS (evaluator.rs compare_values,
    the "Temporal vs Integer(epoch-millis)" arms, for BOTH Timestamp and
    Date lhs; event-time-guide examples write `WHERE _event_time >
    1697296245000`). Spark refuses timestamp-vs-bigint comparison outright
    (DATATYPE_MISMATCH), so the literal is promoted with
    timestamp_millis(). DATE columns compare through Spark's native
    date→midnight-timestamp promotion, the same arm the reference uses
    (`a.and_hms_opt(0,0,0)`, evaluator.rs:1126 — agreement pinned in
    test_function_catalog). The 10-digit floor keeps ordinary integers
    (ids, counts) out; translate applies this to the documented
    `_event_time` system column, and SqlEngine re-applies it with the
    registered streams' actual temporal column names (schema-aware)."""
    names = "|".join(re.escape(c) for c in cols)
    col = rf"((?:\w+\.)?(?:{names}))"
    pat = (
        rf"(?i)\b{col}\s*(>=|<=|<>|!=|>|<|=)\s*(\d{{10,}})\b"
        rf"|\b(\d{{10,}})\s*(>=|<=|<>|!=|>|<|=)\s*{col}\b"
        rf"|\b{col}\s+BETWEEN\s+(\d{{10,}})\s+AND\s+(\d{{10,}})\b"
    )

    def conv(m: re.Match) -> str:
        if m.group(1):
            return f"{m.group(1)} {m.group(2)} timestamp_millis({m.group(3)})"
        if m.group(4):
            return f"timestamp_millis({m.group(4)}) {m.group(5)} {m.group(6)}"
        return (
            f"{m.group(7)} BETWEEN timestamp_millis({m.group(8)}) "
            f"AND timestamp_millis({m.group(9)})"
        )

    return _sub_outside_strings(sql, pat, conv)


def _sub_outside_strings(sql: str, pattern: str, repl) -> str:
    """re.sub applied only OUTSIDE quoted string literals (the match may
    itself span literals — e.g. ``INTERVAL '2' MONTH`` — but can only
    START outside one). ``repl`` is a string or a match→string callable."""
    rx = re.compile(pattern)
    out: list[str] = []
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch in ("'", '"'):
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        m = rx.match(sql, i)
        if m:
            out.append(repl if isinstance(repl, str) else repl(m))
            i = m.end()
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def split_statements(sql_app: str) -> list[str]:
    """Split a SQL application file (app_parser.rs) on top-level `;`."""
    no_comments, _ = strip_comments(sql_app)
    return [s.strip() for s in _split_top_level(no_comments, ";") if s.strip()]


def split_statements_keep_comments(sql_app: str) -> list[str]:
    """Split on top-level `;` but KEEP each statement's comments, so
    per-statement `-- @metric:` blocks (annotations.rs) survive into
    ``parse_statement`` / ``parse_metric_annotations``. String-literal
    and comment aware: a `;` inside '…', "…", or a `--` comment does
    not split. Chunks that are comments-only (a trailing doc block with
    no statement) are dropped."""
    chunks: list[str] = []
    buf: list[str] = []
    in_str: str | None = None
    in_comment = False
    i, n = 0, len(sql_app)
    while i < n:
        ch = sql_app[i]
        if in_comment:
            buf.append(ch)
            if ch == "\n":
                in_comment = False
        elif in_str:
            buf.append(ch)
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
            buf.append(ch)
        elif ch == "-" and sql_app[i + 1 : i + 2] == "-":
            in_comment = True
            buf.append(ch)
        elif ch == ";":
            chunks.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    chunks.append("".join(buf))
    out = []
    for c in chunks:
        stripped, _ = strip_comments(c)
        if stripped.strip():
            out.append(c.strip())
    return out


def _take_balanced(s: str) -> tuple[str, str]:
    """Split ``(...)rest`` at the matching close paren (string-literal and
    ``<>``-aware for STRUCT<...> types); returns (inner, rest)."""
    assert s.startswith("(")
    depth = angle = 0
    i = 0
    while i < len(s):
        ch = s[i]
        if ch in ("'", '"'):
            i = _skip_string(s, i)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[1:i], s[i + 1 :]
        elif ch == "<":
            angle += 1
        elif ch == ">" and angle:
            angle -= 1
        i += 1
    raise ValueError(f"unbalanced parentheses in column definitions: {s[:40]!r}")


def _parse_column_defs(src: str) -> tuple[list, list]:
    """Column-definition block (reference clauses.rs:440): ``name TYPE
    [NOT NULL]`` items, comma-separated at the top level (commas inside
    DECIMAL(10,2) / MAP(...) / STRUCT<...> don't split). The FR-094 doc
    form's table-level ``PRIMARY KEY (col, ...) [NOT ENFORCED]`` is also
    accepted — its columns become the message key (KEY_CONFIGURATION.md).
    Returns ([(name, type_sql, nullable)], key_cols)."""
    cols: list = []
    keys: list[str] = []
    # split at top-level commas, <>-aware
    items, depth, angle, start = [], 0, 0, 0
    i = 0
    while i < len(src):
        ch = src[i]
        if ch in ("'", '"'):
            i = _skip_string(src, i)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "<":
            angle += 1
        elif ch == ">" and angle:
            angle -= 1
        elif ch == "," and depth == 0 and angle == 0:
            items.append(src[start:i])
            start = i + 1
        i += 1
    items.append(src[start:])
    for item in items:
        item = item.strip()
        if not item:
            continue
        km = re.match(r"(?is)^PRIMARY\s+KEY\s*\(([^)]*)\)(\s+NOT\s+ENFORCED)?$", item)
        if km:
            keys.extend(c.strip().strip("`") for c in km.group(1).split(","))
            continue
        cm = re.match(r"(?is)^[`\"]?(\w+)[`\"]?\s+(.+)$", item)
        if not cm:
            raise ValueError(f"bad column definition: {item!r}")
        name, type_sql = cm.group(1), cm.group(2).strip()
        nullable = True
        nn = re.search(r"(?is)\s+NOT\s+NULL\b", type_sql)
        if nn:
            nullable = False
            type_sql = (type_sql[: nn.start()] + type_sql[nn.end() :]).strip()
        pk = re.search(r"(?is)\s+PRIMARY\s+KEY\b", type_sql)
        if pk:
            keys.append(name)
            type_sql = (type_sql[: pk.start()] + type_sql[pk.end() :]).strip()
        cols.append((name, type_sql, nullable))
    return cols, keys


def parse_statement(sql: str, time_col: str = "_event_time") -> Statement:
    """Parse one velostream statement into a Statement."""
    cleaned, annotations = strip_comments(sql)
    body, props, into = _extract_with_props(cleaned.strip())
    body = body.strip().rstrip(";").strip()

    # Structural guards matching the reference parser's rejections
    # (parser/common.rs dispatches on a known statement keyword;
    # parser/select.rs:411 requires a source after FROM): an unknown head
    # or a dangling FROM must be a parse error, not a silent
    # translate-as-select (the validator surfaces these as
    # "parse error: ..." — test_validator.py).
    if not body:
        raise ValueError("empty statement")
    hm = re.match(r"[A-Za-z_]+", body)
    head = hm.group(0).upper() if hm else ""
    _HEADS = {
        "SELECT", "WITH", "CREATE", "INSERT", "UPDATE", "DELETE", "SHOW",
        "LIST", "DESCRIBE", "DEPLOY", "ROLLBACK", "START", "STOP", "PAUSE",
        "RESUME",
    }
    if head not in _HEADS and not body.startswith("("):
        raise ValueError(f"unknown statement head {head or body[:12]!r}")
    if re.search(r"(?is)\bFROM\s*$", body):
        raise ValueError("FROM clause has no source")

    m = re.match(
        r"(?is)^CREATE\s+(?:(OR\s+REPLACE)\s+)?(STREAM|TABLE|VIEW)\s+"
        r"(?:(IF\s+NOT\s+EXISTS)\s+)?([\w.]+)\s*(.*)$",
        body,
    )
    if m:
        what = m.group(2).upper()
        kind = {
            "STREAM": "create_stream",
            "TABLE": "create_table",
            "VIEW": "create_view",
        }[what]
        rest = m.group(5).strip()
        columns = key_cols = None
        if rest.startswith("("):
            col_src, rest = _take_balanced(rest)
            columns, key_cols = _parse_column_defs(col_src)
            rest = rest.strip()
        # WITH may precede AS in the FR-094 doc form:
        # CREATE TABLE x (PRIMARY KEY (k)) WITH (...) AS SELECT ...
        wm = re.match(r"(?is)^WITH\s*\(", rest)
        if wm:
            w_inner, after = _take_balanced(rest[wm.end() - 1 :])
            _, mid_props, _ = _extract_with_props(f"X WITH ({w_inner})")
            props = {**mid_props, **props}
            rest = after.strip()
        # Registration sugar from the developer docs
        # (ADDING_SOURCES_AND_SINKS.md, configuration-api-reference.md):
        # `CREATE STREAM name FROM <uri>` / `FROM KAFKA '<uri>'` — the
        # source half of FR-047 bound to a name with no query. Unknown
        # schemes (the docs' redis:// example is a to-be-added connector)
        # still REGISTER; reading them errors at use, not at parse.
        fm = re.match(r"(?is)^FROM\s+(?:KAFKA\s+|FILE\s+)?(?:'([^']+)'|(\S+))\s*$", rest)
        if fm and kind != "create_view":
            uri = fm.group(1) or fm.group(2)
            if "://" in uri:
                return Statement(
                    kind=kind, name=m.group(4), select_sql=None,
                    with_props=props, key_fields=key_cols or [],
                    annotations=annotations, raw=sql, into=into,
                    schema_columns=columns, uri_sources={m.group(4): uri},
                    if_not_exists=bool(m.group(3)), or_replace=bool(m.group(1)),
                )
        am = re.match(r"(?is)^AS\s+(\S.*)$", rest)
        if am:
            sel, wc, emit, keys, rw, uris = translate_select_full(
                am.group(1), time_col
            )
            return Statement(
                kind=kind, name=m.group(4), select_sql=sel, emit=emit,
                window=wc, rows_window_aggs=rw,
                key_fields=key_cols or keys, with_props=props,
                annotations=annotations, raw=sql, into=into,
                uri_sources=uris, schema_columns=columns,
                if_not_exists=bool(m.group(3)), or_replace=bool(m.group(1)),
            )
        if rest:
            raise ValueError(f"malformed CREATE statement: {body[:40]!r}")
        # Registration-only form (no AS): the reference's quickstart /
        # hello-world docs register sources and sinks exactly like this
        # (`CREATE STREAM orders WITH ('topic' = ..., ...)` — its own
        # parser requires AS, commands.rs:43, but the shipped docs are the
        # user contract; doc-faithful extension like SESSION_START). A
        # typed column block with no query declares an empty typed table.
        if kind == "create_view":
            raise ValueError("CREATE VIEW requires AS <select>")
        if not props and not columns:
            raise ValueError(
                f"CREATE {what} without AS needs WITH properties or a "
                f"column schema: {body[:40]!r}"
            )
        return Statement(
            kind=kind, name=m.group(4), select_sql=None, with_props=props,
            key_fields=key_cols or [], annotations=annotations, raw=sql,
            into=into, schema_columns=columns,
            if_not_exists=bool(m.group(3)), or_replace=bool(m.group(1)),
        )

    m = re.match(
        r"(?is)^INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\))?\s*(VALUES\s*(.*)|SELECT\s.*)$",
        body,
    )
    if m:
        cols = [c.strip() for c in m.group(2).split(",")] if m.group(2) else None
        if m.group(3).upper().startswith("VALUES"):
            rows = []
            for grp in re.finditer(r"\(((?:[^()']|'[^']*'|\([^)]*\))*)\)", m.group(4)):
                rows.append([v.strip() for v in _split_top_level(grp.group(1))])
            return Statement(kind="insert", target=m.group(1), insert_columns=cols,
                             insert_values=rows, annotations=annotations, raw=sql)
        sel, _, _, _ = translate_select(m.group(3), time_col)
        return Statement(kind="insert", target=m.group(1), insert_columns=cols,
                         insert_select=sel, annotations=annotations, raw=sql)

    m = re.match(r"(?is)^UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$", body)
    if m:
        sets = {}
        for item in _split_top_level(m.group(2)):
            k, _, v = item.partition("=")
            sets[k.strip()] = _rewrite_functions(v.strip())
        where = _rewrite_functions(m.group(3).strip()) if m.group(3) else None
        return Statement(kind="update", target=m.group(1), set_clause=sets,
                         where_sql=where, annotations=annotations, raw=sql)

    m = re.match(r"(?is)^DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*))?$", body)
    if m:
        where = _rewrite_functions(m.group(2).strip()) if m.group(2) else None
        return Statement(kind="delete", target=m.group(1), where_sql=where,
                         annotations=annotations, raw=sql)

    # LIST is a full SHOW alias (parser common.rs:392: Show | List both
    # dispatch parse_show); QUERIES/QUERY are backward-compat aliases for
    # JOBS/JOB (tokenizer mod.rs:354,363).
    m = re.match(r"(?is)^(SHOW|LIST|DESCRIBE)\s+(.*)$", body)
    if m:
        what = m.group(2)
        what = re.sub(r"(?is)^QUERIES\b", "JOBS", what)
        what = re.sub(r"(?is)^QUERY\b", "JOB", what)
        # optional trailing filter: SHOW STREAMS ['prefix%'|LIKE 'pat%']
        # (commands.rs:312-328; %-wildcard semantics show.rs:406-431).
        # Extracted BEFORE uppercasing so the pattern keeps its case.
        pattern = None
        pm = re.search(r"(?is)\s+(?:LIKE\s+)?'([^']*)'\s*$", what)
        if pm:
            pattern = pm.group(1)
            what = what[: pm.start()]
        return Statement(kind="show", show_what=f"{m.group(1)} {what}".upper()
                         if m.group(1).upper() == "DESCRIBE" else what.upper(),
                         show_pattern=pattern,
                         annotations=annotations, raw=sql)

    # DEPLOY JOB name VERSION 'v' [STRATEGY BLUE_GREEN|CANARY(p%)|ROLLING|
    # REPLACE] AS <select> (ast.rs:344-352, display :2188)
    m = re.match(
        r"(?is)^DEPLOY\s+JOB\s+(\w+)\s+VERSION\s+'([^']+)'"
        r"(?:\s+STRATEGY\s+(BLUE_GREEN|ROLLING|REPLACE|CANARY\s*\(\s*(\d+)\s*%?\s*\)))?"
        r"\s+AS\s+(.*)$",
        body,
    )
    if m:
        strategy = (m.group(3) or "REPLACE").upper()
        canary_pct = int(m.group(4)) if m.group(4) else None
        if strategy.startswith("CANARY"):
            strategy = "CANARY"
        sel, wc, emit, keys, rw, uris = translate_select_full(m.group(5), time_col)
        return Statement(
            kind="deploy_job", name=m.group(1), select_sql=sel, emit=emit,
            window=wc, rows_window_aggs=rw, key_fields=keys, with_props=props,
            job_version=m.group(2), job_strategy=strategy.lower(),
            canary_pct=canary_pct, annotations=annotations, raw=sql, into=into,
            uri_sources=uris,
        )

    # ROLLBACK JOB name [VERSION 'v'] (commands.rs:502-507: bare VERSION,
    # no TO — the TO form is kept as a lenient alias)
    m = re.match(
        r"(?is)^ROLLBACK\s+JOB\s+(\w+)(?:\s+(?:TO\s+)?VERSION\s+'([^']+)')?\s*$",
        body,
    )
    if m:
        return Statement(kind="job", job_action="rollback", target=m.group(1),
                         job_version=m.group(2), annotations=annotations, raw=sql)

    # START JOB name AS <query> [WITH (...)] — the reference's DEFINING
    # form (commands.rs:332-360: name, AS, inner query, optional WITH
    # props): registers a named continuous job from the query and starts
    # it. The WITH clause was already extracted into `props` above.
    m = re.match(r"(?is)^START\s+(?:JOB|QUERY)\s+(\w+)\s+AS\s+(.*)$", body)
    if m:
        sel, wc, emit, keys, rw, uris = translate_select_full(m.group(2), time_col)
        return Statement(
            kind="start_job", name=m.group(1), select_sql=sel, emit=emit,
            window=wc, rows_window_aggs=rw, key_fields=keys, with_props=props,
            annotations=annotations, raw=sql, into=into, uri_sources=uris,
        )

    # QUERY is the backward-compat alias for JOB (tokenizer mod.rs:363);
    # STOP JOB name FORCE sets the force flag (commands.rs:373-378).
    m = re.match(
        r"(?is)^(START|STOP|PAUSE|RESUME|DEPLOY)\s+(?:JOB|QUERY)\s+(\w+)"
        r"(\s+FORCE)?\s*$",
        body,
    )
    if m:
        return Statement(kind="job", job_action=m.group(1).lower(), target=m.group(2),
                         job_force=bool(m.group(3)), annotations=annotations, raw=sql)

    # Every non-SELECT head has an arm above; reaching here with one means
    # its required clauses were missing (CREATE ... AS <nothing>,
    # INSERT with no VALUES/SELECT, bare SHOW) — the reference's parser
    # errors there too.
    if head not in ("SELECT", "WITH") and not body.startswith("("):
        raise ValueError(f"malformed {head} statement: {body[:40]!r}")

    # plain SELECT
    sel, wc, emit, keys, rw, uris = translate_select_full(body, time_col)
    return Statement(kind="select", select_sql=sel, emit=emit, window=wc,
                     rows_window_aggs=rw, key_fields=keys, with_props=props, into=into,
                     annotations=annotations, raw=sql, uri_sources=uris)


# -- EMIT CHANGES changelog (batch form) -------------------------------------

_AGG_NAME_RE = re.compile(
    r"(?is)\b(COUNT|SUM|AVG|MIN|MAX|STDDEV|STDDEV_POP|STDDEV_SAMP|"
    r"VARIANCE|VAR_POP|VAR_SAMP|FIRST|LAST|FIRST_VALUE|LAST_VALUE)\s*\("
)


def _top_level_find(s: str, pattern: str, start: int = 0) -> int:
    """Index of the first regex match at paren/quote depth 0, or -1."""
    rx = re.compile(pattern, re.IGNORECASE)
    depth, i = 0, start
    while i < len(s):
        ch = s[i]
        if ch in ("'", '"'):
            i = _skip_string(s, i)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = rx.match(s, i)
            if m:
                return i
        i += 1
    return -1


def _attach_over(item: str, window_name: str) -> tuple[str, int]:
    """Append ``OVER window_name`` to every aggregate call in a select item;
    returns (rewritten item, number of aggregates rewritten).

    Skips string literals, scalar subqueries (``(SELECT ...)`` regions are
    opaque — their aggregates keep subquery semantics), and aggregates that
    already carry an explicit OVER clause (appending again would produce
    invalid ``SUM(x) OVER __w OVER (...)``)."""
    out, i, n = [], 0, 0
    while i < len(item):
        ch = item[i]
        if ch in ("'", '"'):
            j = _skip_string(item, i)
            out.append(item[i:j])
            i = j
            continue
        if ch == "(" and re.match(r"\(\s*SELECT\b", item[i:], re.IGNORECASE):
            j = _match_paren(item, i + 1)
            out.append(item[i:j])
            i = j
            continue
        m = _AGG_NAME_RE.match(item, i)
        if not m:
            out.append(ch)
            i += 1
            continue
        close = _match_paren(item, m.end())
        call = item[i:close]
        if re.match(r"\s*OVER\b", item[close:], re.IGNORECASE):
            out.append(call)  # already windowed — leave its OVER intact
            i = close
            continue
        if re.search(r"(?is)\bDISTINCT\b", call):
            raise ValueError(
                "EMIT CHANGES changelog: DISTINCT aggregates are not "
                "window-expressible in batch form"
            )
        out.append(call + f" OVER {window_name}")
        n += 1
        i = close
    return "".join(out), n


def changelog_rewrite(spark_sql: str) -> str | None:
    """EMIT CHANGES cadence for a bounded GROUP BY query (reference
    select.rs:1534 ``handle_group_by_record`` + EmitMode::Changes,
    emission strategy window_v2/emission/emit_changes.rs): the reference
    emits the group's UPDATED aggregate row after every input record.

    Batch form: each aggregate becomes a cumulative window function
    partitioned by the group keys and ordered by arrival (input order via
    monotonically_increasing_id — partition-major, so file order), so output
    row i carries its group's state just after record i — exactly the
    changelog the reference's per-record loop writes to the sink. One output
    row per input row, no shuffle beyond the group-key hash partitioning
    WindowExec needs anyway.

    Returns None for queries without GROUP BY (stateless EMIT CHANGES is
    already per-record). HAVING follows the reference's per-emission
    semantics (select.rs:1782-1795): the updated group row is emitted only
    when the RUNNING aggregate satisfies the predicate — expressed by
    rewriting the HAVING aggregates to the same cumulative window and
    filtering emissions on it. Raises for DISTINCT-aggregate shapes, which
    have no faithful batch-window equivalent.
    """
    s = spark_sql.strip().rstrip(";")
    if not re.match(r"(?is)^\s*SELECT\b", s):
        return None
    gi = _top_level_find(s, r"\bGROUP\s+BY\b")
    if gi < 0:
        return None
    fi = _top_level_find(s, r"\bFROM\b")
    if fi < 0 or fi > gi:
        return None
    select_list = re.sub(r"(?is)^\s*SELECT\s+", "", s[:fi]).strip()
    src = s[fi + len("FROM") : gi].strip()
    tail = re.sub(r"(?is)^GROUP\s+BY\s*", "", s[gi:]).strip()
    # peel trailing ORDER BY / LIMIT off the group-key text — they apply to
    # the emitted changelog, not the window partitioning
    suffix = ""
    oi = _top_level_find(tail, r"\b(ORDER\s+BY|LIMIT)\b")
    if oi >= 0:
        suffix = " " + tail[oi:].strip()
        tail = tail[:oi].strip()
    having = None
    hi = _top_level_find(tail, r"\bHAVING\b")
    if hi >= 0:
        having = re.sub(r"(?is)^HAVING\s*", "", tail[hi:]).strip()
        tail = tail[:hi].strip()
    keys = tail
    # A grouping time-window key (WINDOW TUMBLING/SLIDING → `window(...)`
    # in GROUP BY) has no `window` struct in the changelog form — the
    # select list's TUMBLE_START/END rewrites (`window.start/end`) must
    # re-derive the bucket per row from the SAME window expression.
    wk = re.search(r"(?is)\bwindow\s*\(", keys)
    if wk is not None:
        wend = _match_paren(keys, wk.end())
        wexpr = keys[wk.start() : wend]
        select_list = re.sub(
            r"(?i)\bwindow\.(start|end)\b",
            lambda m: f"{wexpr}.{m.group(1).lower()}",
            select_list,
        )
    items, n_aggs = [], 0
    for it in _split_top_level(select_list):
        new, n = _attach_over(it.strip(), "__w")
        items.append(new)
        n_aggs += n
    if n_aggs == 0:
        return None
    if having is not None:
        having_over, _ = _attach_over(having, "__w")
        items.append(f"({having_over}) AS __vs_having")
    inner = (
        f"SELECT {', '.join(items)} FROM "
        f"(SELECT *, monotonically_increasing_id() AS __arrival FROM {src}) "
        f"__vs_changelog WINDOW __w AS (PARTITION BY {keys} ORDER BY "
        f"__arrival ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    if having is None:
        return inner + suffix
    return (
        f"SELECT * EXCEPT (__vs_having) FROM ({inner}) WHERE __vs_having"
        + suffix
    )


def first_from_table(select_sql: str) -> str | None:
    """The statement's driving FROM table, found by a TOP-LEVEL scan — a
    ``FROM`` inside parens (EXTRACT(MONTH FROM ts), SUBSTRING(x FROM 1),
    subqueries) is never it. Used to bind a statement-level ``config_file``
    to its source (engine) and to validate that binding (validator)."""
    pat = r"\bFROM\s+([a-zA-Z_]\w*)"
    i = _top_level_find(select_sql, pat)
    if i < 0:
        return None
    m = re.compile(pat, re.IGNORECASE).match(select_sql, i)
    return m.group(1) if m else None


# ---------------------------------------------------------------------------
# Schema-on-read missing columns (evaluator.rs:234, :520)

_IDENT_RE = re.compile(r"^[A-Za-z_]\w*(\.[A-Za-z_]\w*)*$")

#: Never null out a bare keyword: Spark can report e.g. `FROM` as an
#: unresolved "column" when parsing genuinely malformed SQL (SELECT FROM
#: WHERE), and rewriting it would mask the user's syntax error.
_NULLABLE_IDENT_STOPWORDS = frozenset(
    """select from where group order by having join on and or not as
    distinct limit union all inner left right full outer cross when then
    else end case between like in is null true false exists any some""".split()
)


def _blank_strings(s: str) -> str:
    """Length-preserving copy with string-literal contents blanked (parens
    kept — unlike _blank_nested, identifiers inside subqueries survive)."""
    out = list(s)
    in_str: str | None = None
    for i, ch in enumerate(s):
        if in_str:
            out[i] = " "
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
            out[i] = " "
    return "".join(out)


def null_out_identifier(sql: str, name: str) -> str | None:
    """Replace every standalone occurrence of column ``name`` with NULL —
    the reference's schema-on-read resolution for fields that don't exist
    (`evaluator.rs:234`, `:520`: "Return NULL if not found instead of
    error"). A bare top-level SELECT item keeps its output name via
    ``NULL AS name`` (the reference emits the field under the requested
    name). Returns None when ``name`` isn't a plain identifier or nothing
    matched (caller re-raises Spark's analysis error)."""
    if not _IDENT_RE.match(name):
        return None
    if any(p.lower() in _NULLABLE_IDENT_STOPWORDS for p in name.split(".")):
        return None
    last = name.rsplit(".", 1)[-1]
    pat = re.compile(
        r"(?<![\w.`$])" + re.escape(name) + r"(?![\w.`(])", re.IGNORECASE
    )
    # 1. Bare top-level SELECT items keep their output name.
    blanked = _blank_nested(sql)
    sm = re.search(r"(?i)\bSELECT\s+(DISTINCT\s+)?", blanked)
    fm = re.search(r"(?i)\sFROM\s", blanked)
    out = sql
    if sm and fm and sm.end() < fm.start():
        items = _split_top_level(sql[sm.end() : fm.start()])
        rewritten = [
            f"NULL AS {last}" if it.strip().lower() == name.lower() else it
            for it in items
        ]
        out = sql[: sm.end()] + ", ".join(x.strip() for x in rewritten) + sql[fm.start() :]
    # 2. Every other standalone occurrence (WHERE/HAVING/ORDER BY/subquery
    #    positions) becomes a bare NULL, matching the evaluator.
    masked = _blank_strings(out)
    spans = [
        m.span()
        for m in pat.finditer(masked)
        # alias-definition positions (`... AS name`) define a NEW name —
        # including the `NULL AS name` items injected above — never a
        # column reference to null out
        if not re.search(r"(?i)\bAS\s+$", masked[: m.start()])
    ]
    for a, b in reversed(spans):
        out = out[:a] + "NULL" + out[b:]
    return out if out != sql else None
