"""Property-based dialect tests (hypothesis) — the reference planned but
never implemented property tests (tests/property/mod.rs:1-22); the parser
shim gets them here: parsing invariants over generated durations,
identifiers, WITH properties, and top-level splitting."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from velostream_spark.sql import dialect
from velostream_spark.sql.dialect import (
    _split_top_level,
    parse_duration,
    parse_statement,
    split_statements,
    strip_comments,
)

# The exclusion set is derived from the implementation's OWN stopword set
# (dialect._NULLABLE_IDENT_STOPWORDS — the keywords null_out_identifier
# deliberately refuses to rewrite) plus the parser keywords the generated
# SQL templates use structurally. A hand-copied subset here drifted once:
# hypothesis drew name='oR' and demanded a rewrite the implementation's
# documented keyword-refusal contract forbids (round-8 verdict item 3).
_PARSER_KEYWORDS = {"key", "primary", "with", "emit", "window"}
IDENT = st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_]{0,20}", fullmatch=True).filter(
    lambda s: s.lower()
    not in (dialect._NULLABLE_IDENT_STOPWORDS | _PARSER_KEYWORDS)
)

UNITS = {
    "SECOND": "seconds", "MINUTE": "minutes", "HOUR": "hours", "DAY": "days",
    "SECONDS": "seconds", "MINUTES": "minutes", "HOURS": "hours", "DAYS": "days",
}


@given(n=st.integers(1, 10**6), unit=st.sampled_from(sorted(UNITS)))
def test_parse_duration_interval_form(n, unit):
    assert parse_duration(f"INTERVAL '{n}' {unit}") == f"{n} {UNITS[unit]}"
    assert parse_duration(f"{n} {unit.lower()}") == f"{n} {UNITS[unit]}"


@given(
    parts=st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters=",()'\"", min_codepoint=32,
                                   max_codepoint=126),
            min_size=1, max_size=15,
        ),
        min_size=1, max_size=6,
    )
)
def test_split_top_level_roundtrip(parts):
    joined = ",".join(parts)
    assert _split_top_level(joined) == parts


@given(inner=st.text(alphabet="ab,()", min_size=0, max_size=12))
def test_split_never_splits_inside_parens(inner):
    s = f"f({inner}"  # possibly unbalanced — splitter must not crash
    out = _split_top_level(s + ")")
    assert "".join(
        x + ("," if i < len(out) - 1 else "") for i, x in enumerate(out)
    ) == s + ")"


@given(name=IDENT, col=IDENT, table=IDENT)
@settings(max_examples=30)
def test_csas_roundtrip(name, col, table):
    st_ = parse_statement(
        f"CREATE STREAM {name} AS SELECT {col} FROM {table} EMIT CHANGES "
        f"WITH ('{table}.type' = 'file_source', '{table}.path' = '/x/y.csv');"
    )
    assert st_.kind == "create_stream"
    assert st_.name == name
    assert st_.emit == "changes"
    assert st_.with_props[f"{table}.type"] == "file_source"
    assert col in st_.select_sql and "EMIT" not in st_.select_sql.upper()


@given(col=IDENT, alias=IDENT)
@settings(max_examples=30)
def test_primary_key_extraction_properties(col, alias):
    st_ = parse_statement(
        f"SELECT {col} AS {alias} PRIMARY KEY, 1 AS one FROM t"
    )
    assert st_.key_fields == [alias]
    assert "PRIMARY" not in st_.select_sql.upper()
    assert re.search(rf"\b{re.escape(alias)}\b", st_.select_sql)


@given(comment=st.text(
    alphabet=st.characters(blacklist_characters="\n'", min_codepoint=32,
                           max_codepoint=126),
    max_size=30,
))
def test_comments_stripped_strings_preserved(comment):
    sql = f"SELECT 'lit--eral' AS s -- {comment}\nFROM t"
    cleaned, _ = strip_comments(sql)
    lines = cleaned.splitlines()
    assert lines[0].rstrip() == "SELECT 'lit--eral' AS s"
    assert lines[1] == "FROM t"


@given(n=st.integers(1, 5))
def test_split_statements_count(n):
    app = ";\n".join(f"SELECT {i} AS c FROM t" for i in range(n)) + ";"
    assert len(split_statements(app)) == n


def test_paren_matching_skips_string_literals():
    """A quoted unbalanced paren in a function argument must not corrupt
    the depth match of the OVER-clause probe, the function rewriter, or
    the DELTA rewrite (ADVICE r2)."""
    from velostream_spark.sql.dialect import (
        _call_name_before,
        _match_paren,
        _rewrite_functions,
        _rewrite_over_clauses,
    )

    # _match_paren: close paren inside the string is skipped
    s = "(regexp_extract(s, '([', 1))"
    assert _match_paren(s, 1) == len(s)
    # doubled-quote escape inside the literal
    s2 = "(f('it''s )( fine'))"
    assert _call_name_before(s2[1:-1] + " ") == "f"

    # _call_name_before sees LAG, not a corrupted span
    prefix = "SELECT LAG(regexp_extract(s, '([', 1)) "
    assert _call_name_before(prefix) == "LAG"

    # end-to-end: OVER rewrite leaves the quoted paren intact and still
    # finds the window spec
    sql = (
        "SELECT LAG(regexp_extract(s, '([', 1)) "
        "OVER (PARTITION BY k ORDER BY t) AS x FROM tbl"
    )
    out = _rewrite_over_clauses(sql)
    assert "'(['" in out and "PARTITION BY k ORDER BY t" in out

    # function rewriter: quoted parens in a rewritable call's args
    out2 = _rewrite_functions("SELECT JSON_EXTRACT(payload, '$.a(') AS v FROM t")
    assert out2 == "SELECT get_json_object(payload, '$.a(') AS v FROM t"


# ---------------------------------------------------------------------------
# Rewrite-loop termination: _rewrite_functions re-scans its replacements, so
# any rule whose output re-matches _FN_CALL_RE must be re-scan-stable. Two
# real bugs of this class existed transiently in round 6 (SPLIT emitting
# concat(, REGEXP_REPLACE re-matching itself) — generate random nestings of
# every rewritable function and require termination + idempotence.
# ---------------------------------------------------------------------------

_REWRITABLE_CALLS = st.sampled_from([
    "CONCAT({a}, {b})",
    "CONCAT({a}, NULL, {b})",
    "SPLIT({a}, '.')",
    "SPLIT({a}, {b})",
    "SPLIT_PART({a}, ',', 2)",
    "REGEXP_REPLACE({a}, '[0-9]', 'x', 'g')",
    "REGEXP_REPLACE({a}, '[0-9]', 'x')",
    "REGEXP_REPLACE({a}, {b}, 'x', 'gi')",
    "DATE_FORMAT({a}, '%Y-%m-%d %H:%M:%S')",
    "DATE_FORMAT({a}, 'yyyy-MM-dd')",
    "JSON_EXTRACT({a}, '$.k')",
    "LISTAGG({a}, ',')",
    "JOIN('-', {a}, 'x')",
    "SPLIT_PART({a}, ',', {b})",
    "ARRAY_LENGTH({a})",
    "SET_HEADER('k', {a})",
    "HEADER('k')",
    "LEN({a})",
    "NOW()",
    "EXTRACT('DOW', {a})",
    "EXTRACT(DAYOFWEEK FROM {a})",
    "EXTRACT('EPOCH', {a})",
    "GROUP_CONCAT({a})",
    "COLLECT({a})",
    # round-7 rewrites: CAST target normalization + fixed-duration intervals
    "CAST({a} AS FLOAT)",
    "CAST({a} AS DECIMAL)",
    "TRY_CAST({a} AS VARCHAR)",
    "CAST({a} AS SCALED_INTEGER)",
    "CAST('2024/03/15' AS DATE)",
    "COALESCE({a}, {a} + INTERVAL '2' MONTH)",
    "COALESCE({a}, {a} + INTERVAL '1' YEAR)",
    "COALESCE({a}, {a} + INTERVAL '1500' MICROSECOND)",
    # multi-format column casts: emitted coalesce(try_cast..) chain must be
    # a fixed point (the TRY_CAST first arm re-matches the scanner)
    "CAST({a} AS DATE)",
    "TRY_CAST({a} AS TIMESTAMP)",
    "CAST(CAST({a} AS DATE) AS TIMESTAMP)",
])


@given(outer=_REWRITABLE_CALLS, mid=_REWRITABLE_CALLS, inner=_REWRITABLE_CALLS)
@settings(max_examples=120, deadline=None)
def test_rewrite_functions_terminates_and_is_idempotent(outer, mid, inner):
    expr = outer.format(a=mid.format(a=inner.format(a="c1", b="c2"), b="c2"),
                        b="c3")
    sql = f"SELECT {expr} AS r FROM t"
    once = dialect._rewrite_functions(sql)      # must terminate
    twice = dialect._rewrite_functions(once)    # and be a fixed point
    assert twice == once


# ---------------------------------------------------------------------------
# URI extraction properties (FR-047)
# ---------------------------------------------------------------------------


@given(name=IDENT, col=IDENT)
@settings(max_examples=40)
def test_uri_extraction_identity_without_uris(name, col):
    """SQL with no :// is untouched and yields no URI sources."""
    sql = f"SELECT {col} FROM {name} WHERE {col} > 0"
    out, uris = dialect._extract_uri_sources(sql)
    assert out == sql and uris == {}


@given(
    path=st.from_regex(r"/[a-z0-9_]{1,8}/[a-z0-9_]{1,8}\.(csv|json)", fullmatch=True),
    col=IDENT,
)
@settings(max_examples=40)
def test_uri_extraction_idempotent(path, col):
    """Extracting twice is a fixed point (the view name has no ://)."""
    sql = f"SELECT {col} FROM file://{path} WHERE {col} IS NOT NULL"
    out1, uris1 = dialect._extract_uri_sources(sql)
    out2, uris2 = dialect._extract_uri_sources(out1)
    assert out2 == out1 and uris2 == {}
    assert list(uris1.values()) == [f"file://{path}"]
    (view,) = uris1
    assert view.isidentifier() and f"FROM {view}" in out1


# ---------------------------------------------------------------------------
# Full-translate idempotence over OVER-clause shapes: the value-function
# frame pass inserts a ROWS frame whose presence must suppress re-insertion,
# and epoch-millis promotion wraps literals whose output must not re-match.
# ---------------------------------------------------------------------------

_OVER_SHAPES = st.sampled_from([
    "LAST_VALUE({a}) OVER (PARTITION BY g ORDER BY t)",
    "NTH_VALUE({a}, 2) OVER (ORDER BY t)",
    "LAST_VALUE({a}) OVER (ORDER BY t ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)",
    "FIRST_VALUE({a}) OVER (PARTITION BY g ORDER BY t)",
    "SUM({a}) OVER (ORDER BY t)",
])


@given(shape=_OVER_SHAPES, col=st.sampled_from(["c1", "UPPER(c1)", "c1 + 1"]))
@settings(max_examples=60, deadline=None)
def test_translate_select_over_clauses_idempotent(shape, col):
    sql = (
        f"SELECT {shape.format(a=col)} AS r FROM t "
        "WHERE _event_time > 1697296245000"
    )
    once, *_ = dialect.translate_select(sql)
    twice, *_ = dialect.translate_select(once)
    assert twice == once
    assert "timestamp_millis(1697296245000)" in once


# ---------------------------------------------------------------------------
# Round-7 passes: ungrouped-first wrapping and the validator's function-name
# scanner must terminate, stay idempotent, and never raise on odd-but-legal
# query shapes.
# ---------------------------------------------------------------------------

_GB_ITEMS = st.sampled_from([
    "sym", "price", "t.price AS px", "UPPER(sym) AS us", "COUNT(*) AS n",
    "SUM(v) AS tot", "price", "_window_start", "session_window.start",
    "sym AS s",
])
_GB_KEYS = st.sampled_from(["sym", "s", "UPPER(sym)", "sym, region"])


@given(a=_GB_ITEMS, b=_GB_ITEMS, key=_GB_KEYS,
       tail=st.sampled_from(["", " HAVING COUNT(*) > 1", " ORDER BY 1 LIMIT 5",
                             " WINDOW TUMBLING(INTERVAL '5' MINUTE)"]))
@settings(max_examples=120, deadline=None)
def test_translate_group_by_shapes_idempotent(a, b, key, tail):
    sql = f"SELECT {a}, {b} FROM trades t GROUP BY {key}{tail}"
    once, *_ = dialect.translate_select(sql)
    twice, *_ = dialect.translate_select(once)
    assert twice == once
    # a bare grouped key is never first()-wrapped
    if a == "sym" and key.startswith("sym"):
        assert "first(sym)" not in once


@given(text=st.text(alphabet="abcXY_ (),.'\"%*=<>1\n", min_size=0, max_size=80))
@settings(max_examples=200, deadline=None)
def test_validator_function_scan_never_raises(text):
    from velostream_spark.sql.validator import (
        ValidationReport,
        _validate_function_names,
    )

    rep = ValidationReport()
    _validate_function_names(f"SELECT {text} FROM t", rep, strict=True)
    # errors/warnings are fine; crashing or hanging is not
    assert isinstance(rep.errors, list)


@given(name=IDENT, other=IDENT, lit=IDENT)
@settings(max_examples=60, deadline=None)
def test_null_out_identifier_properties(name, other, lit):
    """Schema-on-read NULL rewrite (evaluator.rs:234): every standalone
    occurrence of the target is replaced, other identifiers and string
    literals are untouched, a bare SELECT item keeps its output name, and
    a second pass over the result finds nothing left to rewrite."""
    from velostream_spark.sql.dialect import null_out_identifier

    if name.lower() in (other.lower(), lit.lower()):
        return
    sql = (
        f"SELECT {other}, {name} FROM t "
        f"WHERE {name} = '{lit}' AND {other} > 1 ORDER BY {name}"
    )
    out = null_out_identifier(sql, name)
    assert out is not None
    blanked = dialect._blank_strings(out)
    assert not re.search(
        rf"(?<![\w.])(?<!AS ){re.escape(name)}(?![\w.])", blanked, re.IGNORECASE
    ), out
    assert f"NULL AS {name}" in out
    assert f"'{lit}'" in out  # string literal preserved
    assert re.search(rf"\b{re.escape(other)}\b", out)  # other column intact
    # fixpoint: nothing left to rewrite on a second pass
    assert null_out_identifier(out, name) is None


@given(kw=st.sampled_from(["FROM", "WHERE", "SELECT", "AND", "NOT", "AS"]))
@settings(max_examples=12, deadline=None)
def test_null_out_identifier_refuses_keywords(kw):
    from velostream_spark.sql.dialect import null_out_identifier

    assert null_out_identifier(f"SELECT {kw} FROM t", kw) is None
    assert null_out_identifier("SELECT a FROM t", kw.lower()) is None


_KEYWORDISH = {"with", "as", "from", "select", "where", "into"}
_PROP_KEY = st.one_of(
    IDENT.filter(lambda s: s.lower() not in _KEYWORDISH),  # bare (doc form)
    st.from_regex(r"[a-z][a-z0-9_]{0,8}(\.[a-z][a-z0-9_]{0,8}){1,2}", fullmatch=True),
)
_PROP_VAL = st.one_of(
    st.from_regex(r"[a-zA-Z0-9_./:-]{1,24}", fullmatch=True),          # scalar
    st.lists(st.from_regex(r"[a-z0-9_]{1,8}", fullmatch=True), min_size=1,
             max_size=4).map(lambda xs: "[" + ", ".join(f"'{x}'" for x in xs) + "]"),
)


@given(props=st.dictionaries(_PROP_KEY, _PROP_VAL, min_size=1, max_size=6),
       quote=st.sampled_from(["'", '"', ""]))
@settings(max_examples=40, deadline=None)
def test_with_props_roundtrip(props, quote):
    """Every key spelling the docs use (quoted either style, bare) and
    every value shape (quoted, bare scalar, array literal) must extract
    verbatim, and the statement body must come back WITH-free."""
    pairs = ", ".join(
        f"{quote}{k}{quote} = '{v}'" if not v.startswith("[") else
        f"{quote}{k}{quote} = {v}"
        for k, v in props.items()
    )
    sql = f"SELECT a FROM t WITH ({pairs})"
    body, got, _into = dialect._extract_with_props(sql)
    assert got == props, (sql, got)
    assert "WITH" not in body.upper()


def test_delta_scope_truncated_at_set_op_boundaries():
    """A GROUP BY in a SIBLING set-operation branch must not classify
    this branch's DELTA as aggregate (ADVICE r9): each SELECT of a
    UNION/INTERSECT/EXCEPT is its own grouping scope."""
    from velostream_spark.sql.dialect import _rewrite_delta

    # ungrouped branch BEFORE a grouped sibling → per-record form
    out = _rewrite_delta(
        "SELECT DELTA(x) FROM a UNION ALL SELECT MAX(y) FROM b GROUP BY y"
    )
    assert "(x - x)" in out and "MAX(x)" not in out, out

    # ungrouped branch AFTER a grouped sibling → per-record form
    out = _rewrite_delta(
        "SELECT MAX(y) FROM b GROUP BY y UNION ALL SELECT DELTA(x) FROM a"
    )
    assert "(x - x)" in out and "MAX(x)" not in out, out

    # grouped branch keeps the aggregate form even with ungrouped siblings
    out = _rewrite_delta(
        "SELECT y FROM b UNION ALL SELECT DELTA(x) FROM a GROUP BY k"
    )
    assert "(MAX(x) - MIN(x))" in out, out

    # parenthesized set-op scope: sibling GROUP BY still must not leak
    out = _rewrite_delta(
        "SELECT * FROM (SELECT DELTA(x) AS d FROM a UNION ALL "
        "SELECT MAX(y) FROM b GROUP BY y) s"
    )
    assert "(x - x)" in out and "MAX(x)" not in out, out

    # both branches grouped: both DELTAs aggregate
    out = _rewrite_delta(
        "SELECT DELTA(x) FROM a GROUP BY k UNION SELECT DELTA(z) FROM b GROUP BY j"
    )
    assert "(MAX(x) - MIN(x))" in out and "(MAX(z) - MIN(z))" in out, out
