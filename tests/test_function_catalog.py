"""Exhaustive conformance test for the reference's scalar/aggregate
function registry (SURVEY §2.9): every name registered via
register_sql_function! in
src/velostream/sql/execution/expression/functions.rs (plus its aliases)
must evaluate through the dialect with the documented semantics.

One test per function family keeps failures attributable; expressions
run through SqlEngine.execute (the dialect path a reference user's SQL
takes), not raw spark.sql.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest


@pytest.fixture(scope="module")
def eng(spark):
    from velostream_spark.sql.engine import SqlEngine

    eng = SqlEngine(spark)
    rows = [
        (1, -3.7, "  Hello World  ", dt.datetime(2026, 3, 5, 12, 30, 45),
         ["a", "b", "c"], {"k1": "v1", "k2": "v2"},
         json.dumps({"a": {"b": 7}, "arr": [1, 2, 3]}), 10.0, 1.0),
        (2, 2.5, "spark", dt.datetime(2026, 3, 6, 1, 2, 3),
         ["x"], {"k": "v"}, json.dumps({"a": {"b": 8}, "arr": []}), 20.0, 2.0),
        (3, 9.0, "velo,stream,sql", dt.datetime(2026, 3, 7, 23, 59, 59),
         [], {}, "null", 30.0, 2.0),
        (4, 16.0, "abcdef", dt.datetime(2026, 3, 8, 0, 0, 1),
         ["p", "q"], {"a": "1"}, json.dumps({"a": {"b": None}}), 40.0, 4.0),
    ]
    df = spark.createDataFrame(
        rows,
        "i int, x double, s string, ts timestamp, arr array<string>, "
        "m map<string,string>, js string, y double, g double",
    )
    eng.register_stream("t", df)
    return eng


def _one(eng, expr: str, where: str = "i = 1"):
    df = eng.execute(f"SELECT {expr} AS r FROM t WHERE {where}")
    return df.collect()[0]["r"]


def _agg(eng, expr: str):
    df = eng.execute(f"SELECT {expr} AS r FROM t")
    return df.collect()[0]["r"]


# ---------------------------------------------------------------------------
# Math: ABS ROUND CEIL/CEILING FLOOR SQRT POWER/POW MOD LEAST GREATEST
# ---------------------------------------------------------------------------


def test_math_functions(eng):
    assert _one(eng, "ABS(x)") == 3.7
    assert _one(eng, "ROUND(x, 1)") == -3.7
    assert _one(eng, "CEIL(x)") == -3.0
    assert _one(eng, "CEILING(x)") == -3.0
    assert _one(eng, "FLOOR(x)") == -4.0
    assert _one(eng, "SQRT(16.0)") == 4.0
    assert _one(eng, "POWER(2, 10)") == 1024.0
    assert _one(eng, "POW(2, 3)") == 8.0
    assert _one(eng, "MOD(10, 3)") == 1
    assert _one(eng, "LEAST(3, 1, 2)") == 1
    assert _one(eng, "GREATEST(3, 1, 2)") == 3
    # NULL-skipping agreement: the reference's compare_values_for_min/max
    # (functions.rs:2531-2613) treat NULL as never-winning — "NULL is not
    # less than anything / anything is less than NULL" — which is exactly
    # Spark's least()/greatest() null-skip; all-NULL args stay NULL in both.
    assert _one(eng, "LEAST(3, NULL, 1)") == 1
    assert _one(eng, "GREATEST(3, NULL, 1)") == 3
    assert _one(eng, "LEAST(NULL, NULL)") is None


# ---------------------------------------------------------------------------
# String: UPPER LOWER SUBSTRING REPLACE TRIM LTRIM RTRIM LENGTH/LEN CONCAT
#         SPLIT JOIN LEFT RIGHT POSITION REGEXP REGEXP_REPLACE SPLIT_PART
# ---------------------------------------------------------------------------


def test_string_functions(eng):
    assert _one(eng, "UPPER(s)", "i = 2") == "SPARK"
    assert _one(eng, "LOWER('ABC')") == "abc"
    assert _one(eng, "SUBSTRING(s, 1, 3)", "i = 2") == "spa"
    assert _one(eng, "REPLACE(s, 'spark', 'x')", "i = 2") == "x"
    assert _one(eng, "TRIM(s)") == "Hello World"
    assert _one(eng, "LTRIM(s)") == "Hello World  "
    assert _one(eng, "RTRIM(s)") == "  Hello World"
    assert _one(eng, "LENGTH(s)", "i = 2") == 5
    assert _one(eng, "LEN(s)", "i = 2") == 5
    assert _one(eng, "CONCAT(s, '!')", "i = 2") == "spark!"
    assert _one(eng, "SPLIT(s, ',')", "i = 3") == ["velo", "stream", "sql"]
    # JOIN(sep, v1, ..., vn) — DELIMITER-FIRST variadic
    # (functions.rs:1001-1043); NULL values become the literal 'NULL'
    assert _one(eng, "JOIN('-', 'a', 'b', 'c')") == "a-b-c"
    assert _one(eng, "JOIN(',', s, 'x')", "i = 2") == "spark,x"
    assert _one(eng, "JOIN(',', 'a', NULL, 'b')") == "a,NULL,b"
    assert _one(eng, "JOIN(':', i, x)", "i = 2") == "2:2.5"
    assert _one(eng, "LEFT(s, 2)", "i = 2") == "sp"
    assert _one(eng, "RIGHT(s, 2)", "i = 2") == "rk"
    assert _one(eng, "POSITION('ar' IN s)", "i = 2") == 3
    assert _one(eng, "POSITION('ar', s)", "i = 2") == 3
    # REGEXP(str, pattern) — boolean full/partial match (functions.rs:3484)
    assert _one(eng, "REGEXP(s, '^sp.*k$')", "i = 2") is True
    assert _one(eng, "REGEXP_REPLACE(s, '[aeiou]', '_')", "i = 2") == "sp_rk"
    assert _one(eng, "SPLIT_PART(s, ',', 2)", "i = 3") == "stream"


# ---------------------------------------------------------------------------
# Date/time: NOW CURRENT_TIMESTAMP TIMESTAMP EXTRACT DATE_FORMAT DATEDIFF
#            FROM_UNIXTIME UNIX_TIMESTAMP
# ---------------------------------------------------------------------------


def test_datetime_functions(eng):
    assert _one(eng, "EXTRACT(YEAR FROM ts)") == 2026
    assert _one(eng, "EXTRACT('MONTH', ts)") == 3
    assert _one(eng, "EXTRACT(EPOCH FROM ts)") == dt.datetime(
        2026, 3, 5, 12, 30, 45
    ).replace(tzinfo=dt.timezone.utc).timestamp()
    assert _one(eng, "DATE_FORMAT(ts, 'yyyy-MM-dd')") == "2026-03-05"
    # reference 'days' unit compares calendar DATES ignoring time
    # (functions.rs:1998-2003) -> 2026-03-10 minus 2026-03-05 = 5
    assert _one(eng, "DATEDIFF('days', ts, TIMESTAMP '2026-03-10 00:00:00')") == 5
    assert _one(eng, "FROM_UNIXTIME(0)").startswith("1970-01-01")
    assert _one(eng, "UNIX_TIMESTAMP(ts)") == int(
        dt.datetime(2026, 3, 5, 12, 30, 45).replace(tzinfo=dt.timezone.utc).timestamp()
    )
    # NOW()/CURRENT_TIMESTAMP: nondeterministic — assert they evaluate
    assert _one(eng, "NOW()") is not None
    assert _one(eng, "CURRENT_TIMESTAMP") is not None


# ---------------------------------------------------------------------------
# Conditional / util: COALESCE NULLIF CAST
# ---------------------------------------------------------------------------


def test_conditional_functions(eng):
    assert _one(eng, "COALESCE(NULL, NULL, 'z')") == "z"
    assert _one(eng, "NULLIF(1, 1)") is None
    assert _one(eng, "NULLIF(2, 1)") == 2
    assert _one(eng, "CAST(x AS STRING)", "i = 2") == "2.5"
    assert _one(eng, "CAST('42' AS INTEGER)") == 42


# ---------------------------------------------------------------------------
# JSON: JSON_EXTRACT JSON_VALUE JSON_EXISTS JSON_QUERY
# ---------------------------------------------------------------------------


def test_json_functions(eng):
    assert _one(eng, "JSON_VALUE(js, '$.a.b')") == "7"
    assert _one(eng, "JSON_EXTRACT(js, '$.a.b')") == "7"
    assert _one(eng, "JSON_EXISTS(js, '$.a.b')") is True
    assert _one(eng, "JSON_EXISTS(js, '$.zzz')") is False
    assert _one(eng, "JSON_QUERY(js, '$.arr')") == "[1,2,3]"


# ---------------------------------------------------------------------------
# Array/Map/Struct: ARRAY STRUCT MAP ARRAY_LENGTH ARRAY_CONTAINS MAP_KEYS
#                   MAP_VALUES
# ---------------------------------------------------------------------------


def test_collection_functions(eng):
    assert _one(eng, "ARRAY(1, 2, 3)") == [1, 2, 3]
    assert _one(eng, "ARRAY_LENGTH(arr)") == 3
    assert _one(eng, "ARRAY_CONTAINS(arr, 'b')") is True
    assert sorted(_one(eng, "MAP_KEYS(m)")) == ["k1", "k2"]
    assert sorted(_one(eng, "MAP_VALUES(m)")) == ["v1", "v2"]
    st = _one(eng, "STRUCT(i, s)")
    assert st["i"] == 1
    m = _one(eng, "MAP('a', 1, 'b', 2)")
    assert m == {"a": 1, "b": 2}


# ---------------------------------------------------------------------------
# Aggregates: COUNT SUM AVG MIN MAX COUNT_DISTINCT APPROX_COUNT_DISTINCT
#   STDDEV/STDDEV_POP/STDDEV_SAMP VARIANCE/VAR_POP/VAR_SAMP CORR
#   COVAR_POP COVAR_SAMP REGR_SLOPE REGR_INTERCEPT REGR_R2 MEDIAN
#   PERCENTILE_CONT PERCENTILE_DISC FIRST_VALUE LAST_VALUE
#   STRING_AGG/GROUP_CONCAT/LISTAGG DELTA
# ---------------------------------------------------------------------------


def test_basic_aggregates(eng):
    assert _agg(eng, "COUNT(*)") == 4
    assert _agg(eng, "SUM(i)") == 10
    assert _agg(eng, "AVG(y)") == 25.0
    assert _agg(eng, "MIN(i)") == 1
    assert _agg(eng, "MAX(i)") == 4
    assert _agg(eng, "COUNT_DISTINCT(g)") == 3
    assert _agg(eng, "APPROX_COUNT_DISTINCT(g)") == 3


def test_statistical_aggregates(eng):
    import statistics

    ys = [10.0, 20.0, 30.0, 40.0]
    assert _agg(eng, "ROUND(STDDEV(y), 6)") == round(statistics.stdev(ys), 6)
    assert _agg(eng, "ROUND(STDDEV_POP(y), 6)") == round(statistics.pstdev(ys), 6)
    assert _agg(eng, "ROUND(STDDEV_SAMP(y), 6)") == round(statistics.stdev(ys), 6)
    assert _agg(eng, "ROUND(VARIANCE(y), 6)") == round(statistics.variance(ys), 6)
    assert _agg(eng, "ROUND(VAR_POP(y), 6)") == round(statistics.pvariance(ys), 6)
    assert _agg(eng, "ROUND(CORR(y, CAST(i AS DOUBLE)), 6)") == 1.0
    assert _agg(eng, "ROUND(COVAR_POP(y, y), 2)") == round(
        statistics.pvariance(ys), 2
    )
    assert _agg(eng, "ROUND(COVAR_SAMP(y, y), 2)") == round(
        statistics.variance(ys), 2
    )
    assert _agg(eng, "ROUND(REGR_SLOPE(y, CAST(i AS DOUBLE)), 6)") == 10.0
    assert _agg(eng, "ROUND(REGR_INTERCEPT(y, CAST(i AS DOUBLE)), 6)") == 0.0
    assert _agg(eng, "ROUND(REGR_R2(y, CAST(i AS DOUBLE)), 6)") == 1.0


def test_percentile_aggregates(eng):
    assert _agg(eng, "MEDIAN(y)") == 25.0
    assert _agg(eng, "PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY y)") == 25.0
    assert _agg(eng, "PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY y)") == 20.0


def test_string_aggregates(eng):
    assert _agg(eng, "STRING_AGG(CAST(i AS STRING), ',')") == "1,2,3,4"
    assert _agg(eng, "GROUP_CONCAT(CAST(i AS STRING), ',')") == "1,2,3,4"
    assert _agg(eng, "LISTAGG(CAST(i AS STRING), ',')") == "1,2,3,4"


def test_window_value_functions(eng):
    df = eng.execute(
        "SELECT i, FIRST_VALUE(y) OVER (ORDER BY i) AS fv, "
        "LAST_VALUE(y) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND UNBOUNDED FOLLOWING) AS lv, "
        "DELTA(y) OVER (ORDER BY i) AS d "
        "FROM t"
    )
    rows = {r["i"]: r for r in df.collect()}
    assert rows[3]["fv"] == 10.0
    assert rows[3]["lv"] == 40.0
    assert rows[1]["d"] is None
    assert rows[3]["d"] == 10.0


# ---------------------------------------------------------------------------
# Kafka-header functions: HEADER HEADER_KEYS HAS_HEADER SET_HEADER
#                         REMOVE_HEADER
# ---------------------------------------------------------------------------


def test_header_functions(eng, spark):
    from velostream_spark.sql.engine import SqlEngine

    e2 = SqlEngine(spark)
    df = spark.createDataFrame(
        [(1, [("src", bytearray(b"iot")), ("v", bytearray(b"2"))])],
        "i int, headers array<struct<key string, value binary>>",
    )
    e2.register_stream("h", df)
    assert (
        e2.execute("SELECT HEADER('src') AS r FROM h").collect()[0]["r"] == "iot"
    )
    assert e2.execute("SELECT HAS_HEADER('src') AS r FROM h").collect()[0]["r"]
    assert sorted(
        e2.execute("SELECT HEADER_KEYS() AS r FROM h").collect()[0]["r"]
    ) == ["src", "v"]
    out = e2.execute(
        "SELECT SET_HEADER('env', 'prod') AS r FROM h"
    ).collect()[0]["r"]
    assert ("env", bytearray(b"prod")) in [(x["key"], x["value"]) for x in out]
    out = e2.execute("SELECT REMOVE_HEADER('v') AS r FROM h").collect()[0]["r"]
    assert [x["key"] for x in out] == ["src"]


# ---------------------------------------------------------------------------
# Windowed-time helpers: TUMBLE_START TUMBLE_END (dialect WINDOW clause)
# ---------------------------------------------------------------------------


def test_tumble_bounds(eng, spark):
    from velostream_spark.sql.engine import SqlEngine

    e2 = SqlEngine(spark, time_col="ts")
    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 3, 5, 12, 2, 0)), (2, dt.datetime(2026, 3, 5, 12, 8, 0))],
        "i int, ts timestamp",
    )
    e2.register_stream("w", df)
    rows = e2.execute(
        "SELECT TUMBLE_START() AS ws, TUMBLE_END() AS we, COUNT(*) AS n "
        "FROM w WINDOW TUMBLING(INTERVAL '5' MINUTE) EMIT FINAL"
    ).collect()
    # INT64 epoch-millis (functions.rs:2347 reads _WINDOW_START, an
    # Integer-millis field; system-columns.md contract)
    got = {
        (
            dt.datetime.fromtimestamp(r["ws"] / 1000).minute,
            dt.datetime.fromtimestamp(r["we"] / 1000).minute,
        )
        for r in rows
    }
    assert got == {(0, 5), (5, 10)}
    assert all(
        isinstance(r["ws"], int) and r["we"] - r["ws"] == 300_000 for r in rows
    )


# ---------------------------------------------------------------------------
# TIMESTAMP() — the record's processing timestamp (functions.rs:3533)
# ---------------------------------------------------------------------------


def test_timestamp_function(eng):
    # zero-arg TIMESTAMP() = record processing time; one-arg = parse
    assert _one(eng, "TIMESTAMP('2026-03-05 12:30:45')") == dt.datetime(
        2026, 3, 5, 12, 30, 45
    )
    assert _one(eng, "TIMESTAMP()") is not None


def test_concat_ignores_nulls_like_reference(eng):
    """functions.rs:1419-1437: CONCAT skips NULL arguments and stringifies
    scalars — Spark's native concat() would return NULL for any NULL arg,
    so the dialect rewrites CONCAT → concat_ws('')."""
    assert _one(eng, "CONCAT('a', NULL, 'b')") == "ab"
    assert _one(eng, "CONCAT(NULL, NULL)") == ""
    assert _one(eng, "CONCAT('n=', i)") == "n=1"
    assert _one(eng, "CONCAT('v', CONCAT(NULL, i))") == "v1"


def test_date_format_accepts_strftime_patterns(eng):
    """functions.rs:2377-2403 formats through chrono strftime, and the
    reference's SQL corpus writes DATE_FORMAT(ts, '%Y-%m-%d ...') — the
    dialect translates strftime to Spark's Java patterns (Java would
    throw or emit garbage on a bare %Y)."""
    assert _one(eng, "DATE_FORMAT(ts, '%Y-%m-%d %H:%M:%S')") == (
        "2026-03-05 12:30:45"
    )
    assert _one(eng, "DATE_FORMAT(ts, '%Y-%m')") == "2026-03"
    assert _one(eng, "DATE_FORMAT(ts, '%Y-%m-%d %H:00:00')") == (
        "2026-03-05 12:00:00"
    )
    assert _one(eng, "DATE_FORMAT(ts, '%a, %b %d, %Y')") == "Thu, Mar 05, 2026"
    assert _one(eng, "DATE_FORMAT(ts, '%I:%M %p')") == "12:30 PM"
    # Java-style literals (no %) still pass through untouched
    assert _one(eng, "DATE_FORMAT(ts, 'yyyy-MM-dd')") == "2026-03-05"


def test_split_treats_delimiter_literally(eng):
    """functions.rs split_function: s.split(&d) is a LITERAL split; Spark's
    split() is regex. '.' and '|' are the classic foot-guns."""
    assert _one(eng, "SPLIT('a.b.c', '.')") == ["a", "b", "c"]
    assert _one(eng, "SPLIT('x|y|z', '|')") == ["x", "y", "z"]
    assert _one(eng, "SPLIT(s, ',')", "i = 3") == ["velo", "stream", "sql"]
    assert (
        _one(eng, "JOIN('-', SPLIT_PART('a.b', '.', 1), SPLIT_PART('a.b', '.', 2))")
        == "a-b"
    )


def test_regexp_replace_flags_and_first_match_default(eng):
    """functions.rs:784-867: REGEXP_REPLACE replaces the FIRST match by
    default and takes flags ('g' global, 'i' case-insensitive). Spark's
    4th arg is a position int, so the corpus's (x, p, r, 'g') form used
    to return NULL silently, and the 3-arg form replaced all matches."""
    assert _one(eng, "REGEXP_REPLACE('b4n4n4', '[0-9]', 'x', 'g')") == "bxnxnx"
    assert _one(eng, "REGEXP_REPLACE('b4n4n4', '[0-9]', 'x')") == "bxn4n4"
    assert _one(eng, "REGEXP_REPLACE('b4n4n4', 'B', 'Z', 'gi')") == "Z4n4n4"
    assert _one(eng, "REGEXP_REPLACE('b4n4n4', 'N', 'Z', 'i')") == "b4Z4n4"
    # literal $N backrefs survive the head-group shift
    assert _one(eng, "REGEXP_REPLACE('ab', '(a)', '[$1]')") == "[a]b"
    assert _one(eng, "REGEXP_REPLACE('xbyb', 'b|y', '_')") == "x_yb"
    assert _one(eng, "REGEXP_REPLACE('abc', 'zz', 'x')") == "abc"
    # corpus shape (data cleaning): strip non-digits globally
    assert _one(
        eng, "REGEXP_REPLACE('(555) 123-4567', '[^0-9]', '', 'g')"
    ) == "5551234567"


def test_string_agg_default_separator_and_collect_alias(eng):
    """aggregation/functions.rs:272-285: 1-arg STRING_AGG/GROUP_CONCAT/
    LISTAGG joins with ',' by default (Spark's listagg default is '');
    COLLECT is the reference's LISTAGG alias (functions.rs:3122)."""
    assert _agg(eng, "GROUP_CONCAT(CAST(i AS STRING))") == "1,2,3,4"
    assert _agg(eng, "LISTAGG(CAST(i AS STRING))") == "1,2,3,4"
    assert _agg(eng, "COLLECT(CAST(i AS STRING))") == "1,2,3,4"
    assert _agg(eng, "STRING_AGG(CAST(i AS STRING), '|')") == "1|2|3|4"


def test_remaining_registry_aliases(eng):
    """Completes the register_sql_function! sweep: FIRST/LAST (aliases of
    FIRST_VALUE/LAST_VALUE, functions.rs), VAR_SAMP, and the bare
    CURRENT_TIMESTAMP keyword all resolve through the dialect. With these,
    every one of the registry's 89 names+aliases is exercised here."""
    assert _agg(eng, "FIRST(i)") == 1
    assert _agg(eng, "LAST(i)") == 4
    assert _agg(eng, "VAR_SAMP(g)") is not None
    assert _one(eng, "CURRENT_TIMESTAMP") is not None


def test_select_alias_reuse(eng):
    """docs/sql/functions/SELECT-ALIAS-REUSE.md: later select items may
    reference earlier aliases in the SAME select list. Spark's lateral
    column alias resolution provides this natively — pinned so the
    enabling conf (lateralColumnAlias.enableImplicitResolution) staying
    on remains load-bearing."""
    r = eng.execute(
        "SELECT x * 2 AS dbl, dbl + 1 AS dbl_plus, "
        "CASE WHEN dbl_plus > 5 THEN 'big' ELSE 'small' END AS label "
        "FROM t WHERE i = 2"
    ).collect()[0]
    assert (r["dbl"], r["dbl_plus"], r["label"]) == (5.0, 6.0, "big")
    # (alias must not shadow a real column — table columns win over
    # lateral aliases, the same precedence as MySQL/Spark document)
    r = eng.execute(
        "SELECT SUM(y) AS total, total * 2 AS total2 FROM t"
    ).collect()[0]
    assert (r["total"], r["total2"]) == (100.0, 200.0)


def test_extract_dow_zero_based_and_dayofyear_alias(eng):
    """enhanced-date-functions.md:24-32: DOW/DAYOFWEEK is 0=Sunday..
    6=Saturday in the reference (Spark's DOW field is 1-based), and
    DAYOFYEAR is a valid unit alias (Spark only spells it DOY).
    2026-03-05 is a Thursday."""
    assert _one(eng, "EXTRACT('DOW', ts)") == 4
    assert _one(eng, "EXTRACT(DOW FROM ts)") == 4
    assert _one(eng, "EXTRACT('DAYOFWEEK', ts)") == 4
    assert _one(eng, "EXTRACT(DAYOFYEAR FROM ts)") == 64
    assert _one(eng, "EXTRACT('DOY', ts)") == 64
    assert _one(eng, "EXTRACT('WEEK', ts)") == 10
    assert _one(eng, "EXTRACT('QUARTER', ts)") == 1


def test_datediff_ms_alias(eng):
    """enhanced-date-functions.md:74: MILLISECONDS has an MS alias."""
    assert _one(
        eng,
        "DATEDIFF('MS', ts, TIMESTAMP '2026-03-05 12:30:46')",
    ) == 1000


# ---------------------------------------------------------------------------
# CAST target-type conformance (types.rs:740-1000 cast_to, dispatched
# functions.rs:1269-1289) — see dialect._CAST_TARGET_REWRITES
# ---------------------------------------------------------------------------


def test_cast_float_is_f64(eng):
    """types.rs:781: "FLOAT" | "DOUBLE" both map to f64 — Spark's 4-byte
    FLOAT would silently lose precision on the corpus's CAST(.. AS FLOAT)."""
    got = _one(eng, "CAST(1.000000001 AS FLOAT)")
    assert got == 1.000000001  # float32 would collapse to 1.0
    df = eng.execute("SELECT CAST(x AS FLOAT) AS r FROM t WHERE i = 1")
    assert df.schema["r"].dataType.simpleString() == "double"


def test_cast_text_varchar_datetime_aliases(eng):
    """types.rs:817 STRING|VARCHAR|TEXT; :878 TIMESTAMP|DATETIME. Spark
    rejects bare VARCHAR/TEXT/DATETIME outright — dialect maps them."""
    assert _one(eng, "CAST(42 AS VARCHAR)") == "42"
    assert _one(eng, "CAST(42 AS TEXT)") == "42"
    got = _one(eng, "CAST('2026-03-05 12:30:45' AS DATETIME)")
    assert got == dt.datetime(2026, 3, 5, 12, 30, 45)
    # VARCHAR(n) is valid Spark — untouched (Spark does not truncate on
    # query-level cast; length enforcement applies on table writes)
    assert _one(eng, "CAST('abcdef' AS VARCHAR(3))") == "abcdef"


def test_cast_bare_decimal_keeps_fraction(eng):
    """types.rs:914: bare DECIMAL is arbitrary-precision rust_decimal —
    CAST(1.5 AS DECIMAL) stays 1.5. Spark's bare DECIMAL is (10,0) and
    would round to 2."""
    from decimal import Decimal

    assert _one(eng, "CAST(1.5 AS DECIMAL)") == Decimal("1.5")
    assert _one(eng, "CAST('1.25' AS NUMERIC)") == Decimal("1.25")
    # explicit precision passes through
    got = _one(eng, "CAST(1.256 AS DECIMAL(10,2))")
    assert got == Decimal("1.26")


def test_cast_scaled_integer_scale4(eng):
    """types.rs:950: SCALED_INTEGER defaults to scale 4 (financial
    standard), rounding — CAST(1.23456 ..) = 1.2346."""
    from decimal import Decimal

    assert _one(eng, "CAST(1.23456 AS SCALED_INTEGER)") == Decimal("1.2346")


def test_cast_int_timestamp_unix_seconds(eng):
    """types.rs:899: integer→TIMESTAMP treats the value as Unix seconds —
    Spark's native CAST agrees; pinned so a regression is caught."""
    got = _one(eng, "CAST(1700000000 AS TIMESTAMP)")
    assert got == dt.datetime(2023, 11, 14, 22, 13, 20)


def test_cast_null_as_string_divergence_documented(eng):
    """ADJUDICATED divergence: reference CAST(NULL AS STRING) returns the
    literal string 'NULL' (types.rs:823) — a reference bug (it would
    corrupt data written through sinks: a downstream consumer cannot
    tell the four characters N-U-L-L from a missing value). We return
    SQL NULL, agreeing with Spark, DuckDB, and every ANSI engine."""
    assert _one(eng, "CAST(NULL AS STRING)") is None


def test_cast_string_boolean_superset(eng):
    """Reference string→boolean accepts TRUE/T/1 and FALSE/F/0
    (types.rs:838-846). Spark additionally accepts y/yes/n/no — a
    permissive superset: every reference-accepted input agrees."""
    for lit, want in (("'TRUE'", True), ("'t'", True), ("'1'", True),
                      ("'FALSE'", False), ("'f'", False), ("'0'", False)):
        assert _one(eng, f"CAST({lit} AS BOOLEAN)") is want


# ---------------------------------------------------------------------------
# INTERVAL unit conformance (types.rs:1402-1414 interval_to_millis):
# every interval is a FIXED duration in milliseconds
# ---------------------------------------------------------------------------


def test_interval_month_is_30_days(eng):
    """Reference MONTH = 30 days flat ("Approximate: 30 days"), not a
    calendar month: Jan 31 + 1 MONTH = Mar 1 (reference), not Feb 29/28
    (Spark's calendar semantics, rewritten away by the dialect)."""
    got = _one(eng, "TIMESTAMP '2024-01-31 00:00:00' + INTERVAL '1' MONTH")
    assert got == dt.datetime(2024, 3, 1)
    got = _one(eng, "TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '2' MONTHS")
    assert got == dt.datetime(2024, 3, 1)


def test_interval_year_is_365_days(eng):
    """Reference YEAR = 365 days flat — leap years don't stretch it."""
    got = _one(eng, "TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1' YEAR")
    assert got == dt.datetime(2024, 12, 31)  # 2024 is a leap year


def test_interval_week_native_pin(eng):
    """Reference WEEK = 7 days (types.rs:1411); Spark's WEEK is also 7
    days — pinned so a Spark behavior change is caught."""
    got = _one(eng, "TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1' WEEK")
    assert got == dt.datetime(2024, 1, 8)


def test_interval_sub_millisecond_truncates(eng):
    """Nanos/micros truncate to whole milliseconds (integer division,
    types.rs:1404-1405) — record timestamps are millis."""
    base = "TIMESTAMP '2024-01-01 00:00:00'"
    got = _one(eng, f"{base} + INTERVAL '1500' MICROSECOND")
    assert got == dt.datetime(2024, 1, 1, 0, 0, 0, 1000)  # 1 ms, not 1.5
    got = _one(eng, f"{base} + INTERVAL '2500000' NANOSECOND")
    assert got == dt.datetime(2024, 1, 1, 0, 0, 0, 2000)  # 2 ms


def test_window_duration_fixed_units():
    """parse_duration (WINDOW clauses) uses the same fixed conversions."""
    from velostream_spark.sql.dialect import parse_duration

    assert parse_duration("INTERVAL '1' MONTH") == "30 days"
    assert parse_duration("2 WEEKS") == "14 days"
    assert parse_duration("INTERVAL '1' YEAR") == "365 days"
    assert parse_duration("1500 MICROSECONDS") == "1 milliseconds"


# ---------------------------------------------------------------------------
# String-function edge adjudications (functions.rs r7 sweep)
# ---------------------------------------------------------------------------


def test_substring_start_zero_agrees(eng):
    """functions.rs:678 `start.saturating_sub(1)`: start 0 behaves like 1 —
    Spark agrees (0 treated as 1); pinned as agreement."""
    assert _one(eng, "SUBSTRING('abcdef', 0, 3)") == "abc"
    assert _one(eng, "SUBSTRING('abcdef', 1, 3)") == "abc"


def test_substring_negative_start_divergence_documented(eng):
    """ADJUDICATED divergence: a negative start hits `start as usize` in
    the reference (functions.rs:669) — the two's-complement wrap makes
    skip() consume everything, returning ''. That is an accident of the
    cast, not designed semantics (the reference documents SUBSTRING as
    1-based). We keep Spark's ANSI behavior (negative start counts from
    the end), the same way the CAST(NULL AS STRING)->'NULL' accident is
    not mirrored."""
    assert _one(eng, "SUBSTRING('abcdef', -2)") == "ef"


def test_left_right_edges(eng):
    """LEFT/RIGHT with n >= length return the whole string in both engines
    (functions.rs:2280,2302-2306). Negative n: the reference's `n as usize`
    wrap (functions.rs:2279) accidentally returns the WHOLE string for
    LEFT(s, -1); Spark/ANSI return '' — adjudicated to Spark (documented,
    not mirrored)."""
    assert _one(eng, "LEFT('abc', 10)") == "abc"
    assert _one(eng, "RIGHT('abc', 10)") == "abc"
    assert _one(eng, "LEFT('abc', -1)") == ""
    assert _one(eng, "RIGHT('abc', -1)") == ""


def test_cast_date_literal_formats(eng):
    """types.rs:857-861: string→DATE tries %Y-%m-%d, %Y/%m/%d, %m/%d/%Y,
    %d-%m-%Y in order — LITERALS in the non-ISO formats are normalized
    statically by the dialect (Spark's ANSI cast only reads ISO)."""
    want = dt.date(2024, 3, 15)
    assert _one(eng, "CAST('2024-03-15' AS DATE)") == want
    assert _one(eng, "CAST('2024/03/15' AS DATE)") == want
    assert _one(eng, "CAST('03/15/2024' AS DATE)") == want
    assert _one(eng, "CAST('15-03-2024' AS DATE)") == want
    # trial ORDER pins disambiguation: Y/m/d wins before m/d/Y
    assert _one(eng, "CAST('2024/03/05' AS DATE)") == dt.date(2024, 3, 5)


def test_cast_timestamp_literal_formats(eng):
    """types.rs:881-895: Y/m/d-with-time is the non-ISO timestamp format
    Spark can't read — normalized; fractional seconds preserved."""
    want = dt.datetime(2024, 3, 15, 12, 30, 45)
    assert _one(eng, "CAST('2024/03/15 12:30:45' AS TIMESTAMP)") == want
    assert _one(eng, "CAST('2024-03-15T12:30:45' AS TIMESTAMP)") == want
    got = _one(eng, "CAST('2024/03/15 12:30:45.250' AS TIMESTAMP)")
    assert got == dt.datetime(2024, 3, 15, 12, 30, 45, 250000)


def test_division_semantics(eng):
    """types.rs:1289-1325: Integer / Integer is TRUE division returning
    Float (3/2 = 1.5) — Spark's `/` agrees (double result). Division by
    zero: the reference returns the SENTINEL Integer(1) ("Defensive:
    return 1 ... to allow record processing to continue") — adjudicated
    NOT to mirror: a fabricated 1 silently corrupts downstream
    aggregates (an AVG of ratios would absorb it). On the engine's
    factory session (session.py: ansi.enabled=false) x/0 yields NULL —
    continues processing AND is visibly absent; on an ANSI session (this
    vanilla driver-like fixture) Spark raises, and TRY_DIVIDE is the
    expression-local NULL form either way."""
    assert _one(eng, "3 / 2") == 1.5
    assert _one(eng, "10 / 4") == 2.5
    assert _one(eng, "TRY_DIVIDE(1, 0)") is None
    # x/0 is session-governed (the shared test session's ANSI flag can be
    # flipped by load_tables during the suite): ANSI on → raise, off →
    # NULL. Both adjudicated fine; only the sentinel 1 would be a bug.
    import pyspark.errors

    if eng.spark.conf.get("spark.sql.ansi.enabled") == "true":
        with pytest.raises(pyspark.errors.exceptions.base.ArithmeticException):
            _one(eng, "1 / 0")
    else:
        assert _one(eng, "1 / 0") is None


def test_concat_operator_vs_function_null_semantics(eng):
    """The reference has TWO concatenations with different NULL rules:
    the || operator is SQL-standard NULL-propagating (evaluator.rs:601
    "concatenation with NULL returns NULL") while the CONCAT function
    SKIPS NULLs (functions.rs concat → dialect concat_ws rewrite). Spark's
    || matches the operator natively; the dialect carries the function."""
    assert _one(eng, "'a' || 'b'") == "ab"
    assert _one(eng, "'a' || NULL") is None
    assert _one(eng, "CONCAT('a', NULL, 'b')") == "ab"
    # mixed-type ||: non-strings take their string rendering
    assert _one(eng, "'v=' || 7") == "v=7"


def test_temporal_cross_comparisons(eng):
    """Date↔Timestamp comparisons promote the date to midnight
    (reference temporal_comparison_test.rs:79-130) — Spark's implicit
    date→timestamp cast agrees; pinned."""
    assert _one(eng, "DATE '2025-06-15' < TIMESTAMP '2025-06-15 12:00:00'") is True
    assert _one(eng, "TIMESTAMP '2025-06-15 23:59:59' < DATE '2025-06-16'") is True
    assert _one(eng, "DATE '2025-06-15' = TIMESTAMP '2025-06-15 00:00:00'") is True


def test_round_double_tie_divergence_documented(eng):
    """ADJUDICATED divergence: the reference rounds doubles C-style —
    `(f * 10^p).round() / 10^p` (functions.rs:448-450), half-away on the
    BINARY product — while Spark's ROUND(double, p) applies HALF_UP to
    the double's shortest DECIMAL representation. They differ exactly
    when the binary product lands on the other side of .5 from the
    decimal text: 1.005*100 = 100.49999999999999 in IEEE, so the
    reference (and DuckDB, same C-style path) give 1.0 where Spark gives
    1.01. NOT mirrored: the string-level dialect is type-blind, and
    rerouting every ROUND through a double-only expression would corrupt
    DECIMAL rounding (which is exact HALF_UP in BOTH engines — the
    ScaledInteger arm, functions.rs:452-464, divides as f64 and rounds
    half-away, agreeing with decimal HALF_UP away-from-zero). Spark's
    reading matches what the literal's author wrote; divergence is
    confined to repr-tie doubles."""
    # Spark decimal-repr HALF_UP (the adjudicated behavior):
    assert _one(eng, "ROUND(CAST(1.005 AS DOUBLE), 2)") == 1.01
    # agreement everywhere the binary product is not a repr-tie:
    assert _one(eng, "ROUND(CAST(2.675 AS DOUBLE), 2)") == 2.68  # 267.5 exact
    assert _one(eng, "ROUND(CAST(2.665 AS DOUBLE), 2)") == 2.67
    assert _one(eng, "ROUND(CAST(-2.5 AS DOUBLE), 0)") == -3.0  # away from 0
    # DECIMAL path: both engines round half-up/away exactly
    assert float(_one(eng, "ROUND(CAST(2.5 AS DECIMAL(5,1)), 0)")) == 3.0
    assert float(_one(eng, "ROUND(CAST(-2.5 AS DECIMAL(5,1)), 0)")) == -3.0


def test_join_reference_signature(eng):
    """JOIN is DELIMITER-FIRST and variadic (functions.rs:1001-1043):
    every value is stringified (NULL → the literal 'NULL',
    functions.rs:1029; numbers/booleans via to_string; dates ISO) and
    joined. A non-string delimiter ERRORS in the reference
    (functions.rs:1013) — here a NULL/array delimiter fails analysis or
    nulls out the same visible way, never silently joins."""
    assert _one(eng, "JOIN('-', 'a', 'b', 'c')") == "a-b-c"
    assert _one(eng, "JOIN(', ', i, s)", "i = 2") == "2, spark"
    assert _one(eng, "JOIN('|', NULL, 'x', NULL)") == "NULL|x|NULL"
    assert _one(eng, "JOIN('-', CAST(NULL AS STRING))") == "NULL"
    assert (
        _one(eng, "JOIN('/', CAST(ts AS DATE))", "i = 1") == "2026-03-05"
    )


def test_split_part_index_edges(eng):
    """functions.rs:989-998: SPLIT_PART index < 1 returns '' (PostgreSQL
    semantics per the reference's own comment), out-of-bounds returns '',
    NULL in any argument propagates NULL. Spark's split_part ERRORS on 0
    and counts from the END on negatives, so non-literal / sub-1 indexes
    are guarded by the dialect."""
    assert _one(eng, "SPLIT_PART('a,b,c', ',', 2)") == "b"
    assert _one(eng, "SPLIT_PART('a,b,c', ',', 9)") == ""
    assert _one(eng, "SPLIT_PART('a,b,c', ',', 0)") == ""
    assert _one(eng, "SPLIT_PART('a,b,c', ',', -1)") == ""
    # dynamic (column) index goes through the guarded form
    assert _one(eng, "SPLIT_PART(s, ',', i - 1)", "i = 3") == "stream"
    assert _one(eng, "SPLIT_PART(s, ',', i - 3)", "i = 3") == ""
    assert _one(eng, "SPLIT_PART('a,b', ',', CAST(NULL AS INT))") is None
    assert _one(eng, "SPLIT_PART(CAST(NULL AS STRING), ',', 1)") is None
    # literal delimiter foot-gun stays literal in the guarded form too
    assert _one(eng, "SPLIT_PART('a.b.c', '.', 1 + 1)") == "b"


def test_position_three_arg_start(eng):
    """functions.rs:2490-2522: 3-arg POSITION searches from start_pos but
    returns the position in the FULL string — Spark's position/locate
    agrees natively (no rewrite); not-found → 0 in both."""
    assert _one(eng, "POSITION('a', 'banana', 3)") == 4
    assert _one(eng, "POSITION('a', 'banana')") == 2
    assert _one(eng, "POSITION('z', 'banana')") == 0


def test_math_edge_conformance(eng):
    """functions.rs:474-510 CEIL/FLOOR on Float return INTEGER (i64) —
    Spark's ceil/floor(double) return BIGINT, agreeing on both value and
    integer-ness (pinned; DuckDB returns double, already handled by
    oracle-side CASTs where used). functions.rs:549-576 POWER always
    returns Float even for int^int — Spark's pow returns double, agrees.
    functions.rs:600-610 MOD keeps the DIVIDEND's sign (Rust %) — Spark's
    MOD/% agrees (pmod is the positive variant, not used). SQRT of a
    negative ERRORS in the reference (functions.rs:522-526); Spark yields
    NaN — adjudicated NOT to mirror (NaN propagates visibly through
    aggregates; wrapping every SQRT in a raise_error CASE would tax the
    hot path for a corner the reference's own corpus never hits)."""
    from pyspark.sql.types import LongType

    df = eng.execute("SELECT CEIL(x) AS c, FLOOR(x) AS f FROM t WHERE i = 2")
    assert isinstance(df.schema["c"].dataType, LongType)
    assert isinstance(df.schema["f"].dataType, LongType)
    assert _one(eng, "CEIL(2.5)") == 3 and _one(eng, "FLOOR(2.5)") == 2
    assert _one(eng, "CEIL(-2.5)") == -2 and _one(eng, "FLOOR(-2.5)") == -3
    assert _one(eng, "POWER(2, 10)") == 1024.0
    assert isinstance(_one(eng, "POWER(2, 10)"), float)
    assert _one(eng, "MOD(-7, 3)") == -1  # dividend sign, both engines
    assert _one(eng, "MOD(7, -3)") == 1
    assert _one(eng, "MOD(7.5, 2.0)") == 1.5
    import math

    assert math.isnan(_one(eng, "SQRT(-1.0)"))


def test_split_returns_array_superset_documented(eng):
    """ADJUDICATED superset: the reference's SPLIT returns only the FIRST
    part — functions.rs:947 'Return first part for simplicity (full array
    support would need array type)' — an implementation LIMITATION of its
    scalar type system, not designed semantics (its docs never promise
    the first-part behavior; the user-facing splitter is SPLIT_PART).
    Here SPLIT returns the full array (Spark has a native array type);
    SPLIT_PART(s, d, 1) is the exact-parity spelling of the reference's
    SPLIT result."""
    assert _one(eng, "SPLIT('a,b', ',')") == ["a", "b"]
    assert _one(eng, "SPLIT_PART('a,b', ',', 1)") == "a"


def test_like_metachar_divergence_documented(eng):
    """ADJUDICATED divergence: the reference's LIKE (evaluator.rs:1210
    match_pattern) builds a regex by substituting % -> .* and _ -> .
    WITHOUT escaping regex metacharacters, so `'3514' LIKE '3.14'` is
    TRUE there (the literal dot matches any char) and `'aaa' LIKE 'a+'`
    is TRUE (the + quantifies). That is a metachar leak, not designed
    semantics — the reference's own docs describe standard SQL LIKE.
    Kept: Spark's standard LIKE (metachars literal). The designed arms
    AGREE and are pinned below: % = any run, _ = exactly one char,
    anchored full-string match."""
    assert _one(eng, "'hello world' LIKE 'hello%'") is True
    assert _one(eng, "'hello world' LIKE '%world'") is True
    assert _one(eng, "'hello world' LIKE '%lo wo%'") is True
    assert _one(eng, "'hat' LIKE 'h_t'") is True
    assert _one(eng, "'heat' LIKE 'h_t'") is False  # _ is exactly one
    assert _one(eng, "'hello' LIKE 'ell'") is False  # anchored both ends
    # the leak, not mirrored: metachars stay literal here
    assert _one(eng, "'3514' LIKE '3.14'") is False
    assert _one(eng, "'3.14' LIKE '3.14'") is True
    assert _one(eng, "'aaa' LIKE 'a+'") is False


def test_ranking_tie_and_ntile_divergences_documented(eng):
    """ADJUDICATED divergences (window_functions.rs): the reference's
    PERCENT_RANK (:714) and CUME_DIST (:749) use the row's buffer
    POSITION, not its rank — tied rows get distinct values there,
    depending on an unstable sort position. Its NTILE (:775) sizes every
    tile at ceil(n/tiles), so trailing tiles starve (4 rows, 3 tiles →
    sizes 2,2,0 instead of the standard 2,1,1). Both contradict the SQL
    standard AND the reference's own docs; position-among-equals is
    nondeterministic in their buffer. Kept: Spark's standard rank-based
    PERCENT_RANK/CUME_DIST (ties share values) and remainder-first
    NTILE. Pinned below on tie data."""
    df = eng.execute(
        "SELECT i, PERCENT_RANK() OVER (ORDER BY tie) AS pr, "
        "CUME_DIST() OVER (ORDER BY tie) AS cd, "
        "NTILE(3) OVER (ORDER BY i) AS nt "
        "FROM (SELECT i, CASE WHEN i <= 2 THEN 0 ELSE 1 END AS tie FROM t)"
    )
    rows = {r["i"]: r for r in df.collect()}
    # ties share: rows 1,2 (tie=0) both pr=0.0, cd=0.5; rows 3,4 pr=2/3, cd=1
    assert rows[1]["pr"] == rows[2]["pr"] == 0.0
    assert rows[3]["pr"] == rows[4]["pr"] == pytest.approx(2 / 3)
    assert rows[1]["cd"] == rows[2]["cd"] == 0.5
    assert rows[3]["cd"] == rows[4]["cd"] == 1.0
    # standard NTILE on 4 rows / 3 tiles: sizes 2,1,1
    assert [rows[i]["nt"] for i in (1, 2, 3, 4)] == [1, 1, 2, 3]


def test_not_in_null_semantics_divergence_documented(eng):
    """ADJUDICATED divergence: the reference's NOT IN is the plain
    negation of its IN scan (subquery_executor.rs:134 `!in_result`), and
    its values_equal treats NULL as unequal to everything — so a NULL in
    the subquery result does NOT poison NOT IN there (rows still pass).
    Standard SQL three-valued logic (Spark, DuckDB, and this repo's
    in_not_in_subquery oracle) says `x NOT IN (..., NULL)` is UNKNOWN →
    row filtered. Kept: standard semantics — the reference's behavior is
    a by-product of its equality helper, contradicts every SQL reference
    text, and silently changes results only on NULL-bearing subqueries."""
    rows = eng.execute(
        "SELECT i FROM t WHERE 99 NOT IN (SELECT CASE WHEN i = 1 THEN NULL "
        "ELSE i END FROM t)"
    ).collect()
    assert rows == []  # NULL poisons NOT IN (standard); reference would pass
    rows = eng.execute(
        "SELECT COUNT(*) AS n FROM t WHERE 99 NOT IN (SELECT i FROM t)"
    ).collect()
    assert rows[0]["n"] > 0  # no NULLs → both engines agree


def test_string_agg_float_formatting_divergence_documented(eng):
    """ADJUDICATED cosmetic divergence: the reference stringifies
    aggregated non-string values with Rust's f64::to_string
    (accumulator.rs:294-298 field_value_to_string) — 1.0 renders as '1'
    there but as '1.0' through Spark's CAST-to-string. Kept: Spark's
    rendering (consistent with every other string context in this engine
    AND with DuckDB's, so oracles agree); whole-number floats losing
    their '.0' only in STRING_AGG would be an inconsistency, not parity.
    Non-whole values render identically in both."""
    assert _agg(eng, "STRING_AGG(y, ',')") == "10.0,20.0,30.0,40.0"


def test_trim_strips_all_whitespace_like_reference(eng):
    """functions.rs:731-744,870-895: TRIM/LTRIM/RTRIM are Rust str::trim —
    ALL whitespace, not just spaces (Spark's 1-arg trim strips only ' ').
    Dialect rewrites to the explicit trim-set form over the ASCII
    whitespace set; the reference's Unicode-whitespace tail (U+00A0 ...)
    is a documented gap. Explicit BOTH/LEADING/TRAILING user forms pass
    through untouched."""
    assert _one(eng, "TRIM('\\t a b \\n')") == "a b"
    assert _one(eng, "LTRIM('\\t a ')") == "a "
    assert _one(eng, "RTRIM(' a \\n')") == " a"
    assert _one(eng, "TRIM(BOTH 'x' FROM 'xax')") == "a"


def test_length_bytes_divergence_documented(eng):
    """ADJUDICATED divergence: the reference's LENGTH/LEN return Rust
    `str::len()` — UTF-8 BYTES (functions.rs:915) — while its own
    SUBSTRING/LEFT/RIGHT index CHARACTERS (chars().skip(), :678), so
    'héllo' is LENGTH 6 there but SUBSTRING(s,1,LENGTH(s)) would overrun.
    A byte count from a char-indexed engine is an accident, and every
    standard engine (Spark, DuckDB — whose oracles gate these entries)
    counts characters. Kept: characters; identical on ASCII."""
    assert _one(eng, "LENGTH('héllo')") == 5  # reference: 6 (bytes)
    assert _one(eng, "LEN('héllo')") == 5
    assert _one(eng, "LENGTH('hello')") == 5  # ASCII: both engines agree


def test_position_bytes_divergence_documented(eng):
    """Same class as LENGTH: the reference's POSITION returns Rust
    `str::find` BYTE offsets +1 (functions.rs:2517-2518), but its
    SUBSTRING consumes CHARACTER positions — feeding one into the other
    breaks on non-ASCII there. Kept: Spark/DuckDB character positions
    (POSITION output composes with SUBSTRING); identical on ASCII."""
    assert _one(eng, "POSITION('l' IN 'héllo')") == 3  # reference: 4 (bytes)
    assert _one(eng, "POSITION('l' IN 'hello')") == 3  # ASCII: agree
