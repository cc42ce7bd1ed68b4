"""SQL pre-flight validator tests (reference SqlValidator/QueryAnalyzer
surface: configuration errors block, feature warnings don't)."""

from __future__ import annotations

from velostream_spark.sql.validator import validate_app, validate_statement


def test_valid_csas_collects_requirements():
    rep = validate_statement(
        """
        CREATE STREAM out AS
        SELECT station, MIN(t) AS mn FROM measurements GROUP BY station
        EMIT FINAL
        WITH ('measurements.type' = 'file_source',
              'measurements.path' = '/x/m.csv',
              'measurements.format' = 'csv',
              'out.type' = 'file_sink', 'out.path' = '/x/o.csv');
        """
    )
    assert rep.ok and not rep.warnings
    assert set(rep.sources) == {"measurements"} and set(rep.sinks) == {"out"}


def test_missing_source_config_is_error():
    rep = validate_statement("SELECT * FROM nowhere")
    assert not rep.ok
    assert "nowhere" in rep.errors[0]


def test_registered_view_satisfies_requirement():
    rep = validate_statement("SELECT * FROM events", registered={"events"})
    assert rep.ok


def test_file_source_without_path_is_error():
    rep = validate_statement(
        "SELECT * FROM m WITH ('m.type' = 'file_source', 'm.format' = 'csv')"
    )
    assert any("requires a 'path'" in e for e in rep.errors)


def test_kafka_source_without_topic_is_error():
    rep = validate_statement(
        "SELECT * FROM k WITH ('k.type' = 'kafka_source')"
    )
    assert any("requires a 'topic'" in e for e in rep.errors)


def test_unknown_format_and_option_flagged():
    rep = validate_statement(
        "SELECT * FROM m WITH ('m.type' = 'file_source', 'm.path' = '/x',"
        " 'm.format' = 'xml', 'm.wibble' = '1')"
    )
    assert any("unknown file format 'xml'" in e for e in rep.errors)
    assert any("unknown option 'wibble'" in w for w in rep.warnings)


def test_emit_final_stateless_warns():
    rep = validate_statement(
        "SELECT a FROM t EMIT FINAL WITH ('t.type' = 'file_source', 't.path' = '/x')"
    )
    assert rep.ok
    assert any("EMIT FINAL" in w for w in rep.warnings)


def test_ctas_without_any_key_warns():
    """A GROUP BY now provides the implicit key (KEY_CONFIGURATION.md), so
    only a table with neither PRIMARY KEY nor GROUP BY is keyless."""
    rep = validate_statement(
        "CREATE TABLE t2 AS SELECT user_id, value FROM events",
        registered={"events"},
    )
    assert rep.ok
    assert any("PRIMARY KEY" in w for w in rep.warnings)
    # grouped CTAS carries the implicit GROUP BY key — no warning
    rep = validate_statement(
        "CREATE TABLE t3 AS SELECT user_id, COUNT(*) AS n FROM events "
        "GROUP BY user_id",
        registered={"events"},
    )
    assert rep.ok
    assert not any("PRIMARY KEY" in w for w in rep.warnings)


def test_primary_key_on_file_sink_warns():
    """FR-094's 'quick win': file sinks silently ignore PRIMARY KEY in the
    reference (README.md:9,199-205) — surface the missing warning. Both
    the named-sink and URI-sink forms."""
    rep = validate_statement(
        "CREATE STREAM out AS SELECT symbol PRIMARY KEY, price FROM trades "
        "INTO snk WITH ('trades.type'='file_source','trades.path'='/x.jsonl',"
        "'trades.format'='jsonl','snk.type'='file_sink','snk.path'='/o.csv',"
        "'snk.format'='csv')"
    )
    assert rep.ok
    assert any("file sink" in w and "FR-094" in w for w in rep.warnings)
    rep = validate_statement(
        "CREATE STREAM out2 AS SELECT symbol PRIMARY KEY, price FROM trades "
        "INTO 'file:///o.csv' WITH ('trades.type'='file_source',"
        "'trades.path'='/x.jsonl','trades.format'='jsonl')"
    )
    assert any("file sink" in w for w in rep.warnings)
    # Kafka sink: the key IS meaningful — no warning
    rep = validate_statement(
        "CREATE STREAM out3 AS SELECT symbol PRIMARY KEY, price FROM trades "
        "INTO ksink WITH ('trades.type'='file_source','trades.path'='/x.jsonl',"
        "'trades.format'='jsonl','ksink.type'='kafka_sink',"
        "'ksink.topic'='t','ksink.bootstrap.servers'='b:9092')"
    )
    assert not any("file sink" in w for w in rep.warnings)


def test_app_dependency_order():
    rep = validate_app(
        """
        CREATE TABLE t1 AS SELECT user_id PRIMARY KEY, COUNT(*) AS n
        FROM events GROUP BY user_id;
        SELECT * FROM t1 WHERE n > 3;
        """,
        registered={"events"},
    )
    assert rep.ok, rep.errors


def test_parse_error_lands_in_errors():
    # (the old probe SELECT DELTA(x) FROM t became LEGAL in round 8 —
    # aggregate DELTA is max-min, per-record DELTA a typed zero)
    for bad in (
        "SELECT amount FROM",        # dangling FROM (select.rs:411)
        "CREATE STREAM x AS",        # CTAS with no query
        "INSERT GARBAGE",            # INSERT missing VALUES/SELECT
        "FROB x",                    # unknown statement head
        "SHOW",                      # SHOW with no resource
    ):
        rep = validate_statement(bad)
        assert not rep.ok, bad
        assert "parse error" in rep.errors[0], (bad, rep.errors)


def test_statement_level_config_file_satisfies_source():
    """A bare config_file WITH property supplies the FROM source's config
    (reference with_clause_parser.rs; demo/trading/sql/ctas_file_trading.sql
    uses exactly this shape) — no 'unregistered table' error, no bare-key
    warning for the reference's statement-level table props."""
    from velostream_spark.sql.validator import validate_statement

    rep = validate_statement(
        """
        CREATE TABLE t AS
        SELECT a, COUNT(*) AS n FROM src GROUP BY a
        WITH (
          "config_file" = "configs/src.yaml",
          "table_model" = "compact",
          "retention" = "7 days"
        )
        """
    )
    assert rep.errors == []
    assert not any("has no '<name>.' prefix" in w for w in rep.warnings)


def test_scoped_config_file_without_type_accepted():
    from velostream_spark.sql.validator import validate_statement

    rep = validate_statement(
        """
        CREATE STREAM s AS SELECT x FROM src
        WITH ('src.config_file' = 'configs/src.yaml')
        """
    )
    assert rep.errors == []


def test_statement_config_file_covers_only_the_from_table():
    """config_file binds ONLY the driving FROM table; a joined second
    table still needs its own source (review finding: the waiver used to
    silence every unregistered table)."""
    from velostream_spark.sql.validator import validate_statement

    rep = validate_statement(
        """
        CREATE STREAM s AS
        SELECT a.x, b.y FROM a JOIN b ON a.k = b.k
        WITH ("config_file" = "configs/a.yaml")
        """
    )
    assert any("'b'" in e for e in rep.errors), rep.errors
    assert not any("'a'" in e for e in rep.errors), rep.errors


def test_aggregate_without_grouping_warning():
    """parser/validator.rs:36-64 AggregateWithoutGrouping — defined as an
    error in the reference but its enforcement call is commented out
    (parser/mod.rs:486), so it surfaces here as the non-blocking warning
    tier, on continuous kinds only."""
    from velostream_spark.sql.validator import validate_statement

    rep = validate_statement(
        "CREATE STREAM s AS SELECT COUNT(*) AS n, AVG(x) AS a FROM t "
        "WITH ('t.type' = 'file_source', 't.path' = '/tmp/x', "
        "'t.format' = 'csv')"
    )
    assert any("AggregateWithoutGrouping" in w for w in rep.warnings)
    assert rep.ok  # warning, not error

    # GROUP BY silences it
    rep = validate_statement(
        "CREATE STREAM s AS SELECT k, COUNT(*) AS n FROM t GROUP BY k "
        "WITH ('t.type' = 'file_source', 't.path' = '/tmp/x', "
        "'t.format' = 'csv')"
    )
    assert not any("AggregateWithoutGrouping" in w for w in rep.warnings)

    # a WINDOW clause is implicit grouping
    rep = validate_statement(
        "CREATE STREAM s AS SELECT COUNT(*) AS n FROM t "
        "WINDOW TUMBLING(INTERVAL '5' MINUTE) "
        "WITH ('t.type' = 'file_source', 't.path' = '/tmp/x', "
        "'t.format' = 'csv')"
    )
    assert not any("AggregateWithoutGrouping" in w for w in rep.warnings)

    # windowed analytic (OVER) is not a grouping aggregate
    rep = validate_statement(
        "CREATE STREAM s AS SELECT x, SUM(x) OVER (ORDER BY x) AS rt FROM t "
        "WITH ('t.type' = 'file_source', 't.path' = '/tmp/x', "
        "'t.format' = 'csv')"
    )
    assert not any("AggregateWithoutGrouping" in w for w in rep.warnings)

    # batch SELECT is exempt (this engine executes global aggregates)
    rep = validate_statement("SELECT COUNT(*) AS n FROM t")
    assert not any("AggregateWithoutGrouping" in w for w in rep.warnings)


def test_semantic_function_validation():
    """semantic_validator.rs:155-207: unknown functions error (strict, the
    reference default) or warn (lenient) with did-you-mean suggestions;
    a known non-window non-aggregate with OVER is always an error. Spark
    builtins pass — this engine's documented permissive superset."""
    from velostream_spark.sql.validator import validate_statement

    r = validate_statement("SELECT UPER(name) FROM t")
    assert any("unknown function 'UPER'" in e and "UPPER" in e for e in r.errors)
    r = validate_statement("SELECT UPER(name) FROM t", strict_functions=False)
    assert not any("unknown function" in e for e in r.errors)
    assert any("unknown function 'UPER'" in w for w in r.warnings)
    r = validate_statement("SELECT UPPER(name) OVER (ORDER BY ts) AS u FROM t")
    assert any("cannot be used in OVER" in e for e in r.errors)
    # window fns + aggregates with OVER, and Spark builtins, all pass
    r = validate_statement(
        "SELECT LAG(x) OVER (ORDER BY ts) AS l, COUNT(*) OVER () AS c, "
        "initcap(name) AS i, PERCENTILE_CONT(0.9) WITHIN GROUP "
        "(ORDER BY x) AS p FROM t"
    )
    assert not [e for e in r.errors if "function" in e], r.errors
