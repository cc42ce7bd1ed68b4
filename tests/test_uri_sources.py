"""FR-047: URI-based data sources directly in FROM/JOIN.

Reference surface: ast.rs:518 (``StreamSource::Uri``), parser/select.rs:
163-180 (quoted-string and bare URI forms after FROM), datasource/config/
types.rs:374-560 (ConnectionString.parse + per-scheme to_source_config),
user-facing examples docs/sql/create-table-wildcard.md:30-77 — executed
verbatim below where the sandbox allows (file://), option-mapping-only
where it can't (kafka://, jdbc, s3).
"""

from __future__ import annotations

import json

import pytest

from velostream_spark.sql.dialect import (
    parse_statement,
    parse_uri_source,
    uri_view_name,
)


# ---------------------------------------------------------------------------
# dialect: URI extraction from FROM/JOIN
# ---------------------------------------------------------------------------


def test_from_uri_extracted_and_viewed():
    st = parse_statement(
        "CREATE TABLE customer_data AS "
        "SELECT * FROM file:///data/customers.json "
        'WITH ("file.format" = "json")'
    )
    assert st.uri_sources == {
        uri_view_name("file:///data/customers.json"): "file:///data/customers.json"
    }
    view = next(iter(st.uri_sources))
    assert f"FROM {view}" in st.select_sql
    assert "://" not in st.select_sql


def test_quoted_uri_with_alias():
    st = parse_statement(
        "SELECT c.name FROM 'file:///data/x.csv' c WHERE c.name <> ''"
    )
    (view,) = st.uri_sources
    assert st.uri_sources[view] == "file:///data/x.csv"
    assert f"FROM {view} c" in st.select_sql


def test_join_uri_source():
    st = parse_statement(
        "SELECT a.id, b.v FROM s a JOIN file:///dim/d.csv b ON a.id = b.id"
    )
    (view,) = st.uri_sources
    assert f"JOIN {view} b" in st.select_sql


def test_uri_inside_string_literal_untouched():
    st = parse_statement("SELECT 'FROM file://not/a/source' AS s FROM t")
    assert st.uri_sources == {}
    assert "file://not/a/source" in st.select_sql


def test_same_uri_twice_one_view():
    st = parse_statement(
        "SELECT * FROM file:///d/x.csv WHERE id IN "
        "(SELECT id FROM file:///d/x.csv)"
    )
    assert len(st.uri_sources) == 1


def test_view_name_deterministic_identifier():
    v = uri_view_name("file:///logs/app-*.json?watch=true")
    assert v == uri_view_name("file:///logs/app-*.json?watch=true")
    assert v.isidentifier()


# ---------------------------------------------------------------------------
# parse_uri_source: scheme → cfg mapping (types.rs:451-560)
# ---------------------------------------------------------------------------


def test_kafka_uri_mapping():
    cfg = parse_uri_source(
        "kafka://localhost:9092/events-topic",
        {"auto.offset.reset": "latest"},
    )
    assert cfg["type"] == "kafka_source"
    assert cfg["bootstrap.servers"] == "localhost:9092"
    assert cfg["topic"] == "events-topic"
    assert cfg["auto.offset.reset"] == "latest"


def test_kafka_uri_default_port_and_params():
    # port default 9092 (types.rs:456); query params become properties
    cfg = parse_uri_source("kafka://broker/orders?group_id=analytics")
    assert cfg["bootstrap.servers"] == "broker:9092"
    assert cfg["topic"] == "orders"
    assert cfg["group_id"] == "analytics"
    with pytest.raises(ValueError, match="topic"):
        parse_uri_source("kafka://broker-only")


def test_file_uri_mapping_defaults():
    # format default json (types.rs:507); csv header=false → csv_no_header
    cfg = parse_uri_source("file:///data/input.json?watch=true")
    assert cfg == {
        "type": "file_source",
        "path": "/data/input.json",
        "format": "json",
        "watch": "true",
    }
    cfg = parse_uri_source(
        "file:///d/x.csv", {"file.format": "csv", "header": "false"}
    )
    assert cfg["format"] == "csv_no_header"


def test_s3_uri_mapping():
    # s3:// → s3a:// (Hadoop connector scheme), format default parquet
    # (types.rs:553)
    cfg = parse_uri_source("s3://bucket/path/*.parquet?region=us-west-2")
    assert cfg["type"] == "file_source"
    assert cfg["path"] == "s3a://bucket/path/*.parquet"
    assert cfg["format"] == "parquet"


def test_jdbc_uri_mapping():
    # create-table-wildcard.md:64-71
    cfg = parse_uri_source("postgresql://localhost/mydb?table=users")
    assert cfg == {
        "type": "jdbc_source",
        "url": "jdbc:postgresql://localhost/mydb",
        "dbtable": "users",
    }
    cfg = parse_uri_source("mysql://db.example.com/shop?table=orders")
    assert cfg["url"] == "jdbc:mysql://db.example.com/shop"
    assert cfg["dbtable"] == "orders"
    with pytest.raises(ValueError, match="table"):
        parse_uri_source("postgresql://localhost/mydb")


def test_unknown_scheme_rejected():
    with pytest.raises(ValueError, match="scheme"):
        parse_uri_source("gopher://old/server")


# ---------------------------------------------------------------------------
# engine: the doc's file:// CTAS examples, executed verbatim
# ---------------------------------------------------------------------------


def test_doc_csv_example_executes(spark, tmp_path):
    """create-table-wildcard.md:46-52, path swapped for a tmp file."""
    from velostream_spark.sql.engine import SqlEngine

    p = tmp_path / "sales.csv"
    p.write_text("id,amount\n1,10.5\n2,20.0\n")
    eng = SqlEngine(spark)
    df = eng.execute(
        f"CREATE TABLE sales_data AS SELECT * FROM file://{p} "
        'WITH ("file.format" = "csv", "header" = "true")'
    )
    assert sorted(r["id"] for r in df.collect()) == [1, 2]
    assert "sales_data" in eng.tables


def test_doc_json_example_executes(spark, tmp_path):
    """create-table-wildcard.md:41-44: json = single array file."""
    from velostream_spark.sql.engine import SqlEngine

    p = tmp_path / "customers.json"
    p.write_text(json.dumps([{"id": 1, "name": "ada"}, {"id": 2, "name": "bo"}]))
    eng = SqlEngine(spark)
    df = eng.execute(
        f"CREATE TABLE customer_data AS SELECT * FROM file://{p} "
        'WITH ("file.format" = "json")'
    )
    assert {r["name"] for r in df.collect()} == {"ada", "bo"}


def test_doc_glob_example_executes(spark, tmp_path):
    """create-table-wildcard.md:54-58: glob over multiple files (jsonl)."""
    from velostream_spark.sql.engine import SqlEngine

    (tmp_path / "app-1.json").write_text('{"n": 1}\n{"n": 2}\n')
    (tmp_path / "app-2.json").write_text('{"n": 3}\n')
    eng = SqlEngine(spark)
    df = eng.execute(
        f"CREATE TABLE log_data AS SELECT * FROM file://{tmp_path}/app-*.json "
        'WITH ("file.format" = "jsonl")'
    )
    assert sorted(r["n"] for r in df.collect()) == [1, 2, 3]


def test_uri_query_params_configure_reader(spark, tmp_path):
    """?format= in the URI itself (types.rs ConnectionString params)."""
    from velostream_spark.sql.engine import SqlEngine

    p = tmp_path / "ev.jsonl"
    p.write_text('{"x": 5}\n{"x": 7}\n')
    eng = SqlEngine(spark)
    df = eng.execute(f"SELECT x FROM file://{p}?format=jsonl WHERE x > 5")
    assert [r["x"] for r in df.collect()] == [7]


def test_uri_join_with_named_stream(spark, tmp_path):
    from velostream_spark.sql.engine import SqlEngine

    p = tmp_path / "dim.csv"
    p.write_text("id,label\n1,gold\n2,silver\n")
    eng = SqlEngine(spark)
    eng.register_stream(
        "facts", spark.createDataFrame([(1, 9.0), (2, 4.0)], "id int, v double")
    )
    df = eng.execute(
        f"SELECT f.v, d.label FROM facts f JOIN file://{p} d ON f.id = d.id "
        'WITH ("file.format" = "csv", "header" = "true")'
    )
    got = {r["label"]: r["v"] for r in df.collect()}
    assert got == {"gold": 9.0, "silver": 4.0}


def test_uri_file_streaming_watch(spark, tmp_path):
    """create-table-wildcard.md:54-58 `watch=true`: a file URI in a
    streaming CSAS wires through spark.readStream (the reference's file
    watcher analog) via the same cfg path as WITH-prop sources."""
    from velostream_spark.sql.engine import SqlEngine

    src = tmp_path / "in"
    src.mkdir()
    (src / "app-1.json").write_text('{"n": 1}\n{"n": 2}\n')
    out = str(tmp_path / "out")
    eng = SqlEngine(spark)
    job = eng.execute_streaming(
        f"CREATE STREAM wlog AS SELECT n FROM file://{src}/app-*.json?format=jsonl&watch=true "
        f"WITH ('wlog.type' = 'file_sink', 'wlog.path' = '{out}', "
        f"'wlog.format' = 'parquet');"
    )
    try:
        got = sorted(r["n"] for r in spark.read.parquet(out).collect())
        assert got == [1, 2]
    finally:
        eng.execute("STOP JOB wlog")


def test_validator_accepts_uri_sources():
    """URI FROM sources are self-configuring — the validator must not
    demand a WITH-clause source config for them (query_analyzer
    requirement analysis skips StreamSource::Uri)."""
    from velostream_spark.sql.validator import validate_app

    rep = validate_app(
        "CREATE TABLE t1 AS SELECT k PRIMARY KEY, v FROM file:///d/x.csv "
        'WITH ("file.format" = "csv");',
        registered=set(),
    )
    assert rep.errors == []


# ---------------------------------------------------------------------------
# INTO sink URIs (clauses.rs:534: INTO sink_name | INTO 'kafka://…')
# ---------------------------------------------------------------------------


def test_parse_uri_sink_mappings():
    from velostream_spark.sql.dialect import parse_uri_sink

    cfg = parse_uri_sink("kafka://broker:9092/out-topic")
    assert cfg["type"] == "kafka_sink"
    assert cfg["bootstrap.servers"] == "broker:9092"
    assert cfg["topic"] == "out-topic"
    cfg = parse_uri_sink("file:///tmp/out.parquet")
    assert cfg == {"type": "file_sink", "path": "/tmp/out.parquet",
                   "format": "parquet"}
    cfg = parse_uri_sink("file:///tmp/out?format=jsonl")
    assert cfg["format"] == "jsonl"
    with pytest.raises(ValueError, match="sink scheme"):
        parse_uri_sink("postgresql://h/db?table=t")


def test_into_uri_sink_executes(spark, tmp_path):
    """CTAS ... INTO 'file://…' writes through the file sink — both the
    quoted form the reference parses and the bare symmetric form."""
    from velostream_spark.sql.engine import SqlEngine

    eng = SqlEngine(spark)
    eng.register_stream(
        "src9", spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    )
    out = tmp_path / "o.parquet"
    eng.execute(
        f"CREATE TABLE snap AS SELECT id, s FROM src9 INTO 'file://{out}'"
    )
    got = sorted(r["id"] for r in spark.read.parquet(str(out)).collect())
    assert got == [1, 2]
    out2 = tmp_path / "o2.parquet"
    eng.execute(
        f"CREATE TABLE snap2 AS SELECT id, s FROM src9 INTO file://{out2}"
    )
    assert spark.read.parquet(str(out2)).count() == 2
