"""CREATE-surface DDL forms mined from the reference's own docs in round 8
(grammar: commands.rs:19-180 + clauses.rs:440 parse_column_definitions;
doc-faithful extensions — registration-only CREATE ... WITH, IF NOT
EXISTS, OR REPLACE, CREATE VIEW — follow the SESSION_START precedent:
the reference's shipped quickstart/hello-world examples use them even
though its parser rejects them, and the docs are the user contract)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

from velostream_spark.session import load_tables
from velostream_spark.sql.dialect import parse_statement
from velostream_spark.sql.engine import SqlEngine


@pytest.fixture()
def engine(spark):
    eng = SqlEngine(spark, time_col="ts")
    for name, df in load_tables(spark, SF_SMOKE, register_views=False).items():
        eng.register_stream(name, df)
    return eng


def test_column_definitions_parse_reference_grammar():
    st = parse_statement(
        "CREATE STREAM typed (id BIGINT NOT NULL, name VARCHAR(255), "
        "amount DECIMAL(10,2)) AS SELECT id, name, amount FROM src"
    )
    assert st.kind == "create_stream"
    assert st.schema_columns == [
        ("id", "BIGINT", False),
        ("name", "VARCHAR(255)", True),
        ("amount", "DECIMAL(10,2)", True),
    ]


def test_declared_schema_casts_select_output(engine):
    df = engine.execute(
        "CREATE STREAM typed_orders (o_orderkey BIGINT, o_totalprice "
        "DECIMAL(12,2)) AS SELECT o_orderkey, o_totalprice FROM orders"
    )
    assert dict(df.dtypes) == {
        "o_orderkey": "bigint",
        "o_totalprice": "decimal(12,2)",
    }
    # the TABLE arm casts too (it routes through a different CTAS path)
    dft = engine.execute(
        "CREATE TABLE typed_orders_t (o_orderkey BIGINT, o_totalprice "
        "DECIMAL(12,2)) AS SELECT o_orderkey, o_totalprice FROM orders"
    )
    assert dict(dft.dtypes)["o_totalprice"] == "decimal(12,2)"


def test_registration_only_with_props(engine):
    # quickstart/hello-world doc form: no AS, bare-key WITH props
    df = engine.execute(
        "CREATE STREAM orders_in WITH (topic = 'orders-topic', "
        "bootstrap.servers = 'localhost:9092', value.format = 'json')"
    )
    assert df.first()["registered"] is True
    assert engine.source_cfgs["orders_in"]["topic"] == "orders-topic"


def test_registration_only_schema_declares_empty_table(engine):
    df = engine.execute(
        "CREATE TABLE perf_baseline (ts TIMESTAMP, metric_name VARCHAR(100), "
        "v DOUBLE)"
    )
    assert df.count() == 0
    assert dict(df.dtypes) == {
        "ts": "timestamp",
        "metric_name": "string",
        "v": "double",
    }
    assert "perf_baseline" in engine.tables


def test_if_not_exists_keeps_existing(engine):
    engine.execute("CREATE STREAM snap AS SELECT o_orderkey FROM orders LIMIT 5")
    engine.execute(
        "CREATE STREAM IF NOT EXISTS snap AS SELECT o_orderkey FROM orders LIMIT 1"
    )
    assert engine.streams["snap"].count() == 5  # existing kept, CTAS skipped
    st = parse_statement("CREATE TABLE IF NOT EXISTS t AS SELECT 1 AS one")
    assert st.if_not_exists and st.kind == "create_table"


def test_primary_key_block_becomes_message_key():
    st = parse_statement(
        "CREATE TABLE portfolio_positions (PRIMARY KEY (account_id, symbol)) "
        "AS SELECT account_id, symbol FROM t"
    )
    assert st.key_fields == ["account_id", "symbol"]
    # FR-094 WITH-before-AS form
    st2 = parse_statement(
        "CREATE TABLE latest_orders (PRIMARY KEY (order_id)) WITH "
        "('dedup.enabled' = 'true') AS SELECT order_id FROM orders"
    )
    assert st2.key_fields == ["order_id"]
    assert st2.with_props["dedup.enabled"] == "true"


def test_create_view_registers_named_query(engine):
    df = engine.execute(
        "CREATE VIEW order_keys AS SELECT o_orderkey FROM orders LIMIT 3"
    )
    assert df.count() == 3
    assert "order_keys" in engine.streams


def test_rollback_version_without_to():
    st = parse_statement("ROLLBACK JOB user_analytics VERSION '0.9.0'")
    assert st.kind == "job" and st.job_action == "rollback"
    assert st.job_version == "0.9.0"


def test_array_literal_property_value():
    st = parse_statement(
        "CREATE STREAM lake AS SELECT * FROM src WITH (format = 'parquet', "
        "partition_by = ['year', 'month'], compression = 'snappy')"
    )
    assert st.with_props["partition_by"] == "['year', 'month']"
    assert st.with_props["compression"] == "snappy"


def test_validator_ignores_column_block_as_function():
    from velostream_spark.sql.validator import validate_statement

    rep = validate_statement("CREATE TABLE t2 (a BIGINT, b STRING)")
    assert rep.ok, rep.errors
    # but functions in the AS query are still validated
    rep2 = validate_statement(
        "CREATE STREAM s (a BIGINT) AS SELECT FAKEFUNC(a) AS x FROM events",
        registered={"events"},
    )
    assert any("FAKEFUNC" in e for e in rep2.errors)


def test_create_from_uri_registers_source(engine, tmp_path):
    import json as _json

    p = tmp_path / "ev.jsonl"
    p.write_text("\n".join(_json.dumps({"a": i}) for i in range(4)))
    # known scheme: readable immediately
    engine.execute(f"CREATE STREAM ev_in FROM file://{p}?format=jsonl")
    assert engine.streams["ev_in"].count() == 4
    # doc's to-be-added connector: registers, errors only at read
    df = engine.execute(
        "CREATE STREAM events_redis FROM "
        "redis://localhost:6379?key_pattern=events:*&format=json"
    )
    assert df.first()["registered"] is True
    assert engine.source_cfgs["events_redis"]["type"] == "redis_source"
    # FROM KAFKA '<uri>' spelling (configuration-api-reference.md)
    df2 = engine.execute(
        "CREATE STREAM user_events FROM KAFKA 'kafka://localhost:9092/events' "
        "WITH (group.id = 'analytics')"
    )
    assert engine.source_cfgs["user_events"]["topic"] == "events"


def test_show_streams_lists_registration_only(engine):
    engine.execute(
        "CREATE STREAM pending_redis FROM redis://localhost:6379?fmt=json"
    )
    rows = engine.execute("SHOW STREAMS 'pending%'")
    names = [r["stream_name"] for r in rows]
    assert names == ["pending_redis"]


def test_show_classifies_registration_only_table_as_table(engine):
    """A registration-only CREATE TABLE ... WITH (connector cfg, no schema)
    is a TABLE in the registry: SHOW TABLES lists it, SHOW STREAMS must not
    (round-8 advice — the old probe keyed on the '_source' cfg suffix and
    misfiled it as a STREAM)."""
    engine.execute(
        "CREATE TABLE pending_dim FROM redis://localhost:6379?fmt=json"
    )
    stream_names = [r["stream_name"] for r in engine.execute("SHOW STREAMS")]
    assert "pending_dim" not in stream_names
    table_rows = {r["table_name"]: r for r in engine.execute("SHOW TABLES")}
    assert "pending_dim" in table_rows
    assert table_rows["pending_dim"]["type"] == "TABLE"
    # the stream twin still files under SHOW STREAMS
    engine.execute(
        "CREATE STREAM pending_str FROM redis://localhost:6379?fmt=json"
    )
    assert "pending_str" in [
        r["stream_name"] for r in engine.execute("SHOW STREAMS")
    ]


def test_wired_create_table_registers_as_table_not_stream(engine, tmp_path):
    """A WIRED registration-only CREATE TABLE (readable file source) must
    land in self.tables, list under SHOW TABLES only, and be queryable —
    the round-9 review found _wire_sources registered every wired source
    as a STREAM regardless of created kind, double-listing it."""
    import json

    p = tmp_path / "dim.jsonl"
    p.write_text(
        "\n".join(json.dumps({"k": i, "v": f"x{i}"}) for i in range(3))
    )
    engine.execute(
        f"CREATE TABLE wired_dim WITH ("
        f"'wired_dim.type' = 'file_source', "
        f"'wired_dim.path' = '{p}', "
        f"'wired_dim.format' = 'jsonl')"
    )
    assert "wired_dim" in engine.tables and "wired_dim" not in engine.streams
    stream_names = [r["stream_name"] for r in engine.execute("SHOW STREAMS")]
    assert "wired_dim" not in stream_names
    table_rows = [r["table_name"] for r in engine.execute("SHOW TABLES")]
    assert table_rows.count("wired_dim") == 1  # listed once, not twice
    assert engine.execute("SELECT COUNT(*) AS n FROM wired_dim").first()["n"] == 3
    # the STREAM twin of the same cfg still wires as a stream
    engine.execute(
        f"CREATE STREAM wired_str WITH ("
        f"'wired_str.type' = 'file_source', "
        f"'wired_str.path' = '{p}', "
        f"'wired_str.format' = 'jsonl')"
    )
    assert "wired_str" in engine.streams and "wired_str" not in engine.tables


def test_show_tables_lists_configless_registration_only_table(engine):
    """A schema-less CREATE TABLE whose WITH props resolve to no source
    cfg of its own (here: props prefixed for its sink) is still a
    registration (created_kinds records it) — it must list under SHOW
    TABLES, not vanish from both SHOW arms (round-9 advice: the TABLES
    arm required source_cfgs membership)."""
    engine.execute(
        "CREATE TABLE pending_cfgless WITH "
        "('out_sink.type' = 'file_sink', 'out_sink.path' = '/tmp/x.json')"
    )
    stream_names = [r["stream_name"] for r in engine.execute("SHOW STREAMS")]
    assert "pending_cfgless" not in stream_names
    table_rows = {r["table_name"]: r for r in engine.execute("SHOW TABLES")}
    assert "pending_cfgless" in table_rows
    assert table_rows["pending_cfgless"]["type"] == "TABLE"
