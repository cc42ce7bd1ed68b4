"""CLI entry points (velostream_spark.cli) — the analog of the reference's
shipped binaries: velo-sql-batch (batch), velo-sql deploy-app, the
config/SQL validator (velo-config-validator + SqlValidator), and the
env-exempt server arm (src/bin/velo-sql.rs, velo-sql-batch.rs:30)."""

from __future__ import annotations

import json

import pytest

from velostream_spark.cli import main


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_validate_exit_codes(tmp_path, capsys):
    good = _write(
        tmp_path, "good.sql",
        "SELECT UPPER(n) AS u FROM t WITH ('t.type'='file_source', "
        "'t.path'='/x.csv');",
    )
    assert main(["validate", "--file", good]) == 0
    bad = _write(
        tmp_path, "bad.sql",
        "SELECT UPER(n) AS u FROM t WITH ('t.type'='file_source', "
        "'t.path'='/x.csv');",
    )
    assert main(["validate", "--file", bad]) == 1
    err = capsys.readouterr().err
    assert "unknown function 'UPER'" in err and "UPPER" in err
    # lenient mirrors SemanticValidator::new_lenient — warns, exits 0
    assert main(["validate", "--file", bad, "--lenient"]) == 0


def test_server_is_env_exempt(capsys):
    assert main(["server"]) == 2
    assert "environment exemption" in capsys.readouterr().err


@pytest.fixture
def restore_session_confs(spark):
    """The CLI's get_session() legitimately applies its tuned runtime confs
    (UTC timezone, ANSI off, ...) via getOrCreate — on the shared VANILLA
    test session that mutation would leak into every later test (the
    watermark tests assert local-time window boundaries). Snapshot and
    restore the confs get_session touches."""
    keys = [
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.session.timeZone",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.ansi.enabled",
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_batch_executes_app(spark, restore_session_confs, tmp_path, capsys):
    # `spark` fixture keeps the CLI's get_session() on the test session
    src = tmp_path / "in.csv"
    src.write_text("station,temp\na,1.5\na,2.5\nb,10.0\n")
    app = _write(
        tmp_path, "app.sql",
        f"""
        CREATE STREAM mins AS
        SELECT station, MIN(temp) AS min_t, MAX(temp) AS max_t
        FROM measurements
        GROUP BY station
        WITH ('measurements.type' = 'file_source',
              'measurements.path' = '{src}',
              'measurements.format' = 'csv');
        SELECT station, min_t FROM mins;
        """,
    )
    assert main(["batch", "--file", app, "--json"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert len(summary) == 2
    assert summary[0]["result"] == "2 rows"  # two stations
    assert summary[1]["result"] == "2 rows"


def test_schema_generator(tmp_path, capsys):
    """`schema` = velo-schema-generator (JSON Schema for WITH configs,
    FR-057): generated from the validator's own constants, so the schema
    can't accept what the engine rejects."""
    import json as _json

    out = tmp_path / "with.schema.json"
    assert main(["schema", "--output", str(out)]) == 0
    schema = _json.loads(out.read_text())
    assert schema["$schema"].startswith("http://json-schema.org")
    src = schema["properties"]["source"]
    assert "file_source" in src["properties"]["type"]["enum"]
    assert "kafka_source" in src["properties"]["type"]["enum"]
    assert "csv" in src["properties"]["format"]["enum"]
    assert main(["schema"]) == 0
    assert '"sink"' in capsys.readouterr().out
