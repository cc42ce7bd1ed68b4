"""Command-line entry points — the Spark analog of the reference's shipped
binaries (src/bin/):

- ``batch``      → `velo-sql-batch` ("Execute SQL files as batch scripts
                   that run and exit", velo-sql-batch.rs:30): split the app,
                   execute every statement on bounded sources, print a
                   per-statement summary, exit.
- ``deploy-app`` → `velo-sql deploy-app --file app.sql`
                   (velo-sql.rs:400): execute the application through the
                   engine (CSAS/CTAS register their streams/tables; START
                   JOB / DEPLOY JOB statements go through the job manager),
                   then list jobs; ``--no-monitor`` mirrors the reference
                   flag (exit immediately instead of awaiting job drain).
- ``validate``   → `velo-config-validator` + SqlValidator (validator.md):
                   parse + configuration + semantic function checks; exit
                   code 1 when errors are present. ``--lenient`` maps to
                   SemanticValidator::new_lenient (unknown functions warn).
- ``server``     → `velo-sql server` is the Kafka-broker multi-job server;
                   broker I/O is environment-exempt here (README), so the
                   subcommand explains that and exits non-zero.

Tables: ``--sf-dir`` registers the test parquet tables as streams before
the app runs (the batch analog of the reference's pre-provisioned topics);
``WITH``-clause file sources in the app itself work either way.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="velostream-spark",
        description="Velostream SQL on Spark — batch/deploy/validate",
    )
    sub = p.add_subparsers(dest="command", required=True)

    b = sub.add_parser("batch", help="execute a .sql application and exit")
    b.add_argument("--file", required=True, help="path to the .sql app")
    b.add_argument("--sf-dir", help="register the test parquet tables from this dir")
    b.add_argument("--time-col", default="_event_time")
    b.add_argument("--json", action="store_true", help="machine-readable summary")

    d = sub.add_parser("deploy-app", help="deploy a .sql application's jobs")
    d.add_argument("--file", required=True)
    d.add_argument("--sf-dir", help="register the test parquet tables from this dir")
    d.add_argument("--time-col", default="_event_time")
    d.add_argument("--no-monitor", action="store_true",
                   help="exit immediately after deployment (velo-sql.rs:76)")

    v = sub.add_parser("validate", help="pre-flight validation, no execution")
    v.add_argument("--file", required=True)
    v.add_argument("--lenient", action="store_true",
                   help="unknown functions warn instead of erroring")

    s = sub.add_parser("server", help="(env-exempt) Kafka multi-job server")
    s.add_argument("--brokers", default="localhost:9092")
    s.add_argument("--port", type=int, default=8080)

    g = sub.add_parser(
        "schema",
        help="emit JSON Schema for WITH-clause configs (velo-schema-generator)",
    )
    g.add_argument("--output", help="write to this path instead of stdout")
    return p


def _config_json_schema() -> dict:
    """JSON Schema for the WITH-clause source/sink configurations — the
    analog of `velo-schema-generator` (src/bin/velo-schema-generator.rs:
    "Generates comprehensive JSON Schema files for IDE integration and
    validation", FR-057 self-registering config schema). Generated from
    the SAME constants the validator enforces, so the schema cannot drift
    from what the engine accepts."""
    from velostream_spark.sql.validator import (
        _FILE_FORMATS,
        _KNOWN_OPTS,
        _SINK_TYPES,
        _SOURCE_TYPES,
    )

    prop_defs = {
        opt: {"type": "string"} for opt in sorted(_KNOWN_OPTS) if opt != "type"
    }
    prop_defs["format"] = {"type": "string", "enum": sorted(_FILE_FORMATS)}

    def node(types: set[str], required: list[str]) -> dict:
        return {
            "type": "object",
            "properties": {
                "type": {"type": "string", "enum": sorted(types)},
                **prop_defs,
            },
            "required": ["type", *required],
            "additionalProperties": True,  # 'kafka.*' client passthrough
        }

    return {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "Velostream-Spark WITH-clause configuration",
        "description": (
            "Per-name source/sink options ('<name>.<option>' keys in the "
            "WITH clause, or a config_file YAML with extends:)"
        ),
        "type": "object",
        "properties": {
            "source": node(_SOURCE_TYPES, []),
            "sink": node(_SINK_TYPES, []),
        },
    }


def _engine(args):
    from velostream_spark.session import get_session, load_tables
    from velostream_spark.sql.engine import SqlEngine

    spark = get_session("velostream-spark-cli")
    eng = SqlEngine(spark, time_col=args.time_col)
    if args.sf_dir:
        for name, df in load_tables(spark, args.sf_dir, register_views=False).items():
            eng.register_stream(name, df)
    return eng


def _describe(result) -> str:
    from pyspark.sql import DataFrame

    if isinstance(result, DataFrame):
        return f"{result.count()} rows"
    if isinstance(result, list):
        return f"{len(result)} entries"
    return str(result)


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.command == "schema":
        text = json.dumps(_config_json_schema(), indent=2)
        if args.output:
            with open(args.output, "w") as fh:
                fh.write(text + "\n")
        else:
            print(text)
        return 0

    if args.command == "server":
        print(
            "velo-sql server requires Kafka broker I/O, which is an "
            "environment exemption in this build (no connector jar / "
            "network / Python Kafka client — see README). Use `batch` or "
            "`deploy-app` with file sources instead.",
            file=sys.stderr,
        )
        return 2

    if args.command == "validate":
        from velostream_spark.sql.dialect import split_statements
        from velostream_spark.sql.validator import ValidationReport, validate_statement

        with open(args.file) as fh:
            app = fh.read()
        combined = ValidationReport()
        for stmt in split_statements(app):
            rep = validate_statement(stmt, strict_functions=not args.lenient)
            combined.errors.extend(rep.errors)
            combined.warnings.extend(rep.warnings)
        for w in combined.warnings:
            print(f"warning: {w}")
        for e in combined.errors:
            print(f"error: {e}", file=sys.stderr)
        print(f"{len(combined.errors)} errors, {len(combined.warnings)} warnings")
        return 0 if combined.ok else 1

    eng = _engine(args)
    with open(args.file) as fh:
        app = fh.read()

    if args.command == "batch":
        from velostream_spark.sql.dialect import split_statements_keep_comments

        stmts = split_statements_keep_comments(app)
        summary = []
        for i, stmt in enumerate(stmts):
            result = eng.execute(stmt)
            head = " ".join(stmt.split())[:60]
            summary.append({"statement": i + 1, "sql": head, "result": _describe(result)})
        if args.json:
            print(json.dumps(summary))
        else:
            for row in summary:
                print(f"[{row['statement']:>3}] {row['result']:<12} {row['sql']}")
        return 0

    # deploy-app
    eng.execute_app(app)
    jobs = eng.execute("SHOW JOBS")
    for j in jobs:
        print(json.dumps(j, default=str))
    if not args.no_monitor:
        for j in jobs:
            name = j.get("job_name") or j.get("name")
            if name:
                try:
                    eng.jobs.wait(name)
                except Exception:  # already finished / bounded job
                    pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
