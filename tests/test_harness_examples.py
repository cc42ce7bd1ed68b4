"""Execute the reference's shipped `demo/test_harness_examples` — tier-1
basic and tier-2 aggregation SQL — end-to-end through SqlEngine, applying
each shipped `.test.yaml` spec's semantics.

The specs follow the reference's velo-test harness model: generate N
records from a declarative schema (`schemas/*.schema.yaml`: typed fields
with range / enum / length constraints, epoch-ms event times with optional
sequential time simulation), run the SHIPPED SQL VERBATIM, then assert on
the output records (`record_count`, `schema_contains`, `field_values`,
`no_nulls`).

The examples' sources/sinks are Kafka; broker I/O is environment-exempt
(README "Kafka runtime status"), so this harness plugs in at the exact
mock-transport seam test_kafka_transport.py uses: the generated records are
pre-registered under the source's stream name (what the Kafka source
builder would produce post-decode), and the Kafka SINK is captured by
patching `write_batch` — everything between those two seams (dialect parse,
WITH-clause routing, window injection, aggregation, EMIT handling, key
extraction) is the real engine.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pytest
import yaml

from pyspark.sql import functions as F

EXAMPLES = "/root/reference/demo/test_harness_examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference harness examples not present"
)

#: deterministic "now" for time_simulation (no absolute-time predicates in
#: any example SQL, so the anchor is arbitrary but must be stable)
NOW = dt.datetime(2026, 1, 1, 12, 0, 0)

_DURATION = {"h": 3600, "m": 60, "s": 1}


def _rel_time(spec: str) -> dt.datetime:
    if spec == "now":
        return NOW
    sign = -1 if spec.startswith("-") else 1
    n, unit = int(spec.strip("+-")[:-1]), spec[-1]
    return NOW + dt.timedelta(seconds=sign * n * _DURATION[unit])


def _load_schema(name: str) -> dict:
    with open(os.path.join(EXAMPLES, "schemas", f"{name}.schema.yaml")) as fh:
        return yaml.safe_load(fh)


def _generate(schema: dict, n: int, time_sim: dict | None, rng) -> list[dict]:
    """velo-test record generator semantics: per-field constraint-driven
    values; `time_simulation.sequential` spreads event_time evenly over
    [start_time, end_time]."""
    rows = [dict() for _ in range(n)]
    for f in schema["fields"]:
        fname, ftype = f["name"], f["type"]
        cons = f.get("constraints", {}) or {}
        if "enum_values" in cons:
            ev = cons["enum_values"]
            vals = rng.choice(
                ev["values"], size=n, p=ev.get("weights")
            ).tolist()
        elif "timestamp_epoch_ms" in cons:
            tw = cons["timestamp_epoch_ms"]
            start = int(_rel_time(tw["start"]).timestamp() * 1000)
            end = int(_rel_time(tw["end"]).timestamp() * 1000)
            if time_sim and time_sim.get("sequential"):
                start = int(_rel_time(time_sim["start_time"]).timestamp() * 1000)
                end = int(_rel_time(time_sim["end_time"]).timestamp() * 1000)
                vals = np.linspace(start, end, n).astype("int64").tolist()
            else:
                vals = rng.integers(start, end, n).tolist()
        elif "range" in cons:
            lo, hi = cons["range"]["min"], cons["range"]["max"]
            if ftype == "integer":
                vals = rng.integers(int(lo), int(hi) + 1, n).tolist()
            else:
                vals = rng.uniform(float(lo), float(hi), n)
                if isinstance(ftype, dict) and "decimal" in ftype:
                    vals = np.round(vals, ftype["decimal"].get("precision", 2))
                vals = vals.tolist()
        elif ftype == "boolean":
            vals = rng.integers(0, 2, n).astype(bool).tolist()
        elif ftype == "string":
            ln = cons.get("length", {"min": 5, "max": 12})
            vals = [
                f"{fname}_{i:06d}"[: ln["max"]].ljust(ln["min"], "x")
                for i in range(n)
            ]
        else:
            raise ValueError(f"unsupported generator field: {f}")
        if ftype == "boolean":
            vals = [bool(v) for v in vals]
        for r, v in zip(rows, vals):
            r[fname] = v
    return rows


def _spark_rows(spark, schema: dict, rows: list[dict]):
    """Generated records → DataFrame in the shape the Kafka source builder
    yields post-decode, plus `_event_time` (the reference system column the
    engine's window clauses key on) derived from the epoch-ms event_time."""

    def spark_type(f):
        t = f["type"]
        if isinstance(t, dict) and "decimal" in t:
            return "double"
        return {"integer": "long", "float": "double", "boolean": "boolean",
                "string": "string"}[t]

    ddl = ", ".join(f"{f['name']} {spark_type(f)}" for f in schema["fields"])
    df = spark.createDataFrame(
        [tuple(r[f["name"]] for f in schema["fields"]) for r in rows], ddl
    )
    if "event_time" in df.columns:
        df = df.withColumn(
            "_event_time", F.timestamp_millis(F.col("event_time"))
        )
    return df


def _assert_spec(rows: list[dict], columns: list[str], assertions: list[dict]):
    for a in assertions:
        typ = a["type"]
        if typ == "record_count":
            if "equals" in a:
                assert len(rows) == a["equals"], a
            if "greater_than" in a:
                assert len(rows) > a["greater_than"], a
            if "less_than" in a:
                assert len(rows) < a["less_than"], a
        elif typ == "schema_contains":
            missing = [f for f in a["fields"] if f not in columns]
            assert not missing, f"missing columns {missing} in {columns}"
        elif typ == "no_nulls":
            for f in a["fields"]:
                assert all(r[f] is not None for r in rows), f
        elif typ == "field_values":
            f, op, val = a["field"], a["operator"], a["value"]
            for r in rows:
                if op == "greater_than":
                    assert r[f] > val, (f, r[f])
                elif op == "equals":
                    assert r[f] == val, (f, r[f])
                else:
                    raise ValueError(f"unsupported operator {op!r}")
        else:
            raise ValueError(f"unsupported assertion {typ!r}")


def _run_example(spark, monkeypatch, tier: str, stem: str):
    from velostream_spark.sql.engine import SqlEngine

    with open(os.path.join(EXAMPLES, tier, f"{stem}.sql")) as fh:
        sql = fh.read()
    with open(os.path.join(EXAMPLES, tier, f"{stem}.test.yaml")) as fh:
        spec = yaml.safe_load(fh)

    qspec = spec["queries"][0]
    eng = SqlEngine(spark)
    rng = np.random.default_rng(7)
    for inp in qspec["inputs"]:
        schema = _load_schema(inp["schema"])
        n = inp.get("records", spec.get("default_records", 100))
        rows = _generate(schema, n, inp.get("time_simulation"), rng)
        eng.register_stream(inp["source"], _spark_rows(spark, schema, rows))

    captured: dict = {}

    def fake_write_batch(df, cfg, key_fields=None):
        captured["df"] = df
        captured["cfg"] = cfg

    import velostream_spark.sources.kafka as kafka_mod

    monkeypatch.setattr(kafka_mod, "write_batch", fake_write_batch)
    result = eng.execute(sql)
    out_df = captured.get("df", result)
    out_rows = [r.asDict() for r in out_df.collect()]
    _assert_spec(out_rows, out_df.columns, qspec["assertions"])
    return out_rows, out_df


def test_tier1_passthrough(spark, monkeypatch):
    """01_passthrough: 100 records flow unchanged to the sink (spec:
    record_count == 100, schema_contains, no_nulls)."""
    rows, _ = _run_example(spark, monkeypatch, "tier1_basic", "01_passthrough")
    assert len(rows) == 100


def test_tier1_filter(spark, monkeypatch):
    """03_filter: WHERE amount > 100 AND active = true — spec pins a strict
    subset of records, all satisfying both predicates."""
    rows, _ = _run_example(spark, monkeypatch, "tier1_basic", "03_filter")
    assert 0 < len(rows) < 100


def test_tier2_tumbling_window(spark, monkeypatch):
    """12_tumbling_window: GROUP BY symbol WINDOW TUMBLING(1m) with the
    _window_start/_window_end system columns, over 100 sequential records
    spanning 3 minutes — time-bucketed aggregates with non-null metrics."""
    rows, df = _run_example(
        spark, monkeypatch, "tier2_aggregations", "12_tumbling_window"
    )
    # multiple 1-minute buckets over the 3-minute simulation
    assert len({(r["window_start"], r["window_end"]) for r in rows}) >= 3
    # window bounds are INT64 epoch-millis exactly 1 minute apart
    # (_window_start/_window_end contract, system-columns.md:32-36)
    for r in rows:
        assert isinstance(r["window_start"], int)
        assert r["window_end"] - r["window_start"] == 60_000
