"""Execute the reference's five production trading apps against their
SHIPPED test specs (demo/trading/tests/*.test.yaml — the same velo-test
harness protocol as the tier1/tier2 examples).

The reference deploys these apps in its demo (start-demo.sh:75-79) and
tests them through the spec files: per-query inputs generated from the
shipped schemas/*.schema.yaml (enum weights, ranges, random-walk prices,
log-normal volumes, derived fields), `data_file` reference-table CSVs
from demo/trading/data/, `from_previous` chaining between pipeline
stages, and shipped assertions (record_count / schema_contains /
no_nulls / field_values) plus metric_assertions over the apps' @metric
blocks (FR-073). Each statement below runs VERBATIM from the shipped
.sql file; only the statements each spec covers are executed — exactly
the harness's own scope.
"""

from __future__ import annotations

import datetime as dt
import os
import re

import numpy as np
import pytest
import yaml

from pyspark.sql import functions as F

TRADING = "/root/reference/demo/trading"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TRADING), reason="reference trading demo not present"
)

#: deterministic anchor for "now"-relative time_simulation windows
NOW = dt.datetime(2026, 1, 1, 12, 0, 0)

_DUR = {"h": 3600, "m": 60, "s": 1}


def _rel_time(spec: str) -> dt.datetime:
    if spec == "now":
        return NOW
    sign = -1 if spec.startswith("-") else 1
    n, unit = int(spec.strip("+-")[:-1]), spec[-1]
    return NOW + dt.timedelta(seconds=sign * n * _DUR[unit])


def _load_schema(name: str) -> dict:
    with open(os.path.join(TRADING, "schemas", f"{name}.schema.yaml")) as fh:
        return yaml.safe_load(fh)


_DERIVED_RE = re.compile(
    r"^\s*(\w+)\s*\*\s*random\(\s*([0-9.]+)\s*,\s*([0-9.]+)\s*\)\s*$"
)


def _generate(schema: dict, n: int, time_sim: dict | None, rng) -> dict:
    """Shipped-schema record generator: enum weights, ranges, GBM
    random-walk (drift/volatility, independent path per group_by value),
    log-normal, `derived: "<dep> * random(a, b)"`, epoch-ms `timestamp`
    fields. Returns {column: list}. Event times are sequential over the
    spec's time window (velo-test `time_simulation.sequential`)."""
    start = _rel_time((time_sim or {}).get("start_time", "-1h"))
    end = _rel_time((time_sim or {}).get("end_time", "now"))
    times = [
        start + dt.timedelta(seconds=float(s))
        for s in np.linspace(0, (end - start).total_seconds(), n, endpoint=False)
    ]
    cols: dict[str, list] = {"_event_time": times}
    deferred = []
    for f in schema["fields"]:
        fname, ftype = f["name"], f["type"]
        if isinstance(ftype, dict):  # {decimal: {precision: p}} → float
            ftype = "float"
        if fname == "_event_time":
            continue
        cons = f.get("constraints", {}) or {}
        if "derived" in cons:
            deferred.append((fname, cons["derived"]))
            continue
        if "enum_values" in cons:
            ev = cons["enum_values"]
            w = ev.get("weights")
            if w is not None:  # shipped weights may sum to 0.999…
                w = (np.asarray(w, dtype="float64") / np.sum(w)).tolist()
            vals = [str(v) for v in rng.choice(ev["values"], size=n, p=w)]
        elif fname == "timestamp" and ftype == "integer":
            vals = [int(t.timestamp() * 1000) for t in times]
        elif "range" in cons:
            lo, hi = float(cons["range"]["min"]), float(cons["range"]["max"])
            dist = cons.get("distribution", {}) or {}
            if "random_walk" in dist:
                rw = dist["random_walk"]
                drift = float(rw.get("drift", 0.0))
                vol = float(rw.get("volatility", 0.01))
                group_col = rw.get("group_by")
                groups = (
                    cols[group_col] if group_col in cols else [""] * n
                )
                state: dict[str, float] = {}
                out = []
                for g in groups:
                    cur = state.get(g, (lo + hi) / 2.0)
                    cur *= 1.0 + drift + vol * float(rng.standard_normal())
                    cur = min(max(cur, lo), hi)
                    state[g] = cur
                    out.append(round(cur, 4))
                vals = out
            elif "log_normal" in dist:
                ln = dist["log_normal"]
                raw = rng.lognormal(
                    float(ln.get("mean", 0.0)), float(ln.get("std_dev", 1.0)), n
                )
                span = np.clip(raw / raw.max(), 0, 1)
                vals = (lo + span * (hi - lo)).astype(
                    "int64" if ftype == "integer" else "float64"
                ).tolist()
            elif ftype == "integer":
                vals = [int(v) for v in rng.integers(int(lo), int(hi) + 1, n)]
            else:
                vals = np.round(rng.uniform(lo, hi, n), 4).tolist()
        elif ftype == "integer":
            vals = [int(v) for v in rng.integers(0, 1_000_000, n)]
        elif ftype == "float":
            vals = np.round(rng.uniform(0, 1000, n), 4).tolist()
        elif ftype == "boolean":
            vals = [bool(v) for v in rng.integers(0, 2, n)]
        else:  # string without constraints
            vals = [f"{fname}_{i:06d}" for i in range(n)]
        cols[fname] = vals
    for fname, d in deferred:
        m = _DERIVED_RE.match(d["expression"])
        if not m:
            raise ValueError(f"unsupported derived expression: {d['expression']}")
        dep, a, b = m.group(1), float(m.group(2)), float(m.group(3))
        base = np.asarray(cols[dep], dtype="float64")
        cols[fname] = np.round(base * rng.uniform(a, b, n), 4).tolist()
    return cols


def _spark_input(spark, schema: dict, cols: dict):
    typ = {"integer": "long", "float": "double", "boolean": "boolean",
           "string": "string"}
    # a schema may declare `_event_time` itself (market_data_ts.schema.yaml
    # models it as epoch-ms integer); the harness's timestamp-typed system
    # column takes that slot
    fields = [f for f in schema["fields"] if f["name"] != "_event_time"]

    def sql_type(t):
        if isinstance(t, dict):  # {decimal: {...}} → double
            return "double"
        return typ.get(t, "string")

    ddl = ", ".join(
        f"{f['name']} {sql_type(f['type'])}" for f in fields
    ) + ", _event_time timestamp"
    names = [f["name"] for f in fields] + ["_event_time"]
    rows = list(zip(*[cols[c] for c in names]))
    return spark.createDataFrame(rows, ddl)


def _app_statements(stem: str) -> dict[str, str]:
    from velostream_spark.sql.dialect import (
        parse_statement,
        split_statements_keep_comments,
    )

    with open(os.path.join(TRADING, "apps", f"{stem}.sql")) as fh:
        sql = fh.read()
    out = {}
    for chunk in split_statements_keep_comments(sql):
        st = parse_statement(chunk)
        if st.name:
            out[st.name] = chunk
    return out


def _strip_alias(field: str) -> str:
    return field.rsplit(".", 1)[-1]


#: Shipped-spec fields that the SAME app's shipped SQL never selects —
#: reference spec-vs-SQL drift, checked against the .sql text and skipped
#: explicitly rather than silently: app_risk.test.yaml asserts
#: `position_id` on trading_positions_ts, but app_risk.sql:1-10 keys the
#: stream on (trader_id, symbol) and selects no position_id.
SPEC_DRIFT = {"position_id"}


def _assert_outputs(rows: list[dict], columns: list[str], assertions: list[dict]):
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
            want = [_strip_alias(f) for f in a["fields"]]
            if "key_field" in a:
                want.append(_strip_alias(a["key_field"]))
            missing = [
                f for f in want if f not in columns and f not in SPEC_DRIFT
            ]
            assert not missing, f"missing columns {missing} in {columns}"
        elif typ == "no_nulls":
            for f in (_strip_alias(x) for x in a["fields"]):
                if f in SPEC_DRIFT and f not in columns:
                    continue
                assert all(r[f] is not None for r in rows), f
        elif typ == "field_values":
            f, op, val = _strip_alias(a["field"]), a["operator"], a["value"]
            for r in rows:
                if r[f] is None:
                    continue
                if op == "greater_than":
                    assert r[f] > val, (f, r[f])
                elif op in ("greater_than_or_equal", "greater_than_or_equals"):
                    assert r[f] >= val, (f, r[f])
                elif op in ("less_than_or_equal", "less_than_or_equals"):
                    assert r[f] <= val, (f, r[f])
                elif op == "less_than":
                    assert r[f] < val, (f, r[f])
                elif op == "equals":
                    assert r[f] == val, (f, r[f])
                elif op == "in":
                    assert r[f] in val, (f, r[f])
                else:
                    raise ValueError(f"unsupported operator {op!r}")
        else:
            raise ValueError(f"unsupported assertion {typ!r}")


def _assert_metrics(eng, assertions: list[dict]):
    for a in assertions:
        name = a["name"]
        if a["type"] == "metric_exists":
            assert name in eng.metrics, f"metric {name} not bound"
            _, ann = eng.metrics[name]
            if "expected_type" in a:
                assert ann.metric_type == a["expected_type"], ann
        elif a["type"] in ("metric_counter", "metric_gauge"):
            vals = [r["value"] for r in eng.metric_values(name).collect()]
            agg = sum(vals) if a["type"] == "metric_counter" else max(vals)
            op, val = a["operator"], a["value"]
            if op == "greater_than":
                assert agg > val, (name, agg)
            elif op == "equals":
                assert agg == val, (name, agg)
            else:
                raise ValueError(f"unsupported metric operator {op!r}")
        else:
            raise ValueError(f"unsupported metric assertion {a['type']!r}")


def _csv_table(spark, path: str):
    """Shipped reference-table CSV: literal NULL tokens are nulls (the
    data's evident intent — regulatory_watchlist.csv uses NULL for
    symbol-only vs trader-only restriction rows)."""
    return spark.read.csv(path, header=True, inferSchema=True, nullValue="NULL")


def _run_app_spec(spark, monkeypatch, stem: str, pre: dict | None = None) -> "tuple":
    from velostream_spark.sql.engine import SqlEngine

    with open(os.path.join(TRADING, "tests", f"{stem}.test.yaml")) as fh:
        spec = yaml.safe_load(fh)
    stmts = _app_statements(stem)

    # the apps' file-source config_files are relative to apps/
    # ('../configs/x.yaml' -> '../data/x.csv'), exactly how the reference
    # deploys them (start-demo.sh runs from the demo root)
    monkeypatch.chdir(os.path.join(TRADING, "apps"))
    eng = SqlEngine(spark)
    for name, df in (pre or {}).items():
        eng.register_stream(name, df)
    rng = np.random.default_rng(13)
    captured: dict = {}

    def fake_write_batch(df, cfg, key_fields=None):
        captured["df"] = df

    import velostream_spark.sources.kafka as kafka_mod

    monkeypatch.setattr(kafka_mod, "write_batch", fake_write_batch)

    default_n = spec.get("default_records", 1000)
    results: dict[str, list[dict]] = {}
    for q in spec["queries"]:
        for inp in q.get("inputs", []):
            src = inp["source"]
            if "from_previous" in inp:
                eng.register_stream(src, eng.streams[inp["from_previous"]])
            elif "data_file" in inp:
                path = os.path.normpath(
                    os.path.join(TRADING, "tests", inp["data_file"])
                )
                eng.register_stream(src, _csv_table(spark, path))
            elif src not in eng.streams:
                schema = _load_schema(inp.get("schema", src))
                n = inp.get("records", default_n)
                cols = _generate(schema, n, inp.get("time_simulation"), rng)
                eng.register_stream(src, _spark_input(spark, schema, cols))
        eng.execute(stmts[q["name"]])
        out_df = eng.streams[q["name"]]
        rows = [r.asDict() for r in out_df.collect()]
        results[q["name"]] = rows
        for out in q.get("outputs", []):
            _assert_outputs(rows, out_df.columns, out.get("assertions", []))
        _assert_metrics(eng, q.get("metric_assertions", []))
    return eng, results


def test_app_market_data(spark, monkeypatch):
    """market_data_pipeline: ingestion → 1s OHLCV candles (TUMBLE bounds,
    FIRST/LAST_VALUE aggregates, EMIT CHANGES) → instrument enrichment
    (stream-table LEFT JOIN against the shipped reference CSV), with the
    app's @metric counter/gauge assertions from the shipped spec."""
    eng, results = _run_app_spec(spark, monkeypatch, "app_market_data")
    assert set(results) == {
        "market_data_ts", "tick_buckets", "enriched_market_data"
    }
    # OHLCV sanity beyond the spec: high >= low per candle
    for r in results["tick_buckets"]:
        assert r["max_price"] >= r["min_price"]


def test_app_risk(spark, monkeypatch):
    """risk_monitoring: position ingestion with event-time watermark +
    update_previous late policy; @metric counter/gauge assertions."""
    eng, results = _run_app_spec(spark, monkeypatch, "app_risk")
    assert "trading_positions_ts" in results
    assert len(results["trading_positions_ts"]) == 500


def test_app_price_analytics(spark, monkeypatch):
    """price_analytics: ROWS WINDOW BUFFER analytics (LAG/LEAD/RANK/
    DENSE_RANK/PERCENT_RANK/STDDEV over per-symbol buffers) verbatim."""
    eng, results = _run_app_spec(spark, monkeypatch, "app_price_analytics")
    assert len(results["price_movement_alerts"]) > 0


def test_app_trading_signals(spark, monkeypatch):
    """trading_signals: sliding-window volume spikes, tumbling order-flow
    imbalance with HAVING + EMIT CHANGES, and the dual-exchange interval
    join arbitrage detector."""
    eng, results = _run_app_spec(spark, monkeypatch, "app_trading_signals")
    assert set(results) >= {"order_flow_imbalance", "arbitrage_detection"}
    # arbitrage semantics: every detected spread must be positive
    for r in results["arbitrage_detection"]:
        assert r["spread"] > 0


def test_app_compliance(spark, monkeypatch):
    """compliance: NOT EXISTS watchlist screening against the shipped
    regulatory_watchlist.csv; market-hours filter against the shipped
    instrument_schedules.csv (spec chains the compliant output into the
    active-hours statement via from_previous)."""
    watchlist = _csv_table(
        spark, os.path.join(TRADING, "data", "regulatory_watchlist.csv")
    )
    eng, results = _run_app_spec(
        spark, monkeypatch, "app_compliance",
        pre={"regulatory_watchlist": watchlist},
    )
    assert set(results) >= {"compliant_market_data", "active_hours_market_data"}
    for r in results["compliant_market_data"]:
        assert r["compliance_status"] == "COMPLIANT"
