"""FR-073 SQL-native metric annotations: parser semantics mirror
reference parser/annotations.rs (state machine, validation); computed
values are oracle-checked against DuckDB over the same records; the
text renderer matches the expected-output shape documented in
examples/ecommerce_with_metrics.sql:284-301."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from velostream_spark.sql.metrics import (
    MetricParseError,
    compute_metric,
    parse_metric_annotations,
    prometheus_text,
)

# ---------------------------------------------------------------------------
# Parser (annotations.rs:240-355, 372-441)
# ---------------------------------------------------------------------------


def test_parse_multi_metric_block():
    sql = """
    -- Counter: orders
    -- @metric: orders_total
    -- @metric_type: counter
    -- @metric_labels: status, region
    -- @metric_condition: amount > 10

    -- @metric: order_value
    -- @metric_type: gauge
    -- @metric_help: "Current order value"
    -- @metric_field: amount
    CREATE STREAM s AS SELECT * FROM t;
    """
    anns = parse_metric_annotations(sql)
    assert [a.name for a in anns] == ["orders_total", "order_value"]
    assert anns[0].metric_type == "counter"
    assert anns[0].labels == ["status", "region"]
    assert anns[0].condition == "amount > 10"
    assert anns[1].metric_type == "gauge"
    assert anns[1].help == "Current order value"
    assert anns[1].field == "amount"
    assert anns[1].sample_rate == 1.0


def test_parse_buckets_preserves_declared_text():
    sql = """
    -- @metric: lat
    -- @metric_type: histogram
    -- @metric_field: v
    -- @metric_buckets: 0.1, 0.5, 1.0, 5
    SELECT 1;
    """
    (a,) = parse_metric_annotations(sql)
    assert a.buckets == [0.1, 0.5, 1.0, 5.0]
    # le labels render exactly as declared ("1.0" stays "1.0", "5" stays "5")
    assert a.bucket_texts == ["0.1", "0.5", "1.0", "5"]


def test_parse_bracketed_buckets_and_unknown_directives_skipped():
    sql = """
    -- @job_mode: batch
    -- @metric: m
    -- @metric_type: histogram
    -- @metric_field: v
    -- @metric_buckets: [1, 2, 4]
    SELECT 1;
    """
    (a,) = parse_metric_annotations(sql)
    assert a.buckets == [1.0, 2.0, 4.0]


@pytest.mark.parametrize(
    "bad",
    [
        # gauge requires @metric_field (annotations.rs:424-435)
        "-- @metric: g\n-- @metric_type: gauge\nSELECT 1;",
        # buckets must be strictly ascending (annotations.rs:388-396)
        "-- @metric: h\n-- @metric_type: histogram\n-- @metric_field: v\n"
        "-- @metric_buckets: 1, 1, 2\nSELECT 1;",
        # buckets must be positive (annotations.rs:400-405)
        "-- @metric: h\n-- @metric_type: histogram\n-- @metric_field: v\n"
        "-- @metric_buckets: -1, 2\nSELECT 1;",
        # invalid type
        "-- @metric: m\n-- @metric_type: summary\nSELECT 1;",
        # sample rate out of range
        "-- @metric: m\n-- @metric_sample_rate: 1.5\nSELECT 1;",
        # invalid Prometheus name
        "-- @metric: 9bad\nSELECT 1;",
        # @metric_type without @metric
        "-- @metric_type: counter\nSELECT 1;",
    ],
)
def test_parse_validation_errors(bad):
    with pytest.raises(MetricParseError):
        parse_metric_annotations(bad)


def test_parse_ignores_non_annotation_comments():
    sql = "-- velo_orders_total{status=\"x\"} 15234\nSELECT 1;"
    assert parse_metric_annotations(sql) == []


# ---------------------------------------------------------------------------
# Computation — DuckDB oracles over the same records
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def records(spark):
    base = dt.datetime(2026, 3, 1, 12, 0, 0)
    pdf = pd.DataFrame(
        {
            "status": ["ok", "ok", "fail", "ok", "fail", "ok"],
            "region": ["us", "eu", "us", "us", "eu", "eu"],
            "amount": [10.0, 250.0, 40.0, 900.0, 5.0, 120.0],
            "latency": [0.05, 0.4, 1.2, 8.0, 0.09, 2.0],
            "_event_time": [base + dt.timedelta(seconds=i) for i in range(6)],
        }
    )
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("r", pdf)
    return df, con


def _sorted(rows):
    return sorted(tuple(r) for r in rows)


def test_counter_with_condition_matches_oracle(records):
    df, con = records
    (ann,) = parse_metric_annotations(
        "-- @metric: big_total\n-- @metric_type: counter\n"
        "-- @metric_labels: status, region\n-- @metric_condition: amount > 50\nSELECT 1;"
    )
    got = _sorted(
        (r["status"], r["region"], r["value"])
        for r in compute_metric(df, ann).collect()
    )
    want = _sorted(
        con.execute(
            "SELECT status, region, CAST(COUNT(*) AS DOUBLE) FROM r "
            "WHERE amount > 50 GROUP BY status, region"
        ).fetchall()
    )
    assert got == want


def test_gauge_is_last_value_by_event_time(records):
    df, con = records
    (ann,) = parse_metric_annotations(
        "-- @metric: amt\n-- @metric_type: gauge\n"
        "-- @metric_field: amount\n-- @metric_labels: region\nSELECT 1;"
    )
    got = _sorted(
        (r["region"], r["value"]) for r in compute_metric(df, ann).collect()
    )
    want = _sorted(
        con.execute(
            "SELECT region, amount FROM r QUALIFY "
            "ROW_NUMBER() OVER (PARTITION BY region ORDER BY _event_time DESC) = 1"
        ).fetchall()
    )
    assert got == want


def test_histogram_cumulative_buckets_match_oracle(records):
    df, con = records
    (ann,) = parse_metric_annotations(
        "-- @metric: lat\n-- @metric_type: histogram\n-- @metric_field: latency\n"
        "-- @metric_labels: status\n-- @metric_buckets: 0.1, 0.5, 2.0\nSELECT 1;"
    )
    got = _sorted(
        (r["status"], r["le"], r["value"])
        for r in compute_metric(df, ann).collect()
    )
    want = []
    for le in ("0.1", "0.5", "2.0"):
        want += con.execute(
            f"SELECT status, '{le}', CAST(SUM(CASE WHEN latency <= {le} "
            "THEN 1 ELSE 0 END) AS DOUBLE) FROM r GROUP BY status"
        ).fetchall()
    want += con.execute(
        "SELECT status, '+Inf', CAST(COUNT(*) AS DOUBLE) FROM r GROUP BY status"
    ).fetchall()
    want += con.execute(
        "SELECT status, '_sum', SUM(latency) FROM r GROUP BY status"
    ).fetchall()
    want += con.execute(
        "SELECT status, '_count', CAST(COUNT(*) AS DOUBLE) FROM r GROUP BY status"
    ).fetchall()
    got_rounded = [(s, le, round(v, 9)) for s, le, v in got]
    want_rounded = _sorted((s, le, round(float(v), 9)) for s, le, v in want)
    assert got_rounded == want_rounded


def test_nested_map_labels_with_unknown_default(spark):
    """Dotted label paths walk map/struct values; a missing key becomes
    'unknown' (observability/label_extraction.rs:48-90, default at :26-32) —
    the shape iot_monitoring_with_metrics.sql relies on."""
    df = spark.createDataFrame(
        [
            ("d1", 71.0, {"region": "us", "zone": "a"}),
            ("d2", 95.0, {"region": "us"}),
            ("d3", 40.0, {"region": "eu", "zone": "b"}),
        ],
        "device_id string, temperature double, metadata map<string,string>",
    )
    (ann,) = parse_metric_annotations(
        "-- @metric: temp_alerts\n-- @metric_type: counter\n"
        "-- @metric_labels: metadata.region, metadata.zone\n"
        "-- @metric_condition: temperature > 50\nSELECT 1;"
    )
    got = _sorted(
        (r["metadata_region"], r["metadata_zone"], r["value"])
        for r in compute_metric(df, ann).collect()
    )
    assert got == [("us", "a", 1.0), ("us", "unknown", 1.0)]
    text = prometheus_text([(ann, df)])
    assert 'temp_alerts{metadata.region="us",metadata.zone="unknown"} 1' in text


def test_counter_without_labels_is_global(records):
    df, _ = records
    (ann,) = parse_metric_annotations("-- @metric: n\nSELECT 1;")
    rows = compute_metric(df, ann).collect()
    assert len(rows) == 1 and rows[0]["value"] == 6.0


# ---------------------------------------------------------------------------
# Exposition format (examples/ecommerce_with_metrics.sql:284-301)
# ---------------------------------------------------------------------------


def test_prometheus_text_shape(records):
    df, _ = records
    anns = parse_metric_annotations(
        "-- @metric: orders_total\n-- @metric_type: counter\n"
        "-- @metric_help: \"Orders by status\"\n-- @metric_labels: status\n"
        "-- @metric: lat\n-- @metric_type: histogram\n-- @metric_field: latency\n"
        "-- @metric_buckets: 1.0\nSELECT 1;"
    )
    text = prometheus_text([(a, df) for a in anns])
    lines = text.splitlines()
    assert "# HELP orders_total Orders by status" in lines
    assert "# TYPE orders_total counter" in lines
    assert 'orders_total{status="fail"} 2' in lines
    assert 'orders_total{status="ok"} 4' in lines
    assert "# TYPE lat histogram" in lines
    assert 'lat_bucket{le="1.0"} 3' in lines
    assert 'lat_bucket{le="+Inf"} 6' in lines
    assert "lat_count 6" in lines


def test_engine_binds_metrics_through_execute_app(spark):
    from velostream_spark.sql.engine import SqlEngine
    import pandas as pd

    eng = SqlEngine(spark)
    pdf = pd.DataFrame(
        {
            "status": ["a", "a", "b"],
            "v": [1.0, 2.0, 3.0],
            "_event_time": pd.to_datetime(
                ["2026-03-01 10:00:00", "2026-03-01 10:00:01", "2026-03-01 10:00:02"]
            ),
        }
    )
    eng.register_stream("src", spark.createDataFrame(pdf))
    eng.execute_app(
        """
        -- @metric: s_total
        -- @metric_type: counter
        -- @metric_labels: status
        CREATE STREAM out1 AS SELECT status, v FROM src;
        """
    )
    assert "s_total" in eng.metrics
    got = {(r["status"], r["value"]) for r in eng.metric_values("s_total").collect()}
    assert got == {("a", 2.0), ("b", 1.0)}
    assert 's_total{status="a"} 2' in eng.prometheus_text()


def test_metrics_bind_on_streaming_deploy(spark, tmp_path):
    """@metric on a streaming CSAS binds to the deployed job; values fold
    over the job's emitted records (memory sink)."""
    import pandas as pd

    from velostream_spark.sql.engine import SqlEngine

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame(
        {
            "status": ["a", "a", "b", "a"],
            "v": [1.0, 5.0, 3.0, 2.0],
            "ts": pd.to_datetime(
                ["2026-03-01 10:00:00"] * 4
            ),
        }
    ).to_parquet(
        src / "part.parquet", coerce_timestamps="us", allow_truncated_timestamps=True
    )
    eng = SqlEngine(spark, time_col="ts")
    eng.execute_streaming(
        f"""
        -- @metric: stream_v_total
        -- @metric_type: counter
        -- @metric_labels: status
        -- @metric_condition: v > 1.5
        CREATE STREAM mstream AS SELECT status, v, ts FROM msrc
        WITH ('msrc.type' = 'file_source', 'msrc.path' = '{src}',
              'msrc.format' = 'parquet')
        """
    )
    assert "stream_v_total" in eng.metrics
    got = {
        (r["status"], r["value"])
        for r in eng.metric_values("stream_v_total").collect()
    }
    assert got == {("a", 2.0), ("b", 1.0)}


def test_top_level_null_label_defaults_to_unknown_and_escaping(spark):
    """r5 advice: a NULL top-level label column takes the same 'unknown'
    default as missing nested paths (label_extraction.rs:26-32) — never the
    Python string 'None' — and label values containing backslash / quote /
    newline are escaped per the Prometheus text exposition format."""
    df = spark.createDataFrame(
        [('a"b\\c\nd',), (None,)], "status string"
    )
    (ann,) = parse_metric_annotations(
        "-- @metric: n\n-- @metric_type: counter\n"
        "-- @metric_labels: status\nSELECT 1;"
    )
    text = prometheus_text([(ann, df)])
    assert 'n{status="unknown"} 1' in text
    assert 'n{status="a\\"b\\\\c\\nd"} 1' in text
    assert "None" not in text
