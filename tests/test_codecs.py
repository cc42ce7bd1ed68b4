"""Serialization-codec tests: the Avro-schema mapping half of the
reference's codecs (avro_codec.rs type/logical-type handling) — pure
Python, no connector jar needed — plus connector gating and the DELTA
dialect rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    TimestampType,
)

from velostream_spark.sources import codecs
from velostream_spark.sql.dialect import translate_select


AVRO_SCHEMA = """
{
  "type": "record", "name": "Trade",
  "fields": [
    {"name": "symbol", "type": "string"},
    {"name": "qty", "type": "long"},
    {"name": "price", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 18, "scale": 4}},
    {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
    {"name": "note", "type": ["null", "string"]},
    {"name": "legs", "type": {"type": "array", "items": "double"}},
    {"name": "tags", "type": {"type": "map", "values": "string"}}
  ]
}
"""


def test_avro_schema_mapping():
    st = codecs.avro_schema_to_struct(AVRO_SCHEMA)
    by_name = {f.name: f for f in st.fields}
    assert by_name["symbol"].dataType == StringType()
    assert by_name["qty"].dataType == LongType()
    # decimal logical type → DecimalType: the ScaledInteger-parity path
    assert by_name["price"].dataType == DecimalType(18, 4)
    assert by_name["ts"].dataType == TimestampType()
    assert by_name["note"].dataType == StringType() and by_name["note"].nullable
    assert by_name["legs"].dataType == ArrayType(DoubleType())
    assert by_name["tags"].dataType == MapType(StringType(), StringType())


def test_avro_runtime_gated(spark):
    df = spark.createDataFrame([(1,)], "id int")
    col = codecs.encode_avro(F.struct("id"))
    with pytest.raises(Exception) as ei:
        df.select(col).collect()
    assert "avro" in str(ei.value).lower()


def test_delta_rewrite_and_execution(spark):
    sql, _, _, _ = translate_select(
        "SELECT user_id, DELTA(value) OVER (PARTITION BY user_id "
        "ORDER BY event_id) AS dv FROM events"
    )
    assert "DELTA" not in sql.upper()
    assert "lag(value, 1)" in sql

    from tests.conftest import SF_SMOKE
    from velostream_spark.session import load_tables

    load_tables(spark, SF_SMOKE, register_views=True)
    got = spark.sql(sql).toPandas().sort_values(["user_id"]).reset_index(drop=True)
    want = (
        spark.sql(
            "SELECT user_id, value - lag(value, 1) OVER (PARTITION BY user_id "
            "ORDER BY event_id) AS dv FROM events"
        )
        .toPandas()
        .sort_values(["user_id"])
        .reset_index(drop=True)
    )
    assert got["dv"].fillna(-1).round(9).tolist() == want["dv"].fillna(-1).round(9).tolist()


def test_delta_without_over_maps_reference_contexts():
    """r8 supersedes the old reject-adjudication: the reference defines
    no-OVER DELTA as max-min in aggregate context
    (aggregation/functions.rs:320-331) and a typed zero per-record
    (functions.rs:1809-1828); the dialect now mirrors both."""
    grouped = translate_select(
        "SELECT k, DELTA(value) AS d FROM events GROUP BY k"
    )[0]
    assert "(MAX(value) - MIN(value))" in grouped
    ungrouped = translate_select("SELECT DELTA(value) AS d FROM events")[0]
    assert "(value - value)" in ungrouped


def test_delta_grouping_is_scoped_per_occurrence():
    """Aggregate-vs-per-record DELTA is decided by the SELECT scope
    ENCLOSING each occurrence, not one statement-level GROUP BY probe
    (round-8 advice, medium): a grouped subquery under an ungrouped outer
    aggregates; an ungrouped subquery under a grouped outer does not."""
    # grouped subquery, ungrouped outer → inner DELTA must aggregate
    sql = translate_select(
        "SELECT d FROM (SELECT k, DELTA(value) AS d FROM events GROUP BY k) t"
    )[0]
    assert "(MAX(value) - MIN(value))" in sql
    assert "(value - value)" not in sql
    # ungrouped scalar subquery inside a grouped outer → per-record zero
    sql2 = translate_select(
        "SELECT k, MAX(value) AS m, "
        "(SELECT DELTA(price) FROM quotes LIMIT 1) AS z "
        "FROM events GROUP BY k"
    )[0]
    assert "(price - price)" in sql2
    assert "MAX(price)" not in sql2
    # outer-scope DELTA in a grouped outer still aggregates, even with an
    # ungrouped subquery present in the same statement
    sql3 = translate_select(
        "SELECT k, DELTA(value) AS d, "
        "(SELECT COUNT(*) FROM quotes) AS n FROM events GROUP BY k"
    )[0]
    assert "(MAX(value) - MIN(value))" in sql3
