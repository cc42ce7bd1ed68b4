"""Kafka source/sink builders — reference kafka/data_source.rs (consumer →
StreamRecord batches, event-time extraction, headers) and data_sink.rs
(producer, message key from PRIMARY KEY fields).

Spark's Kafka connector already provides the reference's surface:
`timestamp`, `offset`, `partition`, `topic`, `key`, `headers` arrive as
real columns — the reference's system columns (_timestamp/_offset/...,
docs/sql/system-columns.md) are a rename away (`with_system_columns`).
Exactly-once via checkpoints exceeds the reference's at-least-once
transactions (kafka/writer.rs).

The Kafka connector jar may be absent in test environments; builders
construct plans/options without contacting a broker, and `read_*`/`write_*`
raise a clear error if the connector is missing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def source_options(cfg: dict[str, str]) -> dict[str, str]:
    """WITH-clause Kafka config → Spark reader options.

    Accepts the reference's keys (bootstrap.servers, topic, group.id,
    auto.offset.reset — kafka/kafka_config.rs) and passes through any
    `kafka.`-prefixed extras.
    """
    opts = {
        "kafka.bootstrap.servers": cfg.get(
            "bootstrap.servers", cfg.get("brokers", "localhost:9092")
        ),
        "subscribe": cfg["topic"],
        "includeHeaders": "true",
    }
    offset = cfg.get("auto.offset.reset", "earliest")
    opts["startingOffsets"] = {"smallest": "earliest", "largest": "latest"}.get(
        offset, offset
    )
    if "group.id" in cfg:
        opts["kafka.group.id"] = cfg["group.id"]
    for k, v in cfg.items():
        if k.startswith("kafka."):
            opts[k] = v
    return opts


def with_system_columns(df: DataFrame) -> DataFrame:
    """Expose the reference's system columns (_timestamp, _offset,
    _partition, _topic, _key — types.rs:1625-1627, system-columns.md) from
    the connector's native columns, value still serialized.

    ``_timestamp`` is INT64 epoch-MILLIS per system-columns.md:20 (the
    doc's own examples compare it to integer literals like
    1697296245000); the connector's native TimestampType column is
    converted with unix_millis so those comparisons work unchanged."""
    return df.select(
        "value",
        "headers",
        F.unix_millis(F.col("timestamp")).alias("_timestamp"),
        F.col("offset").alias("_offset"),
        F.col("partition").alias("_partition"),
        F.col("topic").alias("_topic"),
        F.col("key").cast("string").alias("_key"),
    )


def decode_json_value(df: DataFrame, schema) -> DataFrame:
    """JSON codec (serialization/json_codec.rs): value bytes → columns,
    keeping system columns alongside."""
    other = [c for c in df.columns if c != "value"]
    return df.select(
        F.from_json(F.col("value").cast("string"), schema).alias("_v"), *other
    ).select("_v.*", *other)


def read_stream(spark: SparkSession, cfg: dict[str, str]) -> DataFrame:
    reader = spark.readStream.format("kafka")
    for k, v in source_options(cfg).items():
        reader = reader.option(k, v)
    return _load(reader, "Kafka streaming source")


def read_batch(spark: SparkSession, cfg: dict[str, str]) -> DataFrame:
    reader = spark.read.format("kafka")
    for k, v in source_options(cfg).items():
        reader = reader.option(k, v)
    return _load(reader, "Kafka batch source")


def _load(reader, what: str) -> DataFrame:
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            f"{what} requires the spark-sql-kafka connector on the classpath "
            f"(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>): {e}"
        ) from e


def message_key(df: DataFrame, key_fields: list[str]) -> DataFrame:
    """PRIMARY KEY fields → Kafka message key (FR-089, PARSER_GRAMMAR.md:
    600-610): single field = raw value; compound = pipe-delimited."""
    # Implicit GROUP BY keys may name a grouping column the SELECT didn't
    # project (legal SQL) — only addressable output columns can key the
    # message; none addressable → null key (round-robin partitioning,
    # KEY_CONFIGURATION.md:147).
    key_fields = [k for k in key_fields or [] if k in df.columns]
    if not key_fields:
        return df.withColumn("key", F.lit(None).cast("string"))
    if len(key_fields) == 1:
        key = F.col(key_fields[0]).cast("string")
    else:
        key = F.concat_ws("|", *[F.col(k).cast("string") for k in key_fields])
    return df.withColumn("key", key)


def tombstones(df: DataFrame, key_fields: list[str]) -> DataFrame:
    """Streaming DELETE → Kafka tombstones (reference processors/delete.rs:
    deletes emit null-value records keyed by PRIMARY KEY so compacted topics
    drop the row): (key, NULL value) rows ready for the Kafka sink."""
    return message_key(df, key_fields).select(
        "key", F.lit(None).cast("string").alias("value")
    )


def decode_avro_value(df: DataFrame, cfg: dict[str, str]) -> DataFrame:
    """Avro codec path (serialization/avro_codec.rs): value bytes → columns
    via the schema registry (WITH-clause `avro.schema.*` keys) and the
    pure-Python binary codec — runs without the spark-avro jar."""
    from .schema_registry import decode_with_registry

    return decode_with_registry(df, cfg, value_col="value")


def sink_frame(
    df: DataFrame,
    key_fields: list[str] | None = None,
    cfg: dict[str, str] | None = None,
) -> DataFrame:
    """The sink-side transformation (data_sink.rs): rows serialized into
    `value`, key from PRIMARY KEY fields. Split from `write_batch` so the
    key/value shaping is testable without a broker.

    Default value codec is JSON; with ``value.format = avro_confluent`` the
    value becomes a Confluent-framed Avro binary (magic + global schema id,
    resolved through `avro.schema.registry.path`/`avro.schema.subject`) —
    the wire layout a real migrating user's topics contain.

    A ``headers`` column (`array<struct<key,value>>`) passes through to the
    producer — Spark's Kafka sink writes it natively — implementing FR-090's
    1:1 preserve policy at the wire (the reference's writer sends
    ``record.headers``, kafka/writer.rs; mutate with
    functions.headers.set_header/remove_header, aggregate with
    agg_headers)."""
    cfg = cfg or {}
    data_cols = [c for c in df.columns if c not in ("key", "value", "headers")]
    passthrough = ["headers"] if "headers" in df.columns else []
    if cfg.get("value.format", "").lower() in ("avro_confluent", "avro-confluent"):
        return _confluent_keyed(df, key_fields or [], data_cols, cfg, passthrough)
    return message_key(df, key_fields or []).select(
        "key", F.to_json(F.struct(*data_cols)).alias("value"), *passthrough
    )


def _confluent_keyed(
    df: DataFrame,
    key_fields: list[str],
    data_cols: list[str],
    cfg: dict[str, str],
    passthrough: list[str] | None = None,
) -> DataFrame:
    """key + Confluent-framed value in ONE Arrow stage: the shared
    ``df_encode_confluent`` pipeline with the message key (and any
    ``headers`` column) passed through."""
    from .schema_registry import df_encode_confluent

    version = cfg.get("avro.schema.version")
    extra = passthrough or []
    keyed = message_key(df, key_fields).select("key", *extra, *data_cols)
    return df_encode_confluent(
        keyed,
        cfg["avro.schema.registry.path"],
        cfg["avro.schema.subject"],
        int(version) if version else None,
        passthrough_cols=["key", *extra],
    )


def write_batch(df: DataFrame, cfg: dict[str, str], key_fields: list[str] | None = None) -> None:
    """Batch write to Kafka: rows serialized into `value` (JSON or
    Confluent-framed Avro per cfg), key from PRIMARY KEY fields
    (data_sink.rs key extraction)."""
    out = sink_frame(df, key_fields, cfg)
    writer = (
        out.write.format("kafka")
        .option(
            "kafka.bootstrap.servers",
            cfg.get("bootstrap.servers", cfg.get("brokers", "localhost:9092")),
        )
        .option("topic", cfg["topic"])
    )
    try:
        writer.save()
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            f"Kafka sink requires the spark-sql-kafka connector: {e}"
        ) from e
