"""Kafka (Redpanda) edge: Confluent-Avro framed topics as streaming
sources/sinks (SURVEY.md §2.1 S3/S5, §2.10 U3).

The reference's only wire format is Avro with the 5-byte Confluent
header (magic byte + schema-registry id, lib/utils.py:56-61,87-89).
Spark's ``from_avro``/``to_avro`` handle bare Avro; the framing is a
byte-slice on read and a literal prepend on write.

Everything here is gated: the test container has neither a broker nor
the spark-avro jar (it ships separately from pyspark), so these builders
raise a clear error when unavailable and are exercised only by
integration deployments. The rest of the engine never imports this
module unless Kafka is requested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def avro_available() -> bool:
    try:
        from pyspark.sql.avro.functions import from_avro  # noqa: F401

        return True
    except ImportError:
        return False


def strip_confluent_header(value: Column) -> Column:
    """Drop the 5-byte Confluent wire-format prefix (magic 0x00 + 4-byte
    schema id) to get the bare Avro payload (U3)."""
    return F.expr("substring(value, 6, length(value) - 5)")


def confluent_header(schema_id: int) -> Column:
    """The 5-byte prefix for writes registered under ``schema_id``."""
    return F.lit(bytes([0]) + int(schema_id).to_bytes(4, "big"))


def confluent_schema_id(value: Column) -> Column:
    """The 4-byte big-endian schema id embedded in a framed message —
    what the consumer's deserializer dispatches on (lib/utils.py:56-61)."""
    return F.expr("cast(conv(hex(substring(value, 2, 4)), 16, 10) AS int)")


def sink_frame(df: DataFrame, key_col: str, payload: Column, schema_id: int | None = None) -> DataFrame:
    """The sink's exact output projection: (key string, value binary),
    value = Confluent header + Avro payload. Factored out of
    ``write_topic_stream`` so the plan is assertable without a broker or
    the spark-avro jar (the payload column is injectable)."""
    if schema_id is not None:
        payload = F.concat(confluent_header(schema_id), payload)
    return df.select(F.col(key_col).cast("string").alias("key"), payload.alias("value"))


def source_project(raw: DataFrame, decode: Column) -> DataFrame:
    """The source's exact post-decode projection: key cast to
    ``mmsi_key`` string, decoded struct exploded to top-level columns.
    Factored out of ``read_topic_stream`` so the plan is assertable
    without a broker or the spark-avro jar — production injects
    ``from_avro`` over the stripped payload; tests inject any decoder
    with the same struct shape."""
    return raw.select(
        F.col("key").cast("string").alias("mmsi_key"),
        decode.alias("event"),
    ).select("mmsi_key", "event.*")


def read_topic_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    avro_schema_json: str | None = None,
    starting_offsets: str = "earliest",
    registry=None,
) -> DataFrame:
    """S5/S6 — topic → typed streaming DataFrame.

    Mirrors the consumer/ClickHouse-queue config: earliest offsets
    (lib/utils.py:63-77), AvroConfluent decode
    (sql/clickhouse-ddl.sql:27-28,56-57). When ``avro_schema_json`` is
    omitted, the subject's latest schema is resolved from ``registry``
    (a ``schema_registry.SchemaRegistryClient``) — the reference
    consumer's AvroDeserializer behavior. Spark's from_avro needs the
    reader schema at plan time, so resolution happens once here, not
    per message (ids embedded in the framing are asserted equal by
    integration checks, not re-fetched per row).
    """
    from pyspark.sql.avro.functions import from_avro

    if avro_schema_json is None:
        if registry is None:
            raise ValueError("pass avro_schema_json or a registry client")
        from .schema_registry import value_subject

        _, avro_schema_json = registry.latest(value_subject(topic))
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return source_project(
        raw, from_avro(strip_confluent_header(F.col("value")), avro_schema_json)
    )


def write_topic_stream(
    df: DataFrame,
    brokers: str,
    topic: str,
    key_col: str,
    checkpoint_dir: str,
    schema_id: int | None = None,
    avro_schema_json: str | None = None,
    registry=None,
):
    """S3/S4 — typed DataFrame → Avro-framed topic, keyed by MMSI so
    per-ship order is preserved within a partition (ST4,
    lib/producer-from-ais-api.py:47-49). ``acks=all`` matches the
    producer (lib/utils.py:95); batching replaces its per-message flush.

    Framing id resolution, in precedence order: an explicit
    ``schema_id``; else registering ``avro_schema_json`` under the
    topic's value subject via ``registry`` (the AvroSerializer's
    produce-time register-then-embed behavior, lib/utils.py:85-111);
    else no header (bare Avro).
    """
    from pyspark.sql.avro.functions import to_avro

    if schema_id is None and registry is not None:
        if avro_schema_json is None:
            raise ValueError("registering a subject requires avro_schema_json")
        from .schema_registry import value_subject

        schema_id = registry.register(value_subject(topic), avro_schema_json)
    struct = F.struct(*[F.col(c) for c in df.columns])
    payload = to_avro(struct, avro_schema_json) if avro_schema_json else to_avro(struct)
    out = sink_frame(df, key_col, payload, schema_id)
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("kafka.acks", "all")
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
