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


def read_topic_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    avro_schema_json: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S5/S6 — topic → typed streaming DataFrame.

    Mirrors the consumer/ClickHouse-queue config: earliest offsets
    (lib/utils.py:63-77), AvroConfluent decode
    (sql/clickhouse-ddl.sql:27-28,56-57).
    """
    from pyspark.sql.avro.functions import from_avro

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("mmsi_key"),
        from_avro(strip_confluent_header(F.col("value")), avro_schema_json).alias("event"),
    ).select("mmsi_key", "event.*")


def write_topic_stream(
    df: DataFrame,
    brokers: str,
    topic: str,
    key_col: str,
    checkpoint_dir: str,
    schema_id: int | None = None,
):
    """S3/S4 — typed DataFrame → Avro-framed topic, keyed by MMSI so
    per-ship order is preserved within a partition (ST4,
    lib/producer-from-ais-api.py:47-49). ``acks=all`` matches the
    producer (lib/utils.py:95); batching replaces its per-message flush.
    """
    from pyspark.sql.avro.functions import to_avro

    payload = to_avro(F.struct(*[F.col(c) for c in df.columns]))
    if schema_id is not None:
        payload = F.concat(confluent_header(schema_id), payload)
    out = df.select(F.col(key_col).cast("string").alias("key"), payload.alias("value"))
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("kafka.acks", "all")
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
