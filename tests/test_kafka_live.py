"""OPT-IN live Kafka/Redpanda integration for the broker-gated edge
(S3 Avro sink, S5/S6 Avro source, ST4 keyed ordering — SURVEY.md §2.1).

Everything here SKIPS unless a real broker is reachable; the day one is
available the whole gated surface gets its first end-to-end
produce/consume run with zero new code. One-command setup:

    docker run -d --name redpanda -p 9092:9092 -p 8081:8081 \
        redpandadata/redpanda:latest redpanda start --overprovisioned \
        --smp 1 --memory 1G --kafka-addr PLAINTEXT://0.0.0.0:9092 \
        --advertise-kafka-addr PLAINTEXT://localhost:9092 \
        --schema-registry-addr 0.0.0.0:8081

    SPARK_GRAFT_KAFKA_BROKERS=localhost:9092 \
    SPARK_GRAFT_SCHEMA_REGISTRY=http://localhost:8081 \
    SPARK_GRAFT_KAFKA_PACKAGES=org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2,org.apache.spark:spark-avro_2.13:4.1.2 \
    python -m pytest tests/test_kafka_live.py -v

SPARK_GRAFT_KAFKA_PACKAGES (optional) is passed as spark.jars.packages
to a dedicated session — the shared test session has neither the kafka
connector nor spark-avro, and this container ships neither, so these
tests are structurally skipped here (the framing round-trip, sink/source
plan contracts and registry protocol are pytest-pinned offline in
tests/test_edges.py and tests/test_streaming.py).
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

BROKERS = os.environ.get("SPARK_GRAFT_KAFKA_BROKERS")
REGISTRY_URL = os.environ.get("SPARK_GRAFT_SCHEMA_REGISTRY")

pytestmark = pytest.mark.skipif(
    not BROKERS,
    reason="live Kafka edge: set SPARK_GRAFT_KAFKA_BROKERS=host:9092 "
    "(and optionally SPARK_GRAFT_SCHEMA_REGISTRY / "
    "SPARK_GRAFT_KAFKA_PACKAGES) to run",
)

POSITION_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "LivePositionEvent",
        "fields": [
            {"name": "mmsi", "type": "string"},
            {"name": "seq", "type": "long"},
            {"name": "speed", "type": "int"},
        ],
    }
)
SRC_DDL = "mmsi string, seq long, speed int"


@pytest.fixture(scope="module")
def kspark():
    """A dedicated session carrying the kafka + avro jars (the shared
    fixture session has neither)."""
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-live")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
    )
    pkgs = os.environ.get("SPARK_GRAFT_KAFKA_PACKAGES")
    if pkgs:
        builder = builder.config("spark.jars.packages", pkgs)
    spark = builder.getOrCreate()
    yield spark


def _require_edge(kspark):
    from redpanda_ais_demo_spark.sources import kafka

    if not kafka.avro_available():
        pytest.skip("spark-avro jar not on the session classpath")
    try:
        kspark.read.format("kafka").option(
            "kafka.bootstrap.servers", BROKERS
        ).option("subscribe", "__edge_probe").load().schema
    except Exception as exc:  # connector jar missing
        pytest.skip(f"kafka connector unavailable: {exc}")
    return kafka


def _registry():
    if not REGISTRY_URL:
        return None
    from redpanda_ais_demo_spark.sources.schema_registry import (
        SchemaRegistryClient,
    )

    return SchemaRegistryClient(REGISTRY_URL)


def test_kafka_avro_produce_consume_round_trip(kspark, tmp_path):
    """S3 + S5 end-to-end: stream-write Confluent-framed Avro to a fresh
    topic, stream-read it back through read_topic_stream, and get the
    exact rows out."""
    kafka = _require_edge(kspark)
    topic = f"sgraft-live-{uuid.uuid4().hex[:8]}"
    rows = [
        (f"24401000{s}", q, 10 * s + q) for q in range(3) for s in range(3)
    ]
    src = str(tmp_path / "src")
    kspark.createDataFrame(rows, SRC_DDL).coalesce(1).write.parquet(src)
    stream = kspark.readStream.schema(SRC_DDL).parquet(src)
    registry = _registry()
    wq = kafka.write_topic_stream(
        stream,
        BROKERS,
        topic,
        "mmsi",
        str(tmp_path / "wck"),
        schema_id=None if registry else 1,
        avro_schema_json=POSITION_SCHEMA,
        registry=registry,
    )
    wq.processAllAvailable()
    wq.stop()

    back = kafka.read_topic_stream(
        kspark, BROKERS, topic, avro_schema_json=POSITION_SCHEMA
    )
    rq = (
        back.writeStream.format("memory")
        .queryName("live_rt")
        .option("checkpointLocation", str(tmp_path / "rck"))
        .start()
    )
    rq.processAllAvailable()
    rq.stop()
    got = {
        (r.mmsi, r.seq, r.speed)
        for r in kspark.table("live_rt").collect()
    }
    assert got == set(rows)
    # the key column IS the mmsi (ST4's partitioner input)
    keys = {r.mmsi_key for r in kspark.table("live_rt").collect()}
    assert keys == {m for m, _, _ in rows}


def test_kafka_keyed_ordering_within_partition(kspark, tmp_path):
    """ST4: per-ship updates land in ONE partition, offset order
    following produce order — the compacted-topic / per-key ordering
    contract the reference relies on (lib/producer-from-ais-api.py:47-49)."""
    kafka = _require_edge(kspark)
    topic = f"sgraft-live-{uuid.uuid4().hex[:8]}"
    rows = [(f"24401000{s}", q, 0) for q in range(5) for s in range(4)]
    src = str(tmp_path / "src")
    # one file per seq so micro-batches produce in seq order
    for q in range(5):
        kspark.createDataFrame(
            [r for r in rows if r[1] == q], SRC_DDL
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        kspark.readStream.schema(SRC_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    wq = kafka.write_topic_stream(
        stream, BROKERS, topic, "mmsi", str(tmp_path / "wck"),
        schema_id=1, avro_schema_json=POSITION_SCHEMA,
    )
    wq.processAllAvailable()
    wq.stop()

    from pyspark.sql import functions as F
    from pyspark.sql.avro.functions import from_avro

    raw = (
        kspark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(
            F.col("key").cast("string").alias("mmsi"),
            "partition",
            "offset",
            from_avro(
                kafka.strip_confluent_header(F.col("value")), POSITION_SCHEMA
            ).alias("ev"),
        )
        .select("mmsi", "partition", "offset", "ev.seq")
        .collect()
    )
    per_key: dict[str, list[tuple[int, int]]] = {}
    for r in raw:
        per_key.setdefault(r.mmsi, []).append((r.partition, r.offset, r.seq))
    for mmsi, recs in per_key.items():
        assert len({p for p, _, _ in recs}) == 1, f"{mmsi} split across partitions"
        by_offset = [s for _, o, s in sorted(recs, key=lambda t: t[1])]
        assert by_offset == sorted(by_offset), f"{mmsi} offsets out of seq order"


def test_schema_registry_register_and_resolve(kspark, tmp_path):
    """S5's registry path: write registers the subject, read resolves
    the latest schema from the registry instead of taking one inline,
    and the embedded wire id matches what the registry returned."""
    kafka = _require_edge(kspark)
    registry = _registry()
    if registry is None:
        pytest.skip("set SPARK_GRAFT_SCHEMA_REGISTRY to run")
    topic = f"sgraft-live-{uuid.uuid4().hex[:8]}"
    src = str(tmp_path / "src")
    kspark.createDataFrame([("244010009", 0, 7)], SRC_DDL).write.parquet(src)
    stream = kspark.readStream.schema(SRC_DDL).parquet(src)
    wq = kafka.write_topic_stream(
        stream, BROKERS, topic, "mmsi", str(tmp_path / "wck"),
        avro_schema_json=POSITION_SCHEMA, registry=registry,
    )
    wq.processAllAvailable()
    wq.stop()

    back = kafka.read_topic_stream(kspark, BROKERS, topic, registry=registry)
    rq = (
        back.writeStream.format("memory")
        .queryName("live_reg")
        .option("checkpointLocation", str(tmp_path / "rck"))
        .start()
    )
    rq.processAllAvailable()
    rq.stop()
    got = kspark.table("live_reg").collect()
    assert [(r.mmsi, r.seq, r.speed) for r in got] == [("244010009", 0, 7)]

    # wire id == registered id
    from pyspark.sql import functions as F

    sid_row = (
        kspark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(kafka.confluent_schema_id(F.col("value")).alias("sid"))
        .collect()
    )
    from redpanda_ais_demo_spark.sources.schema_registry import value_subject

    reg_id, _ = registry.latest(value_subject(topic))
    assert {r.sid for r in sid_row} == {reg_id}
