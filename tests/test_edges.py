"""Edge-module tests that need no broker/feed: Confluent wire framing
round-trip, socket-source declaration shape, decode gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redpanda_ais_demo_spark.sources import ais_feed, kafka


def test_confluent_framing_roundtrip(spark):
    """prepend(header) then strip must be the identity on the payload,
    and the header must carry the schema id big-endian after magic 0."""
    payload = bytes(range(1, 40))
    df = spark.createDataFrame([(payload,)], "payload binary")
    framed = df.select(
        F.concat(kafka.confluent_header(schema_id=1234), F.col("payload")).alias("value")
    )
    row = framed.select(
        kafka.strip_confluent_header(F.col("value")).alias("bare"), "value"
    ).collect()[0]
    assert bytes(row.bare) == payload
    header = bytes(row.value)[:5]
    assert header[0] == 0 and int.from_bytes(header[1:], "big") == 1234


def test_confluent_header_empty_payload(spark):
    df = spark.createDataFrame([(b"",)], "payload binary")
    framed = df.select(
        F.concat(kafka.confluent_header(schema_id=7), F.col("payload")).alias("value")
    )
    row = framed.select(kafka.strip_confluent_header(F.col("value")).alias("bare")).collect()[0]
    assert bytes(row.bare) == b""


def test_socket_source_declares_without_connecting(spark):
    # declaration must not dial the feed; connection happens at .start()
    df = ais_feed.read_nmea_socket_stream(spark, "203.0.113.1", 5631)
    assert df.isStreaming and df.columns == ["nmea"]


def test_decode_works_without_pyais(spark):
    # formerly a raising gate; U2 now decodes through the native codec
    # when pyais is absent — the same sentence must produce a typed row
    lines = spark.createDataFrame(
        [("!AIVDM,1,1,,A,13u?etPv2;0n:dDPwUM1U1Cb069D,0*24",)], "nmea string"
    )
    rows = ais_feed.decode_nmea(lines).collect()
    assert len(rows) == 1
    assert rows[0].msg_type == 1 and rows[0].mmsi > 0
    assert rows[0].lat is not None and rows[0].lon is not None


# --- Schema registry (stubbed transport — no HTTP, no broker) ---------------

from redpanda_ais_demo_spark.sources.schema_registry import (  # noqa: E402
    SchemaRegistryClient,
    SchemaRegistryError,
    value_subject,
)

_SCHEMA = '{"type":"record","name":"pos","fields":[{"name":"mmsi","type":"string"}]}'


class _StubRegistry:
    """In-memory registry speaking the REST shapes the client uses."""

    def __init__(self):
        self.by_subject: dict[str, list[str]] = {}
        self.ids: dict[str, int] = {}
        self.calls: list[tuple[str, str]] = []

    def __call__(self, method, url, body, headers):
        import json

        self.calls.append((method, url))
        path = url.split("://", 1)[-1].split("/", 1)[1]
        if method == "POST" and path.endswith("/versions"):
            subject = path.split("/")[1]
            schema = json.loads(body)["schema"]
            if schema not in self.ids:
                self.ids[schema] = len(self.ids) + 41
                self.by_subject.setdefault(subject, []).append(schema)
            return 200, json.dumps({"id": self.ids[schema]}).encode()
        if method == "GET" and path.endswith("/versions/latest"):
            subject = path.split("/")[1]
            if subject not in self.by_subject:
                return 404, b'{"error_code":40401,"message":"subject not found"}'
            schema = self.by_subject[subject][-1]
            return 200, json.dumps(
                {"subject": subject, "version": 1, "id": self.ids[schema], "schema": schema}
            ).encode()
        if method == "GET" and "/schemas/ids/" in path:
            sid = int(path.rsplit("/", 1)[-1])
            for schema, i in self.ids.items():
                if i == sid:
                    return 200, json.dumps({"schema": schema}).encode()
            return 404, b'{"error_code":40403,"message":"schema not found"}'
        return 500, b"{}"


def test_schema_registry_register_lookup_roundtrip():
    stub = _StubRegistry()
    client = SchemaRegistryClient("http://registry:8081", transport=stub)
    sid = client.register(value_subject("ais-positions"), _SCHEMA)
    assert sid == 41
    # register is idempotent and cached: no second HTTP call
    assert client.register(value_subject("ais-positions"), _SCHEMA) == sid
    assert len([c for c in stub.calls if c[0] == "POST"]) == 1
    # consumer-side lookups agree
    assert client.latest(value_subject("ais-positions")) == (sid, _SCHEMA)
    assert client.schema_by_id(sid) == _SCHEMA
    # by-id is served from cache after register
    assert not any("/schemas/ids/" in u for _, u in stub.calls)


def test_schema_registry_error_surfaces_status():
    client = SchemaRegistryClient("http://registry:8081", transport=_StubRegistry())
    with pytest.raises(SchemaRegistryError) as e:
        client.latest("no-such-subject-value")
    assert e.value.status == 404


def test_registered_id_round_trips_through_wire_framing(spark):
    """register → embed id in header → extract id → fetch schema by id:
    the full produce/consume dispatch loop, offline."""
    client = SchemaRegistryClient("http://registry:8081", transport=_StubRegistry())
    sid = client.register(value_subject("t"), _SCHEMA)
    payload = b"\x01\x02\x03"
    df = spark.createDataFrame([(payload,)], "payload binary")
    framed = df.select(
        F.concat(kafka.confluent_header(sid), F.col("payload")).alias("value")
    )
    row = framed.select(
        kafka.confluent_schema_id(F.col("value")).alias("sid"),
        kafka.strip_confluent_header(F.col("value")).alias("bare"),
    ).collect()[0]
    assert row.sid == sid
    assert bytes(row.bare) == payload
    assert client.schema_by_id(row.sid) == _SCHEMA


def test_sink_frame_plan_contract(spark):
    """The exact projection write_topic_stream hands to the kafka sink —
    (key string, value binary), value framed with the schema id — is
    assertable without a broker or the avro jar (payload injectable)."""
    df = spark.createDataFrame(
        [(244010001, 12.5, b"\xaa\xbb")], "mmsi long, speed double, payload binary"
    )
    out = kafka.sink_frame(df, "mmsi", F.col("payload"), schema_id=1234)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("key", "string"),
        ("value", "binary"),
    ]
    row = out.collect()[0]
    assert row.key == "244010001"  # kafka partitioner keys on this → ST4 per-ship order
    assert bytes(row.value)[:5] == bytes([0]) + (1234).to_bytes(4, "big")
    assert bytes(row.value)[5:] == b"\xaa\xbb"


def test_read_topic_stream_plan_contract(spark):
    """Read-side mirror of the sink contract: the post-decode projection
    read_topic_stream builds — key cast to mmsi_key string, framed value
    stripped, decoded struct exploded to columns — asserted without a
    broker or the avro jar. Production injects from_avro; this test
    injects from_json over the SAME stripped payload bytes, so the
    framing strip inside the projection is exercised for real."""
    import json as _json

    payload = _json.dumps({"mmsi": "244010001", "speed": 12.5}).encode()
    framed = bytes([0]) + (77).to_bytes(4, "big") + payload
    raw = spark.createDataFrame([(b"244010001", framed)], "key binary, value binary")
    decode = F.from_json(
        kafka.strip_confluent_header(F.col("value")).cast("string"),
        "mmsi string, speed double",
    )
    out = kafka.source_project(raw, decode)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("mmsi_key", "string"),
        ("mmsi", "string"),
        ("speed", "double"),
    ]
    row = out.collect()[0]
    assert row.mmsi_key == "244010001"
    assert row.mmsi == "244010001" and row.speed == 12.5
    # the framing metadata the deserializer dispatches on is intact
    sid = raw.select(kafka.confluent_schema_id(F.col("value")).alias("sid")).collect()[0].sid
    assert sid == 77


def test_write_topic_stream_requires_schema_with_registry(tmp_path, spark):
    if not kafka.avro_available():
        pytest.skip("spark-avro jar not shipped in this container")
    client = SchemaRegistryClient("http://registry:8081", transport=_StubRegistry())
    df = spark.createDataFrame([("a",)], "mmsi string")
    with pytest.raises(ValueError, match="avro_schema_json"):
        kafka.write_topic_stream(df, "b:9092", "t", "mmsi", str(tmp_path), registry=client)
