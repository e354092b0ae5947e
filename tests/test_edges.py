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


def test_decode_gated_without_pyais(spark):
    if ais_feed.pyais_available():
        pytest.skip("pyais installed; gating path not exercisable")
    lines = spark.createDataFrame([("!AIVDM,1,1,,A,13u?etPv2;0n:dDPwUM1U1Cb069D,0*24",)], "nmea string")
    with pytest.raises(NotImplementedError):
        ais_feed.decode_nmea(lines)
