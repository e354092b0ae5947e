"""Ingest stage: decoded AIS messages → two typed event streams.

Re-expresses lib/producer-from-ais-api.py as a narrow (shuffle-free)
DataFrame pipeline over an ``AIS_DECODED``-shaped stream — one source
fanned out to two sinks by two filters (SURVEY.md §3.1). Works unchanged
on batch and streaming DataFrames (the transformations are all
stateless), which is how the tests drive it.

Boundary semantics preserved exactly:
- tag-block gate + base-10 receiver-timestamp parse (S2/F2,
  producer-from-ais-api.py:31-34)
- msg-type router: {1,3,18} → positions, {5} → ship-info, rest dropped
  (P1, :35-38,78)
- enum coercion with "NotReported" default (F1, :41-45,79-83)
- validity predicate speed∈(2,75), |lat|<=90, |lon|<=180, heading<360
  (P2, :54-61)
- projections P3/P4 with the nested location struct (:62-69,88-95)
- MMSI key cast to string (F3, :49,87)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import with_default

POSITION_MSG_TYPES = (1, 3, 18)
SHIP_INFO_MSG_TYPE = 5


def with_receiver_timestamp(decoded: DataFrame) -> DataFrame:
    """S2 — drop messages without a tag block; parse receiver_timestamp
    base-10 (producer-from-ais-api.py:31-34)."""
    return decoded.filter(F.col("receiver_timestamp").isNotNull()).withColumn(
        "timestamp", F.col("receiver_timestamp").cast("long")
    )


def validity_filter() -> Column:
    """P2 — conjunctive range predicate (producer-from-ais-api.py:54-61).

    Note the reference checks only upper bounds on lat/lon; reproduced
    verbatim (lat <= 90, lon <= 180, speed in (2, 75), heading < 360).
    """
    return (
        (F.col("speed") > 2)
        & (F.col("speed") < 75)
        & (F.col("lat") <= 90)
        & (F.col("lon") <= 180)
        & (F.col("heading") < 360)
    )


def route_positions(decoded: DataFrame) -> DataFrame:
    """P1(positions) + F1 + P2 + P3: the position-event branch."""
    return (
        with_receiver_timestamp(decoded)
        .filter(F.col("msg_type").isin(*POSITION_MSG_TYPES))
        .withColumn("status", with_default(F.col("status"), "NotReported"))
        .filter(validity_filter())
        .select(
            F.col("mmsi").cast("string").alias("mmsi"),
            F.col("status"),
            F.col("timestamp"),
            F.struct(F.col("lat"), F.col("lon")).alias("location"),
            F.col("speed"),
            F.col("heading"),
        )
    )


def route_ship_info(decoded: DataFrame) -> DataFrame:
    """P1(info) + F1 + P4: the ship-info branch (type-5 messages)."""
    return (
        with_receiver_timestamp(decoded)
        .filter(F.col("msg_type") == SHIP_INFO_MSG_TYPE)
        .select(
            F.col("mmsi").cast("string").alias("mmsi"),
            F.col("timestamp").cast("int").alias("timestamp"),  # int per avsc quirk
            F.col("shipname"),
            F.col("callsign"),
            with_default(F.col("ship_type"), "NotReported").alias("shiptype"),
            F.col("destination"),
        )
    )
