"""Deterministic AIS-shaped fixtures (FIXTURES.md §1-§4): decoded
messages covering both sides of every reference predicate — P1 routing
(incl. dropped types), P2 boundaries (speed 2/75, heading 360), F1
defaults (NULL status), empty shipnames (P8), multiple info events per
ship (W1/J1 multiplication), and position-only / info-only ships."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redpanda_ais_demo_spark.schemas import AIS_DECODED

# (msg_type, mmsi, receiver_ts, status, lat, lon, speed, heading,
#  shipname, callsign, ship_type, destination)
DECODED_ROWS = [
    # -- ship 257000001: clean moving tanker, 3 positions + 2 info events
    (1, 257000001, "1700000000", "UnderWayUsingEngine", 60.1, 5.1, 12, 90, None, None, None, None),
    (3, 257000001, "1700000060", "UnderWayUsingEngine", 60.2, 5.2, 14, 91, None, None, None, None),
    (18, 257000001, "1700000120", "UnderWayUsingEngine", 60.3, 5.3, 15, 92, None, None, None, None),
    (5, 257000001, "1700000010", None, None, None, None, None, "NORDIC STAR", "LAXA", "Tanker", "BERGEN"),
    (5, 257000001, "1700000200", None, None, None, None, None, "NORDIC STAR", "LAXA", "Tanker", "OSLO"),
    # -- ship 257000002: boundary speeds — speed==2 and ==75 must drop (P2)
    (1, 257000002, "1700000000", "Moored", 59.0, 4.0, 2, 10, None, None, None, None),
    (1, 257000002, "1700000030", "Moored", 59.0, 4.0, 75, 10, None, None, None, None),
    (1, 257000002, "1700000061", "UnderWayUsingEngine", 59.1, 4.1, 3, 10, None, None, None, None),
    (5, 257000002, "1700000100", None, None, None, None, None, "FJORD QUEEN", "LBXQ", "Passenger", "STAVANGER"),
    # -- ship 257000003: heading 360 must drop; null status → NotReported (F1)
    (3, 257000003, "1700000000", None, 61.0, 6.0, 20, 360, None, None, None, None),
    (3, 257000003, "1700000040", None, 61.1, 6.1, 21, 359, None, None, None, None),
    # info with EMPTY shipname (P8 filter must drop from dashboard)
    (5, 257000003, "1700000050", None, None, None, None, None, "", "LCYZ", "Cargo", "TRONDHEIM"),
    # -- ship 257000004: position-only ship (left side unmatched in J1)
    (1, 257000004, "1700000000", "Fishing", 62.0, 7.0, 8, 180, None, None, None, None),
    # -- ship 257000005: info-only ship (right side unmatched)
    (5, 257000005, "1700000000", None, None, None, None, None, "GHOST", "LDAA", "CargoHazardousA", "BODO"),
    # -- dropped message types (P1: only 1,3,18,5 survive)
    (4, 257000006, "1700000000", None, 60.0, 5.0, 10, 100, None, None, None, None),
    (24, 257000006, "1700000010", None, 60.0, 5.0, 10, 100, None, None, None, None),
    # -- no tag block → dropped at S2
    (1, 257000007, None, "UnderWayUsingEngine", 60.5, 5.5, 10, 100, None, None, None, None),
    # -- lat out of range (P2: lat <= 90)
    (1, 257000008, "1700000000", "UnderWayUsingEngine", 91.0, 5.0, 10, 100, None, None, None, None),
]


def decoded_messages(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(DECODED_ROWS, AIS_DECODED)
