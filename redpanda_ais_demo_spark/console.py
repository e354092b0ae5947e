"""Dashboard query surface — the three SQL queries + marker math the
Streamlit console issues (lib/console.py:27-116; SURVEY.md §3.3), as
composable DataFrame functions over the materialized views.

Works over any SHIP_POSITION_WITH_WEATHER / SHIP_INFO shaped tables
(streaming memory MVs, parquet MVs, or batch fixtures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions.scalar import hemisphere, iso_utc, prefix_map

# F9 — first-matching-prefix → marker color, with default
# (lib/console.py:62-81; prefix semantics: startswith, ordered).
# Values are the reference dict's EFFECTIVE mapping: its literal repeats
# the "Law" key ("blue" then "lightgreen", lib/console.py:64,72), and a
# Python dict keeps the first key's position with the last value — so
# Law maps to lightgreen at the second slot.
ICON_COLOR_MAP = {
    "Tanker": "red",
    "Law": "lightgreen",
    "Military": "gray",
    "Pilot": "lightred",
    "Medical": "darkred",
    "Cargo": "purple",
    "Search": "orange",
    "NonCombat": "beige",
    "Passenger": "green",
    "Dredging": "darkgreen",
    "AntiPollution": "darkblue",
    "Fishing": "lightblue",
    "Towing": "darkpurple",
    "HSC": "pink",
    "OtherType": "cadetblue",
    "Tug": "black",
}
DEFAULT_ICON_COLOR = "lightgray"


def total_ships(positions: DataFrame) -> DataFrame:
    """A1 — 'Total ships seen' (lib/console.py:34-37)."""
    return positions.agg(F.countDistinct("mmsi").alias("ship_count"))


def moving_ships(positions: DataFrame, knots: int = 10) -> DataFrame:
    """A2 — 'Ships moving > 10 knots' (lib/console.py:39-42)."""
    return positions.filter(F.col("speed") > knots).agg(F.countDistinct("mmsi").alias("ship_count"))


def latest_info(info: DataFrame) -> DataFrame:
    """W1 — latest ship-info per MMSI: the explicit form of the compacted
    topic's semantics (README.md:199-200). Dedups the MV's full history so
    the join can't multiply position rows (SURVEY.md §2.4 J1 note)."""
    w = Window.partitionBy("mmsi").orderBy(F.col("timestamp").desc())
    return info.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def dashboard_grid(positions: DataFrame, info: DataFrame, limit: int = 600) -> DataFrame:
    """J1 + P7 + P8 + L1 — the flagship dashboard query
    (sql/clickhouse-dml.sql:11-14, lib/console.py:44-51).

    Inner join against the deduplicated dimension + non-empty-shipname
    filter: produces the same final set as the reference's left-outer
    join + ``shipname != ''`` (ClickHouse fills '' for non-matches;
    Spark NULLs are likewise dropped by the filter — §2.4). The dedup'd
    dimension side is broadcast: ship_info ≪ positions at every scale.
    """
    dim = F.broadcast(latest_info(info).filter(F.col("shipname") != ""))
    return (
        positions.join(dim, "mmsi", "inner")
        .select(
            positions["mmsi"],
            "shipname",
            "callsign",
            "shiptype",
            "destination",
            "status",
            "speed",
            "heading",
            "lat",
            "lon",
            "locale",
            "region",
            "country",
            "condition",
            "temp_f",
            "wind_mph",
            "wind_dir",
            positions["timestamp"],
        )
        .limit(limit)
    )


def map_markers(grid: DataFrame) -> DataFrame:
    """F7/F8/F9 — per-row marker prep the reference does in a pandas loop
    (lib/console.py:86-100), as codegen'd column expressions."""
    return grid.select(
        "mmsi",
        "lat",
        "lon",
        F.concat(F.abs(F.col("lat")).cast("string"), hemisphere(F.col("lat"), "°N", "°S")).alias("lat_label"),
        F.concat(F.abs(F.col("lon")).cast("string"), hemisphere(F.col("lon"), "°E", "°W")).alias("lon_label"),
        prefix_map(F.col("shiptype"), ICON_COLOR_MAP, DEFAULT_ICON_COLOR).alias("icon_color"),
        F.format_string(
            "%s (%s) → %s | %s kn, %s° | %s, %s°F",
            "shipname",
            "callsign",
            "destination",
            "speed",
            "heading",
            "condition",
            "temp_f",
        ).alias("tooltip"),
        iso_utc(F.timestamp_seconds(F.col("timestamp"))).alias("seen_at"),
    )


def map_view(grid: DataFrame) -> DataFrame:
    """A3 + A4 — map center (mean) and bounding box (min/max) the
    reference computes client-side in pandas (lib/console.py:59-60,102-105)."""
    return grid.agg(
        F.avg("lat").alias("center_lat"),
        F.avg("lon").alias("center_lon"),
        F.min("lat").alias("min_lat"),
        F.max("lat").alias("max_lat"),
        F.min("lon").alias("min_lon"),
        F.max("lon").alias("max_lon"),
    )
