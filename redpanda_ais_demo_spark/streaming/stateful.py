"""Custom stateful streaming operator (SURVEY.md §2.9 upgrade path):
a per-ship voyage tracker built on ``applyInPandasWithState``.

The reference keeps no per-ship state at all — its MVs append raw
events and the dashboard recomputes from scratch per render
(sql/clickhouse-ddl.sql:32-38, lib/console.py:34-52). This operator
maintains a running per-MMSI summary (report count, cumulative
great-circle distance, mean speed, last seen position) that is O(ships)
state regardless of stream length — the shape that survives an
unbounded 100 TB stream where append-everything cannot.

Scale design: rows shuffle once per micro-batch on the group key
(mmsi); state lives in the state store co-located with its key, so a
1000-executor cluster partitions ships across executors with no
cross-talk. The pandas kernel is Arrow-batched per key group.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VOYAGE_SCHEMA = (
    "mmsi string, n_reports long, total_km double, avg_speed double, "
    "last_lat double, last_lon double, last_ts long"
)
_STATE_SCHEMA = "n long, km double, sum_speed double, lat double, lon double, ts long"

_EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Vectorized great-circle distance between consecutive fixes."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp, dl = np.radians(lat2 - lat1), np.radians(lon2 - lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * _EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def track_voyages(positions: DataFrame) -> DataFrame:
    """Continuously maintained per-ship voyage summary.

    Input: the P3-shaped position stream (mmsi, timestamp,
    location{lat,lon}, speed, ...). Output (one row per ship per
    micro-batch that saw it, outputMode ``update``):
    (mmsi, n_reports, total_km, avg_speed, last_lat, last_lon, last_ts).

    Distance accumulates over fixes ordered by timestamp *within* each
    micro-batch and chained to the last fix carried in state; per-key
    arrival order across batches is preserved by the source (ST4 — the
    MMSI partition key), so cross-batch order needs no re-sort.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..dist import ensure_shipped

    ensure_shipped(positions.sparkSession)
    flat = positions.select(
        "mmsi",
        "timestamp",
        F.col("location.lat").alias("lat"),
        F.col("location.lon").alias("lon"),
        F.col("speed").cast("double").alias("speed"),
    )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, km, sum_speed, lat, lon, ts = state.get
        else:
            n, km, sum_speed, lat, lon, ts = 0, 0.0, 0.0, None, None, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("timestamp")
            lats = pdf["lat"].to_numpy(dtype=np.float64)
            lons = pdf["lon"].to_numpy(dtype=np.float64)
            if lat is not None:
                lats = np.concatenate(([lat], lats))
                lons = np.concatenate(([lon], lons))
            if len(lats) > 1:
                km += float(haversine_km(lats[:-1], lons[:-1], lats[1:], lons[1:]).sum())
            n += len(pdf)
            sum_speed += float(pdf["speed"].sum())
            lat, lon = float(lats[-1]), float(lons[-1])
            ts = int(pdf["timestamp"].max()) if ts is None else max(ts, int(pdf["timestamp"].max()))
        state.update((n, km, sum_speed, lat, lon, ts))
        yield pd.DataFrame(
            {
                "mmsi": [key[0]],
                "n_reports": [n],
                "total_km": [round(km, 6)],
                "avg_speed": [round(sum_speed / n, 6) if n else 0.0],
                "last_lat": [lat],
                "last_lon": [lon],
                "last_ts": [ts],
            }
        )

    return flat.groupBy("mmsi").applyInPandasWithState(
        update, VOYAGE_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
