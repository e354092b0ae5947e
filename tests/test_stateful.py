"""Stateful streaming operator tests: the applyInPandasWithState voyage
tracker must accumulate across micro-batches (state carries over) and
keep O(ships) state."""

from __future__ import annotations

import numpy as np
import pytest

from redpanda_ais_demo_spark.schemas import AIS_DECODED
from redpanda_ais_demo_spark.streaming import ingest, stateful

from .ais_fixtures import decoded_messages


def _latest_per_mmsi(spark, table):
    rows = spark.table(table).collect()
    out = {}
    for r in rows:  # update mode appends one row per key per batch; last wins
        if r.mmsi not in out or r.n_reports > out[r.mmsi].n_reports:
            out[r.mmsi] = r
    return out


def test_voyage_tracker_single_batch(spark, tmp_path):
    path = str(tmp_path / "voy1")
    decoded_messages(spark).coalesce(1).write.mode("overwrite").parquet(path)
    stream = ingest.route_positions(spark.readStream.schema(AIS_DECODED).parquet(path))
    q = (
        stateful.track_voyages(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("voyages1")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _latest_per_mmsi(spark, "voyages1")
    ship1 = got["257000001"]
    assert ship1.n_reports == 3
    expect_km = float(
        stateful.haversine_km(
            np.array([60.1, 60.2]), np.array([5.1, 5.2]), np.array([60.2, 60.3]), np.array([5.2, 5.3])
        ).sum()
    )
    assert ship1.total_km == pytest.approx(expect_km, abs=1e-4)
    assert ship1.avg_speed == pytest.approx((12 + 14 + 15) / 3, abs=1e-6)
    assert ship1.last_ts == 1700000120
    # single-fix ship: zero distance, not NaN
    assert got["257000004"].total_km == 0.0


def test_voyage_tracker_state_carries_across_batches(spark, tmp_path):
    path = str(tmp_path / "voy2")
    base = decoded_messages(spark)
    first = base.filter("receiver_timestamp <= '1700000060'")
    second = base.filter("receiver_timestamp > '1700000060'")
    first.coalesce(1).write.mode("overwrite").parquet(path)
    stream = ingest.route_positions(spark.readStream.schema(AIS_DECODED).parquet(path))
    q = (
        stateful.track_voyages(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("voyages2")
        .start()
    )
    q.processAllAvailable()
    second.coalesce(1).write.mode("append").parquet(path)
    q.processAllAvailable()
    q.stop()
    got = _latest_per_mmsi(spark, "voyages2")
    ship1 = got["257000001"]
    # 2 fixes in batch 1 + 1 fix in batch 2; distance must chain through
    # the state-carried last position, identical to the single-batch run
    assert ship1.n_reports == 3
    expect_km = float(
        stateful.haversine_km(
            np.array([60.1, 60.2]), np.array([5.1, 5.2]), np.array([60.2, 60.3]), np.array([5.2, 5.3])
        ).sum()
    )
    assert ship1.total_km == pytest.approx(expect_km, abs=1e-4)
    assert ship1.last_ts == 1700000120
