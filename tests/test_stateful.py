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


def test_voyage_tracker_recovers_state_from_checkpoint(spark, tmp_path):
    """Stop the query after batch 1, restart from the same checkpoint,
    feed batch 2: the tracker must resume its per-ship state (counts and
    distance chain), not restart from zero."""
    path = str(tmp_path / "voy3")
    ckpt = str(tmp_path / "voy3_ckpt")
    out = str(tmp_path / "voy3_out")
    base = decoded_messages(spark)
    base.filter("receiver_timestamp <= '1700000060'").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)

    def start():
        # memory sink can't recover from a checkpoint; foreachBatch-to-
        # parquet is the durable production shape and supports restart
        stream = ingest.route_positions(spark.readStream.schema(AIS_DECODED).parquet(path))
        return (
            stateful.track_voyages(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda b, _i: b.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    base.filter("receiver_timestamp > '1700000060'").coalesce(1).write.mode("append").parquet(path)
    q = start()
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(out).collect()
    got = {}
    for r in rows:
        if r.mmsi not in got or r.n_reports > got[r.mmsi].n_reports:
            got[r.mmsi] = r
    ship1 = got["257000001"]
    assert ship1.n_reports == 3  # 2 from run 1 + 1 after restart
    expect_km = float(
        stateful.haversine_km(
            np.array([60.1, 60.2]), np.array([5.1, 5.2]), np.array([60.2, 60.3]), np.array([5.2, 5.3])
        ).sum()
    )
    assert ship1.total_km == pytest.approx(expect_km, abs=1e-4)
