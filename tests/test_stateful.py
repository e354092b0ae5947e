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


def test_admit_first_suppresses_cross_batch_duplicates(spark, tmp_path):
    """transformWithStateInPandas idempotent ingest: only the first record
    per event_id survives, across micro-batches; within a batch the
    lowest order-col row wins. The state-server protocol needs protobuf
    (absent in some environments) - the kernel-level test below runs
    everywhere."""
    pytest.importorskip("google.protobuf")
    from redpanda_ais_demo_spark.streaming import idempotent

    path = str(tmp_path / "adm1")
    schema = "event_id long, seq long, payload string"
    b1 = spark.createDataFrame(
        [(1, 11, "a-dup-late"), (1, 10, "a"), (2, 20, "b"), (3, 30, "c")], schema
    )
    b1.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        idempotent.admit_first(stream, ["event_id"], "seq")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("admit1")
        .start()
    )
    q.processAllAvailable()
    # batch 2: redeliveries of 1 and 2, plus a new id 4
    spark.createDataFrame([(2, 21, "b-redelivery"), (4, 40, "d"), (1, 12, "x")], schema)\
        .coalesce(1).write.mode("append").parquet(path)
    q.processAllAvailable()
    q.stop()
    rows = {r.event_id: r for r in spark.table("admit1").collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].payload == "a"  # in-batch tie broken by seq, not arrival
    assert rows[2].payload == "b"  # redelivery suppressed
    assert rows[4].payload == "d"  # genuinely new key admitted


def test_admit_first_state_survives_checkpoint_restart(spark, tmp_path):
    """Restart from the checkpoint: admitted-key state must recover, so a
    redelivery arriving after the restart is still suppressed."""
    pytest.importorskip("google.protobuf")
    from redpanda_ais_demo_spark.streaming import idempotent

    path = str(tmp_path / "adm2")
    ckpt = str(tmp_path / "adm2_ckpt")
    out = str(tmp_path / "adm2_out")
    schema = "event_id long, seq long, payload string"

    def start():
        stream = spark.readStream.schema(schema).parquet(path)
        deduped = idempotent.admit_first(stream, ["event_id"], "seq")

        def sink(df, _bid):
            df.write.mode("append").parquet(out)

        return (
            deduped.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .start()
        )

    spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], schema).coalesce(1)\
        .write.mode("overwrite").parquet(path)
    q = start()
    q.processAllAvailable()
    q.stop()
    spark.createDataFrame([(1, 11, "a-redelivery"), (3, 30, "c")], schema).coalesce(1)\
        .write.mode("append").parquet(path)
    q = start()
    q.processAllAvailable()
    q.stop()
    got = {r.event_id: r.payload for r in spark.read.parquet(out).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # post-restart redelivery of 1 suppressed


class _FakeValueState:
    """Stands in for the state-store ValueState so the processor kernel
    executes for real without the protobuf state server."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


def test_first_seen_processor_kernel_semantics():
    """Direct execution of the FirstSeenProcessor kernel: batch 1 admits
    the lowest-seq row per key, batch 2's redeliveries are suppressed by
    the carried state — the exact per-key contract the streaming wrapper
    shuffles into place."""
    import pandas as pd

    from redpanda_ais_demo_spark.streaming.idempotent import FirstSeenProcessor

    proc = FirstSeenProcessor("seq", ttl_ms=None)
    proc._seen = _FakeValueState()  # init() needs a live handle; kernel doesn't
    b1 = pd.DataFrame({"event_id": [1, 1], "seq": [11, 10], "payload": ["late", "first"]})
    out1 = list(proc.handleInputRows((1,), iter([b1.iloc[:1], b1.iloc[1:]]), None))
    assert len(out1) == 1 and out1[0]["payload"].iloc[0] == "first"
    assert proc._seen.get() == (10,)
    # same key, later batch: state suppresses everything
    b2 = pd.DataFrame({"event_id": [1], "seq": [12], "payload": ["redelivery"]})
    out2 = list(proc.handleInputRows((1,), iter([b2]), None))
    assert out2 == []
    # fresh key on a fresh state admits again
    proc2 = FirstSeenProcessor("seq", ttl_ms=None)
    proc2._seen = _FakeValueState()
    out3 = list(proc2.handleInputRows((2,), iter([pd.DataFrame({"event_id": [2], "seq": [5], "payload": ["b"]})]), None))
    assert len(out3) == 1 and out3[0]["payload"].iloc[0] == "b"
