"""Streaming last-touch attribution: batch parity on an ordered replay,
cross-batch state carry, window-bound eviction (O(keys) retention)."""

from __future__ import annotations

import pandas as pd


def _rows(spark, table):
    return {r.conv_id: r for r in spark.table(table).collect()}


def _write_events(spark, path, rows, mode="overwrite"):
    df = spark.createDataFrame(
        rows, "user_id long, tsec long, event_type string, event_id long"
    ).selectExpr("user_id", "to_timestamp(tsec) AS ts", "event_type", "event_id")
    df.coalesce(1).write.mode(mode).parquet(path)


_SCHEMA = "user_id long, ts timestamp, event_type string, event_id long"


def test_stream_matches_batch_on_ordered_replay(spark, tmp_path):
    """Same input, same answer: streaming output must equal the batch
    operator row-for-row on an in-order replay."""
    from redpanda_ais_demo_spark.operators.timeseries import last_touch_attribution
    from redpanda_ais_demo_spark.streaming.attribution import attribute_stream

    rows = [
        (1, 10, "view", 100), (1, 20, "click", 101), (1, 30, "purchase", 102),
        (1, 40, "purchase", 103),
        (2, 0, "view", 200), (2, 50000, "purchase", 201),
        (3, 5, "purchase", 300),
        (4, 0, "click", 400), (4, 10, "purchase", 401), (4, 20, "purchase", 402),
    ]
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    stream = spark.readStream.schema(_SCHEMA).parquet(path)
    q = (
        attribute_stream(stream, window_sec=3600)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attr1")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _rows(spark, "attr1")

    batch_df = spark.read.parquet(path)
    want = {
        r.conv_id: r
        for r in last_touch_attribution(
            batch_df, "user_id", "ts", "event_type", "event_id",
            "purchase", ["view", "click"], 3600,
        ).collect()
    }
    assert set(got) == set(want)
    for cid in want:
        for f in ("user_id", "conv_ts", "touch_id", "touch_ts", "touch_type", "age_sec"):
            assert getattr(got[cid], f) == getattr(want[cid], f), (cid, f)


def test_stream_state_carries_touch_across_batches(spark, tmp_path):
    """A touch in batch 1 must credit a conversion arriving in batch 2."""
    from redpanda_ais_demo_spark.streaming.attribution import attribute_stream

    path = str(tmp_path / "ev2")
    _write_events(spark, path, [(7, 100, "click", 700)])
    stream = spark.readStream.schema(_SCHEMA).parquet(path)
    q = (
        attribute_stream(stream, window_sec=3600)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attr2")
        .start()
    )
    q.processAllAvailable()
    _write_events(spark, path, [(7, 200, "purchase", 701)], mode="append")
    q.processAllAvailable()
    q.stop()
    got = _rows(spark, "attr2")
    assert got[701].touch_id == 700 and got[701].age_sec == 100


def test_stream_evicts_stale_touch_state(spark, tmp_path):
    """A touch older than the window relative to the newest event is
    removed from state — a later conversion is unattributed, and dead
    keys do not accumulate."""
    from redpanda_ais_demo_spark.streaming.attribution import attribute_stream

    path = str(tmp_path / "ev3")
    # touch at t=0, then an unrelated event at t=10000 ages it out
    _write_events(spark, path, [(9, 0, "view", 900), (9, 10000, "other", 901)])
    stream = spark.readStream.schema(_SCHEMA).parquet(path)
    q = (
        attribute_stream(stream, window_sec=3600)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attr3")
        .start()
    )
    q.processAllAvailable()
    # conversion arrives later — within window of NOTHING (state evicted)
    _write_events(spark, path, [(9, 10100, "purchase", 902)], mode="append")
    q.processAllAvailable()
    q.stop()
    got = _rows(spark, "attr3")
    assert got[902].touch_id is None and got[902].age_sec is None
