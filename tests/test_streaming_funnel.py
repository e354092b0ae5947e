"""Streaming ordered funnel: batch parity on ordered replay + cross-batch
step-machine state carry."""

from __future__ import annotations


_SCHEMA = "user_id long, ts timestamp, event_type string, event_id long"


def _write(spark, path, rows, mode="overwrite"):
    (
        spark.createDataFrame(rows, "user_id long, tsec long, event_type string, event_id long")
        .selectExpr("user_id", "to_timestamp(tsec) AS ts", "event_type", "event_id")
        .coalesce(1)
        .write.mode(mode)
        .parquet(path)
    )


def _final_per_key(spark, table):
    out = {}
    for r in spark.table(table).collect():  # update mode: depth monotone, last wins
        if r.user_id not in out or r.depth >= out[r.user_id].depth:
            out[r.user_id] = r
    return out


def test_stream_funnel_matches_batch_on_ordered_replay(spark, tmp_path):
    from redpanda_ais_demo_spark.operators.timeseries import funnel
    from redpanda_ais_demo_spark.streaming.funnel import funnel_stream

    rows = [
        (1, 1, "view", 10), (1, 2, "click", 11), (1, 3, "purchase", 12),
        (2, 1, "view", 20), (2, 3, "click", 21), (2, 2, "purchase", 22),
        (3, 1, "click", 30), (3, 2, "purchase", 31),
        (4, 1, "view", 40), (4, 200000, "click", 41),  # outside window
        (5, 1, "view", 50), (5, 2, "view", 51), (5, 3, "click", 52),  # t1 = FIRST view
    ]
    path = str(tmp_path / "fev")
    _write(spark, path, rows)
    stream = spark.readStream.schema(_SCHEMA).parquet(path)
    q = (
        funnel_stream(stream, ["view", "click", "purchase"], window_sec=86400)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sfun1")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _final_per_key(spark, "sfun1")

    want = {
        r.user_id: r
        for r in funnel(
            spark.read.parquet(path), "user_id", "ts", "event_type",
            ["view", "click", "purchase"], 86400,
        ).collect()
    }
    # batch emits every key incl. depth-0; streaming only keys with events
    # (same set here since every user has events)
    assert set(got) == set(want)
    for k in want:
        for f in ("depth", "t1", "t2", "t3"):
            assert getattr(got[k], f) == getattr(want[k], f), (k, f)


def test_stream_funnel_state_advances_across_batches(spark, tmp_path):
    from redpanda_ais_demo_spark.streaming.funnel import funnel_stream

    path = str(tmp_path / "fev2")
    _write(spark, path, [(8, 10, "view", 80)])
    stream = spark.readStream.schema(_SCHEMA).parquet(path)
    q = (
        funnel_stream(stream, ["view", "click", "purchase"], window_sec=3600)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sfun2")
        .start()
    )
    q.processAllAvailable()
    _write(spark, path, [(8, 20, "click", 81)], mode="append")
    q.processAllAvailable()
    _write(spark, path, [(8, 30, "purchase", 82), (8, 40, "purchase", 83)], mode="append")
    q.processAllAvailable()
    q.stop()
    final = _final_per_key(spark, "sfun2")[8]
    assert final.depth == 3
    assert (final.t1, final.t2, final.t3) == (10, 20, 30)  # greedy-earliest

def test_funnel_trajectory_matches_live_tracker_per_batch(spark, tmp_path):
    """The fourth batch-replay-parity pin: after every day-aligned
    micro-batch, the live tracker's state population and depth histogram
    must equal funnel_trajectory_batch's row for that day — the greedy
    slots never change once set, so the trajectory is exact."""
    from redpanda_ais_demo_spark.streaming.funnel import (
        funnel_stream,
        funnel_trajectory_batch,
    )

    day = 86400
    batches = [
        # day 0: u1 reaches depth 2, u2 depth 1, u3 click-before-view
        [(1, 10, "view", 1), (2, 20, "view", 2), (3, 30, "click", 3),
         (1, 100, "click", 4)],
        # day 1: u1 completes, u2 clicks, u4 appears
        [(1, day + 100, "purchase", 5), (2, day + 3600, "click", 6),
         (4, day + 3601, "view", 7)],
        # day 2: u3 finally views (depth 1), u5 seen via a non-step event
        [(3, 2 * day + 100, "view", 8), (5, 2 * day + 200, "other", 9)],
    ]
    want = {
        0: dict(n_users=3, d0=1, d1=1, d2=1, d3=0),
        day: dict(n_users=4, d0=1, d1=1, d2=1, d3=1),
        2 * day: dict(n_users=5, d0=1, d1=2, d2=1, d3=1),
    }
    steps = ["view", "click", "purchase"]
    window_sec = 200000  # spans all three days

    path = str(tmp_path / "ftraj")
    _write(spark, path, batches[0])
    stream = spark.readStream.schema(_SCHEMA).parquet(path)
    q = (
        funnel_stream(stream, steps, window_sec=window_sec)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sfun3")
        .start()
    )
    live = {}
    for i, rows in enumerate(batches):
        if i:
            _write(spark, path, rows, mode="append")
        q.processAllAvailable()
        states = _final_per_key(spark, "sfun3")
        hist = {d: 0 for d in range(len(steps) + 1)}
        for r in states.values():
            hist[r.depth] += 1
        live[i * day] = dict(
            n_users=len(states), **{f"d{d}": hist[d] for d in hist}
        )
    q.stop()

    all_rows = [r for b in batches for r in b]
    df = (
        spark.createDataFrame(
            all_rows, "user_id long, tsec long, event_type string, event_id long"
        )
        .selectExpr("user_id", "to_timestamp(tsec) AS ts", "event_type", "event_id")
    )
    traj = {
        r.batch_ts: dict(n_users=r.n_users, d0=r.d0, d1=r.d1, d2=r.d2, d3=r.d3)
        for r in funnel_trajectory_batch(
            df, "user_id", "ts", "event_type", steps, window_sec
        ).collect()
    }
    assert traj == want
    assert live == want
