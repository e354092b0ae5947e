"""Streaming ordered funnel — the continuous windowFunnel: per key a
fixed-size step-machine state (one timestamp slot per funnel step)
advances as events arrive, with the same strict-order greedy-earliest
semantics as the batch operator (``operators/timeseries.py:funnel``):
t1 anchors at the key's FIRST step-1 event, each later step fills with
the first qualifying event after the previous step and inside
``window_sec`` of t1; a tighter later chain is deliberately not
searched.

State is exactly ``len(steps)`` longs per key — O(keys · steps)
regardless of stream length, the bound that survives an unbounded
stream. A completed or expired chain simply stops advancing (the batch
semantics pin t1 forever, so the state row stays as the key's answer;
emitted depth is monotone per key).

Output (update mode): one row per key per micro-batch that touched it —
(key, depth, t_1..t_n). The LAST row per key equals the batch funnel's
row for the same (ordered) data: parity-pinned in
tests/test_streaming_funnel.py.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    window_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    if not steps:
        raise ValueError("funnel_stream: steps must be non-empty")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..dist import ensure_shipped

    ensure_shipped(events.sparkSession)
    n_steps = len(steps)
    out_schema = "user_id long, depth long, " + ", ".join(
        f"t{i + 1} long" for i in range(n_steps)
    )
    state_schema = ", ".join(f"t{i + 1} long" for i in range(n_steps))
    flat = events.select(
        F.col(key_col).alias("user_id"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("ts"),
        F.col(type_col).alias("et"),
        F.col(id_col).alias("event_id"),
    )

    def update(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ts_slots = list(state.get) if state.exists else [None] * n_steps
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, et in zip(pdf["ts"], pdf["et"]):
                ts = int(ts)
                if ts_slots[0] is None:
                    if et == steps[0]:
                        ts_slots[0] = ts
                    continue
                # first unfilled slot; chain is strict-order greedy
                try:
                    i = ts_slots.index(None)
                except ValueError:
                    continue  # funnel complete
                if (
                    et == steps[i]
                    and ts > ts_slots[i - 1]
                    and ts <= ts_slots[0] + window_sec
                ):
                    ts_slots[i] = ts
        state.update(tuple(ts_slots))
        depth = sum(1 for t in ts_slots if t is not None)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "depth": [depth],
                **{f"t{i + 1}": [ts_slots[i]] for i in range(n_steps)},
            }
        )

    return flat.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def funnel_trajectory_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    window_sec: int,
    batch_sec: int = 86400,
) -> DataFrame:
    """Batch replay of the streaming funnel tracker's per-batch DEPTH
    HISTOGRAM, in exact integer arithmetic — the fourth batch-replay-
    parity row in the streaming-tracker family (ab_monitor z-trajectory,
    bottom-k, quantile trajectory precedents). One row per event batch
    (``batch_sec`` buckets of ``ts_col`` — the micro-batch analogue):
    how many keys the tracker has seen so far, and how many sit at each
    funnel depth 0..n at the end of that batch.

    The exactness argument: the live tracker (``funnel_stream``) fills
    greedy-earliest slots that NEVER change once set and fill in
    increasing event-time order, so its state after batch D is the
    full-stream batch funnel's slot vector truncated to slots with
    t_i inside the first D batches. Depth-at-batch is therefore a pure
    join of the one-shuffle batch ``funnel`` result to the bounded
    batch axis — no per-batch replay of anything.

    Scale shape (the reason this beats the naive "funnel per day
    prefix" fan-out): per key we emit at most ``len(steps)+1``
    DELTA rows (first-seen day, and the day each slot fills), one
    partial-aggregable groupBy collapses those to the bounded
    (level, day) increment table, and the cumulative counts ride a
    broadcast join against the CALENDAR-bounded batch axis — the
    quantile-trajectory argument. Keys never fan out across days.

    Output: batch_ts, n_users (keys with any event so far — the
    tracker's state population, depth-0 rows included), d0..dn (keys
    at exactly that depth). All counts exact longs.
    """
    if not steps:
        raise ValueError("funnel_trajectory_batch: steps must be non-empty")
    from ..operators.timeseries import funnel

    n = len(steps)
    day = lambda c: (F.floor(c / batch_sec) * batch_sec).cast("long")  # noqa: E731
    e = df.select(
        F.col(key_col).alias("key"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("ts"),
    )
    slots = funnel(df, key_col, ts_col, type_col, steps, window_sec)
    seen = e.groupBy("key").agg(F.min("ts").alias("t0"))
    u = slots.withColumnRenamed(key_col, "key").join(seen, "key")
    # delta rows: level 0 fires at the key's first event; level i at the
    # day slot i fills (NULL past the reached depth -> filtered)
    lv = F.explode(
        F.array(
            F.struct(F.lit(0).alias("level"), day(F.col("t0")).alias("day")),
            *[
                F.struct(
                    F.lit(i).alias("level"), day(F.col(f"t{i}")).alias("day")
                )
                for i in range(1, n + 1)
            ],
        )
    ).alias("lv")
    incs = (
        u.select(lv)
        .select("lv.level", "lv.day")
        .filter(F.col("day").isNotNull())
        .groupBy("level", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("add"))
    )
    days = e.select(day(F.col("ts")).alias("bts")).distinct()
    cnt = (
        incs.join(F.broadcast(days), F.col("day") <= F.col("bts"))
        .groupBy("bts", "level")
        .agg(F.sum("add").cast("long").alias("ge"))
    )
    wide = cnt.groupBy("bts").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("level") == i, F.col("ge"))), F.lit(0)
            )
            .cast("long")
            .alias(f"ge{i}")
            for i in range(n + 1)
        ]
    )
    exact = [
        (F.col(f"ge{i}") - (F.col(f"ge{i + 1}") if i < n else F.lit(0)))
        .cast("long")
        .alias(f"d{i}")
        for i in range(n + 1)
    ]
    return wide.select(
        F.col("bts").alias("batch_ts"), F.col("ge0").alias("n_users"), *exact
    )
