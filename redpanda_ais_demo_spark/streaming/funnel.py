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
