"""Streaming last-touch attribution — the continuous counterpart of the
batch operator (``operators/timeseries.py:last_touch_attribution``):
credit each conversion to the key's most recent qualifying touch within
``window_sec``, as events arrive.

State design (the part that must survive an unbounded stream): per key,
exactly ONE carried touch — (ts, id, type) of the latest touch seen —
so state is O(keys) regardless of stream length, and a touch older than
the attribution window is evicted outright (a conversion could never
credit it), bounding retention the way the batch operator's window
predicate does. Rows shuffle once per micro-batch on the key; state
lives co-located with its key in the state store, so a 1000-executor
cluster partitions users with no cross-talk.

Ordering contract: within a batch the kernel sorts by (ts, event_id);
across batches per-key arrival order must be preserved by the source
(the same ST4 keyed-ordering assumption the voyage tracker documents).
Late events that violate it attribute against the state as-of arrival —
the standard processing-order semantics of this operator family.

Parity: on an ordered replay, output rows match the batch operator
exactly (pinned in tests/test_streaming_attribution.py).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTR_SCHEMA = (
    "user_id long, conv_id long, conv_ts long, touch_id long, "
    "touch_ts long, touch_type string, age_sec long"
)
_STATE_SCHEMA = "t_ts long, t_id long, t_et string"


def attribute_stream(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    window_sec: int = 86400,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Attribute conversions continuously. Input: a streaming DataFrame
    with (key, timestamp, type, id) columns. Output (append-per-batch):
    one row per conversion, attributed or NULL-touch (unattributed) —
    the same schema and semantics as the batch operator."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..dist import ensure_shipped

    ensure_shipped(events.sparkSession)
    touches = set(touch_types)
    flat = events.select(
        F.col(key_col).alias("user_id"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("ts"),
        F.col(type_col).alias("et"),
        F.col(id_col).alias("event_id"),
    )

    def update(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        t_ts, t_id, t_et = state.get if state.exists else (None, None, None)
        out = {c: [] for c in ("conv_id", "conv_ts", "touch_id", "touch_ts", "touch_type", "age_sec")}
        max_ts = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, et, eid in zip(pdf["ts"], pdf["et"], pdf["event_id"]):
                ts, eid = int(ts), int(eid)
                max_ts = ts if max_ts is None else max(max_ts, ts)
                if et == conversion_type:
                    if t_ts is not None and ts - t_ts <= window_sec:
                        out["conv_id"].append(eid)
                        out["conv_ts"].append(ts)
                        out["touch_id"].append(t_id)
                        out["touch_ts"].append(t_ts)
                        out["touch_type"].append(t_et)
                        out["age_sec"].append(ts - t_ts)
                    else:
                        out["conv_id"].append(eid)
                        out["conv_ts"].append(ts)
                        out["touch_id"].append(None)
                        out["touch_ts"].append(None)
                        out["touch_type"].append(None)
                        out["age_sec"].append(None)
                elif et in touches:
                    t_ts, t_id, t_et = ts, eid, et
        # retention bound: a touch no future conversion can credit
        # (older than window vs the newest event seen) is dead state
        if t_ts is not None and max_ts is not None and max_ts - t_ts > window_sec:
            state.remove()
        elif t_ts is not None:
            state.update((t_ts, t_id, t_et))
        n = len(out["conv_id"])
        yield pd.DataFrame({"user_id": [key[0]] * n, **out})

    return flat.groupBy("user_id").applyInPandasWithState(
        update, ATTR_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
