"""Watermarked stream-stream interval join — the two-live-streams case the
reference cannot express at all: its enrichment path is a per-row REST call
from a single-threaded Python loop (`lib/enrich.py` in the reference tree),
so correlating two unbounded feeds (say position fixes with a live weather
observation stream) would force it to buffer one side forever.

Structured Streaming's stream-stream join solves the unbounded-state
problem with event-time constraints: each side declares a watermark, the
join predicate bounds how far the two event times may diverge, and the
state store can then EVICT every buffered row older than
``watermark − interval`` — state is O(key-rate × window), not O(stream).
That eviction bound is also what makes the left-outer variant well-defined:
a left row's NULL match is emitted exactly when the watermark proves no
right match can still arrive.

Scale notes: both sides hash-partition on the join key (one shuffle each,
co-partitioned state); the time bound keeps per-key state bounded, so a
1000-executor job holds window-sized state per key regardless of how much
history streamed through. Skewed keys behave like any keyed state op —
salt upstream if one zone dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts_col: str,
    right_ts_col: str,
    before_s: int,
    after_s: int,
    watermark_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join two watermarked streams on key equality plus the event-time
    band ``right_ts ∈ [left_ts − before_s, left_ts + after_s]``.

    Column hygiene: the right side's key is dropped after the join (it
    equals the left's); both timestamp columns survive so callers can
    compute lag. ``how`` may be "inner" or "leftOuter" — the outer
    variant needs the time bound (Spark rejects it otherwise) and emits
    the NULL-padded row only once the right watermark passes
    ``left_ts + after_s``.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner|leftOuter, got {how!r}")
    if before_s < 0 or after_s < 0:
        raise ValueError(f"need before_s >= 0 and after_s >= 0, got {before_s}, {after_s}")
    lw = left.withWatermark(left_ts_col, f"{int(watermark_s)} seconds")
    # Disambiguate overlapping column names by prefixing the right side
    # (except its key, which merges into the left's). Rename BEFORE
    # declaring the watermark — a projection after withWatermark can
    # detach the watermark from the renamed event-time column.
    rkey = f"__r_{key_col}"
    r_ts = f"r_{right_ts_col}"
    rw = right.select(
        F.col(key_col).alias(rkey),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key_col],
    ).withWatermark(r_ts, f"{int(watermark_s)} seconds")
    cond = (
        (F.col(key_col) == F.col(rkey))
        & (F.col(r_ts) >= F.col(left_ts_col) - F.expr(f"INTERVAL {int(before_s)} SECONDS"))
        & (F.col(r_ts) <= F.col(left_ts_col) + F.expr(f"INTERVAL {int(after_s)} SECONDS"))
    )
    return lw.join(rw, cond, how).drop(rkey)
