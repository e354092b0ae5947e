"""Streaming anomaly alerts from batch-trained robust statistics — the
train-batch / score-stream pattern: ``operators.timeseries.mad_stats``
learns per-group (median, MAD) offline; the live stream joins that tiny
stats table by broadcast and flags |modified z| > threshold rows as they
arrive. No streaming state at all — the model IS the state, refreshed by
re-running the batch trainer (the same lifecycle as the hashed linear
quality scorer, but for numeric outliers).

Scale: the stats table is one row per group (broadcast at any corpus
size); scoring is a narrow projection per micro-batch; threshold
semantics are identical to the batch ``mad_outliers`` operator, pinned
by a shared-fixture test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_anomaly_stream(
    stream: DataFrame,
    stats: DataFrame,
    group_col: str,
    value_col: str,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Flag stream rows whose ``value_col`` deviates robustly from the
    batch-trained per-group (med, mad). Groups with MAD 0 or unseen in
    training pass through unflagged (inner join drops unseen — route
    them to a quarantine stream if the schema drifts)."""
    scored = (
        stream.join(F.broadcast(stats), group_col)
        .filter(F.col("mad") > 0)
        .withColumn(
            "robust_z",
            F.round(
                F.lit(0.6745) * (F.col(value_col) - F.col("med")) / F.col("mad"), 6
            ),
        )
    )
    return scored.filter(F.abs(F.col("robust_z")) > z_threshold)
