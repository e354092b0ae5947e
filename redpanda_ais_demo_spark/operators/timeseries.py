"""Time-series resampling operators: regular-grid gap-fill with forward
fill — the hypertable-style companion to the bucketed rollups
(``st_window_traffic``/``st_sliding_traffic``) and the as-of/range joins
in ``plans/advanced_queries.py``.

An event stream is irregular; most downstream consumers (charting,
feature windows, rate computations) want one row per (key, bucket) with
the last observation carried forward. At 100 TB the shape matters: every
stage here is keyed on (or partitioned by) the series key — per-key
bounds are one partial aggregate, the grid is a narrow ``sequence``
explode bounded by time-range/step per key, last-per-bucket is one
keyed window, and the forward fill is a per-key running ``last(...,
ignorenulls)`` — no global sort or single-partition exchange anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_forward(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_sec: int,
    tiebreak_col: str,
) -> DataFrame:
    """Resample ``df`` onto a regular ``step_sec`` grid per ``key_col``
    and forward-fill ``value_col``.

    Semantics (deterministic, oracle-checkable):
    - bucket = floor(epoch seconds / step) * step;
    - per (key, bucket) the surviving observation is the LAST by
      (``ts_col``, ``tiebreak_col``) — the tie-break makes equal
      timestamps deterministic;
    - the grid spans [min bucket, max bucket] of each key's own data, so
      the first grid row always has a value (no leading nulls);
    - empty buckets carry the previous bucket's value forward.

    Output: (key, bucket_ts epoch-seconds long, value forward-filled).
    """
    bucket = (
        F.unix_timestamp(F.col(ts_col)) / step_sec
    ).cast("long") * step_sec  # floor for the positive epochs this engine handles
    keyed = df.select(
        F.col(key_col).alias("key"),
        bucket.alias("bucket_ts"),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__tb"),
        F.col(value_col).alias("value"),
    )
    w_last = Window.partitionBy("key", "bucket_ts").orderBy(
        F.col("__ts").desc(), F.col("__tb").desc()
    )
    last_vals = (
        keyed.withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select("key", "bucket_ts", "value")
    )
    bounds = keyed.groupBy("key").agg(
        F.min("bucket_ts").alias("t0"), F.max("bucket_ts").alias("t1")
    )
    grid = bounds.select(
        "key",
        F.explode(F.sequence(F.col("t0"), F.col("t1"), F.lit(step_sec))).alias("bucket_ts"),
    )
    w_ff = Window.partitionBy("key").orderBy("bucket_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(last_vals, ["key", "bucket_ts"], "left")
        .withColumn("value", F.last("value", ignorenulls=True).over(w_ff))
        .select(F.col("key").alias(key_col), "bucket_ts", "value")
    )
