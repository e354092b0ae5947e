"""Streaming distinct-count tracker: "how many unique users has this
stream EVER seen" over an unbounded feed, in constant state — the
streaming form of the HLL rollups in ``operators/sketches.py``.

Shape per micro-batch (foreachBatch):
1. sketch the batch (one ``hll_sketch_agg`` — a partial-aggregable
   JVM aggregate; the shuffle carries sketches, never raw keys),
2. union with the persisted cumulative sketch (``hll_union_agg`` over
   two rows — HLL union is SET-mergeable: any arrival order covers the
   same key set; the ESTIMATE can wobble by a count or two with merge
   representation, but a same-order replay is byte-identical),
3. write the new sketch state to ``state_dir/__batch_id=<id>`` and an
   estimate snapshot row to ``snapshots_dir/__batch_id=<id>``.

Replay idempotency (the trending-tracker doctrine): a batch derives
ONLY from the newest state partition with id strictly below its own,
so a crash-after-write replay rereads the same predecessor and
overwrites its own partitions with identical bytes. State discovery
and pruning go through the Hadoop FileSystem helpers shared with
``streaming/trending.py`` — hdfs:// and s3a:// state dirs resume
instead of silently resetting.

At 100 TB: state is ONE sketch (kilobytes) regardless of stream
volume; per batch the only data-sized pass is the partial-aggregated
sketch build. Standard error ~1.04/sqrt(2^lgK) (~1.6% at the default
lgK=12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .trending import _latest_state_below, _list_state_ids, _prune_state_partitions


def batch_sketch(df: DataFrame, key_col: str, lg_k: int = 12) -> DataFrame:
    """One-row (sketch binary) HLL of a micro-batch's keys."""
    return df.agg(F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch"))


def merge_sketches(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Union the persisted cumulative sketch with the batch sketch —
    two rows in, one row out; exact mergeability is the HLL contract."""
    both = batch if state is None else state.select("sketch").unionAll(
        batch.select("sketch")
    )
    return both.agg(F.hll_union_agg(F.col("sketch")).alias("sketch"))


def start_distinct_tracker(
    stream: DataFrame,
    key_col: str,
    state_dir: str,
    snapshots_dir: str,
    checkpoint_dir: str,
    lg_k: int = 12,
    retain: int = 2,
) -> StreamingQuery:
    """Start the tracker. Each micro-batch replaces the cumulative
    sketch under ``state_dir`` and appends one snapshot partition under
    ``snapshots_dir`` (columns: batch_id, n_estimate)."""
    if retain < 1:
        raise ValueError("retain must be >= 1")
    spark = stream.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        prior = _latest_state_below(spark, state_dir, batch_id)
        merged = merge_sketches(prior, batch_sketch(batch_df, key_col, lg_k))
        merged = merged.localCheckpoint()
        merged.write.mode("overwrite").parquet(
            state_dir.rstrip("/") + f"/__batch_id={batch_id}"
        )
        snap = merged.select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            F.round(F.hll_sketch_estimate(F.col("sketch"))).cast("long").alias(
                "n_estimate"
            ),
        )
        snap.write.mode("overwrite").parquet(
            snapshots_dir.rstrip("/") + f"/__batch_id={batch_id}"
        )
        _prune_state_partitions(spark, state_dir, batch_id - retain + 1)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


__all__ = [
    "batch_sketch",
    "merge_sketches",
    "start_distinct_tracker",
    "_list_state_ids",
]
