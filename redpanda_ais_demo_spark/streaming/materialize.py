"""Materialization stage: event streams → continuously-maintained tables.

Re-expresses the ClickHouse Kafka-engine → Memory-MV layer
(sql/clickhouse-ddl.sql:5-67; SURVEY.md §2.1 S6/S7, §2.9):

- memory MVs (``format("memory")``) reproduce the reference's
  ``ENGINE = Memory`` append-everything semantics exactly (demo parity,
  S7) — including the property that the "table" is the full stream
  history and latest-per-key is resolved at query time (the reference's
  join tolerates info-row multiplication; our console dedups, W1).
- parquet MVs are the durable variant the reference lacks (its Memory
  MVs grow unboundedly in RAM, BASELINE.md): checkpointed exactly-once
  file sink, partitioned for scale.

Checkpoints give at-least-once → exactly-once (file sink) delivery — a
strict upgrade over the reference's commit-before-publish at-most-once
hop (ST3, consumer...py:67 vs :88), documented rather than reproduced.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .enrich import FetchFn, enrich_with_weather, stub_weather_fetch
from .ingest import route_positions, route_ship_info

POS_MV = "ship_pos_and_wx_mv"
INFO_MV = "ship_info_and_destination_mv"


def start_memory_mv(df: DataFrame, name: str, checkpoint_dir: str) -> StreamingQuery:
    """S7 — SELECT * materialized view, Memory engine parity."""
    return (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
        .start()
    )


def start_parquet_mv(df: DataFrame, path: str, checkpoint_dir: str, name: str) -> StreamingQuery:
    """Durable MV: exactly-once parquet sink (the scale path)."""
    return (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
        .queryName(name)
        .start()
    )


@dataclass
class Pipeline:
    """Handles to the running dataflow (both MVs share one logical source,
    mirroring the producer's one-stream→two-topic split, §3.1)."""

    spark: SparkSession
    position_query: StreamingQuery
    info_query: StreamingQuery

    def process_all(self) -> None:
        self.position_query.processAllAvailable()
        self.info_query.processAllAvailable()

    def stop(self) -> None:
        for q in (self.position_query, self.info_query):
            if q.isActive:
                q.stop()

    def positions(self) -> DataFrame:
        return self.spark.table(POS_MV)

    def ship_info(self) -> DataFrame:
        return self.spark.table(INFO_MV)


def run_pipeline(
    spark: SparkSession,
    decoded_stream: DataFrame,
    checkpoint_dir: str,
    fetch: FetchFn = stub_weather_fetch,
    max_per_hour: int | None = None,
) -> Pipeline:
    """Wire the full reference dataflow: decoded AIS stream → route →
    enrich → two memory MVs. ``decoded_stream`` is any streaming
    DataFrame with the AIS_DECODED schema (file/rate/kafka source)."""
    enriched = enrich_with_weather(route_positions(decoded_stream), fetch, max_per_hour)
    info = route_ship_info(decoded_stream)
    return Pipeline(
        spark=spark,
        position_query=start_memory_mv(enriched, POS_MV, checkpoint_dir),
        info_query=start_memory_mv(info, INFO_MV, checkpoint_dir),
    )


def start_rollup_mv(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    name: str,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> StreamingQuery:
    """Continuously-maintained AGGREGATE materialized view: each
    micro-batch folds into the persisted rollup via incremental view
    maintenance (``operators/ivm.py:merge_agg``) — the real MV
    semantics (the append-only parquet MV stores raw rows and defers
    aggregation to read time; this one stores one row per group and
    pays only a delta partial-agg + outer merge per batch, the shape
    that survives an unbounded stream).

    Exactly-once across restarts: a manifest records the last folded
    ``batch_id``; Structured Streaming replays the last uncommitted
    batch after a crash, and the replay is SKIPPED if the manifest
    shows it already folded (the same idempotent-sink trick as the
    JSONL manifest sink). State swaps via write-new-then-rename; a
    production deployment would put a transactional table format under
    this for reader-atomic swaps — the fold logic is unchanged.
    """
    import json
    import shutil

    from ..operators.ivm import agg_state, merge_agg

    manifest = path + ".manifest.json"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = -1
        if os.path.exists(manifest):
            with open(manifest) as f:
                last = json.load(f)["last_batch_id"]
        if batch_id <= last:
            return  # replayed batch already folded — idempotent skip
        if os.path.exists(path):
            new = merge_agg(spark.read.parquet(path), batch_df, keys, measures)
        else:
            new = agg_state(batch_df, keys, measures)
        staging = f"{path}.staging-{batch_id}"
        new.write.mode("overwrite").parquet(staging)
        old = f"{path}.old-{batch_id}"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(staging, path)
        if os.path.exists(old):
            shutil.rmtree(old)
        with open(manifest, "w") as f:
            json.dump({"last_batch_id": batch_id}, f)

    return (
        df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
        .queryName(name)
        .start()
    )
