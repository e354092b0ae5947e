"""Streaming near-dup filter: batch-internal dedup, cross-batch index
hits, acceptance of novel docs, and idempotent batch replay."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from redpanda_ais_demo_spark.streaming import neardup

SCHEMA = "doc_id long, text string"

# 3-word shingles; "… g h" vs "… g x" → Jaccard 5/7 ≈ 0.71 ≥ 0.5
B1 = [
    (1, "a b c d e f g h"),
    (2, "p q r s t u v w"),
    (3, "k l m n o aa bb cc"),
    (6, "a b c d e f g x"),  # near-dup of 1 (same batch, larger id → rejected)
]
B2 = [
    (7, "p q r s t u v z"),  # near-dup of 2 (index hit → rejected)
    (8, "dd ee ff gg hh ii jj kk"),  # novel → accepted
]


def _write_batch(spark, path, rows, name):
    # the file-stream source watches flat files in `path`, so stage the
    # parquet elsewhere and drop the part file in under a stable name
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as staging:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(p for p in os.listdir(staging) if p.endswith(".parquet"))
        shutil.copy(os.path.join(staging, part), os.path.join(path, f"{name}.parquet"))


def _ids(spark, path):
    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    if not files:
        return set()
    return {r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()}


def test_batch_core_and_streaming_filter(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    rej = str(tmp_path / "rej")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # pure batch core first (no stream machinery in the failure path)
    b1 = spark.createDataFrame(B1, SCHEMA)
    accepted, profiles, rejections = neardup.dedup_batch_against_index(b1, None)
    assert {r.doc_id for r in accepted.collect()} == {1, 2, 3}
    assert {r.id for r in profiles.collect()} == {1, 2, 3}
    rej_rows = {(r.doc_id, r.matched_id, r.via) for r in rejections.collect()}
    assert rej_rows == {(6, 1, "batch")}

    # now through the stream, two micro-batches
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    _write_batch(spark, src, B1, "b1")
    q = neardup.start_near_dup_filter(stream, out, idx, rej, ckpt)
    try:
        q.processAllAvailable()
        assert _ids(spark, out) == {1, 2, 3}
        _write_batch(spark, src, B2, "b2")
        q.processAllAvailable()
        assert _ids(spark, out) == {1, 2, 3, 8}
        rejected = {
            (r.doc_id, r.matched_id, r.via)
            for r in spark.read.parquet(rej).select("doc_id", "matched_id", "via").collect()
        }
        assert rejected == {(6, 1, "batch"), (7, 2, "index")}
        # the index holds exactly the accepted profiles
        assert {r.id for r in spark.read.parquet(idx).select("id").collect()} == {1, 2, 3, 8}
    finally:
        q.stop()


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Dynamic partition overwrite by batch id: re-processing the same
    micro-batch (crash-recovery semantics) must not duplicate output."""
    out = str(tmp_path / "out")
    b1 = spark.createDataFrame(B1, SCHEMA)

    def write(df, batch_id):
        (
            df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(out)
        )

    accepted, _, _ = neardup.dedup_batch_against_index(b1, None)
    write(accepted, 0)
    write(accepted, 0)  # replay
    assert spark.read.parquet(out).count() == 3
