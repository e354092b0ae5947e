"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes / explicit stubs (clearly marked) — but the Spark-side
plumbing is real and tested: schemas, batch iteration, partition sizing,
and the UDF signatures are exactly what a production decode would use.

Scale notes:
- payloads stay in ``BinaryType`` columns end-to-end; Arrow moves them
  zero-copy into pandas batches.
- ``repartition`` before heavy decode so batches are size-bounded
  (maxRecordsPerBatch caps Arrow batch memory), and decode parallelism is
  decoupled from upstream file layout.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of a multimodal asset table: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """STUB — real implementation needs an image codec (PIL/opencv), not in
    this container. Deterministic fake: derive (width, height) from the
    payload hash so tests are reproducible."""
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def extract_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: payload -> metadata + tiny feature vector.

    Real decode/feature models would run here (one model load per
    partition, amortized over Arrow batches — the standard pattern).
    """
    for pdf in batches:
        out = {
            "asset_id": pdf["asset_id"],
            "modality": pdf["modality"],
            "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int32"),
            "sha256": pdf["payload"].map(lambda b: hashlib.sha256(b or b"").hexdigest()),
        }
        dims = pdf["payload"].map(lambda b: decode_image(b or b""))
        out["width"] = dims.map(lambda d: d[0]).astype("int32")
        out["height"] = dims.map(lambda d: d[1]).astype("int32")
        # deterministic fake embedding: first 8 bytes of sha as floats in [0,1)
        out["feature"] = pdf["payload"].map(
            lambda b: [x / 255.0 for x in hashlib.sha256(b or b"").digest()[:8]]
        )
        yield pd.DataFrame(out)


def extract_features(assets: DataFrame, partitions: int | None = None) -> DataFrame:
    """Run the multimodal feature pipeline over an asset table."""
    from ..dist import ensure_shipped

    ensure_shipped(assets.sparkSession)  # kernel is module-level → pickled by reference
    if partitions:
        assets = assets.repartition(partitions)
    return assets.mapInPandas(extract_features_batch, FEATURE_SCHEMA)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: synthesize a binary asset table from the documents fixture
    (text bytes as payload) so the multimodal plumbing is exercisable on
    the driver's parquet tables without real media files."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
