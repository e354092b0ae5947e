"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas`` stages.

Image decode/resize are gated on an importable PIL: real codec when the
environment provides it, deterministic fakes otherwise (same schemas and
invariants either way — non-image payloads always take the fake path, so
fixture-driven oracles are environment-independent). Audio decode remains
an explicit raising stub. The Spark-side plumbing is real and tested in
both modes: schemas, batch iteration, partition sizing, and the UDF
signatures are exactly what a production decode uses.

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


try:  # optional codec gate: real decode/resize when the environment has PIL
    from PIL import Image as _PILImage
except ImportError:  # container default — deterministic fakes below
    _PILImage = None


def _pil_open(payload: bytes):
    """Decode ``payload`` with PIL when (a) PIL is importable and (b) the
    bytes are actually an image; returns None otherwise. Non-image
    payloads (the parquet-fixture spine uses text bytes) deliberately
    fall through to the deterministic fake in EVERY environment, so
    fixture-driven results — including the ``multimodal_frame_sample``
    oracle — are identical with and without the codec installed."""
    if _PILImage is None or not payload:
        return None
    import io

    try:
        img = _PILImage.open(io.BytesIO(payload))
        img.load()
        return img
    except Exception:
        return None


def decode_image(payload: bytes) -> tuple[int, int]:
    """(width, height) of an image payload. Real decode via PIL when the
    environment provides it and the bytes parse as an image; otherwise a
    deterministic fake derives dims from the payload hash so tests are
    reproducible in the codec-less container."""
    img = _pil_open(payload)
    if img is not None:
        return img.width, img.height
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
        T.StructField("pts_ms", T.LongType(), False),
    ]
)


def resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload to (width, height). Real path via PIL when
    available and the bytes parse as an image (re-encoded PNG); otherwise
    a deterministic fake re-hashes the payload salted with the target
    dims, sized ∝ area, so output bytes are reproducible and
    size-plausible in the codec-less container."""
    img = _pil_open(payload)
    if img is not None:
        import io

        buf = io.BytesIO()
        img.resize((width, height)).save(buf, format="PNG")
        return buf.getvalue()
    h = hashlib.sha256(payload + f"{width}x{height}".encode()).digest()
    reps = max(1, (width * height) // (32 * 64))
    return (h * reps)[: max(32, min(len(h) * reps, 4096))]


def decode_audio_waveform(payload: bytes) -> list[float]:
    """STUB — explicitly unimplemented: audio decode needs a codec library
    not present in this container. The gating pattern production code
    would use; callers get a clear error, not silent garbage."""
    raise NotImplementedError(
        "audio decode requires an audio codec (e.g. soundfile/librosa); "
        "not available in this environment"
    )


def resize_images(assets: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Batch image resize: same row count, payload rewritten, dims attached.

    Plumbing identical to a production resize — one kernel per Arrow
    batch, binary in/binary out, metadata columns added JVM-visible."""
    from ..dist import ensure_shipped

    ensure_shipped(assets.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "payload": pdf["payload"].map(lambda b: resize_payload(b or b"", width, height)),
                    "mime": pdf["mime"],
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(kernel, RESIZED_SCHEMA)


def sample_frames(assets: DataFrame, n_frames: int = 4, fps_ms: int = 1000) -> DataFrame:
    """Video frame sampling: each asset row fans out to ``n_frames`` frame
    rows (1→N inside the kernel — the shape a real demuxer produces).

    STUB decode: frames are deterministic payload slices; timestamps are
    synthetic presentation times at ``fps_ms`` spacing."""
    from ..dist import ensure_shipped

    ensure_shipped(assets.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, pts = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = payload or b""
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(b[i * step : (i + 1) * step] or b"\x00")
                    pts.append(i * fps_ms)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_payload": frames,
                    "pts_ms": pd.Series(pts, dtype="int64"),
                }
            )

    return assets.mapInPandas(kernel, FRAME_SCHEMA)


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
