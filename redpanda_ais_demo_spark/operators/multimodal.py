"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas`` stages.

Codec gating order (``operators/codecs.py`` holds the stdlib codecs):
- images: binary PPM (P6) decodes with the pure-stdlib codec in EVERY
  environment; other formats decode via PIL when importable; anything
  else takes the deterministic fake path (same schemas and invariants, so
  fixture-driven oracles over non-image payloads are environment-
  independent).
- audio: PCM WAV (8/16-bit) decodes via the stdlib ``wave`` module;
  compressed formats raise ``NotImplementedError`` (honest stub — no
  codec library in this container).
The Spark-side plumbing is real and tested in all modes: schemas, batch
iteration, partition sizing, and the UDF signatures are exactly what a
production decode uses.

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

from . import codecs

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
    """(width, height) of an image payload. Real decode for binary PPM via
    the stdlib codec (always available), then PIL for other formats when
    the environment provides it; otherwise a deterministic fake derives
    dims from the payload hash so tests are reproducible in the codec-less
    container."""
    if payload and codecs.is_ppm(payload):
        try:
            w, h, _ = codecs.decode_ppm(payload)
            return w, h
        except ValueError:
            pass  # malformed PPM falls through to PIL/fake
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
    """Resize an image payload to (width, height). Real paths: binary PPM
    via the stdlib codec (nearest-neighbor on raw RGB, re-encoded P6 —
    runs in every environment), then PIL for other formats when available
    (re-encoded PNG); otherwise a deterministic fake re-hashes the payload
    salted with the target dims, sized ∝ area, so output bytes are
    reproducible and size-plausible in the codec-less container."""
    if payload and codecs.is_ppm(payload):
        try:
            w0, h0, rgb = codecs.decode_ppm(payload)
            return codecs.encode_ppm(width, height, codecs.resize_rgb_nearest(rgb, w0, h0, width, height))
        except ValueError:
            pass  # malformed PPM falls through to PIL/fake
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
    """Mono-mixed float waveform in [-1, 1] from an audio payload.

    Real decode for uncompressed PCM WAV (8/16-bit) via the stdlib
    ``wave`` codec — executable in every environment. Compressed formats
    (mp3/ogg/flac/…) still raise ``NotImplementedError``: they need a
    codec library this container doesn't ship, and callers get a clear
    error, not silent garbage."""
    _, _, samples = codecs.decode_wav(payload)
    return samples


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """mapInPandas audio pipeline: WAV payloads decode for real (stdlib
    codec); non-WAV payloads yield NULL feature columns instead of failing
    the batch — the production shape for mixed-quality corpora, where a
    quarantine filter on NULLs follows."""
    import math

    from ..dist import ensure_shipped

    ensure_shipped(assets.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, counts, durs, rmss = [], [], [], []
            for payload in pdf["payload"]:
                try:
                    rate, _, samples = codecs.decode_wav(bytes(payload) if payload is not None else b"")
                    n = len(samples)
                    rates.append(rate)
                    counts.append(n)
                    durs.append(int(n * 1000 / rate) if rate else None)
                    rmss.append(math.sqrt(sum(s * s for s in samples) / n) if n else 0.0)
                except NotImplementedError:
                    rates.append(None)
                    counts.append(None)
                    durs.append(None)
                    rmss.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": pd.Series(rates, dtype="Int32"),
                    "n_samples": pd.Series(counts, dtype="Int32"),
                    "duration_ms": pd.Series(durs, dtype="Int64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    return assets.mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)


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


def synthesize_ppm_assets(docs: DataFrame) -> DataFrame:
    """Adapter: deterministic 9x8 binary-PPM "bag-of-shingles" image per
    document — each distinct token paints the pixel its md5 addresses,
    so documents sharing most tokens yield images differing in few
    pixels: the text fixture's NEAR-dups become image near-dups (the
    ground truth an image-dedup operator needs), and identical texts
    yield identical images. Real PPM bytes: the full decode path runs,
    not the fake."""

    # fixed pseudorandom background, identical for every doc: shingle
    # pixels overwrite it, so shared shingles leave shared pixels and the
    # unpainted canvas still carries gradients (an all-black background
    # would make every sparse image hash-collide). Paints key on 3-gram
    # SHINGLES, not tokens — the fixture vocabulary is ~30 words, so
    # distinct-token sets are near-constant corpus-wide; shingle sets
    # carry the actual near-dup structure.
    seed, bg = b"dhash-bg", b""
    while len(bg) < 216:
        seed = hashlib.md5(seed).digest()
        bg += seed

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = bytearray(bg[:216])  # 9*8*3 canvas: every pixel
                # survives the 9x8 dHash grid, none of the paint wasted
                toks = text.split(" ")
                for sh in {" ".join(toks[i : i + 3]) for i in range(max(1, len(toks) - 2))}:
                    d = hashlib.md5(sh.encode("utf-8")).digest()
                    p = d[0] % 72  # pixel 0..71
                    raw[3 * p : 3 * p + 3] = d[1:4]
                payloads.append(codecs.encode_ppm(9, 8, bytes(raw)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                    "mime": "image/x-portable-pixmap",
                }
            )

    schema = "asset_id long, modality string, payload binary, mime string"
    return docs.select("doc_id", "text").mapInPandas(kernel, schema)


def _dhash_bytes(payload: bytes) -> int | None:
    """64-bit difference hash (dHash): decode → grayscale → 9x8 nearest
    resize → bit b = (gray[x] < gray[x+1]) row-major. Gradient-based, so
    uniform brightness shifts leave the hash unchanged; NULL when no
    real decode path accepts the payload (quarantine, like the audio
    kernel — a hash of fake pixels would be a fake fingerprint)."""
    import numpy as np

    rgb = w = h = None
    if payload and codecs.is_ppm(payload):
        try:
            w, h, rgb = codecs.decode_ppm(payload)
        except ValueError:
            pass
    if rgb is None:
        img = _pil_open(payload)
        if img is None:
            return None
        img = img.convert("RGB")
        w, h, rgb = img.width, img.height, img.tobytes()
    small = codecs.resize_rgb_nearest(rgb, w, h, 9, 8)
    arr = np.frombuffer(small, dtype=np.uint8).reshape(8, 9, 3).astype(np.int64)
    gray = (299 * arr[..., 0] + 587 * arr[..., 1] + 114 * arr[..., 2]) // 1000
    v = 0
    for bit in (gray[:, :-1] < gray[:, 1:]).flatten():
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(assets: DataFrame) -> DataFrame:
    """Perceptual image fingerprints: (id, simhash) rows ready for the
    banded Hamming joiner (``dedup.simhash_pairs``) — image near-dup
    detection is TEXT near-dup detection with a perceptual hash swapped
    in for the token fold. Arrow-batched kernel, one row out per asset;
    undecodable payloads hash to NULL and drop from pairing.

    Scale: narrow 1-in-1-out kernel (the decode is the cost — at 100 TB
    this is the same embarrassingly parallel shape as feature
    extraction), then simhash_pairs' pigeonhole banding keeps candidate
    generation linear."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs = [_dhash_bytes(bytes(p) if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "id": pdf["asset_id"].astype("int64"),
                    "simhash": pd.Series(hs, dtype="Int64"),
                }
            )

    return assets.mapInPandas(kernel, "id long, simhash long").filter(
        F.col("simhash").isNotNull()
    )


def synthesize_wav_assets(
    docs: DataFrame, sample_rate: int = 8000, duration_ms: int = 500
) -> DataFrame:
    """Deterministic PCM-WAV audio assets derived from ``documents`` —
    the audio twin of ``synthesize_ppm_assets``: each doc becomes a
    mono clip of silence with ONE 440 Hz tone burst whose position and
    length are pure functions of ``doc_id`` (start decile = doc_id % 7,
    length = a fifth of the clip), so downstream kernels (VAD,
    features) have exactly-known answers at any scale. Real bytes
    through the stdlib RIFF codec — the full binary path executes."""
    from ..dist import ensure_shipped

    ensure_shipped(docs.sparkSession)
    n = int(sample_rate * duration_ms / 1000)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        t = np.arange(n, dtype=np.float64)
        tone = 0.5 * np.sin(2.0 * np.pi * 440.0 * t / sample_rate)
        # only doc_id % 7 reaches the waveform — precompute the 7
        # distinct payloads once per task instead of re-encoding an
        # identical clip for every row
        cache: dict[int, bytes] = {}
        for slot in range(7):
            start = slot * n // 10
            burst = n // 5
            wave_arr = np.zeros(n, dtype=np.float64)
            wave_arr[start : start + burst] = tone[:burst]
            cache[slot] = codecs.encode_wav_pcm16(wave_arr.tolist(), sample_rate)
        for pdf in batches:
            payloads = [cache[int(doc_id % 7)] for doc_id in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "modality": "audio",
                    "mime": "audio/wav",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(
        kernel,
        "asset_id long, modality string, mime string, payload binary",
    )


VAD_SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("seg_idx", T.IntegerType(), False),
        T.StructField("start_ms", T.LongType(), False),
        T.StructField("end_ms", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("mean_rms", T.DoubleType(), False),
    ]
)


def audio_vad_segments(
    assets: DataFrame,
    frame_ms: int = 20,
    threshold: float = 0.1,
    min_frames: int = 2,
) -> DataFrame:
    """Energy-threshold voice-activity detection over binary audio
    payloads: frame the decoded waveform into ``frame_ms`` windows,
    mark frames whose RMS ≥ ``threshold`` voiced, merge consecutive
    voiced frames into segments, drop segments shorter than
    ``min_frames`` — the speech-segment extractor ahead of any ASR/
    audio-training pipeline, and the real-DSP depth of the X4 family
    (decode → numpy frame/RMS → run-length, all inside one Arrow
    batch; no per-sample Python).

    One row per detected segment. Undecodable payloads (compressed
    formats the stdlib codec refuses) contribute zero segments — the
    quarantine-filter production shape, matching
    ``extract_audio_features``'s NULL convention.
    """
    if frame_ms <= 0 or min_frames < 1:
        raise ValueError(f"need frame_ms > 0, min_frames >= 1, got {frame_ms}, {min_frames}")
    from ..dist import ensure_shipped

    ensure_shipped(assets.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "seg_idx": [], "start_ms": [],
                "end_ms": [], "n_frames": [], "mean_rms": [],
            }
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    # np variant: same float64 values, no per-sample
                    # list build + asarray re-parse per payload
                    rate, _, x = codecs.decode_wav_np(
                        bytes(payload) if payload is not None else b""
                    )
                except NotImplementedError:
                    continue
                if rate <= 0:
                    # a corrupt header can declare framerate=0 and still
                    # decode — quarantine it like the undecodable path
                    # instead of dividing by zero in the ms conversion
                    continue
                frame_len = max(1, int(rate * frame_ms / 1000))
                n_frames_total = len(x) // frame_len
                if n_frames_total == 0:
                    continue
                frames = x[: n_frames_total * frame_len].reshape(
                    n_frames_total, frame_len
                )
                rms = np.sqrt((frames * frames).mean(axis=1))
                mask = (rms >= threshold).astype(np.int8)
                edges = np.flatnonzero(np.diff(np.concatenate(([0], mask, [0]))))
                seg_idx = 0
                for s, e in zip(edges[::2], edges[1::2]):
                    if e - s < min_frames:
                        continue
                    out["asset_id"].append(int(asset_id))
                    out["seg_idx"].append(seg_idx)
                    out["start_ms"].append(int(s * frame_len * 1000 / rate))
                    out["end_ms"].append(int(e * frame_len * 1000 / rate))
                    out["n_frames"].append(int(e - s))
                    out["mean_rms"].append(float(rms[s:e].mean()))
                    seg_idx += 1
            yield pd.DataFrame(out)

    return assets.mapInPandas(kernel, VAD_SEGMENT_SCHEMA)
