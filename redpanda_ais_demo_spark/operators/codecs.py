"""Pure-stdlib media codecs: binary PPM (P6) images and PCM WAV audio.

These make the *real* decode branch of the multimodal operators executable
with zero third-party dependencies: PIL/soundfile are absent in many
execution environments (including this one), so the container-independent
floor is an uncompressed format each modality ships in the stdlib's reach —
P6 for raw RGB pixels (netpbm spec), RIFF/WAV via the ``wave`` module for
PCM samples. Compressed formats still route to PIL (images, when
importable) or raise ``NotImplementedError`` (audio) — see
``operators/multimodal.py`` for the gating order.

Reference scope note: the reference pipeline has no media columns at all
(SURVEY.md §2.11 — the X4 family is mandated extension surface); these
codecs exist so the Spark-side plumbing around binary payloads is proven
with real pixel/sample round-trips, not only deterministic fakes.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# --- PPM (P6) ---------------------------------------------------------------

_PPM_MAGIC = b"P6"
_WS = b" \t\r\n"


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6, maxval 255) from packed RGB bytes (row-major)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb length {len(rgb)} != {width}x{height}x3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _read_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited token, skipping '#' comments (netpbm spec)."""
    while pos < len(buf):
        c = buf[pos : pos + 1]
        if c == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
        elif c in _WS:
            pos += 1
        else:
            break
    start = pos
    while pos < len(buf) and buf[pos : pos + 1] not in _WS:
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return buf[start:pos], pos


def is_ppm(payload: bytes) -> bool:
    return payload[:2] == _PPM_MAGIC and (len(payload) < 3 or payload[2:3] in _WS or payload[2:3] == b"#")


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, packed RGB bytes) from a binary PPM (P6) payload."""
    if not is_ppm(payload):
        raise ValueError("not a P6 PPM payload")
    pos = 2
    vals = []
    for _ in range(3):
        tok, pos = _read_token(payload, pos)
        vals.append(int(tok))
    width, height, maxval = vals
    if width <= 0 or height <= 0:
        raise ValueError(f"bad PPM dims {width}x{height}")
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # exactly one whitespace byte separates header from raster
    rgb = payload[pos : pos + width * height * 3]
    if len(rgb) != width * height * 3:
        raise ValueError("truncated PPM raster")
    return width, height, rgb


def resize_rgb_nearest(rgb: bytes, width: int, height: int, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resize of packed RGB bytes (deterministic, the
    classic index-map formula: src = floor(dst * src_dim / dst_dim))."""
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ys = (np.arange(new_h) * height) // new_h
    xs = (np.arange(new_w) * width) // new_w
    return arr[ys][:, xs].tobytes()


# --- WAV (RIFF PCM) ---------------------------------------------------------


def encode_wav_pcm16(samples: list[float], sample_rate: int = 16000, channels: int = 1) -> bytes:
    """PCM-16 WAV from float samples in [-1, 1] (interleaved if multichannel)."""
    ints = np.clip(np.asarray(samples, dtype=np.float64) * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, list[float]]:
    """(sample_rate, n_channels, mono-mixed float samples in [-1, 1]) from a
    PCM WAV payload. 8-bit unsigned and 16-bit signed PCM are supported;
    compressed WAV (the ``wave`` module refuses non-PCM) and other sample
    widths raise ``NotImplementedError``."""
    rate, channels, x = decode_wav_np(payload)
    return rate, channels, x.tolist()


def decode_wav_np(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """`decode_wav` without the list round-trip: returns the mono-mixed
    float64 samples as the numpy array they are decoded into. The
    values are bit-identical to ``decode_wav``'s floats (tolist() is a
    lossless float64 conversion) — numpy kernels (VAD framing) should
    take this form instead of paying a per-sample list build + asarray
    re-parse on every payload."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            channels, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError, struct.error) as e:
        raise NotImplementedError(f"not an uncompressed PCM WAV payload: {e}") from e
    try:
        if width == 1:  # unsigned 8-bit
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif width == 2:  # signed 16-bit little-endian
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        else:
            raise NotImplementedError(f"sample width {width * 8}-bit PCM not supported (8/16-bit only)")
    except ValueError as e:
        # a data chunk cut mid-sample passes wave.open but leaves a byte
        # count that isn't a multiple of the sample width — quarantine it
        # like every other undecodable payload instead of letting the
        # frombuffer ValueError abort a whole Arrow batch
        raise NotImplementedError(f"truncated PCM payload: {e}") from e
    if channels > 1:
        frames = len(x) // channels
        x = x[: frames * channels].reshape(frames, channels).mean(axis=1)
    return rate, channels, x
