"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

Two decode tiers:

* **Real decode** for uncompressed formats that need no codec library:
  pure-numpy BMP (24-bpp BI_RGB, bottom-up or top-down, row padding)
  and RIFF/WAV (PCM 16-bit) parsers in ``decode_bmp`` / ``decode_wav``,
  run batch-wise inside mapInPandas by ``extract_decoded_features`` —
  actual pixels/samples in, numeric features out.
* **Stub** for codec formats genuinely absent from this container
  (JPEG/PNG/MP3/H.264 need PIL/ffmpeg): ``decode_image_batch`` raises
  NotImplementedError unless ``fake=True``, in which case it produces a
  deterministic md5-derived feature vector — the Spark-side plumbing
  (schema, mapInPandas batching, partition sizing) is identical either
  way.

At production scale the pattern is:
  * binaries stay in their own column, NEVER in a join key;
  * decode/feature-extract runs in mapInPandas so each Arrow batch is
    amortized across the Python boundary once;
  * downstream ops use only the extracted metadata/features, so the
    heavy binary column is pruned out of every subsequent scan.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_image_batch(content: pd.Series, fake: bool = False) -> pd.DataFrame:
    """Batch decode stub. Real implementation would use PIL/ffmpeg;
    neither ships in this container (see module docstring)."""
    if not fake:
        raise NotImplementedError(
            "image/audio decode requires PIL/ffmpeg, not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    n_bytes = content.map(lambda b: len(b) if b is not None else 0)
    digest = content.map(
        lambda b: hashlib.md5(b or b"").hexdigest()  # noqa: S324 - fingerprint only
    )
    # Deterministic 8-dim fake feature: bytes of the md5 digest scaled.
    feature = digest.map(
        lambda d: [int(d[i : i + 2], 16) / 255.0 for i in range(0, 16, 2)]
    )
    return pd.DataFrame(
        {"n_bytes": n_bytes, "digest": digest, "feature": feature}
    )


def extract_media_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    mime_col: str = "mime",
    fake: bool = True,
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = decode_image_batch(pdf[content_col], fake=fake)
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "mime": pdf[mime_col],
                    "n_bytes": decoded["n_bytes"],
                    "digest": decoded["digest"],
                    "feature": decoded["feature"],
                }
            )
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Real decode: pure-numpy BMP + WAV (no codec library required)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as a 24-bpp BI_RGB BMP
    (bottom-up, 4-byte row padding). Test/fixture writer for the
    decoder below."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    img_size = (row_bytes + pad) * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    # file stores BGR, bottom row first
    bgr = pixels[::-1, :, ::-1]
    rows = bytearray()
    zeros = b"\x00" * pad
    for r in range(h):
        rows += bgr[r].tobytes() + zeros
    return header + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """Parse a 24-bpp uncompressed (BI_RGB) BMP into an (h, w, 3) uint8
    RGB array. Supports bottom-up (positive height) and top-down
    (negative) rows and 4-byte row padding. Raises ValueError on
    malformed or unsupported input."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("bad dimensions")
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    need = pixel_off + stride * h
    if len(data) < need:
        raise ValueError("truncated pixel data")
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pixel_off)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Serialize int16 mono samples as a PCM RIFF/WAV. Fixture writer
    for the decoder below."""
    pcm = samples.astype("<i2").tobytes()
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(pcm), b"WAVE")
        + b"fmt " + fmt
        + struct.pack("<4sI", b"data", len(pcm)) + pcm
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM 16-bit RIFF/WAV into (int16 samples [n, channels]
    flattened mono-major, sample_rate). Walks the chunk list (extra
    chunks like LIST are skipped). Raises ValueError on malformed or
    non-PCM-16 input."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    pos = 12
    sample_rate = channels = None
    pcm = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(pcm[: len(pcm) // 2 * 2], dtype="<i2")
    return samples, sample_rate


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("d1", LongType()),     # bmp: width   | wav: n_samples
        StructField("d2", LongType()),     # bmp: height  | wav: sample_rate
        StructField("f1", DoubleType()),   # bmp: mean R  | wav: rms
        StructField("f2", DoubleType()),   # bmp: mean G  | wav: peak/32768
        StructField("f3", DoubleType()),   # bmp: mean B  | wav: mean/32768
    ]
)


def _decode_one(mime: str, blob: bytes | None):
    if blob is None:
        return (None, None, None, None, None)
    if mime == "image/bmp":
        px = decode_bmp(bytes(blob)).astype(np.float64)
        h, w, _ = px.shape
        means = px.reshape(-1, 3).mean(axis=0)
        return (w, h, float(means[0]), float(means[1]), float(means[2]))
    if mime == "audio/wav":
        samples, rate = decode_wav(bytes(blob))
        s = samples.astype(np.float64)
        n = len(s)
        rms = float(np.sqrt((s * s).mean())) if n else 0.0
        peak = float(np.abs(s).max() / 32768.0) if n else 0.0
        mean = float(s.mean() / 32768.0) if n else 0.0
        return (n, rate, rms, peak, mean)
    raise NotImplementedError(
        f"no codec for {mime!r} in this environment (BMP/WAV decode is "
        "native; JPEG/PNG/MP3 need PIL/ffmpeg)"
    )


def extract_decoded_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    mime_col: str = "mime",
    on_error: str = "null",
) -> DataFrame:
    """REAL decode path: parse BMP pixels / WAV samples batch-wise in
    mapInPandas and emit per-media numeric features (DECODED_SCHEMA).

    ``on_error='null'`` (production posture) nulls the feature columns
    for malformed blobs instead of failing the task; ``'raise'``
    propagates (test posture). Unknown mimes always raise — that is a
    configuration error, not dirty data.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for mid, mime, blob in zip(
                pdf[id_col], pdf[mime_col], pdf[content_col]
            ):
                try:
                    vals = _decode_one(mime, blob)
                except NotImplementedError:
                    raise
                except (ValueError, struct.error):
                    if on_error == "raise":
                        raise
                    vals = (None, None, None, None, None)
                out_rows.append((mid, mime, *vals))
            yield pd.DataFrame(
                out_rows,
                columns=["media_id", "mime", "d1", "d2", "f1", "f2", "f3"],
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)
