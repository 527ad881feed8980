"""Video frame-sampling and image resize — the remaining multimodal
verbs (decode / feature-extract / RESIZE / FRAME-SAMPLE), real, no
codec library.

Video is handled as MJPEG-in-AVI: the AVI container is RIFF (the same
chunk grammar ``decode_wav`` already walks) and each frame is a
baseline JPEG, which ``operators/jpeg.py`` decodes natively. That is a
REAL, widely produced format (motion-JPEG cameras, OpenCV's default
fallback writer) — not a synthetic stand-in — so the full
frame-sample path (container walk -> every-k-th selection -> entropy
decode -> per-frame features) runs on actual bytes. Entropy-coded
inter-frame codecs (H.264/VP9) stay out of scope for this container,
rejected loudly.

Resize is pure-numpy area averaging (box filter) — the standard
downscale for training-data thumbnailing — exact on integer factors,
mean-of-box on ragged edges.

Spark posture (same as operators/multimodal.py): binary columns stay
out of join keys; sampling/decoding runs batch-wise in mapInPandas so
the Python boundary is crossed once per Arrow batch; downstream
consumers read only the emitted numeric columns, letting the scan
prune the heavy blob column. A 100 TB crawl shards videos across
partitions by media_id — no operator here ever needs two videos in
one task.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .jpeg import decode_jpeg, encode_jpeg


# --- AVI (RIFF) container ---------------------------------------------------


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return struct.pack("<4sI4s", b"LIST", 4 + len(body), list_type) + body


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return struct.pack("<4sI", cid, len(body)) + body + pad


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 100
) -> bytes:
    """Serialize frames ((h, w, 3) or (h, w) uint8 arrays, all the same
    size) as an MJPEG AVI: standard 'hdrl' (avih + one video stream
    with 'MJPG' fourcc), a 'movi' list of '00dc' JPEG chunks, and an
    'idx1' index. Fixture writer for the sampler below; the output also
    opens in standard players."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    blobs = [encode_jpeg(f, quality=quality) for f in frames]
    max_bytes = max(len(b) for b in blobs)
    usec_per_frame = 1_000_000 // max(1, fps)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, max_bytes * fps, 0, 0x10,  # HASINDEX
        len(frames), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        max_bytes, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_body = b""
    idx = b""
    for blob in blobs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += struct.pack("<4sIII", b"00dc", 0x10, 4 + len(movi_body), len(blob))
        movi_body += _riff_chunk(b"00dc", blob)
    movi = _riff_list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", idx)
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def iter_avi_frames(data: bytes) -> Iterator[bytes]:
    """Yield each video-frame payload ('00dc'/'00db' chunks inside the
    'movi' list) from an AVI. Pure chunk walk — no index required, so
    truncated-index crawl files still stream. Raises ValueError on
    non-AVI input or a missing movi list; a non-MJPEG payload surfaces
    downstream when the JPEG decode rejects it (loudly)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI")
    pos, movi = 12, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        if cid == b"LIST" and data[pos + 8 : pos + 12] == b"movi":
            movi = (pos + 12, pos + 8 + size)
            break
        pos += 8 + size + (size & 1)
    if movi is None:
        raise ValueError("no movi list")
    pos, end = movi
    end = min(end, len(data))
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated frame chunk")
        if cid in (b"00dc", b"00db"):
            yield body
        pos += 8 + size + (size & 1)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_k: int = 2,
    id_col: str = "media_id",
    content_col: str = "content",
    on_error: str = "null",
) -> DataFrame:
    """FRAME-SAMPLE: one output row per kept frame (every ``every_k``-th,
    starting at 0) with per-channel pixel means from a REAL decode of
    the MJPEG payload. Malformed videos/frames null their stats under
    ``on_error='null'`` (production posture) or raise under ``'raise'``.

    Scale shape: the sampler is embarrassingly parallel over videos
    (mapInPandas, one Arrow crossing per batch); frame explosion
    happens Python-side so the shuffle only ever carries the small
    numeric rows, never the blob.
    """
    if every_k < 1:
        raise ValueError("every_k must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                # NULL media_id arrives as NaN (Arrow nullable int ->
                # float64); int(NaN) would crash the task BEFORE the
                # on_error='null' path could engage.
                mid = None if pd.isna(mid) else int(mid)
                try:
                    for i, payload in enumerate(iter_avi_frames(bytes(blob))):
                        if i % every_k:
                            continue
                        px = decode_jpeg(payload).astype(np.float64)
                        h, w, ch = px.shape
                        m = px.reshape(-1, ch).mean(axis=0)
                        r, g, b = (
                            (m[0], m[0], m[0]) if ch == 1 else (m[0], m[1], m[2])
                        )
                        rows.append((mid, i, w, h, float(r), float(g), float(b)))
                except (ValueError, struct.error, TypeError):
                    if on_error == "raise":
                        raise
                    rows.append((mid, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


# --- image resize -----------------------------------------------------------


def resize_area(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box-filter (area-average) resize of (h, w[, ch]) uint8 to
    (out_h, out_w[, ch]) uint8 — the standard training-data downscale.
    Exact block means on integer factors; on ragged factors each output
    pixel is the mean of its (possibly uneven) source box, computed via
    a cumulative-sum integral image (O(hw), no Python loops)."""
    if out_h < 1 or out_w < 1:
        raise ValueError("bad target size")
    gray = px.ndim == 2
    if gray:
        px = px[:, :, None]
    h, w, ch = px.shape
    # integral image with zero row/col, float64 (exact for uint8 sums)
    ii = np.zeros((h + 1, w + 1, ch), dtype=np.float64)
    np.cumsum(np.cumsum(px, axis=0), axis=1, out=ii[1:, 1:])
    ys = np.floor(np.arange(out_h + 1) * h / out_h).astype(np.int64)
    xs = np.floor(np.arange(out_w + 1) * w / out_w).astype(np.int64)
    # UPSCALE guard: when a target dimension exceeds the source, some
    # boxes would be empty (zero area -> 0/0 -> NaN -> undefined uint8
    # cast, i.e. silent garbage pixels). Replicate instead: every box
    # spans at least one source pixel (lo <= h-1 always, so lo+1 <= h).
    ys_lo, ys_hi = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    xs_lo, xs_hi = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    sums = (
        ii[ys_hi, :, :][:, xs_hi, :]
        - ii[ys_lo, :, :][:, xs_hi, :]
        - ii[ys_hi, :, :][:, xs_lo, :]
        + ii[ys_lo, :, :][:, xs_lo, :]
    )
    areas = (ys_hi - ys_lo)[:, None, None] * (xs_hi - xs_lo)[None, :, None]
    out = np.clip(np.round(sums / areas), 0, 255).astype(np.uint8)
    return out[:, :, 0] if gray else out


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def resize_images(
    df: DataFrame,
    out_h: int,
    out_w: int,
    id_col: str = "media_id",
    content_col: str = "content",
    mime_col: str = "mime",
    on_error: str = "null",
) -> DataFrame:
    """RESIZE: decode each image blob (BMP/PNG/JPEG via the native
    parsers), area-resize to (out_h, out_w), and emit the resized
    per-channel means — the stats downstream dedup/quality scoring
    reads. The resized pixels themselves stay task-local by design:
    at crawl scale you re-emit them as a binary column only at the
    final sink, never through a shuffle."""
    from .multimodal import decode_bmp, decode_png

    decoders = {
        "image/bmp": decode_bmp,
        "image/png": decode_png,
        "image/jpeg": decode_jpeg,
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, blob in zip(pdf[id_col], pdf[mime_col], pdf[content_col]):
                mid = None if pd.isna(mid) else int(mid)
                decode = decoders.get(mime)
                if decode is None:
                    # mime is ROW DATA from the crawl: under the
                    # production on_error='null' posture a stray
                    # image/gif or NULL mime must yield a null-stats
                    # row like every other malformed input, not kill
                    # the job; the loud reject stays for 'raise'.
                    if on_error == "raise":
                        raise NotImplementedError(f"no image codec for {mime!r}")
                    rows.append((mid, None, None, None, None, None))
                    continue
                try:
                    px = resize_area(decode(bytes(blob)), out_h, out_w)
                except (ValueError, struct.error, TypeError):
                    if on_error == "raise":
                        raise
                    rows.append((mid, None, None, None, None, None))
                    continue
                ch = px.shape[2] if px.ndim == 3 else 1
                m = px.reshape(-1, ch).mean(axis=0)
                r, g, b = (m[0], m[0], m[0]) if ch == 1 else (m[0], m[1], m[2])
                rows.append((mid, out_w, out_h, float(r), float(g), float(b)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


__all__ = [
    "FRAME_SCHEMA",
    "RESIZED_SCHEMA",
    "encode_avi_mjpeg",
    "iter_avi_frames",
    "resize_area",
    "resize_images",
    "sample_video_frames",
]
