"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

Two decode tiers:

* **Real decode** for uncompressed formats that need no codec library:
  pure-numpy BMP (24-bpp BI_RGB, bottom-up or top-down, row padding)
  and RIFF/WAV (PCM 16-bit) parsers in ``decode_bmp`` / ``decode_wav``,
  run batch-wise inside mapInPandas by ``extract_decoded_features`` —
  actual pixels/samples in, numeric features out.
* **Real decode** also for PNG — no codec library needed: the DEFLATE
  layer is stdlib ``zlib``, and the chunk walk + scanline unfiltering
  (None/Sub/Up/Average/Paeth) in ``decode_png`` is ~100 lines of numpy.
  8-bit gray/RGB/RGBA, non-interlaced — the shapes a crawl pipeline
  actually stores after ingest normalization.
* **Real decode** also for baseline JPEG — ``operators/jpeg.py`` is a
  pure-numpy T.81 codec (marker walk, DHT-driven Huffman, dequant,
  matrix IDCT, 4:2:0 upsampling, restart markers), so the last *image*
  stub is gone.
* **Stub** only for entropy-coded audio/video formats genuinely absent
  from this container (MP3/H.264 need ffmpeg-class decoders):
  ``decode_image_batch`` raises NotImplementedError unless
  ``fake=True``, in which case it produces a deterministic md5-derived
  feature vector — the Spark-side plumbing (schema, mapInPandas
  batching, partition sizing) is identical either way.

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


# --- PNG: stdlib zlib + numpy unfiltering (W3C PNG 2nd ed. / RFC 2083) ---

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> channels at 8-bit depth


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor over int16 vectors (a=left, b=up, c=up-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_seed: int = 0) -> bytes:
    """Serialize (h, w) uint8 gray, (h, w, 3) RGB or (h, w, 4) RGBA as
    an 8-bit non-interlaced PNG. Scanline r uses filter type
    (filter_seed + r) % 5, so round-trip fixtures exercise every
    unfilter branch; IDAT is split in two chunks to exercise
    reassembly. Fixture writer for ``decode_png``."""
    import zlib

    if pixels.ndim == 3 and pixels.shape[2] == 1:
        pixels = pixels[:, :, 0]  # 1-channel is gray, not RGBA
    if pixels.ndim == 2:
        ct, px = 0, pixels[:, :, None]
    elif pixels.shape[2] == 3:
        ct, px = 2, pixels
    else:
        ct, px = 6, pixels
    h, w, ch = px.shape
    bpp = ch  # bytes per pixel at 8-bit depth
    raw = px.reshape(h, w * ch).astype(np.int16)
    prev = np.zeros(w * ch, dtype=np.int16)
    zero = np.zeros(bpp, dtype=np.int16)
    out = bytearray()
    for r in range(h):
        line = raw[r]
        ft = (filter_seed + r) % 5
        left = np.concatenate([zero, line[:-bpp]])
        upleft = np.concatenate([zero, prev[:-bpp]])
        if ft == 0:
            filt = line
        elif ft == 1:
            filt = line - left
        elif ft == 2:
            filt = line - prev
        elif ft == 3:
            filt = line - (left + prev) // 2
        else:
            filt = line - _paeth(left, prev, upleft)
        out.append(ft)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    comp = zlib.compress(bytes(out), 6)
    mid = len(comp) // 2
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", comp[:mid])
        + _png_chunk(b"IDAT", comp[mid:])
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Parse an 8-bit non-interlaced PNG (gray / RGB / RGBA) into an
    (h, w, channels) uint8 array: chunk walk with multi-IDAT
    reassembly, stdlib zlib inflate, full None/Sub/Up/Average/Paeth
    scanline unfiltering. Verified against real-world adaptively
    filtered PNGs, not just this module's own encoder. Raises
    ValueError on malformed or unsupported input (16-bit, palette,
    interlaced — ingest normalization rewrites those upstream)."""
    import zlib

    if len(data) < 8 + 25 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError("bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ct, comp_m, filt_m, interlace = ihdr
    if depth != 8 or ct not in _PNG_CHANNELS or comp_m or filt_m or interlace:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={ct} interlace={interlace}"
        )
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20 or w * h > 1 << 24:
        # The PER-AXIS caps alone still admit w=2^20 x h=8k ~ 26 GB of
        # inflate from a few MB of deflate (PNG is compressed, so file
        # size does not bound the allocation the way BMP's does); the
        # PRODUCT cap (16 Mpixel) bounds both the inflate and the
        # unfilter buffer.
        raise ValueError("bad dimensions")
    ch = _PNG_CHANNELS[ct]
    stride = w * ch
    need = (stride + 1) * h
    # Zip-bomb guard: decompressobj(max_length=...) truly caps the
    # inflated output (zlib.decompress's bufsize is only the INITIAL
    # buffer size — a hostile IDAT would fully inflate before any
    # length check could run).
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), need)
        # The flush probe must sit INSIDE the try: a stream corrupted
        # past the first `need` bytes raises zlib.error HERE, and a
        # raw zlib.error violates the raises-ValueError contract that
        # the on_error='null' production path catches.
        over = dec.decompress(b"", 1)
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from None
    if len(raw) != need or over or not dec.eof or dec.unused_data:
        raise ValueError("IDAT length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    if (ftypes > 4).any():
        raise ValueError("bad filter type")
    out = np.zeros((h, stride), dtype=np.int16)
    bpp = ch
    zero = np.zeros(bpp, dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    for r in range(h):
        line = rows[r, 1:].astype(np.int16)
        ft = int(ftypes[r])
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prev) % 256
        else:
            # Sub/Average/Paeth depend on the just-reconstructed left
            # pixel: sequential in pixel blocks, vectorized per block.
            upleft = np.concatenate([zero, prev[:-bpp]])
            rec = np.empty(stride, dtype=np.int16)
            for x0 in range(0, stride, bpp):
                left = rec[x0 - bpp : x0] if x0 else zero
                seg = line[x0 : x0 + bpp]
                if ft == 1:
                    rec[x0 : x0 + bpp] = (seg + left) % 256
                elif ft == 3:
                    rec[x0 : x0 + bpp] = (
                        seg + (left + prev[x0 : x0 + bpp]) // 2
                    ) % 256
                else:
                    rec[x0 : x0 + bpp] = (
                        seg
                        + _paeth(left, prev[x0 : x0 + bpp], upleft[x0 : x0 + bpp])
                    ) % 256
        out[r] = rec
        prev = rec
    return out.astype(np.uint8).reshape(h, w, ch)


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
    if not channels or channels < 1:
        raise ValueError("bad channel count")
    flat = np.frombuffer(pcm[: len(pcm) // 2 * 2], dtype="<i2")
    # Honor the documented [n, channels] shape: interleaved multi-
    # channel PCM silently misread as mono doubles the sample count
    # and corrupts every duration-derived feature downstream.
    n = len(flat) // channels
    samples = flat[: n * channels].reshape(n, channels)
    return samples, sample_rate


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("d1", LongType()),     # image: width   | wav: n_samples
        StructField("d2", LongType()),     # image: height  | wav: sample_rate
        StructField("f1", DoubleType()),   # image: mean R  | wav: rms
        StructField("f2", DoubleType()),   # image: mean G  | wav: peak/32768
        StructField("f3", DoubleType()),   # image: mean B  | wav: mean/32768
    ]
)


def _decode_one(mime: str, blob: bytes | None):
    if blob is None:
        return (None, None, None, None, None)
    if mime in ("image/bmp", "image/png", "image/jpeg"):
        if mime == "image/bmp":
            decode = decode_bmp
        elif mime == "image/png":
            decode = decode_png
        else:
            from .jpeg import decode_jpeg

            decode = decode_jpeg
        px = decode(bytes(blob)).astype(np.float64)
        h, w, ch = px.shape
        if ch == 1:  # gray: one mean, reported on all three channels
            m = float(px.mean())
            return (w, h, m, m, m)
        means = px.reshape(-1, ch)[:, :3].mean(axis=0)  # alpha excluded
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
        f"no codec for {mime!r} in this environment (BMP/PNG/JPEG/WAV "
        "decode is native; MP3/H.264 need ffmpeg-class codecs)"
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
