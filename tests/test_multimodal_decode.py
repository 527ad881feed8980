"""Real multimodal decode: pure-numpy BMP/WAV parsers round-trip and
survive malformed input; the mapInPandas extraction path matches the
generative formulas (the sf-scale twin is the mm_decode_media oracle).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from name_matcher_spark.operators.multimodal import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    extract_decoded_features,
)


def test_bmp_round_trip_with_padding():
    # w=5 -> 15-byte rows -> 1 byte padding per row
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_top_down_rows():
    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    data = bytearray(encode_bmp(px))
    # flip height sign -> top-down; pixel rows must be re-flipped to match
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    assert np.array_equal(decode_bmp(bytes(data)), px[::-1])


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"BM" + b"\x00" * 20,                       # truncated header
        b"PNG not a bmp at all" + b"\x00" * 60,     # wrong magic
        encode_bmp(np.zeros((2, 2, 3), np.uint8))[:-3],  # truncated pixels
    ],
)
def test_bmp_malformed_raises(blob):
    with pytest.raises(ValueError):
        decode_bmp(blob)


def test_bmp_unsupported_bpp_raises():
    data = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<H", data, 28, 8)  # bpp 24 -> 8
    with pytest.raises(ValueError):
        decode_bmp(bytes(data))


def test_wav_round_trip_and_extra_chunk():
    v = (np.arange(100) * 331 % 65536 - 32768).astype(np.int16)
    data = decode_wav(encode_wav(v, 16000))
    # decode returns the documented [n, channels] shape (mono: n x 1)
    assert data[1] == 16000 and np.array_equal(data[0], v.reshape(-1, 1))
    # insert a LIST chunk between fmt and data: the chunk walk must skip it
    raw = encode_wav(v, 16000)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 6) + b"INFOab"
    patched = raw[:fmt_end] + extra + raw[fmt_end:]
    samples, rate = decode_wav(patched)
    assert rate == 16000 and np.array_equal(samples, v.reshape(-1, 1))


def test_wav_stereo_frame_count_not_doubled():
    """Interleaved stereo must decode to (n_frames, 2) — misreading it
    as mono doubles the sample count and corrupts duration features."""
    v = (np.arange(100) * 331 % 65536 - 32768).astype(np.int16)
    raw = bytearray(encode_wav(v, 8000))
    struct.pack_into("<H", raw, 12 + 8 + 2, 2)  # fmt.channels = 2
    samples, rate = decode_wav(bytes(raw))
    assert rate == 8000 and samples.shape == (50, 2)
    assert np.array_equal(samples.reshape(-1), v)


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"RIFF\x00\x00\x00\x00WAVE",  # no chunks at all
        struct.pack("<4sI4s", b"RIFF", 4, b"AVI "),  # not WAVE
    ],
)
def test_wav_malformed_raises(blob):
    with pytest.raises(ValueError):
        decode_wav(blob)


@pytest.mark.parametrize("shape", [(5, 7), (4, 5, 3), (3, 6, 4)])
def test_png_round_trip_all_filters(shape):
    # filter_seed sweeps the scanline filter so every unfilter branch
    # (None/Sub/Up/Average/Paeth) reconstructs exactly, for gray, RGB
    # and RGBA layouts; the encoder also splits IDAT in two, so chunk
    # reassembly is covered on every pass.
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    expected = px[:, :, None] if px.ndim == 2 else px
    for seed in range(5):
        got = decode_png(encode_png(px, filter_seed=seed))
        assert np.array_equal(got, expected)


def test_png_single_row_and_column():
    # 1-wide images make every left/upleft neighbor the zero vector
    for shape in [(1, 9, 3), (9, 1, 3), (1, 1)]:
        px = (np.arange(int(np.prod(shape))) * 37 % 256).astype(np.uint8).reshape(shape)
        exp = px[:, :, None] if px.ndim == 2 else px
        assert np.array_equal(decode_png(encode_png(px, filter_seed=3)), exp)


def test_png_malformed_raises():
    good = bytearray(encode_png(np.zeros((3, 3, 3), np.uint8)))
    bad_filter = bytearray(encode_png(np.zeros((2, 2, 3), np.uint8)))
    for blob in [
        b"",
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 10,   # truncated chunk list
        bytes(good[:40]),                        # truncated mid-IHDR/IDAT
        bytes(good).replace(b"IDAT", b"JUNK"),   # no IDAT at all
    ]:
        with pytest.raises(ValueError):
            decode_png(blob)
    # unsupported: 16-bit depth (IHDR depth byte at offset 8+8+8)
    deep = bytearray(good)
    deep[8 + 8 + 8] = 16
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bytes(deep))
    # corrupt zlib stream -> ValueError, not zlib.error
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(bytes(bad_filter[:-20]) + b"\x00" * 8 + bytes(bad_filter[-12:]))


def test_extract_decoded_features_nulls_bad_rows(spark):
    px = np.full((3, 4, 3), 10, np.uint8)
    v = np.full(50, 1000, np.int16)
    rows = [
        (1, "image/bmp", bytearray(encode_bmp(px))),
        (2, "audio/wav", bytearray(encode_wav(v, 8000))),
        (3, "image/bmp", bytearray(b"garbage not a bmp")),
        (4, "image/png", bytearray(encode_png(np.full((2, 6, 3), 9, np.uint8)))),
        (5, "image/png", bytearray(b"\x89PNG garbage")),
    ]
    df = spark.createDataFrame(rows, "media_id long, mime string, content binary")
    out = {r.media_id: r for r in extract_decoded_features(df).collect()}
    assert out[1].d1 == 4 and out[1].d2 == 3 and out[1].f1 == 10.0
    assert out[2].d1 == 50 and out[2].d2 == 8000
    assert out[2].f1 == pytest.approx(1000.0)
    assert out[3].d1 is None and out[3].f1 is None  # nulled, task survived
    assert out[4].d1 == 6 and out[4].d2 == 2 and out[4].f1 == 9.0
    assert out[5].d1 is None


def test_extract_decoded_features_unknown_mime_raises(spark):
    # mp3 stays a genuinely-uncodec'd mime (jpeg is native since r05)
    df = spark.createDataFrame(
        [(1, "audio/mp3", bytearray(b"\xff\xfb\x90"))],
        "media_id long, mime string, content binary",
    )
    with pytest.raises(Exception, match="no codec"):
        extract_decoded_features(df).collect()


def test_malformed_jpeg_nulls_not_fails(spark):
    df = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(b"\xff\xd8\xff\xee junk"))],
        "media_id long, mime string, content binary",
    )
    row = extract_decoded_features(df, on_error="null").collect()[0]
    assert row.d1 is None and row.f1 is None


def test_png_zip_bomb_rejected_without_inflation():
    """decompressobj(max_length) caps inflation BEFORE allocation —
    zlib.decompress's bufsize is only an initial size and would
    materialize the whole bomb first."""
    import struct as _struct
    import time
    import zlib

    from name_matcher_spark.operators.multimodal import _PNG_SIG, _png_chunk

    ihdr = _struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)  # declares 1x1 gray
    bomb = zlib.compress(b"\x00" * 50_000_000, 9)  # ~50MB inflated
    data = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", bomb) + _png_chunk(b"IEND", b"")
    t0 = time.time()
    with pytest.raises(ValueError, match="IDAT length mismatch"):
        decode_png(data)
    assert time.time() - t0 < 2.0


def test_png_bad_ihdr_length_is_value_error():
    from name_matcher_spark.operators.multimodal import _PNG_SIG, _png_chunk

    data = _PNG_SIG + _png_chunk(b"IHDR", b"\x00" * 12) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR"):
        decode_png(data)


def test_encode_png_single_channel_3d_is_gray():
    px = np.arange(24, dtype=np.uint8).reshape(4, 6, 1)
    out = decode_png(encode_png(px))
    assert out.shape == (4, 6, 1)
    assert (out == px).all()


def test_png_rejects_pixel_product_bomb():
    """Per-axis caps alone admit w=2^20 x h=2^12 (~26 GB inflate from a
    few MB of deflate); the PRODUCT cap must reject it at header time,
    before any allocation."""
    ihdr = struct.pack(">IIBBBBB", 1 << 20, 1 << 12, 8, 2, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I4s", 13, b"IHDR") + ihdr + b"\x00" * 4
        + struct.pack(">I4s", 1, b"IDAT") + b"x" + b"\x00" * 4
        + struct.pack(">I4s", 0, b"IEND") + b"\x00" * 4
    )
    with pytest.raises(ValueError, match="bad dimensions"):
        decode_png(blob)
