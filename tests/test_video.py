"""Video frame-sampling (MJPEG-in-AVI) and area resize: real container
walk + real JPEG decode, closed-form exactness via the q100
tile-constant contract, malformed-input discipline, and the Spark
mapInPandas paths end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from name_matcher_spark.operators.jpeg import encode_jpeg
from name_matcher_spark.operators.video import (
    encode_avi_mjpeg,
    iter_avi_frames,
    resize_area,
    resize_images,
    sample_video_frames,
)


def _tile_frame(seed: int, h: int = 12, w: int = 19) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    g = ((29 * seed + 13 * (x // 8) + 7 * (y // 8)) % 256).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def test_avi_round_trip_frame_payloads():
    frames = [_tile_frame(i) for i in range(5)]
    avi = encode_avi_mjpeg(frames, fps=4)
    payloads = list(iter_avi_frames(avi))
    assert len(payloads) == 5
    from name_matcher_spark.operators.jpeg import decode_jpeg

    for i, p in enumerate(payloads):
        assert (decode_jpeg(p) == frames[i]).all()  # q100 tile contract


def test_avi_malformed_raises():
    with pytest.raises(ValueError):
        list(iter_avi_frames(b""))
    with pytest.raises(ValueError):
        list(iter_avi_frames(b"RIFF\x08\x00\x00\x00WAVE"))
    good = encode_avi_mjpeg([_tile_frame(1)])
    with pytest.raises(ValueError):
        list(iter_avi_frames(good[:60]))  # header only, no movi


def test_sample_video_frames_exact(spark):
    vids = []
    for mid in (3, 4):
        frames = [_tile_frame(mid * 10 + i) for i in range(6)]
        vids.append((mid, bytearray(encode_avi_mjpeg(frames))))
    vids.append((9, bytearray(b"RIFF garbage")))
    df = spark.createDataFrame(vids, "media_id long, content binary")
    out = sample_video_frames(df, every_k=2).collect()
    by_key = {(r.media_id, r.frame_idx): r for r in out}
    for mid in (3, 4):
        for i in (0, 2, 4):  # every 2nd frame kept
            r = by_key[(mid, i)]
            want = _tile_frame(mid * 10 + i)[:, :, 0].mean()
            assert (r.width, r.height) == (19, 12)
            assert r.mean_r == r.mean_g == r.mean_b == want  # bit-exact
        assert (mid, 1) not in by_key and (mid, 3) not in by_key
    bad = by_key[(9, None)]
    assert bad.width is None and bad.mean_r is None  # nulled, task alive


def test_sample_video_frames_raise_posture(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not avi"))], "media_id long, content binary"
    )
    with pytest.raises(Exception, match="RIFF"):
        sample_video_frames(df, on_error="raise").collect()


def test_resize_area_integer_factor_exact():
    # 2x2 integer factor: each output pixel is the exact 2x2 block mean
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = resize_area(px, 4, 4)
    want = px.reshape(4, 2, 4, 2, 3).mean(axis=(1, 3))
    assert (out == np.clip(np.round(want), 0, 255).astype(np.uint8)).all()


def test_resize_area_ragged_and_identity_and_gray():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (7, 11, 3), dtype=np.uint8)
    out = resize_area(px, 3, 4)  # ragged boxes
    assert out.shape == (3, 4, 3)
    # brute-force the same uneven boxes
    ys = np.floor(np.arange(4) * 7 / 3).astype(int)
    xs = np.floor(np.arange(5) * 11 / 4).astype(int)
    for oy in range(3):
        for ox in range(4):
            box = px[ys[oy]:ys[oy + 1], xs[ox]:xs[ox + 1]].reshape(-1, 3).mean(axis=0)
            assert (out[oy, ox] == np.clip(np.round(box), 0, 255)).all()
    assert (resize_area(px, 7, 11) == px).all()  # identity
    g = rng.randint(0, 256, (9, 6), dtype=np.uint8)
    assert resize_area(g, 3, 2).shape == (3, 2)
    with pytest.raises(ValueError):
        resize_area(px, 0, 4)


def test_resize_images_spark_path(spark):
    g = _tile_frame(7, 16, 16)[:, :, 0]  # gray tiles, 16x16 -> 2x2 tiles
    rows = [
        (1, "image/jpeg", bytearray(encode_jpeg(g, 100))),
        (2, "image/jpeg", bytearray(b"\xff\xd8 junk")),
    ]
    df = spark.createDataFrame(rows, "media_id long, mime string, content binary")
    out = {r.media_id: r for r in resize_images(df, 2, 2).collect()}
    # each 8x8 tile is constant, so the 2x2 area resize IS the tile grid
    tiles = g.reshape(2, 8, 2, 8).mean(axis=(1, 3))
    assert out[1].mean_r == tiles.mean()
    assert (out[1].width, out[1].height) == (2, 2)
    assert out[2].mean_r is None


def test_resize_area_upscale_replicates_not_nan():
    """Target larger than source: boxes must replicate source pixels,
    never divide by a zero-area box (NaN -> undefined uint8 garbage)."""
    import numpy as np

    from name_matcher_spark.operators.video import resize_area

    px = np.array([[10, 200], [30, 40]], dtype=np.uint8)
    out = resize_area(px, 4, 4)
    assert out.shape == (4, 4)
    expected = np.array(
        [[10, 10, 200, 200], [10, 10, 200, 200],
         [30, 30, 40, 40], [30, 30, 40, 40]], dtype=np.uint8
    )
    assert np.array_equal(out, expected)
    # mixed: upscale one axis, downscale the other
    out2 = resize_area(px, 1, 4)
    assert np.array_equal(out2, np.array([[20, 20, 120, 120]], dtype=np.uint8))


def test_resize_area_property_vs_naive_reference():
    """Any (h, w) -> (out_h, out_w) combination — downscale, upscale,
    mixed, ragged — must equal the naive per-box mean with the same
    replicate-on-upscale box rule."""
    import numpy as np

    from name_matcher_spark.operators.video import resize_area

    rng = np.random.RandomState(7)
    for _ in range(40):
        h, w = rng.randint(1, 13), rng.randint(1, 13)
        oh, ow = rng.randint(1, 13), rng.randint(1, 13)
        ch = rng.choice([0, 1, 3])
        shape = (h, w) if ch == 0 else (h, w, ch)
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        got = resize_area(px, oh, ow)
        p3 = px[:, :, None] if ch == 0 else px
        ys = np.floor(np.arange(oh + 1) * h / oh).astype(int)
        xs = np.floor(np.arange(ow + 1) * w / ow).astype(int)
        exp = np.zeros((oh, ow, p3.shape[2]))
        for i in range(oh):
            ylo, yhi = ys[i], max(ys[i + 1], ys[i] + 1)
            for j in range(ow):
                xlo, xhi = xs[j], max(xs[j + 1], xs[j] + 1)
                exp[i, j] = p3[ylo:yhi, xlo:xhi].reshape(-1, p3.shape[2]).mean(axis=0)
        exp = np.clip(np.round(exp), 0, 255).astype(np.uint8)
        if ch == 0:
            exp = exp[:, :, 0]
        assert np.array_equal(got, exp), (shape, oh, ow)


def test_resize_unknown_mime_nulls_under_null_posture(spark):
    """mime is crawl row data: an unsupported or NULL mime must yield a
    null-stats row under on_error='null' (the production posture) and
    still raise loudly under on_error='raise'."""
    from name_matcher_spark.operators.multimodal import encode_bmp
    from name_matcher_spark.operators.video import resize_images

    px = np.full((6, 6, 3), 9, dtype=np.uint8)
    rows = [
        (1, "image/bmp", bytearray(encode_bmp(px))),
        (2, "image/gif", bytearray(b"GIF89a")),
        (3, None, bytearray(b"....")),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, mime string, content binary"
    )
    out = {r.media_id: r for r in resize_images(df, 3, 3).collect()}
    assert out[1].mean_r == 9.0
    assert out[2].width is None and out[2].mean_r is None
    assert out[3].width is None and out[3].mean_r is None
    with pytest.raises(Exception, match="no image codec"):
        resize_images(df, 3, 3, on_error="raise").collect()


def test_decode_jpeg_hostile_sof_dims_rejected_before_allocation():
    """A few-hundred-byte blob claiming 65535x65535 in its SOF must be
    rejected with ValueError BEFORE the coefficient stores are
    allocated (~17 GB per component otherwise), so the on_error='null'
    nets catch it like any other malformed input."""
    import struct as _struct

    from name_matcher_spark.operators.jpeg import decode_jpeg

    # SOI + minimal SOF0 claiming 65535x65535, 1 component + SOS
    sof = bytes([8]) + _struct.pack(">HH", 65535, 65535) + bytes([1, 1, 0x11, 0])
    seg = b"\xff\xc0" + _struct.pack(">H", 2 + len(sof)) + sof
    sos = b"\xff\xda" + _struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    blob = b"\xff\xd8" + seg + sos + b"\x00" * 64 + b"\xff\xd9"
    with pytest.raises(ValueError, match="too large"):
        decode_jpeg(blob)
