"""Pure-numpy baseline JPEG codec tests (operators/jpeg.py).

Three layers, mirroring the BMP/PNG/WAV decode test strategy:
  * bit-exact reconstruction on the quality-100 per-8x8-tile-constant
    contract the mm_decode_media oracle relies on, across every encode
    variant (grayscale scan, 4:4:4, 4:2:0, restart markers);
  * lossless entropy layer: decode-of-encode reproduces the encoder's
    quantized coefficients exactly (checked end-to-end via q=100 on
    block-aligned content, where transform rounding is the only
    tolerance and is < 0.5);
  * tolerance + structure checks on arbitrary content and loud
    failures on malformed/unsupported input.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from name_matcher_spark.operators.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _tile_gray(mid: int, h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return ((29 * mid + 13 * (x // 8) + 7 * (y // 8)) % 256).astype(np.uint8)


def test_zigzag_is_a_permutation_with_known_prefix():
    flat = ZIGZAG[:, 0] * 8 + ZIGZAG[:, 1]
    assert sorted(flat.tolist()) == list(range(64))
    # first ten entries of the T.81 scan, row-major indices
    assert flat[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


@pytest.mark.parametrize("h,w", [(1, 1), (4, 5), (8, 8), (10, 13), (14, 17), (3, 20), (16, 16)])
@pytest.mark.parametrize("variant", ["gray", "444", "422", "420", "420rst", "422rst"])
def test_tile_constant_q100_exact(h, w, variant):
    g = _tile_gray(11, h, w)
    if variant == "gray":
        data, want = encode_jpeg(g, 100), g[:, :, None]
    else:
        rgb = np.stack([g, g, g], axis=-1)
        want = rgb
        sub = variant[:3]
        if variant.endswith("rst"):
            data = encode_jpeg(rgb, 100, sub, restart_interval=1)
        else:
            data = encode_jpeg(rgb, 100, sub)
    out = decode_jpeg(data)
    assert out.shape == want.shape
    assert (out == want).all()


def test_solid_gray_every_level_q100_exact():
    # DC-only path across the full dynamic range, including the values
    # whose category-11 DC diffs stress magnitude coding.
    for v in (0, 1, 127, 128, 200, 254, 255):
        px = np.full((9, 11), v, dtype=np.uint8)
        assert (decode_jpeg(encode_jpeg(px, 100)) == v).all()
        rgb = np.stack([px] * 3, axis=-1)
        assert (decode_jpeg(encode_jpeg(rgb, 100, "420")) == v).all()


def test_random_rgb_tolerance_by_quality():
    rng = np.random.RandomState(42)
    px = rng.randint(0, 256, (24, 31, 3), dtype=np.uint8)
    exact = decode_jpeg(encode_jpeg(px, 100, "444"))
    # q=100 on arbitrary content: only color-transform + IDCT rounding
    assert np.abs(exact.astype(int) - px.astype(int)).max() <= 3
    lossy = decode_jpeg(encode_jpeg(px, 75, "444"))
    assert lossy.shape == px.shape
    # white-noise worst case still bounded well inside a byte
    assert np.abs(lossy.astype(int) - px.astype(int)).max() < 128
    smooth_err = np.abs(
        decode_jpeg(encode_jpeg(px, 90, "444")).astype(int) - px.astype(int)
    ).mean()
    assert smooth_err < 12.0


def test_smooth_gradient_420_with_restarts():
    yy, xx = np.mgrid[0:40, 0:56]
    px = np.stack(
        [(3 * xx + 2 * yy) % 256, (xx + yy) % 200, (2 * xx) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px, 85, "420", restart_interval=3))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 2.0


def test_ff_stuffing_round_trip():
    # find a tile-constant fixture whose entropy stream contains a
    # stuffed FF00, then prove it still round-trips bit-exactly on the
    # q100 block-constant contract
    hit = False
    for mid in range(64):
        g = _tile_gray(mid, 32, 40)
        data = encode_jpeg(g, 100)
        scan = data[data.find(b"\xff\xda"):]
        assert (decode_jpeg(data) == g[:, :, None]).all()
        hit = hit or b"\xff\x00" in scan
    assert hit  # stuffing exercised at least once across the sweep


def test_rejects_malformed_and_unsupported():
    g = _tile_gray(1, 10, 12)
    good = encode_jpeg(g, 100)
    with pytest.raises(ValueError):
        decode_jpeg(b"")
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated mid-segment
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    sof_at = good.find(b"\xff\xc0")
    assert sof_at > 0
    prog = good[:sof_at + 1] + b"\xc2" + good[sof_at + 2:]
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    # entropy truncation: cut mid-stream in a many-block image
    big = encode_jpeg(_tile_gray(9, 48, 64), 100)
    cut = big.find(b"\xff\xda") + 14
    with pytest.raises(ValueError):
        decode_jpeg(big[:cut])


def test_quality_scaling_monotone_size():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    sizes = [len(encode_jpeg(px, q, "444")) for q in (25, 50, 75, 100)]
    assert sizes == sorted(sizes)


def test_decoder_reads_tables_from_file_not_constants():
    # Rewrite the luma DQT in-place with a doubled table; the decoder
    # must honor the file's table (pixels shift), proving DHT/DQT are
    # parsed rather than assumed.
    px = np.full((8, 8), 200, dtype=np.uint8)
    data = bytearray(encode_jpeg(px, 100))
    at = bytes(data).find(b"\xff\xdb")
    ln = struct.unpack_from(">H", data, at + 2)[0]
    # body: [pq_tq, 64 table bytes]
    for i in range(at + 5, at + 2 + ln):
        data[i] = min(255, data[i] * 3)
    out = decode_jpeg(bytes(data))
    # DC was 8*(200-128)=576 quantized by 1; decoding with q=3 gives
    # 576*3/8 + 128 = 344 -> clipped to 255
    assert (out == 255).all()


def test_wired_into_decode_one():
    from name_matcher_spark.operators.multimodal import _decode_one

    g = _tile_gray(23, 9, 14)
    w, h, f1, f2, f3 = _decode_one("image/jpeg", encode_jpeg(g, 100))
    assert (w, h) == (14, 9)
    assert f1 == f2 == f3 == pytest.approx(g.mean(), abs=0)


# --- property tests -------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    mid=st.integers(0, 1 << 40),
    variant=st.sampled_from(["gray", "444", "422", "420", "420rst", "422rst"]),
)
def test_prop_tile_constant_q100_exact(h, w, mid, variant):
    """The oracle exactness contract holds for ARBITRARY dims (any
    padding geometry) and tile values (any DC-diff category)."""
    g = _tile_gray(mid, h, w)
    if variant == "gray":
        data, want = encode_jpeg(g, 100), g[:, :, None]
    else:
        rgb = np.stack([g, g, g], axis=-1)
        want = rgb
        kw = {}
        if variant[:3] in ("420", "422"):
            kw["subsample"] = variant[:3]
        if variant.endswith("rst"):
            kw["restart_interval"] = 2
        data = encode_jpeg(rgb, 100, **kw)
    out = decode_jpeg(data)
    assert out.shape == want.shape
    assert (out == want).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    quality=st.sampled_from([50, 75, 90, 100]),
    sub=st.sampled_from(["444", "420"]),
)
def test_prop_random_rgb_round_trip_bounded(h, w, seed, quality, sub):
    """Arbitrary content at any quality: decode never errors, shape is
    preserved, and the error stays inside the byte range (quantization
    can be large on noise, but must never wrap/overflow)."""
    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality, sub))
    assert out.shape == px.shape
    assert out.dtype == np.uint8
    if quality == 100 and sub == "444":
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_real_world_jpegs_from_spark_distribution():
    """Validate against files this codec's own encoder never produced:
    the Spark distribution ships real camera JPEGs (mllib image test
    data). Every baseline file must decode with plausible photo stats;
    progressive ones must be rejected loudly, never mis-decoded.
    Skipped when no Spark distribution directory is present."""
    import glob
    import os

    roots = glob.glob("/opt/spark*/data/mllib/images/origin/kittens")
    if not roots:
        pytest.skip("no Spark distribution image data on this host")
    decoded = rejected = 0
    for path in sorted(glob.glob(os.path.join(roots[0], "*.jpg"))):
        blob = open(path, "rb").read()
        try:
            px = decode_jpeg(blob)
        except ValueError as e:
            assert "baseline" in str(e) or "unsupported" in str(e)
            rejected += 1
            continue
        decoded += 1
        h, w, ch = px.shape
        assert ch == 3 and h >= 8 and w >= 8
        # a real photo is neither black nor blown out, and has texture
        assert 10.0 < px.mean() < 245.0
        assert px.std() > 5.0
    assert decoded >= 3  # the distribution ships 4 kitten photos


def test_real_photo_reencode_consistency():
    """decode(real photo) -> encode(q95, 420) -> decode stays close:
    proves the encoder/decoder pair is consistent on natural content
    (adaptive-quantizer real files, subsampling, large MCU grids)."""
    import glob

    files = sorted(glob.glob("/opt/spark*/data/mllib/images/origin/kittens/*.jpg"))
    if not files:
        pytest.skip("no Spark distribution image data on this host")
    src = None
    for path in files:
        try:
            src = decode_jpeg(open(path, "rb").read())
            break
        except ValueError:
            continue
    assert src is not None
    rt = decode_jpeg(encode_jpeg(src, 95, "420"))
    err = np.abs(rt.astype(int) - src.astype(int))
    assert err.mean() < 4.0
    assert np.percentile(err, 99) <= 16


def test_rgb_component_ids_skip_color_transform():
    """Adobe-style files store component IDs 'R','G','B' and no YCbCr
    transform. Rewrite a solid-gray file's component IDs: the decoder
    must then return the raw planes as RGB — (v, 128, 128) for a file
    whose YCbCr planes were (v, 128, 128)."""
    v = 200
    px = np.full((8, 8, 3), v, dtype=np.uint8)
    data = bytearray(encode_jpeg(px, 100, "444"))
    sof = bytes(data).find(b"\xff\xc0")
    # SOF body starts at sof+4: prec(1) h(2) w(2) nc(1), then (cid,hv,tq)*3
    for i, cid in enumerate(b"RGB"):
        data[sof + 4 + 6 + 3 * i] = cid
    sos = bytes(data).find(b"\xff\xda")
    # SOS body starts at sos+4: ns(1), then (cid, tdta)*3
    for i, cid in enumerate(b"RGB"):
        data[sos + 4 + 1 + 2 * i] = cid
    out = decode_jpeg(bytes(data))
    assert (out[:, :, 0] == v).all()
    assert (out[:, :, 1] == 128).all() and (out[:, :, 2] == 128).all()


def test_decode_speed_linear_in_scan_size():
    """The bit reader must mask its accumulator: unmasked, decode is
    O(n^2) in entropy-stream bytes (a 123KB scan measured 12s). A
    256x256 noise image (~100KB+ scan) must decode in seconds."""
    import time

    px = np.random.RandomState(3).randint(0, 256, (256, 256, 3), dtype=np.uint8)
    data = encode_jpeg(px, 90, "444")
    assert len(data) > 60_000  # big enough to expose quadratic cost
    t0 = time.time()
    out = decode_jpeg(data)
    assert out.shape == px.shape
    assert time.time() - t0 < 30.0  # O(n^2) took minutes at this size


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes."""
    g = _tile_gray(4, 10, 12)
    data = encode_jpeg(g, 100)
    sof = data.find(b"\xff\xc0")
    padded = data[:sof] + b"\xff\xff\xff" + data[sof:]
    assert (decode_jpeg(padded) == g[:, :, None]).all()


def test_grayscale_nonunit_sampling_is_noninterleaved():
    """A single-component scan is non-interleaved (T.81 A.2): sampling
    factors in SOF must not change the block layout. Rewriting a gray
    file's SOF hv byte from 1x1 to 2x2 must decode identically."""
    g = _tile_gray(8, 24, 21)
    data = bytearray(encode_jpeg(g, 100))
    sof = bytes(data).find(b"\xff\xc0")
    hv_at = sof + 4 + 6 + 1  # body: prec(1) h(2) w(2) nc(1) cid(1) -> hv
    assert data[hv_at] == 0x11
    data[hv_at] = 0x22
    assert (decode_jpeg(bytes(data)) == g[:, :, None]).all()
