"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

No codec library required: the entropy layer is plain Huffman coding
(Annex K tables on the encode side; the decoder builds its tables from
the file's own DHT segments), the transform layer is an 8x8 matrix
DCT in float64, and everything in between (zigzag, quantization, DC
prediction, run-length AC, byte stuffing, restart markers, 4:2:0/4:4:4
chroma subsampling, JFIF YCbCr color transform) is a few hundred lines
of numpy. This closes the last multimodal decode stub in
``operators/multimodal.py`` — only entropy-coded *audio/video*
(MP3/H.264) remains out of scope for this container.

Supported on decode: baseline sequential DCT (SOF0), 8-bit, 1 or 3
components, sampling factors 1-2 per axis, restart intervals,
multi-scan-free single SOS, byte-stuffed entropy data. Progressive
(SOF2), arithmetic coding, 12-bit, and hierarchical modes raise
ValueError — a crawl ingest pipeline normalizes those upstream, and a
loud error beats a wrong decode. Validated against real camera/tool
JPEGs it did not encode (the Spark distribution's mllib image test
data and every other JPEG on this host: all baseline files decode,
all progressive files reject loudly — tests/test_jpeg.py).

Exactness contract used by the ``mm_decode_media`` oracle: at
quality=100 every quantizer step is 1, so an image that is CONSTANT
WITHIN EACH 8x8 BLOCK (gray, so chroma is a flat 128) reconstructs
bit-exactly — DC = 8*(v-128) survives round(F/1)*1, every AC
coefficient quantizes to 0, and the inverse transform returns the
constant. That makes decoded pixel statistics a closed form DuckDB can
compute from the generative formula, while the bytes still traverse
the full marker walk, Huffman DC-difference coding, and (in the 4:2:0
variants) the interleaved-MCU + upsampling paths.

Reference parity note: the reference engine (Kirachon/Name_Matcher)
has no media handling at all; this module exists for the
training-data-pipeline surface required by the build brief.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K) --------------------------------------

# Zigzag scan order, generated rather than transcribed: diagonal s is
# walked with the row index descending when s is even, ascending when
# odd (T.81 Figure 5).
ZIGZAG = np.array(
    [
        (r, s - r)
        for s in range(15)
        for r in (range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0
                  else range(max(0, s - 7), min(s, 7) + 1))
    ],
    dtype=np.int64,
)
_ZZ_FLAT = ZIGZAG[:, 0] * 8 + ZIGZAG[:, 1]  # zigzag -> row-major index

_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K Huffman specs: (bits per code length 1..16, symbol values).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II basis: A[u, x] = c_u/2 * cos((2x+1)u*pi/16).
# FDCT of a block X is A @ X @ A.T; IDCT is the transpose sandwich.
_DCT_A = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling (public formula): q=100 ->
    all-ones table (the exactness contract above), q=50 -> Annex K."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the canonical code (T.81 C.2)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s (F.1.2.3)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC value (F.1.2.1)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H, W) float64 level-shifted plane -> (H//8 * W//8, 64) int32
    zigzagged quantized coefficients, block row-major."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    coeffs = np.einsum("ux,nxy,vy->nuv", _DCT_A, blocks, _DCT_A)
    q = np.round(coeffs / qt).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZZ_FLAT]


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    """Huffman-encode one zigzagged block; returns the new DC predictor."""
    dc = int(zz[0])
    s, bits = _magnitude(dc - pred)
    code, ln = dc_tab[s]
    bw.put(code, ln)
    if s:
        bw.put(bits, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.put(code, ln)
        bw.put(bits, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.put(code, ln)
    return dc


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF full-range color transform, float64 (h, w, 3) -> same."""
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dht_body(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc_th, *bits, *vals])


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 100,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Serialize (h, w, 3) uint8 RGB or (h, w)/(h, w, 1) uint8 gray as
    a baseline JFIF JPEG. ``subsample`` is '444', '422' or '420'
    (ignored for gray). ``restart_interval`` > 0 inserts RSTn every that
    many MCUs (exercises the decoder's restart path). quality=100
    yields all-ones quantizers — see the module exactness contract."""
    if pixels.ndim == 3 and pixels.shape[2] == 1:
        pixels = pixels[:, :, 0]
    gray = pixels.ndim == 2
    if subsample not in ("444", "422", "420"):
        raise ValueError(f"unsupported subsample {subsample!r}")
    h, w = pixels.shape[:2]
    if h <= 0 or w <= 0:
        raise ValueError("empty image")
    qt_l = _scaled_qt(_QT_LUMA, quality)
    qt_c = _scaled_qt(_QT_CHROMA, quality)
    if gray or subsample == "444":
        sampling = (1, 1)
    elif subsample == "422":
        sampling = (2, 1)
    else:
        sampling = (2, 2)
    hmax, vmax = sampling
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    pad_w = -w % mcu_w
    pad_h = -h % mcu_h
    mcus_x, mcus_y = (w + pad_w) // mcu_w, (h + pad_h) // mcu_h

    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(pixels.astype(np.float64))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    planes = [
        np.pad(p, ((0, pad_h), (0, pad_w)), mode="edge") for p in planes
    ]
    if not gray and sampling != (1, 1):
        # mean chroma downsample by the sampling factors; padded dims
        # are MCU multiples so the subsampled planes are 8-multiples.
        sh, sv = sampling[0], sampling[1]
        planes[1:] = [
            p.reshape(p.shape[0] // sv, sv, p.shape[1] // sh, sh).mean(axis=(1, 3))
            for p in planes[1:]
        ]

    zz = [
        _fdct_quant(p - 128.0, qt_l if i == 0 else qt_c)
        for i, p in enumerate(planes)
    ]
    # block-grid widths per component (for MCU-interleaved addressing)
    bw_comp = [p.shape[1] // 8 for p in planes]

    enc_dc = [_huff_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _huff_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    enc_ac = [_huff_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS),
              _huff_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    comps = [(1, hmax, vmax, 0)] if gray else [
        (1, hmax, vmax, 0), (2, 1, 1, 1), (3, 1, 1, 1)
    ]
    bwr = _BitWriter()
    preds = [0] * len(comps)
    body = bytearray()
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_i = my * mcus_x + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bwr.flush()
                body += bwr.out
                bwr = _BitWriter()
                body += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                preds = [0] * len(comps)
            for ci, (_, hi, vi, tq) in enumerate(comps):
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * bw_comp[ci] + (mx * hi + bx)
                        preds[ci] = _encode_block(
                            bwr, zz[ci][bi], preds[ci],
                            enc_dc[tq], enc_ac[tq],
                        )
    bwr.flush()
    body += bwr.out

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qt_l.reshape(-1)[_ZZ_FLAT].tolist()))
    if not gray:
        out += _seg(
            0xDB, bytes([1]) + bytes(qt_c.reshape(-1)[_ZZ_FLAT].tolist())
        )
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS))
    out += _seg(0xC4, _dht_body(0x10, _AC_LUMA_BITS, _AC_LUMA_VALS))
    if not gray:
        out += _seg(0xC4, _dht_body(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
        out += _seg(0xC4, _dht_body(0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _, _, tq in comps:
        sos += bytes([cid, (tq << 4) | tq])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------


class _HuffDecoder:
    """Canonical Huffman decode via the T.81 F.2.2.3 min/max-code walk."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """Entropy-segment bit reader: unstuffs FF00, stops at any other
    marker (exposing it via ``marker``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("entropy data exhausted mid-symbol")
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated after 0xFF")
            b2 = self.data[self.pos]
            self.pos += 1
            if b2 != 0x00:
                self.marker = b2
                raise ValueError("marker inside entropy segment")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        b = (self.acc >> self.nbits) & 1
        # Drop the consumed bit: without this mask the accumulator grows
        # by 8 bits per scan byte and every subsequent shift copies the
        # whole big-int — O(n^2) in entropy-stream size (a 123 KB scan
        # took 12 s; a real 2 MB photo would take ~an hour).
        self.acc &= (1 << self.nbits) - 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, tab: _HuffDecoder) -> int:
        code = self.bit()
        for length in range(1, 17):
            if tab.maxcode[length] >= code:
                return tab.vals[tab.valptr[length] + code - tab.mincode[length]]
            code = (code << 1) | self.bit()
        raise ValueError("invalid Huffman code")

    def align_to_marker(self) -> int:
        """Discard pad bits; the next bytes must be FF xx. Returns xx."""
        self.acc = 0
        self.nbits = 0
        if self.marker is not None:
            m, self.marker = self.marker, None
            return m
        while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            m = self.data[self.pos + 1]
            self.pos += 2
            if m == 0xFF:  # fill byte
                self.pos -= 1
                continue
            return m
        raise ValueError("expected marker in entropy data")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Parse a baseline JPEG into an (h, w, channels) uint8 array
    (channels = 1 for grayscale, 3 for RGB after the JFIF inverse
    color transform). Raises ValueError on malformed or unsupported
    input (progressive, arithmetic, 12-bit, >2 sampling factors)."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qts: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], _HuffDecoder] = {}
    sof = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2 fill byte before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone (no length)
            pos += 2
            continue
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (may hold several tables)
            bpos = 0
            while bpos < len(body):
                pq_tq = body[bpos]
                if pq_tq >> 4 != 0:
                    raise ValueError("16-bit quantizers unsupported")
                table = np.zeros(64, dtype=np.int64)
                table[_ZZ_FLAT] = list(body[bpos + 1 : bpos + 65])
                qts[pq_tq & 0xF] = table.reshape(8, 8)
                bpos += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 (both Huffman sequential)
            if len(body) < 6:
                raise ValueError("short SOF segment")
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            if len(body) < 6 + 3 * nc:
                raise ValueError("short SOF segment")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise ValueError(f"sampling {hi}x{vi} unsupported")
                comps.append((cid, hi, vi, tq))
            sof = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xC4:  # DHT (may hold several tables)
            bpos = 0
            while bpos < len(body):
                tc_th = body[bpos]
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                huffs[(tc_th >> 4, tc_th & 0xF)] = _HuffDecoder(bits, vals)
                bpos += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("short DRI segment")
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            pos = pos + 2 + seglen
            break
        # APPn / COM / others: skip
        pos = pos + 2 + seglen
    else:
        raise ValueError("no SOS marker")
    if sof is None:
        raise ValueError("SOS before SOF")
    fh, fw, comps = sof
    if fh <= 0 or fw <= 0 or fh > 1 << 16 or fw > 1 << 16:
        raise ValueError("bad dimensions")
    # Pixel-PRODUCT cap mirroring decode_png's zip-bomb guard: the SOF
    # fields are 16-bit, so the per-axis check above is vacuous against
    # a hostile 65535x65535 header, which would allocate ~17 GB of
    # int32 coefficient stores per component from a few hundred input
    # bytes — a MemoryError that escapes the (ValueError, ...) nets in
    # sample_video_frames/resize_images and kills the job despite
    # on_error='null'. Raise BEFORE any allocation; 16 Mpixel bounds
    # the padded stores to low hundreds of MB worst case.
    if fh * fw > 1 << 24:
        raise ValueError("image too large")
    if len(body) < 1:
        raise ValueError("short SOS segment")
    ns = body[0]
    if len(body) < 1 + 2 * ns + 3:
        raise ValueError("short SOS segment")
    scan = []
    for i in range(ns):
        cs, td_ta = body[1 + 2 * i : 3 + 2 * i]
        match = [c for c in comps if c[0] == cs]
        if not match:
            raise ValueError(f"scan references unknown component {cs}")
        scan.append((match[0], td_ta >> 4, td_ta & 0xF))
    if len(scan) != len(comps):
        raise ValueError("multi-scan JPEG unsupported")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(scan) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the
        # MCU is ONE data unit, raster order over the component's own
        # ceil(w/8) x ceil(h/8) grid, regardless of its SOF sampling
        # factors (which only matter relative to other components).
        cid, _, _, tq = scan[0][0]
        scan = [((cid, 1, 1, tq), scan[0][1], scan[0][2])]
        hmax = vmax = 1
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # per-component coefficient stores (block grid sized to the MCU grid)
    stores = []
    for (_, hi, vi, _), _, _ in scan:
        stores.append(
            np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
        )

    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    n_mcus = mcus_x * mcus_y
    for mcu_i in range(n_mcus):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            m = br.align_to_marker()
            if not 0xD0 <= m <= 0xD7:
                raise ValueError(f"expected RST marker, got {m:#x}")
            preds = [0] * len(scan)
        my, mx = divmod(mcu_i, mcus_x)
        for ci, ((_, hi, vi, _), td, ta) in enumerate(scan):
            dc_tab = huffs.get((0, td))
            ac_tab = huffs.get((1, ta))
            if dc_tab is None or ac_tab is None:
                raise ValueError("scan references missing Huffman table")
            for by in range(vi):
                for bx in range(hi):
                    zz = stores[ci][my * vi + by, mx * hi + bx]
                    s = br.decode(dc_tab)
                    if s > 11:
                        raise ValueError("bad DC category")
                    diff = _extend(br.bits(s), s) if s else 0
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k <= 63:
                        rs = br.decode(ac_tab)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflows block")
                        zz[k] = _extend(br.bits(s), s)
                        k += 1

    # dequantize + IDCT + reassemble each component plane
    planes = []
    for ci, ((_, hi, vi, tq), _, _) in enumerate(scan):
        if tq not in qts:
            raise ValueError(f"missing quantization table {tq}")
        gy, gx, _ = stores[ci].shape
        zz = stores[ci].reshape(-1, 64).astype(np.float64)
        blocks = np.zeros((zz.shape[0], 64), dtype=np.float64)
        blocks[:, _ZZ_FLAT] = zz
        blocks = blocks.reshape(-1, 8, 8) * qts[tq]
        spatial = np.einsum("xu,nuv,yv->nxy", _DCT_A.T, blocks, _DCT_A.T)
        plane = (
            spatial.reshape(gy, gx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gy * 8, gx * 8)
        ) + 128.0
        # upsample to full resolution by sample replication
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    # Channel mapping follows component ID, not scan position (virtually
    # every encoder scans Y,Cb,Cr, but the spec doesn't require it).
    cids = [c[0][0] for c in scan]
    order = sorted(range(3), key=lambda i: cids[i])
    p0, p1, p2 = (planes[order[i]] for i in range(3))
    if sorted(cids) == [0x42, 0x47, 0x52]:  # component IDs 'R','G','B':
        # Adobe-style RGB scan — stored without the YCbCr transform.
        rgb = [p for _, p in sorted(zip(cids, planes), key=lambda t: -t[0])]
        return np.clip(np.round(np.stack(rgb, axis=-1)), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(p0, p1, p2)
