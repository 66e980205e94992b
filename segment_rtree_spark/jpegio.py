"""Pure-NumPy baseline JPEG codec (encoder + decoder, no external libs).

Closes the engine's last codec gap honestly: `fmt='jpeg'` payloads are
now real ITU T.81 baseline-sequential JFIF files, produced and consumed
by this module with stdlib + NumPy only.

Scope (stated, not hidden):
  * encode: 8-bit RGB, baseline sequential (SOF0), 4:4:4 (no chroma
    subsampling), Annex-K quantization tables scaled by `quality`
    (libjpeg's 5000/Q | 200-2Q rule), Annex-K Huffman tables. The DQT
    and DHT segments are embedded in the stream per the spec, so ANY
    compliant decoder reads our files regardless of table choice.
  * decode: baseline sequential, 8-bit, 1 or 3 components, GENERAL
    sampling factors (4:4:4, 4:2:0, 4:2:2, any dividing Hi,Vi <= 4 —
    nearest-neighbor chroma upsample), restart markers honored (DC
    predictors reset); progressive (SOF2), arithmetic coding and
    12-bit precision raise JpegError — a typed, catchable
    "corrupt/unsupported stream" for the errors-as-data validator.
    Interop is TESTED against the JVM's javax.imageio codec in both
    directions (our encoder -> Java decoder, Java 4:2:0 encoder ->
    our decoder).

The DCT is the orthonormal matrix form: one einsum over all blocks per
component (no per-pixel Python); only the entropy (Huffman) layer is a
per-symbol loop, which is per-COEFFICIENT work bounded by the payload
size — the right altitude for a mapInPandas batch body on thumbnail-
scale corpora. For production-scale photography, swap a native codec
behind the same decode_image() seam.

Lossy contract: round trip at quality>=90 holds PSNR>=40dB on smooth
content (asserted in tests), matching the graft's per-row invariant
for lossy formats.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "JpegError", "JPEG_SOI"]

JPEG_SOI = b"\xff\xd8"


class JpegError(ValueError):
    """Corrupt or unsupported JPEG stream (errors-as-data friendly)."""


# -- tables ------------------------------------------------------------

_QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.float64,
)
_QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    np.float64,
)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """Flat indices of the 8x8 zigzag scan (generated, not typed)."""
    idx = np.arange(64).reshape(8, 8)
    zz = []
    for s in range(15):
        pts = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        if s % 2 == 0:
            pts = pts[::-1]
        zz += [idx[y, x] for y, x in pts]
    return np.array(zz, np.int64)


_ZZ = _zigzag_order()
_UNZZ = np.argsort(_ZZ)

# orthonormal DCT-II matrix: FDCT X = D @ B @ D.T, IDCT B = D.T @ X @ D
_D = np.array(
    [
        [
            (np.sqrt(0.5) if k == 0 else 1.0)
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            / 2.0
            for n in range(8)
        ]
        for k in range(8)
    ],
    np.float64,
)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits, vals):
    """symbol -> (code, length) for a (BITS, HUFFVAL) table pair."""
    codes = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# -- bit IO ------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, length):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-segment reader: de-stuffs FF00, surfaces RST markers."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker = None  # set when a non-RST marker ends the scan

    def _fill(self):
        b = self.buf
        if self.pos >= len(b):
            raise JpegError("truncated entropy stream")
        v = b[self.pos]
        if v == 0xFF:
            if self.pos + 1 >= len(b):
                raise JpegError("truncated entropy stream at marker")
            m = b[self.pos + 1]
            if m == 0x00:
                self.pos += 2
            elif 0xD0 <= m <= 0xD7:  # RSTn consumed by read_restart()
                raise JpegError("restart marker inside coefficient read")
            else:
                self.marker = m
                raise JpegError("marker inside entropy stream")
            v = 0xFF
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | v
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self):
        """Consume an RSTn marker at a restart interval boundary."""
        self.acc = 0
        self.n = 0
        b = self.buf
        if self.pos + 1 < len(b) and b[self.pos] == 0xFF and 0xD0 <= b[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise JpegError("expected restart marker")


def _decode_tables(bits, vals):
    """(length, code) -> symbol decode map."""
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(bits: int, s: int) -> int:
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


# -- color -------------------------------------------------------------

def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """[H, W] (multiples of 8) -> [n_blocks, 8, 8] in raster block order."""
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, hh: int, ww: int) -> np.ndarray:
    return (
        blocks.reshape(hh // 8, ww // 8, 8, 8).transpose(0, 2, 1, 3).reshape(hh, ww)
    )


# -- encoder -----------------------------------------------------------

def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                restart_interval: int = 0,
                grayscale: bool = False,
                subsample: bool = False) -> bytes:
    """uint8[h,w,3] -> baseline JFIF bytes (quality-scaled Annex-K
    tables; see module docstring for the exact scope).

    restart_interval > 0 emits a DRI segment and an RSTn marker every
    that many MCUs (DC predictors reset, stream byte-aligned) — the
    resync structure long streams carry so one bit error cannot
    corrupt everything after it. grayscale=True writes a 1-component
    (luma-only) frame; the decoder returns it replicated to RGB.
    subsample=True writes 4:2:0 (Y at 2x2, chroma box-mean downsampled
    2x in each axis — the default trade every production encoder
    makes; ~35-40% smaller streams, chroma detail halved)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_jpeg expects uint8[h,w,3]")
    h, w, _ = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt = [_scaled_qt(_QT_LUMA, quality), _scaled_qt(_QT_CHROMA, quality)]
    if grayscale:
        samp = [(1, 1)]
    elif subsample:
        samp = [(2, 2), (1, 1), (1, 1)]  # 4:2:0
    else:
        samp = [(1, 1)] * 3
    n_comp = len(samp)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad to MCU multiples by edge replication
    ph, pw = -h % (8 * vmax), -w % (8 * hmax)
    padded = np.pad(px, ((0, ph), (0, pw), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded)

    dc_codes = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
                _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
                _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    # per component: (rows, cols, 64) zigzag block grid — FDCT +
    # quantize vectorized over all blocks, subsampled chroma planes
    # box-mean reduced first
    grids = []
    for c in range(n_comp):
        t = 0 if c == 0 else 1
        hi, vi = samp[c]
        plane = ycc[..., c]
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            hh0, ww0 = plane.shape
            plane = plane.reshape(hh0 // ry, ry, ww0 // rx, rx).mean(axis=(1, 3))
        blocks = _to_blocks(plane) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
        q = np.round(coef / qt[t]).astype(np.int64)
        rows, cols = plane.shape[0] // 8, plane.shape[1] // 8
        grids.append(q.reshape(-1, 64)[:, _ZZ].reshape(rows, cols, 64))

    bw = _BitWriter()
    preds = [0] * n_comp
    nmy = padded.shape[0] // (8 * vmax)
    nmx = padded.shape[1] // (8 * hmax)
    rst = 0

    def put_block(zz, t, c):
        diff = int(zz[0]) - preds[c]
        preds[c] = int(zz[0])
        s = _category(diff)
        code, ln = dc_codes[t][s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        nz = np.nonzero(zz[1:])[0]
        prev = 0
        for i in nz:
            run = int(i) - prev
            prev = int(i) + 1
            while run > 15:
                code, ln = ac_codes[t][0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            v = int(zz[1 + i])
            s = _category(v)
            code, ln = ac_codes[t][(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        if prev < 63:
            code, ln = ac_codes[t][0x00]  # EOB
            bw.write(code, ln)

    for mi in range(nmy * nmx):  # interleaved MCU order (T.81 A.2.3)
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()  # byte-align, then RSTn, then fresh predictors
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * n_comp
        my, mx = divmod(mi, nmx)
        for c in range(n_comp):
            hi, vi = samp[c]
            t = 0 if c == 0 else 1
            for v in range(vi):
                for u in range(hi):
                    put_block(grids[c][my * vi + v, mx * hi + u], t, c)
    bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(JPEG_SOI)
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for t in range(1 if grayscale else 2):
        out += seg(0xDB, bytes([t]) + bytes(qt[t].ravel()[_ZZ].astype(np.uint8)))
    sof_comps = b"".join(
        bytes([c + 1, (samp[c][0] << 4) | samp[c][1], 0 if c == 0 else 1])
        for c in range(n_comp)
    )
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, n_comp) + sof_comps)
    tables = [
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ]
    if not grayscale:
        tables += [
            (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for cls, tid, bits, vals in tables:
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    if grayscale:
        out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# -- decoder -----------------------------------------------------------

def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8[h,w,3] (see module docstring for
    the supported subset; unsupported/corrupt streams raise JpegError)."""
    if len(buf) < 4 or buf[:2] != JPEG_SOI:
        raise JpegError("missing JPEG SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    sof = None
    restart_interval = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            raise JpegError("no scan data")
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        body = buf[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                tbl = np.frombuffer(body[o + 1 : o + 65], np.uint8).astype(np.int64)
                if len(tbl) != 64:
                    raise JpegError("short DQT")
                qts[tq] = tbl[_UNZZ].reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                if len(bits) != 16:
                    raise JpegError("short DHT")
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                if len(vals) != n:
                    raise JpegError("short DHT")
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _decode_tables(bits, vals)
                o += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
            if len(body) < 6:
                raise JpegError("short SOF")
            prec, hh, ww, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise JpegError("only 8-bit precision supported")
            # declared segment length can be self-consistent yet too
            # small for nc components — validate before slicing so a
            # corrupt stream raises JpegError, not a bare ValueError
            if len(body) < 6 + 3 * nc:
                raise JpegError("short SOF component list")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise JpegError(f"invalid sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, tq))
            sof = (hh, ww, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError("progressive/extended JPEG unsupported (baseline only)")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegError("short DRI")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise JpegError("SOS before SOF")
            if len(body) < 1 or len(body) < 1 + 2 * body[0]:
                raise JpegError("short SOS header")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            return _decode_scan(
                buf, pos + 2 + length, sof, scan, qts, dc_tabs, ac_tabs,
                restart_interval,
            )
        pos += 2 + length
    raise JpegError("no SOS marker")


def _decode_scan(buf, pos, sof, scan, qts, dc_tabs, ac_tabs, restart_interval):
    """Interleaved baseline scan with GENERAL sampling factors: an MCU
    holds Hi x Vi blocks per component (raster order within the MCU);
    subsampled chroma planes upsample by pixel replication. 4:4:4
    (what our encoder emits), 4:2:0 / 4:2:2 (what libjpeg-family
    encoders emit by default) and any Hi,Vi <= 4 with Hmax % Hi == 0
    all decode through the same path."""
    hh, ww, comps = sof
    if len(scan) != len(comps):
        raise JpegError("scan/frame component mismatch")
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    for _, hi, vi, _ in comps:
        if hmax % hi or vmax % vi:
            raise JpegError(f"non-dividing sampling factors {hi}x{vi}")
    nmx = -(-ww // (8 * hmax))  # MCUs per row
    nmy = -(-hh // (8 * vmax))
    n_mcu = nmx * nmy
    br = _BitReader(buf, pos)
    # per scan component: block grid (rows = nmy*Vi, cols = nmx*Hi)
    geo = []
    coefs = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise JpegError("unknown scan component")
        hi, vi, tq = by_id[cs]
        geo.append((hi, vi, tq))
        coefs.append(np.zeros((nmy * vi, nmx * hi, 64), np.int64))
    preds = [0] * len(scan)
    try:
        for mi in range(n_mcu):
            if restart_interval and mi and mi % restart_interval == 0:
                br.align_restart()
                preds = [0] * len(scan)
            my, mx = divmod(mi, nmx)
            for ci, (cs, td, ta) in enumerate(scan):
                hi, vi, _ = geo[ci]
                dct = dc_tabs.get(td)
                act = ac_tabs.get(ta)
                if dct is None or act is None:
                    raise JpegError("missing Huffman table")
                for v in range(vi):
                    for u in range(hi):
                        s = _read_symbol(br, dct)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[ci] += diff
                        zz = coefs[ci][my * vi + v, mx * hi + u]
                        zz[0] = preds[ci]
                        k = 1
                        while k <= 63:
                            rs = _read_symbol(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC coefficient index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
    except IndexError as e:  # defensive: malformed stream indexing
        raise JpegError(f"malformed stream: {e}") from None

    planes = []
    for ci, (cs, td, ta) in enumerate(scan):
        hi, vi, tq = geo[ci]
        qt = qts.get(tq)
        if qt is None:
            raise JpegError("missing quant table")
        grid = coefs[ci]
        cph, cpw = grid.shape[0] * 8, grid.shape[1] * 8
        c = grid.reshape(-1, 64)[:, _UNZZ].reshape(-1, 8, 8) * qt[None, :, :]
        blocks = np.einsum("ji,njk,kl->nil", _D, c.astype(np.float64), _D) + 128.0
        plane = _from_blocks(blocks, cph, cpw)
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:  # nearest-neighbor chroma upsample
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:hh, :ww])
    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    if len(planes) != 3:
        raise JpegError(f"{len(planes)}-component JPEG unsupported")
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
