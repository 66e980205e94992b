"""Codec round-trips, phash determinism, synthetic-table invariants."""

import numpy as np

from segment_rtree_spark.imageio import (
    decode_image,
    encode_png,
    encode_raw,
    hamming64,
    phash64,
    psnr,
)
from segment_rtree_spark.synth import synth_image, synth_partition


def test_raw_roundtrip():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (16, 32, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_raw(px), "raw", 32, 16), px)


def test_png_roundtrip_and_standard_decoder():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    buf = encode_png(px)
    assert np.array_equal(decode_image(buf, "png", 24, 24), px)
    # cross-check with zlib-level inspection: our own decoder suffices,
    # but the signature/IHDR must be spec-correct
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    assert buf[12:16] == b"IHDR"


def test_phash_deterministic_and_locality():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    h1, h2 = phash64(px), phash64(px.copy())
    assert h1 == h2
    # small perturbation -> small hamming distance
    px2 = px.copy()
    px2[0, 0, 0] ^= 1
    assert hamming64(h1, phash64(px2))[0] <= 4
    # int64-representable
    assert -(1 << 63) <= h1 < (1 << 63)


def test_psnr():
    a = np.zeros((8, 8, 3), np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 255
    assert 20 < psnr(a, b) < 40


def test_synth_deterministic():
    w, h, fmt, px, ph, buf = synth_image(7)
    w2, h2, fmt2, px2, ph2, buf2 = synth_image(7)
    assert (w, h, fmt, ph, buf) == (w2, h2, fmt2, ph2, buf2)
    assert np.array_equal(px, px2)
    # decoded pixels equal original (lossless invariant)
    assert np.array_equal(decode_image(buf, fmt, w, h), px)


def test_synth_partition_schema_and_slicing():
    full = synth_partition(0, 50)
    part = synth_partition(20, 30)
    assert list(full.columns) == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "lat", "lng",
    ]
    # slice-independence: rows 20..30 identical whether generated alone or not
    a = full.iloc[20:30].reset_index(drop=True)
    b = part.reset_index(drop=True)
    assert a.equals(b)
    assert (full["lat"].between(-90, 90)).all()
    assert (full["lng"].between(-180, 180)).all()
    assert full["image_id"].is_unique


def test_synth_skew_mode():
    df = synth_partition(0, 1000, skew_frac=0.2)
    hot = df["lat"].between(48.8, 48.9) & df["lng"].between(2.3, 2.4)
    assert 150 <= hot.sum() <= 250


def _filter_scanlines(px: np.ndarray, fts) -> bytes:
    """Forward-filter pixels per RFC 2083 (the encoder side our engine
    does not ship) to build test fixtures for every filter type."""
    import struct
    import zlib

    h, w, _ = px.shape
    px = px.astype(np.int64)
    flat = px.reshape(h, w * 3)
    lines = bytearray()
    for y in range(h):
        ft = fts[y % len(fts)]
        raw = flat[y]
        prior = flat[y - 1] if y > 0 else np.zeros(w * 3, np.int64)
        left = np.concatenate([np.zeros(3, np.int64), raw[:-3]])
        ul = np.concatenate([np.zeros(3, np.int64), prior[:-3]])
        if ft == 0:
            filt = raw
        elif ft == 1:
            filt = raw - left
        elif ft == 2:
            filt = raw - prior
        elif ft == 3:
            filt = raw - ((left + prior) >> 1)
        else:
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, ul))
            filt = raw - pred
        lines.append(ft)
        lines += (filt & 0xFF).astype(np.uint8).tobytes()

    def chunk(tag, body):
        c = struct.pack(">I", len(body)) + tag + body
        return c + struct.pack(">I", zlib.crc32(tag + body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
            + chunk(b"IEND", b""))


def test_png_defilter_all_types():
    """Filters 1-4 (and mixed per-row schedules) reconstruct exactly:
    hand-filtered scanlines of a gradient+noise image decode back to
    the original pixels."""
    rng = np.random.default_rng(3)
    h, w = 21, 17
    px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    for fts in ([1], [2], [3], [4], [0, 1, 2, 3, 4], [4, 3, 2, 1]):
        buf = _filter_scanlines(px, fts)
        got = decode_image(buf, "png", w, h)
        assert (got == px).all(), f"filter schedule {fts} mismatched"
    # invalid filter type -> loud ValueError (CorruptStream tier)
    import pytest

    bad = _filter_scanlines(px, [0])
    # rebuild with filter byte 7 on row 0
    import struct
    import zlib

    raw = np.concatenate(
        [np.full((h, 1), 0, np.uint8), px.reshape(h, w * 3)], axis=1
    )
    raw[0, 0] = 7
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, body):
        c = struct.pack(">I", len(body)) + tag + body
        return c + struct.pack(">I", zlib.crc32(tag + body))

    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="filter type 7"):
        decode_image(bad, "png", w, h)


def _png_chunks(ihdr_args, body):
    import struct
    import zlib

    def chunk(tag, b):
        return (struct.pack(">I", len(b)) + tag + b
                + struct.pack(">I", zlib.crc32(tag + b)))

    ihdr = struct.pack(">IIBBBBB", *ihdr_args)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + body
            + chunk(b"IEND", b"")), chunk


def test_png_color_types_and_depths():
    """External-world PNG coverage: gray (8/16/1-bit), palette (8/4),
    gray+alpha, RGBA — each decodes to the documented uint8[h,w,3]
    conversion (gray replicated, palette via PLTE, alpha stripped,
    16-bit high byte)."""
    import zlib

    rng = np.random.default_rng(5)
    h, w = 13, 9

    def idat(rows_u8):
        import struct
        import zlib as z

        def chunk(tag, b):
            return (struct.pack(">I", len(b)) + tag + b
                    + struct.pack(">I", z.crc32(tag + b)))

        return chunk(b"IDAT", z.compress(rows_u8.tobytes()))

    def with_filter0(payload):
        return np.concatenate(
            [np.zeros((h, 1), np.uint8), payload.reshape(h, -1)], axis=1
        )

    # gray 8-bit
    g = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    buf, _ = _png_chunks((w, h, 8, 0, 0, 0, 0), idat(with_filter0(g)))
    assert (decode_image(buf, "png", w, h)
            == np.repeat(g[:, :, None], 3, axis=2)).all()

    # gray 16-bit: high byte kept
    g16 = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    buf, _ = _png_chunks(
        (w, h, 16, 0, 0, 0, 0),
        idat(with_filter0(g16.astype(">u2").view(np.uint8).reshape(h, w * 2))),
    )
    assert (decode_image(buf, "png", w, h)[:, :, 0]
            == (g16 >> 8).astype(np.uint8)).all()

    # gray 1-bit: packed scanlines, scaled to 0/255
    b1 = rng.integers(0, 2, size=(h, w)).astype(np.uint8)
    buf, _ = _png_chunks(
        (w, h, 1, 0, 0, 0, 0), idat(with_filter0(np.packbits(b1, axis=1)))
    )
    assert (decode_image(buf, "png", w, h)[:, :, 0] == b1 * 255).all()

    # palette 8-bit
    import struct
    import zlib as z

    def chunk(tag, b):
        return (struct.pack(">I", len(b)) + tag + b
                + struct.pack(">I", z.crc32(tag + b)))

    plte = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, size=(h, w)).astype(np.uint8)
    buf, _ = _png_chunks(
        (w, h, 8, 3, 0, 0, 0),
        chunk(b"PLTE", plte.tobytes()) + idat(with_filter0(idx)),
    )
    assert (decode_image(buf, "png", w, h) == plte[idx]).all()

    # palette with an out-of-range index -> loud (CorruptStream tier)
    import pytest

    bad_idx = idx.copy()
    bad_idx[0, 0] = 200
    buf, _ = _png_chunks(
        (w, h, 8, 3, 0, 0, 0),
        chunk(b"PLTE", plte.tobytes()) + idat(with_filter0(bad_idx)),
    )
    with pytest.raises(ValueError, match="palette index"):
        decode_image(buf, "png", w, h)

    # RGBA: alpha stripped
    rgba = rng.integers(0, 256, size=(h, w, 4)).astype(np.uint8)
    buf, _ = _png_chunks((w, h, 8, 6, 0, 0, 0), idat(with_filter0(rgba)))
    assert (decode_image(buf, "png", w, h) == rgba[:, :, :3]).all()

    # gray+alpha: alpha stripped, gray replicated
    ga = rng.integers(0, 256, size=(h, w, 2)).astype(np.uint8)
    buf, _ = _png_chunks((w, h, 8, 4, 0, 0, 0), idat(with_filter0(ga)))
    assert (decode_image(buf, "png", w, h)
            == np.repeat(ga[:, :, :1], 3, axis=2)).all()


def test_png_adam7_interlace():
    """Adam7: seven independently-filtered sub-images scatter back to
    the full grid bit-exactly — including non-trivial per-pass filter
    schedules and dimensions that leave some passes empty."""
    import struct
    import zlib as z

    from segment_rtree_spark.imageio import _ADAM7

    def chunk(tag, b):
        return (struct.pack(">I", len(b)) + tag + b
                + struct.pack(">I", z.crc32(tag + b)))

    rng = np.random.default_rng(11)
    for h, w in ((13, 9), (4, 4), (1, 17)):
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        stream = bytearray()
        for pi, (x0, y0, dx, dy) in enumerate(_ADAM7):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub = px[y0::dy, x0::dx].reshape(ph, pw * 3).astype(np.int64)
            # alternate per-pass filters: pass 0 none, odd passes Sub,
            # even passes Up (forward-filtered here, defiltered by the
            # decoder)
            ft = 0 if pi == 0 else (1 if pi % 2 else 2)
            for y in range(ph):
                raw = sub[y]
                if ft == 1:
                    left = np.concatenate([np.zeros(3, np.int64), raw[:-3]])
                    out = raw - left
                elif ft == 2:
                    prior = sub[y - 1] if y > 0 else np.zeros(pw * 3, np.int64)
                    out = raw - prior
                else:
                    out = raw
                stream.append(ft)
                stream += (out & 0xFF).astype(np.uint8).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
        buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", z.compress(bytes(stream)))
               + chunk(b"IEND", b""))
        got = decode_image(buf, "png", w, h)
        assert (got == px).all(), f"adam7 mismatch at {h}x{w}"
