"""CCITT Group 3/4 (T.4/T.6) codec: round trips, framing variants,
and the errors-as-data taxonomy.

The exhaustive code-table conformance tests (every run length
0..2600, both colors, all three compressions, against javax.imageio's
CCITT encoder) live in test_codec_interop.py; this file covers the
pure-python surface: the G4 encoder/decoder pair, T.4 1D framing +
fill bits (which javax's 2D-only writer never emits), Modified
Huffman byte alignment, FillOrder 2, photometric inversion,
multi-strip restarts, and the corrupt-stream taxonomy."""

import struct

import numpy as np
import pytest

from segment_rtree_spark.ccitt import (
    _BLACK_ENC,
    _WHITE_ENC,
    decode_ccitt_strip,
    encode_ccitt_g4,
    encode_tiff_g4,
)
from segment_rtree_spark.imageio import decode_image


def _runs_bits(runs, first_black=False):
    """1D-code a row given [run, run, ...] starting white."""
    out = []
    black = first_black
    for r in runs:
        enc = _BLACK_ENC if black else _WHITE_ENC
        while r >= 64:
            mk = min(2560, r & ~63 if r < 2624 else 2560)
            out.append(enc[mk])
            r -= mk
        out.append(enc[r])
        black = not black
    return "".join(out)


def _pack(bits):
    bits += "0" * (-len(bits) % 8)
    return int(bits, 2).to_bytes(len(bits) // 8, "big") if bits else b""


def _mask_runs(mask_row):
    """row -> 1D run lengths starting white."""
    runs, cur, n = [], False, 0
    for v in mask_row:
        if bool(v) == cur:
            n += 1
        else:
            runs.append(n)
            cur = bool(v)
            n = 1
    runs.append(n)
    return runs


def _tiff(strips, w, h, comp, rps=None, photometric=0, extra=()):
    """Minimal little-endian TIFF with the given pre-coded strips."""
    rps = h if rps is None else rps
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1),
        (259, 3, 1, comp), (262, 3, 1, photometric),
        (277, 3, 1, 1), (278, 3, 1, rps),
    ] + list(extra)
    n = len(tags) + 2  # + offsets + counts
    arr_off = 8 + 2 + 12 * n + 4
    if len(strips) == 1:
        arrays = b""
        offs = [arr_off]
        tags += [(273, 4, 1, arr_off), (279, 4, 1, len(strips[0]))]
    else:
        arrays = b""
        data_off = arr_off + 8 * len(strips)
        offs, off = [], data_off
        for s in strips:
            offs.append(off)
            off += len(s)
        arrays = b"".join(struct.pack("<I", o) for o in offs)
        arrays += b"".join(struct.pack("<I", len(s)) for s in strips)
        tags += [(273, 4, len(strips), arr_off),
                 (279, 4, len(strips), arr_off + 4 * len(strips))]
    tags.sort()
    ifd = struct.pack("<H", len(tags))
    for tag, typ, cnt, val in tags:
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    return b"II\x2a\x00" + struct.pack("<I", 8) + ifd + arrays + b"".join(strips)


def _expected(mask, photometric=0):
    gray = np.where(mask, 0, 255) if photometric == 0 else \
        np.where(mask, 255, 0)
    return np.repeat(gray.astype(np.uint8)[:, :, None], 3, axis=2)


def _rand_mask(rng, h, w, p):
    return rng.random((h, w)) < p


def test_g4_self_roundtrip_shapes_and_densities():
    rng = np.random.default_rng(11)
    shapes = [(1, 1), (1, 40), (40, 1), (7, 7), (33, 130), (64, 2700)]
    for h, w in shapes:
        for p in (0.0, 0.02, 0.4, 0.6, 0.98, 1.0):
            mask = _rand_mask(rng, h, w, p)
            back = decode_ccitt_strip(encode_ccitt_g4(mask), w, h, 4)
            assert np.array_equal(back, mask), (h, w, p)


def test_tiff_g4_full_file_roundtrip():
    rng = np.random.default_rng(5)
    mask = _rand_mask(rng, 21, 37, 0.3)
    px = _expected(mask)
    assert np.array_equal(decode_image(encode_tiff_g4(px), "tiff", 37, 21), px)


def test_tiff_g4_encoder_rejects_non_bilevel():
    px = np.full((4, 4, 3), 128, np.uint8)
    with pytest.raises(ValueError, match="bilevel"):
        encode_tiff_g4(px)


def test_t4_1d_rows_with_fill_bits():
    """T.4 Group 3 pure-1D framing (T4Options=0): EOL before every
    row, with fill zeros inserted before some EOLs — the framing
    javax's 2D-only writer never produces."""
    rng = np.random.default_rng(7)
    mask = _rand_mask(rng, 9, 53, 0.35)
    bits = ""
    for y in range(mask.shape[0]):
        bits += "0" * (y % 5)  # fill before EOL
        bits += "000000000001"  # EOL
        bits += _runs_bits(_mask_runs(mask[y]))
    buf = _tiff([_pack(bits)], 53, 9, 3, extra=[(292, 4, 1, 0)])
    assert np.array_equal(decode_image(buf, "tiff", 53, 9), _expected(mask))


def test_t4_2d_tag_bits_mixed_lines():
    """T.4 2D (T4Options bit 0): EOL + tag bit per line; a tag of 1
    forces a 1D line mid-stream and the decoder must resync the
    reference line."""
    rng = np.random.default_rng(3)
    mask = _rand_mask(rng, 12, 64, 0.45)
    # encode: all lines 1D but framed as T.4-2D (tag=1 every line)
    bits = ""
    for y in range(mask.shape[0]):
        bits += "000000000001" + "1" + _runs_bits(_mask_runs(mask[y]))
    buf = _tiff([_pack(bits)], 64, 12, 3, extra=[(292, 4, 1, 1)])
    assert np.array_equal(decode_image(buf, "tiff", 64, 12), _expected(mask))


def test_modified_huffman_rows_byte_aligned():
    """Compression 2: no EOLs, every row restarts on a byte boundary."""
    rng = np.random.default_rng(13)
    mask = _rand_mask(rng, 8, 45, 0.5)
    bits = b"".join(_pack(_runs_bits(_mask_runs(row))) for row in mask)
    buf = _tiff([bits], 45, 8, 2)
    assert np.array_equal(decode_image(buf, "tiff", 45, 8), _expected(mask))


def test_fillorder2_lsb_first_bytes():
    rng = np.random.default_rng(17)
    mask = _rand_mask(rng, 6, 30, 0.4)
    strip = encode_ccitt_g4(mask)
    rev = bytes(int(f"{b:08b}"[::-1], 2) for b in strip)
    buf = _tiff([rev], 30, 6, 4, extra=[(266, 3, 1, 2)])
    assert np.array_equal(decode_image(buf, "tiff", 30, 6), _expected(mask))


def test_photometric1_inverts_mapping():
    rng = np.random.default_rng(19)
    mask = _rand_mask(rng, 5, 24, 0.5)
    buf = _tiff([encode_ccitt_g4(mask)], 24, 5, 4, photometric=1)
    assert np.array_equal(
        decode_image(buf, "tiff", 24, 5), _expected(mask, photometric=1)
    )


def test_multistrip_g4_restarts_reference_line():
    """Each strip restarts from the imaginary white reference line;
    splitting an image into strips and coding each independently must
    reassemble exactly (the TIFF contract that also makes fax decode
    strip-parallel at scale)."""
    rng = np.random.default_rng(23)
    mask = _rand_mask(rng, 22, 61, 0.35)
    rps = 5
    strips = [
        encode_ccitt_g4(mask[y : y + rps]) for y in range(0, 22, rps)
    ]
    buf = _tiff(strips, 61, 22, 4, rps=rps)
    assert np.array_equal(decode_image(buf, "tiff", 61, 22), _expected(mask))


def test_wrong_strip_count_is_corrupt():
    rng = np.random.default_rng(29)
    mask = _rand_mask(rng, 10, 31, 0.4)
    buf = _tiff([encode_ccitt_g4(mask)], 31, 10, 4, rps=5)  # needs 2 strips
    with pytest.raises(ValueError, match="strip count"):
        decode_image(buf, "tiff", 31, 10)


def test_uncompressed_mode_flags_decline():
    rng = np.random.default_rng(31)
    mask = _rand_mask(rng, 4, 16, 0.5)
    strip = encode_ccitt_g4(mask)
    for comp, tag in ((3, 292), (4, 293)):
        buf = _tiff([strip], 16, 4, comp, extra=[(tag, 4, 1, 2)])
        with pytest.raises(NotImplementedError, match="uncompressed"):
            decode_image(buf, "tiff", 16, 4)


def test_non_bilevel_ccitt_declines():
    """CCITT with 8-bit samples is valid-but-out-of-scope, not
    corrupt."""
    rng = np.random.default_rng(37)
    mask = _rand_mask(rng, 4, 16, 0.5)
    buf = _tiff([encode_ccitt_g4(mask)], 16, 4, 4, extra=[])
    # patch BitsPerSample (258) value to 8 in place
    b = bytearray(buf)
    i = b.find(struct.pack("<HHII", 258, 3, 1, 1))
    assert i > 0
    b[i + 8] = 8
    with pytest.raises(NotImplementedError, match="bilevel"):
        decode_image(bytes(b), "tiff", 16, 4)


def test_truncated_and_garbage_streams_are_corrupt():
    rng = np.random.default_rng(41)
    mask = _rand_mask(rng, 9, 40, 0.4)
    strip = encode_ccitt_g4(mask)
    for bad in (strip[: len(strip) // 2], b"", b"\x00" * 64):
        buf = _tiff([bad], 40, 9, 4)
        with pytest.raises(ValueError):
            decode_image(buf, "tiff", 40, 9)
    # fax streams carry no checksum: garbage whose bits happen to form
    # valid mode codes (0xAA = V0/VL1 runs) decodes to SOME bilevel
    # image — the contract is well-typed output or ValueError, never
    # a crash (the fuzz suite sweeps this property at volume)
    buf = _tiff([b"\xaa" * 64], 40, 9, 4)
    try:
        out = decode_image(buf, "tiff", 40, 9)
        assert out.dtype == np.uint8 and out.shape == (9, 40, 3)
    except ValueError:
        pass


def test_dimension_mismatch_before_decode():
    from segment_rtree_spark.codec_errors import DimensionMismatchError

    rng = np.random.default_rng(43)
    mask = _rand_mask(rng, 6, 20, 0.4)
    buf = _tiff([encode_ccitt_g4(mask)], 20, 6, 4)
    with pytest.raises(DimensionMismatchError):
        decode_image(buf, "tiff", 21, 6)


def test_validate_images_classifies_g4(spark):
    """The operator surface: a G4 TIFF rides the normal tiff lane of
    validate_images and lands valid with the right phash."""
    from segment_rtree_spark.imageio import phash64
    from segment_rtree_spark.operators.images import validate_images

    rng = np.random.default_rng(47)
    mask = _rand_mask(rng, 16, 16, 0.5)
    px = _expected(mask)
    buf = encode_tiff_g4(px)
    df = spark.createDataFrame(
        [("g4", bytearray(buf), 16, 16, "tiff")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = validate_images(df).collect()
    assert len(rows) == 1 and rows[0]["ok"] and rows[0]["err_code"] is None
    # and the decode surface agrees with the direct kernel
    assert phash64(decode_image(buf, "tiff", 16, 16)) == phash64(px)


def test_1d_zero_run_flood_rejected():
    """Hostile MH stream alternating zero-length runs at one position
    (white-0 / black-0 forever): the 1D row budget must reject it
    instead of spinning or overflowing the transition accumulator."""
    z = (_WHITE_ENC[0] + _BLACK_ENC[0]) * 4000
    buf = _tiff([_pack(z)], 24, 4, 2)
    with pytest.raises(ValueError, match="advance"):
        decode_image(buf, "tiff", 24, 4)
