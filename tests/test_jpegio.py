"""Pure-NumPy baseline JPEG codec: round-trip quality, structural
errors-as-data, and the Spark validate/stats integration."""

import numpy as np
import pandas as pd
import pytest

from segment_rtree_spark.imageio import psnr
from segment_rtree_spark.jpegio import JPEG_SOI, JpegError, decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            yy * 255 // max(1, h - 1),
            xx * 255 // max(1, w - 1),
            (yy + xx) * 255 // max(1, h + w - 2),
        ],
        axis=-1,
    ).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (16, 24), (13, 9), (64, 64), (33, 47)])
def test_roundtrip_psnr_smooth(h, w):
    """The graft's lossy contract: PSNR >= 40dB at quality >= 90 on
    smooth content, every shape (including non-multiples of 8)."""
    px = _gradient(h, w)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    assert out.shape == (h, w, 3)
    assert psnr(px, out) >= 40.0


def test_quality_monotone():
    px = _gradient(32, 32)
    p50 = psnr(px, decode_jpeg(encode_jpeg(px, quality=50)))
    p95 = psnr(px, decode_jpeg(encode_jpeg(px, quality=95)))
    assert p95 > p50
    assert len(encode_jpeg(px, 95)) > len(encode_jpeg(px, 50))


def test_noise_roundtrip_decodes():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=95))
    assert out.shape == px.shape
    assert psnr(px, out) > 25.0  # noise is the worst case; must still decode


def test_structural_errors():
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"\x00\x01")
    with pytest.raises(JpegError, match="no (SOS|scan)"):
        decode_jpeg(JPEG_SOI + b"\xff\xd9")
    # truncated entropy stream
    buf = encode_jpeg(_gradient(16, 16), 90)
    with pytest.raises(JpegError):
        decode_jpeg(buf[: len(buf) // 2])
    # marker-swapped "progressive" carrying a baseline full-band scan
    # is structurally invalid (a progressive DC scan must have Se=0) —
    # CorruptStream, not a silent misdecode
    sof2 = bytearray(buf)
    i = sof2.find(b"\xff\xc0")
    sof2[i + 1] = 0xC2
    with pytest.raises(JpegError, match="progressive DC scan"):
        decode_jpeg(bytes(sof2))


def test_corrupt_headers_raise_jpeg_error_not_bare():
    """Length-consistent but under-sized segment bodies must raise
    JpegError (the CorruptStream taxonomy tier), never bare ValueError
    / struct.error / IndexError from a slice or unpack (r4 advisor)."""
    import struct as _s

    def seg(marker, body):
        return marker + _s.pack(">H", len(body) + 2) + body

    # SOF declares nc=3 but carries one component triple
    sof_short = seg(b"\xff\xc0", _s.pack(">BHHB", 8, 16, 16, 3) + bytes([1, 0x11, 0]))
    with pytest.raises(JpegError, match="short SOF"):
        decode_jpeg(JPEG_SOI + sof_short + b"\xff\xd9")
    # SOF body shorter than its fixed 6-byte prefix
    with pytest.raises(JpegError, match="short SOF"):
        decode_jpeg(JPEG_SOI + seg(b"\xff\xc0", b"\x08\x00") + b"\xff\xd9")
    sof_ok = seg(b"\xff\xc0", _s.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0]))
    # SOS declares ns=3 with a 1-byte tail
    with pytest.raises(JpegError, match="short SOS"):
        decode_jpeg(JPEG_SOI + sof_ok + seg(b"\xff\xda", bytes([3, 1])))
    # DRI with an empty body
    with pytest.raises(JpegError, match="short DRI"):
        decode_jpeg(JPEG_SOI + seg(b"\xff\xdd", b"") + b"\xff\xd9")
    # DHT with a truncated bits table
    with pytest.raises(JpegError, match="short DHT"):
        decode_jpeg(JPEG_SOI + seg(b"\xff\xc4", bytes([0x00, 1, 2])) + b"\xff\xd9")


def test_spec_structure():
    """The stream is a structurally valid JFIF file: tables embedded,
    segment lengths consistent, EOI terminated — any compliant external
    decoder can read it (tables travel with the file)."""
    buf = encode_jpeg(_gradient(16, 16), 90)
    assert buf[:2] == JPEG_SOI and buf[-2:] == b"\xff\xd9"
    import struct

    pos, seen = 2, []
    while pos < len(buf) - 2:
        assert buf[pos] == 0xFF
        marker = buf[pos + 1]
        seen.append(marker)
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        pos += 2 + length
        if marker == 0xDA:
            break
    assert 0xDB in seen and 0xC4 in seen and 0xC0 in seen and 0xDA in seen
    assert seen.count(0xC4) == 4  # DC/AC x luma/chroma


def test_validate_images_jpeg_taxonomy(spark):
    """fmt='jpeg' is a real decode path now: valid file -> ok, missing
    SOI -> BadSignature (Catalyst tier), corrupt stream -> CorruptStream
    (kernel tier), metadata mismatch -> DimensionMismatch."""
    from segment_rtree_spark.operators.images import validate_images

    px = _gradient(16, 16)
    good = encode_jpeg(px, 90)
    rows = [
        ("ok", bytearray(good), "jpeg", 16, 16, 0),
        ("nosig", bytearray(b"\x00" + good[1:]), "jpeg", 16, 16, 0),
        ("trunc", bytearray(good[: len(good) // 2]), "jpeg", 16, 16, 0),
        ("dims", bytearray(good), "jpeg", 99, 16, 0),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int, phash long"
    )
    got = {
        r["image_id"]: (r["ok"], r["err_code"])
        for r in validate_images(df).collect()
    }
    assert got["ok"] == (True, None)
    assert got["nosig"] == (False, "BadSignature")
    assert got["trunc"] == (False, "CorruptStream")
    assert got["dims"] == (False, "DimensionMismatch")


def test_image_stats_over_jpeg_rows(spark):
    """The stats kernel decodes jpeg payloads through the same seam as
    raw/png (decode_image), with means within lossy tolerance."""
    from segment_rtree_spark.imageio import phash64
    from segment_rtree_spark.operators.images import with_pixel_stats

    rows = []
    means = {}
    for i in range(4):
        px = _gradient(16 + i, 24 - i)
        buf = encode_jpeg(px, 90)
        decoded = decode_jpeg(buf)  # phash of the DECODED pixels: the
        # stored hash an ingest pipeline would compute post-transcode
        rows.append(
            (f"j{i}", bytearray(buf), np.int32(24 - i), np.int32(16 + i),
             "jpeg", np.int64(phash64(decoded)))
        )
        means[f"j{i}"] = float(px.mean())
    pdf = pd.DataFrame(
        rows, columns=["image_id", "bytes", "w", "h", "fmt", "phash"]
    )
    df = spark.createDataFrame(pdf)
    out = with_pixel_stats(df).toPandas().set_index("image_id")
    for iid, true_mean in means.items():
        r = out.loc[iid]
        got_mean = (r["mean_r"] + r["mean_g"] + r["mean_b"]) / 3.0
        assert abs(got_mean - true_mean) < 3.0  # lossy tolerance
        assert bool(r["phash_ok"])  # decode is deterministic


def test_interop_with_jvm_codec(spark):
    """Spec compliance against an INDEPENDENT implementation: the
    JVM's javax.imageio. Our encoder's files decode in Java at
    >=40dB vs the original; Java's default writer (quality ~0.75,
    4:2:0 chroma subsampling) produces files OUR decoder reads at
    >=30dB — i.e. the general-sampling-factor path handles foreign
    streams, not just our own 4:4:4 output."""
    h, w = 16, 24
    px = _gradient(h, w)
    jvm = spark.sparkContext._jvm

    buf = encode_jpeg(px, quality=90)
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(buf))
    )
    assert img is not None, "javax.imageio could not parse our stream"
    assert (img.getWidth(), img.getHeight()) == (w, h)
    arr = np.array(list(img.getRGB(0, 0, w, h, None, 0, w)), np.int64).reshape(h, w)
    dec_java = np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=-1
    ).astype(np.uint8)
    assert psnr(px, dec_java) >= 40.0

    bi = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            bi.setRGB(
                x, y,
                int((int(px[y, x, 0]) << 16) | (int(px[y, x, 1]) << 8) | int(px[y, x, 2])),
            )
    bos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "jpeg", bos)
    out = decode_jpeg(bytes(bos.toByteArray()))
    assert out.shape == (h, w, 3)
    assert psnr(px, out) >= 30.0  # bounded by JAVA's lossy defaults


def test_mjpeg_frame_sampling(spark):
    """fmt='mjpeg' video rows: frame boundaries from SOI/EOI markers,
    sampled frames emitted as fmt='jpeg' rows that decode with the
    engine's codec at lossy fidelity."""
    from segment_rtree_spark.operators.images import sample_video_frames

    h, w, n_frames = 16, 16, 10
    frames_px = [
        np.clip(_gradient(h, w).astype(np.int64) + 5 * i, 0, 255).astype(np.uint8)
        for i in range(n_frames)
    ]
    blob = b"".join(encode_jpeg(px, 90) for px in frames_px)
    pdf = pd.DataFrame(
        {"video_id": ["v0"], "bytes": [blob], "w": np.int32(w),
         "h": np.int32(h), "fmt": "mjpeg"}
    )
    out = sample_video_frames(spark.createDataFrame(pdf), every_n=3).toPandas()
    assert out["frame_idx"].tolist() == [0, 3, 6, 9]
    assert (out["fmt"] == "jpeg").all()
    for _, r in out.iterrows():
        px = decode_jpeg(bytes(r["bytes"]))
        assert px.shape == (h, w, 3)
        assert psnr(frames_px[int(r["frame_idx"])], px) >= 40.0
    # corrupt container: missing EOI -> loud error, not silent truncation
    bad = pdf.copy()
    bad["bytes"] = [blob[:-2]]
    with pytest.raises(Exception, match="unterminated|EOI"):
        sample_video_frames(spark.createDataFrame(bad), every_n=3).collect()


def test_mjpeg_structural_split_ffd9_in_headers():
    """FF D9 can legally appear inside marker-segment payloads (a DQT
    table value at low quality, an EXIF thumbnail in APP1); the splitter
    must walk segments by their length fields, not find() the first
    FF D9.  Repro from the r4 advisor: our own encoder at quality=6
    emits FF D9 inside the DQT."""
    from segment_rtree_spark.operators.images import _split_mjpeg

    px = (np.arange(16 * 24 * 3, dtype=np.int64) * 7 % 256).astype(np.uint8)
    px = px.reshape(16, 24, 3)
    f_low = encode_jpeg(px, quality=6)
    assert f_low.find(b"\xff\xd9") < len(f_low) - 2, "repro precondition"
    f_hi = encode_jpeg(px, quality=90)
    frames = _split_mjpeg(f_low + f_hi + f_low)
    assert [len(f) for f in frames] == [len(f_low), len(f_hi), len(f_low)]
    for f in frames:
        assert decode_jpeg(f).shape == (16, 24, 3)

    # APP1 payload containing a literal FF D9 (EXIF-thumbnail shape)
    app1 = b"\xff\xe1" + (10).to_bytes(2, "big") + b"Ex\xff\xd9if\x00\x00"
    with_app = f_hi[:2] + app1 + f_hi[2:]
    frames = _split_mjpeg(with_app + f_hi)
    assert [len(f) for f in frames] == [len(with_app), len(f_hi)]
    assert decode_jpeg(frames[0]).shape == (16, 24, 3)

    # garbage between frames is a loud structural error
    with pytest.raises(ValueError, match="expected SOI"):
        _split_mjpeg(f_hi + b"\x00\x01" + f_hi)


def test_jpeg_fuzz_shapes_and_content():
    """Property fuzz: any uint8[h,w,3] with h,w >= 1 encodes and
    decodes back to the same shape with finite error — including
    sub-8x8 images (pure padding blocks) and extreme values."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
        flat=st.booleans(),
    )
    def check(h, w, seed, flat):
        rng = np.random.default_rng(seed)
        if flat:  # constant blocks: pure-DC streams
            px = np.full((h, w, 3), rng.integers(0, 256), np.uint8)
        else:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=92))
        assert out.shape == (h, w, 3)
        if flat:
            assert psnr(px, out) >= 40.0  # constants survive quantization

    check()


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_restart_interval_roundtrip(ri):
    """DRI/RSTn: the encoder byte-aligns and resets predictors every
    `ri` MCUs; the decoder's restart path reproduces the image."""
    px = _gradient(48, 40)
    out = decode_jpeg(encode_jpeg(px, 90, restart_interval=ri))
    assert psnr(px, out) >= 40.0


def test_grayscale_roundtrip():
    """1-component frames: luma-only stream, decoder replicates to
    RGB."""
    px = _gradient(48, 40)
    g = decode_jpeg(encode_jpeg(px, 90, grayscale=True))
    assert g.shape == (48, 40, 3)
    assert np.array_equal(g[..., 0], g[..., 1])
    luma = (0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2])
    ref = np.stack([luma] * 3, axis=-1).astype(np.uint8)
    assert psnr(ref, g) >= 40.0


def test_restart_interval_interop_java(spark):
    """RST-bearing streams read in javax.imageio too."""
    h, w = 24, 24
    px = _gradient(h, w)
    buf = encode_jpeg(px, 90, restart_interval=2)
    jvm = spark.sparkContext._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(buf))
    )
    assert img is not None
    arr = np.array(list(img.getRGB(0, 0, w, h, None, 0, w)), np.int64).reshape(h, w)
    dec = np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=-1
    ).astype(np.uint8)
    assert psnr(px, dec) >= 40.0


def test_subsample_420_roundtrip_and_size():
    """4:2:0 encode: smaller streams, decodes through our own
    general-sampling decoder, PSNR bounded by the halved chroma."""
    px = _gradient(64, 64)
    b444 = encode_jpeg(px, 90)
    b420 = encode_jpeg(px, 90, subsample=True)
    assert len(b420) < len(b444)
    out = decode_jpeg(b420)
    assert out.shape == px.shape
    assert psnr(px, out) >= 40.0  # smooth content survives 4:2:0
    # with restart markers interleaved at MCU granularity too
    out2 = decode_jpeg(encode_jpeg(px, 90, subsample=True, restart_interval=2))
    assert psnr(px, out2) >= 40.0


def test_subsample_420_interop_java(spark):
    """Our 4:2:0 streams (the production sampling every encoder
    defaults to) read in javax.imageio at >=40dB."""
    h, w = 32, 48
    px = _gradient(h, w)
    buf = encode_jpeg(px, 90, subsample=True)
    jvm = spark.sparkContext._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(buf))
    )
    assert img is not None
    arr = np.array(list(img.getRGB(0, 0, w, h, None, 0, w)), np.int64).reshape(h, w)
    dec = np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=-1
    ).astype(np.uint8)
    assert psnr(px, dec) >= 40.0


# -- progressive (T.81 Annex G) ----------------------------------------


def _java_jpeg(jvm, px, quality=None, progressive=False):
    """Encode via javax.imageio's JPEG writer (independent impl)."""
    h, w, _ = px.shape
    bi = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            bi.setRGB(
                x, y,
                int((int(px[y, x, 0]) << 16) | (int(px[y, x, 1]) << 8) | int(px[y, x, 2])),
            )
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    param = writer.getDefaultWriteParam()
    if progressive:
        param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    if quality is not None:
        param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(float(quality))
    bos = jvm.java.io.ByteArrayOutputStream()
    mc = jvm.javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(mc)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    mc.flush()
    writer.dispose()
    return bytes(bos.toByteArray())


def _java_decode(jvm, buf):
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(buf))
    )
    assert img is not None
    w, h = img.getWidth(), img.getHeight()
    arr = np.array(list(img.getRGB(0, 0, w, h, None, 0, w)), np.int64).reshape(h, w)
    return np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=-1
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "h,w,kw",
    [
        (16, 24, {}),
        (17, 23, {}),
        (8, 8, {}),
        (33, 41, {"subsample": True}),
        (24, 24, {"restart_interval": 2}),
        (25, 19, {"restart_interval": 3, "subsample": True}),
        (20, 20, {"grayscale": True}),
    ],
)
def test_progressive_layout_bit_exact(h, w, kw):
    """progressive=True re-layouts the SAME coefficients into an SOF2
    spectral-selection scan script — decode must be BIT-EXACT vs the
    baseline layout of the same encode (incl. odd sizes, 4:2:0 where
    the non-interleaved luma sub-grid is narrower than the MCU-padded
    grid, restart markers counting blocks not MCUs, grayscale)."""
    rng = np.random.default_rng(h * 100 + w)
    px = (0.7 * _gradient(h, w) + 0.3 * rng.integers(0, 256, (h, w, 3))).astype(
        np.uint8
    )
    base = decode_jpeg(encode_jpeg(px, 92, **kw))
    buf = encode_jpeg(px, 92, progressive=True, **kw)
    assert b"\xff\xc2" in buf  # SOF2 on the wire
    assert np.array_equal(decode_jpeg(buf), base)


def test_progressive_fuzz_roundtrip():
    """Random content and shapes: progressive decode == baseline decode
    on identical coefficients, PSNR contract preserved."""
    from segment_rtree_spark.imageio import psnr as _psnr

    rng = np.random.default_rng(99)
    for _ in range(8):
        h = int(rng.integers(8, 49))
        w = int(rng.integers(8, 49))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        sub = bool(rng.integers(0, 2))
        base = decode_jpeg(encode_jpeg(px, 95, subsample=sub))
        prog = decode_jpeg(encode_jpeg(px, 95, progressive=True, subsample=sub))
        assert np.array_equal(base, prog)
    smooth = _gradient(32, 40)
    assert _psnr(smooth, decode_jpeg(encode_jpeg(smooth, 90, progressive=True))) >= 40.0


def test_progressive_javax_interop(spark):
    """The REAL progressive shape: javax.imageio's progressive script
    uses successive approximation (DC/AC refinement scans), which our
    own encoder never emits. Gate 1 (exact): javax baseline and javax
    progressive of the same image carry identical coefficients, so our
    decodes of both must be bit-equal. Gate 2: agreement with javax's
    own decoder (residual = chroma upsample choice, same bound as the
    baseline 4:2:0 interop test)."""
    jvm = spark.sparkContext._jvm
    rng = np.random.default_rng(11)
    for (h, w), q in [((32, 48), 0.85), ((17, 23), 0.9), ((16, 16), 0.5)]:
        px = (0.8 * _gradient(h, w) + 0.2 * rng.integers(0, 256, (h, w, 3))).astype(
            np.uint8
        )
        b_base = _java_jpeg(jvm, px, q, progressive=False)
        b_prog = _java_jpeg(jvm, px, q, progressive=True)
        assert b"\xff\xc2" in b_prog and b"\xff\xc2" not in b_base
        ours_prog = decode_jpeg(b_prog)
        assert np.array_equal(decode_jpeg(b_base), ours_prog)
        assert psnr(ours_prog, _java_decode(jvm, b_prog)) >= 30.0


def test_progressive_truncation_raises():
    px = _gradient(24, 24)
    buf = encode_jpeg(px, 90, progressive=True)
    with pytest.raises(JpegError):  # mid-scan truncation
        decode_jpeg(buf[: len(buf) * 2 // 3])
    with pytest.raises(JpegError, match="missing EOI"):
        decode_jpeg(buf[:-2])


def test_unsupported_family_taxonomy():
    """VALID-but-out-of-scope T.81 family members raise
    NotImplementedError (-> CodecUnavailable downstream), while corrupt
    streams stay JpegError — the two-typed contract (errors.rs:5-47)."""
    buf = encode_jpeg(_gradient(16, 16), 90)
    i = buf.find(b"\xff\xc0")
    for marker, label in [
        (0xC9, "arithmetic"),
        (0xCA, "arithmetic"),
        (0xC3, "lossless"),
        (0xC7, "lossless"),
        (0xCE, "lossless"),  # hierarchical family
    ]:
        swapped = bytearray(buf)
        swapped[i + 1] = marker
        with pytest.raises(NotImplementedError, match=label):
            decode_jpeg(bytes(swapped))
    deep = bytearray(buf)
    deep[i + 4] = 12  # SOF precision byte -> 12-bit
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(deep))
    assert not issubclass(NotImplementedError, JpegError)  # distinct types


def test_validate_images_progressive_and_unsupported(spark):
    """Taxonomy through the Spark operator (the r5 verdict weak item):
    a progressive JPEG is a VALID payload and now decodes -> ok=True;
    an arithmetic-coded one routes to CodecUnavailable (transcode
    bucket), never CorruptStream (discard bucket)."""
    from segment_rtree_spark.imageio import phash64
    from segment_rtree_spark.operators.images import validate_images

    px = _gradient(20, 28)
    prog = encode_jpeg(px, 90, progressive=True)
    arith = bytearray(encode_jpeg(px, 90))
    arith[arith.find(b"\xff\xc0") + 1] = 0xC9
    rows = [
        ("prog", bytearray(prog), "jpeg", 28, 20, int(phash64(decode_jpeg(prog)))),
        ("arith", arith, "jpeg", 28, 20, 0),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int, phash long"
    )
    got = {
        r["image_id"]: (r["ok"], r["err_code"])
        for r in validate_images(df, check_phash=True).collect()
    }
    assert got["prog"] == (True, None)
    assert got["arith"] == (False, "CodecUnavailable")
