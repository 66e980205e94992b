"""External-encoder interop for the round-5/6 codec stack: every
format the engine WRITES must decode in an independent implementation
(the JVM's javax.imageio), and files that implementation writes —
including compressed-TIFF and paletted/RLE8-BMP variants — must
decode in ours. Mirrors the jpeg/png interop discipline of
test_jpegio.py::test_interop_with_jvm_codec."""

import numpy as np
import pytest

from segment_rtree_spark.imageio import (
    decode_image,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_tiff,
)


def _gradient(h, w):
    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    r = (y * 255 // max(1, h - 1)).astype(np.uint8)
    g = (x * 255 // max(1, w - 1)).astype(np.uint8)
    b = ((y + x) * 255 // max(1, h + w - 2)).astype(np.uint8)
    return np.stack(
        [np.broadcast_to(r, (h, w)), np.broadcast_to(g, (h, w)),
         np.broadcast_to(b, (h, w))], axis=-1
    ).copy()


def _to_buffered(jvm, px):
    h, w, _ = px.shape
    bi = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            bi.setRGB(
                x, y,
                int((int(px[y, x, 0]) << 16)
                    | (int(px[y, x, 1]) << 8) | int(px[y, x, 2])),
            )
    return bi


def _java_decode(jvm, buf):
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(buf))
    )
    assert img is not None, "javax.imageio could not parse the stream"
    w, h = img.getWidth(), img.getHeight()
    arr = np.array(list(img.getRGB(0, 0, w, h, None, 0, w)), np.int64).reshape(h, w)
    return np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=-1
    ).astype(np.uint8)


def _java_encode(jvm, bi, fmt, compression_type=None):
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(fmt)
    assert it.hasNext(), f"no javax writer for {fmt}"
    writer = it.next()
    param = writer.getDefaultWriteParam()
    if compression_type is not None:
        param.setCompressionMode(
            jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT
        )
        param.setCompressionType(compression_type)
    bos = jvm.java.io.ByteArrayOutputStream()
    mc = jvm.javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(mc)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    mc.flush()
    writer.dispose()
    return bytes(bos.toByteArray())


def test_our_writers_decode_in_java(spark):
    """Engine-written png/bmp/gif/tiff all parse in javax.imageio and
    reproduce the source pixels exactly (lossless formats)."""
    jvm = spark.sparkContext._jvm
    h, w = 13, 17
    px = _gradient(h, w)
    for fmt, enc in (("png", encode_png), ("bmp", encode_bmp),
                     ("tiff", encode_tiff)):
        got = _java_decode(jvm, enc(px))
        assert (got == px).all(), f"java mis-decoded our {fmt}"
    # gif needs a palette-sized image (our writer refuses quantization)
    pal = _gradient(4, 8).reshape(-1, 3)
    idx = (np.arange(h * w) % len(pal)).reshape(h, w)
    pp = pal[idx]
    assert (_java_decode(jvm, encode_gif(pp)) == pp).all()


def test_java_writers_decode_in_engine(spark):
    """javax-written bmp/gif/tiff decode in our codec stack to exactly
    what java itself reads back from the same bytes (palette-mapped
    formats compare against java's own reading, sidestepping its
    quantizer)."""
    jvm = spark.sparkContext._jvm
    h, w = 13, 17
    px = _gradient(h, w)
    bi = _to_buffered(jvm, px)
    for fmt in ("bmp", "tiff"):
        buf = _java_encode(jvm, bi, fmt)
        assert (decode_image(buf, fmt, w, h) == px).all(), fmt
    buf = _java_encode(jvm, bi, "gif")
    assert (decode_image(buf, "gif", w, h) == _java_decode(jvm, buf)).all()


def test_java_compressed_tiff_decodes_in_engine(spark):
    """The round-6 TIFF tails against a FOREIGN encoder: javax's
    LZW / Deflate / ZLib / PackBits TIFF outputs (whatever predictor
    it picks) decode bit-exactly in the engine."""
    jvm = spark.sparkContext._jvm
    h, w = 21, 15
    px = _gradient(h, w)
    bi = _to_buffered(jvm, px)
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    assert it.hasNext()
    types = list(it.next().getDefaultWriteParam().getCompressionTypes())
    tried = []
    for ct in ("LZW", "Deflate", "ZLib", "PackBits"):
        if ct not in types:
            continue
        buf = _java_encode(jvm, bi, "tiff", compression_type=ct)
        assert (decode_image(buf, "tiff", w, h) == px).all(), ct
        tried.append(ct)
    assert len(tried) >= 2, f"javax tiff writer offered only {types}"


def test_java_paletted_and_rle8_bmp_decode_in_engine(spark):
    """The round-6 BMP tails against a FOREIGN encoder: javax's
    8-bit-indexed BMP (BI_RGB) and its BI_RLE8 output decode to
    exactly what java reads back from the same bytes."""
    jvm = spark.sparkContext._jvm
    h, w = 13, 17
    px = _gradient(h, w)
    # TYPE_BYTE_INDEXED: java maps to its default 256-color palette --
    # the interop contract is our-decode == java-decode of SAME bytes
    bi = jvm.java.awt.image.BufferedImage(w, h, 13)  # TYPE_BYTE_INDEXED
    for y in range(h):
        for x in range(w):
            bi.setRGB(
                x, y,
                int((int(px[y, x, 0]) << 16)
                    | (int(px[y, x, 1]) << 8) | int(px[y, x, 2])),
            )
    plain = _java_encode(jvm, bi, "bmp")
    assert (decode_image(plain, "bmp", w, h) == _java_decode(jvm, plain)).all()

    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("bmp")
    types = list(it.next().getDefaultWriteParam().getCompressionTypes())
    if "BI_RLE8" in types:
        rle = _java_encode(jvm, bi, "bmp", compression_type="BI_RLE8")
        assert (decode_image(rle, "bmp", w, h)
                == _java_decode(jvm, rle)).all()
    else:
        pytest.skip(f"javax bmp writer offers {types}, no BI_RLE8")

def test_java_reads_our_rle4_and_16bit_bmp(spark):
    """The round-7 BMP tails against a FOREIGN decoder: hand-built
    BI_RLE4 and 16-bit (BI_RGB 5-5-5 / BI_BITFIELDS 5-6-5) fixtures
    decode to the same pixels in javax.imageio and in the engine."""
    from test_imageio_synth import _build_16bit_bmp, _build_rle4_bmp

    jvm = spark.sparkContext._jvm
    rng = np.random.default_rng(59)
    h, w = 11, 14
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, size=(h, w)).astype(np.uint8)
    idx[:, :5] = idx[0, 0]  # long runs engage the encoded-run path
    for td in (False, True):
        fx = _build_rle4_bmp(idx, pal, top_down=td)
        ours = decode_image(fx, "bmp", w, h)
        assert (ours == pal[idx]).all(), td
        assert (ours == _java_decode(jvm, fx)).all(), td

    px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    for masks, comp in ((None, 0), ((0xF800, 0x07E0, 0x001F), 3)):
        fx = _build_16bit_bmp(px, masks, comp)
        assert (decode_image(fx, "bmp", w, h)
                == _java_decode(jvm, fx)).all(), (masks, comp)


def _to_binary_buffered(jvm, mask):
    """bool black mask -> TYPE_BYTE_BINARY BufferedImage."""
    h, w = mask.shape
    bi = jvm.java.awt.image.BufferedImage(w, h, 12)  # TYPE_BYTE_BINARY
    for y in range(h):
        for x in range(w):
            bi.setRGB(x, y, 0 if mask[y, x] else 0xFFFFFF)
    return bi


def test_java_ccitt_decodes_in_engine_and_back(spark):
    """The round-7 CCITT fax tails against a FOREIGN codec, both
    directions: javax's 'CCITT RLE' (compression 2, Modified
    Huffman), 'CCITT T.4' (compression 3, which javax writes in 2D
    mode) and 'CCITT T.6' (compression 4) streams decode bit-exactly
    in the engine; and the engine's own G4 writer decodes bit-exactly
    in javax.imageio."""
    from segment_rtree_spark.ccitt import encode_tiff_g4

    jvm = spark.sparkContext._jvm
    rng = np.random.default_rng(61)
    h, w = 19, 43
    masks = {
        "noise": rng.random((h, w)) < 0.4,
        "allwhite": np.zeros((h, w), bool),
        "allblack": np.ones((h, w), bool),
        "stripes": np.tile(np.arange(w) % 7 < 3, (h, 1)),
    }
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    types = list(it.next().getDefaultWriteParam().getCompressionTypes())
    ccitt = [t for t in types if t.startswith("CCITT")]
    assert len(ccitt) == 3, f"javax tiff writer offered only {types}"
    for name, mask in masks.items():
        px = np.repeat(
            np.where(mask, 0, 255).astype(np.uint8)[:, :, None], 3, axis=2
        )
        bi = _to_binary_buffered(jvm, mask)
        for ct in ccitt:
            buf = _java_encode(jvm, bi, "tiff", compression_type=ct)
            assert (decode_image(buf, "tiff", w, h) == px).all(), (name, ct)
        ours = encode_tiff_g4(px)
        assert (_java_decode(jvm, ours) == px).all(), name


_GEN_CCITT_JAVA = r"""
import java.awt.image.BufferedImage;
import java.io.File;
import java.io.FileOutputStream;
import java.io.ByteArrayOutputStream;
import java.util.Iterator;
import javax.imageio.*;
import javax.imageio.stream.MemoryCacheImageOutputStream;

public class GenCcittRuns {
    static byte[] enc(BufferedImage bi, String type) throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("tiff");
        ImageWriter w = it.next();
        ImageWriteParam p = w.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionType(type);
        ByteArrayOutputStream bos = new ByteArrayOutputStream();
        MemoryCacheImageOutputStream mc = new MemoryCacheImageOutputStream(bos);
        w.setOutput(mc);
        w.write(null, new IIOImage(bi, null, null), p);
        mc.flush();
        w.dispose();
        return bos.toByteArray();
    }
    public static void main(String[] args) throws Exception {
        int w = 2700, h = 2601;
        String[][] types = {{"CCITT RLE","rle"},{"CCITT T.4","t4"},{"CCITT T.6","t6"}};
        for (String pat : new String[]{"white", "black"}) {
            BufferedImage bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    boolean blackpx = pat.equals("white")
                        ? x >= y                      // row y: y white then black
                        : (x >= 1 && x < 1 + y);      // row y: 1 white, y black
                    bi.setRGB(x, y, blackpx ? 0 : 0xFFFFFF);
                }
            for (String[] t : types)
                try (FileOutputStream f = new FileOutputStream(
                        new File(args[0], pat + "_" + t[1] + ".tiff"))) {
                    f.write(enc(bi, t[0]));
                }
        }
    }
}
"""


def test_java_ccitt_exhaustive_run_length_conformance(tmp_path):
    """Every T.4 run-length code word, conformance-checked against
    javax's CCITT encoder: a 2700x2601 image whose row y is [y white,
    then black] exercises white runs 0..2600 (every terminating,
    makeup and shared extended-makeup code), and its inverse
    exercises every black code — under all three compressions (MH
    byte-aligned rows, T.4 2D framing with strip restarts, T.6).
    One wrong table entry anywhere shifts a row and fails the exact
    compare. (The VP8L distance-map discipline, applied to fax.)"""
    import os
    import subprocess

    java_home = os.environ.get("JAVA_HOME")
    if not java_home or not os.path.exists(f"{java_home}/bin/javac"):
        pytest.skip("no JDK for the standalone fixture generator")
    src = tmp_path / "GenCcittRuns.java"
    src.write_text(_GEN_CCITT_JAVA)
    subprocess.run(
        [f"{java_home}/bin/javac", str(src)], check=True, cwd=tmp_path
    )
    subprocess.run(
        [f"{java_home}/bin/java", "GenCcittRuns", str(tmp_path)],
        check=True, cwd=tmp_path,
    )
    w, h = 2700, 2601
    x, y = np.arange(w)[None, :], np.arange(h)[:, None]
    for pat, mask in (("white", x >= y), ("black", (x >= 1) & (x < 1 + y))):
        px = np.repeat(
            np.where(mask, 0, 255).astype(np.uint8)[:, :, None], 3, axis=2
        )
        for typ in ("rle", "t4", "t6"):
            buf = (tmp_path / f"{pat}_{typ}.tiff").read_bytes()
            got = decode_image(buf, "tiff", w, h)
            assert np.array_equal(got, px), (pat, typ)
