"""Multimodal (image) column operators.

Images are opaque `binary` columns + typed metadata (w, h, fmt); all
pixel work happens in Arrow-batched mapInPandas kernels that decode
per IMAGE (never per pixel in Python — the inner loops are NumPy).

Real implementations for raw/png/bmp/gif/tiff (lossless, equality
checks exact), webp (lossless VP8L, webp.py — libwebp-conformance
tested), jpeg (pure-NumPy baseline+progressive codec, jpegio.py —
lossy, PSNR>=40dB at quality>=90) AND mjpeg video containers
(frame-sample by structural marker walk, frames decode as jpeg); the
remaining external codecs (inter-frame video like mp4/h264, lossy
VP8) raise NotImplementedError inside the same batch body: the
distributed plumbing (schema, batching, partitioning) is identical
and tested, only the codec call changes when the library exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..imageio import decode_image, encode_png, encode_raw, phash64

__all__ = [
    "with_pixel_stats",
    "with_pixel_stats_exact",
    "resize_images",
    "sample_video_frames",
    "psnr_refine_pairs",
    "validate_images",
]


def with_pixel_stats(images: DataFrame) -> DataFrame:
    """Decode and compute per-image stats: channel means, luma std,
    recomputed phash (verifies the stored one at ingest)."""
    schema = (
        "image_id string, mean_r double, mean_g double, mean_b double, "
        "luma_std double, phash_ok boolean"
    )

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            mr = np.empty(n)
            mg = np.empty(n)
            mb = np.empty(n)
            ls = np.empty(n)
            ok = np.empty(n, bool)
            for k in range(n):
                px = decode_image(
                    pdf["bytes"].iloc[k], pdf["fmt"].iloc[k],
                    int(pdf["w"].iloc[k]), int(pdf["h"].iloc[k]),
                )
                p = px.astype(np.float64)
                mr[k], mg[k], mb[k] = p[..., 0].mean(), p[..., 1].mean(), p[..., 2].mean()
                luma = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
                ls[k] = luma.std()
                ok[k] = phash64(px) == int(pdf["phash"].iloc[k])
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "mean_r": mr, "mean_g": mg, "mean_b": mb,
                    "luma_std": ls, "phash_ok": ok,
                }
            )

    cols = ["image_id", "bytes", "fmt", "w", "h", "phash"]
    return images.select(*cols).mapInPandas(kernel, schema)


def with_pixel_stats_exact(images: DataFrame) -> DataFrame:
    """Integer-exact per-image stats over the ARITHMETIC image table:
    channel means as exact-integer-sum / n (order-independent, so a
    SQL oracle reproduces them bit-for-bit), integer-luma power sums
    (S1, S2 — variance is derivable exactly downstream), and phash_ok
    verifying decode->hash against the stored column. This is the
    oracle-visible twin of with_pixel_stats: it validates the whole
    binary round trip (synth -> png/raw encode -> decode -> stats)
    against a pure-arithmetic recomputation."""
    from ..synth import phash_arith

    schema = (
        "image_id string, mean_r double, mean_g double, mean_b double, "
        "luma_s1 long, luma_s2 long, phash_ok boolean"
    )

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            mr = np.empty(n)
            mg = np.empty(n)
            mb = np.empty(n)
            s1 = np.empty(n, np.int64)
            s2 = np.empty(n, np.int64)
            ok = np.empty(n, bool)
            for k in range(n):
                px = decode_image(
                    pdf["bytes"].iloc[k], pdf["fmt"].iloc[k],
                    int(pdf["w"].iloc[k]), int(pdf["h"].iloc[k]),
                )
                p = px.astype(np.int64)
                npx = float(p.shape[0] * p.shape[1])
                mr[k] = float(p[..., 0].sum()) / npx
                mg[k] = float(p[..., 1].sum()) / npx
                mb[k] = float(p[..., 2].sum()) / npx
                lum = 299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]
                s1[k] = lum.sum()
                s2[k] = (lum * lum).sum()
                ok[k] = int(phash_arith(px[None, ...])[0]) == int(pdf["phash"].iloc[k])
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "mean_r": mr, "mean_g": mg, "mean_b": mb,
                    "luma_s1": s1, "luma_s2": s2, "phash_ok": ok,
                }
            )

    cols = ["image_id", "bytes", "fmt", "w", "h", "phash"]
    return images.select(*cols).mapInPandas(kernel, schema)


def _resize_nn(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample, pure NumPy index gather."""
    h, w, _ = px.shape
    yi = (np.arange(out_h) * h // out_h).astype(np.int64)
    xi = (np.arange(out_w) * w // out_w).astype(np.int64)
    return px[yi[:, None], xi[None, :]]


def resize_images(images: DataFrame, out_w: int, out_h: int, fmt: str = "raw") -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode. Output keeps the
    input schema shape (image_id, bytes, w, h, fmt). `fmt` selects the
    output codec: any of the engine's writers (raw, png, bmp, tiff,
    webp — lossless VP8L — and jpeg at quality 90; gif is
    deliberately absent — its 256-color palette would force a silent
    quantization on natural imagery)."""
    from ..imageio import encode_bmp, encode_tiff, encode_webp
    from ..jpegio import encode_jpeg as _enc_jpeg

    encoders = {
        "raw": encode_raw,
        "png": encode_png,
        "bmp": encode_bmp,
        "tiff": encode_tiff,
        "webp": encode_webp,
        "jpeg": lambda px: _enc_jpeg(px, 90),
    }
    if fmt not in encoders:
        raise ValueError(
            f"resize fmt must be one of {sorted(encoders)}, got {fmt!r}"
        )
    encode = encoders[fmt]
    schema = "image_id string, bytes binary, w int, h int, fmt string"

    def kernel(batches):
        for pdf in batches:
            out = []
            for k in range(len(pdf)):
                px = decode_image(
                    pdf["bytes"].iloc[k], pdf["fmt"].iloc[k],
                    int(pdf["w"].iloc[k]), int(pdf["h"].iloc[k]),
                )
                rp = _resize_nn(px, out_w, out_h)
                out.append(encode(rp))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "bytes": out,
                    "w": np.full(len(pdf), out_w, np.int32),
                    "h": np.full(len(pdf), out_h, np.int32),
                    "fmt": fmt,
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(kernel, schema)


def sample_video_frames(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling for video binary columns.

    REAL for two container formats; everything else stays an honest
    stub:
      * fmt='fakevid' — concatenated raw RGB frames (the deterministic
        test container; frame boundaries from w*h*3);
      * fmt='mjpeg' — concatenated baseline JFIF frames (Motion-JPEG,
        the classic capture container): frame boundaries come from a
        STRUCTURAL parse of the marker stream — marker segments are
        skipped by their declared length fields (FF D9 can legally
        occur inside a segment payload, e.g. a DQT table value or an
        APPn EXIF thumbnail, so a naive find(FFD9) mis-splits), and
        only the entropy-coded section after SOS is byte-scanned,
        where T.81 stuffing guarantees a bare FF D9 is the EOI.
        Sampled frames pass through as fmt='jpeg' rows the rest of
        the image suite decodes with jpegio.
      * fmt='gif' — animated GIF: every frame LZW-decodes and
        composites onto a persistent canvas (frames may be sub-rects
        with transparency, so frame N needs frames 0..N-1 — unlike
        MJPEG, skipping cannot skip decode), sampled snapshots emit as
        fmt='raw' rows.
      * fmt='webp' — animated webp (round 7): ANIM/ANMF containers
        with VP8L frames composite per the container spec (sub-rect
        placement, alpha-blend vs replace, dispose-to-background);
        lossy VP8 frames decline as CodecUnavailable.
    Compressed inter-frame codecs (mp4/h264/webm) need libraries this
    container lacks: NotImplementedError, same batch body.

    Scale note: sampling slices BYTES only — no frame is decoded here;
    decode happens downstream on the sampled subset (with_pixel_stats
    / validate_images over the emitted rows), so the kernel's cost is
    marker scanning, not IDCTs for frames that get skipped.
    """
    schema = "video_id string, frame_idx int, bytes binary, w int, h int, fmt string"

    def kernel(batches):
        for pdf in batches:
            rows = {k: [] for k in ("video_id", "frame_idx", "bytes", "w", "h", "fmt")}
            for k in range(len(pdf)):
                out_fmt, frames = _decode_frames(
                    pdf["bytes"].iloc[k], pdf["fmt"].iloc[k],
                    int(pdf["w"].iloc[k]), int(pdf["h"].iloc[k]),
                )
                for fi in range(0, len(frames), every_n):
                    rows["video_id"].append(pdf["video_id"].iloc[k])
                    rows["frame_idx"].append(fi)
                    rows["bytes"].append(frames[fi])
                    rows["w"].append(int(pdf["w"].iloc[k]))
                    rows["h"].append(int(pdf["h"].iloc[k]))
                    rows["fmt"].append(out_fmt)
            yield pd.DataFrame(rows)

    return videos.mapInPandas(kernel, schema)


def _mjpeg_frame_end(buf: bytes, pos: int) -> int:
    """Return the offset one past the EOI of the frame starting at
    `pos` via a structural marker-stream walk (T.81 B.1.1): header
    segments are skipped by their 16-bit length fields — never
    byte-scanned, because FF D9 may appear inside a payload (a DQT
    table value, an APPn EXIF thumbnail) — and only entropy-coded
    data (after an SOS) is scanned for a bare marker, where byte
    stuffing (FF 00) and restart markers are the only legal FF uses,
    so FF D9 there IS the frame terminator."""
    n = len(buf)
    if buf[pos : pos + 2] != b"\xff\xd8":
        raise ValueError(f"mjpeg: expected SOI at offset {pos}")
    p = pos + 2
    while True:
        if p + 2 > n:
            raise ValueError("mjpeg: unterminated frame (no EOI)")
        if buf[p] != 0xFF:
            raise ValueError(f"mjpeg: expected marker at offset {p}")
        m = buf[p + 1]
        if m == 0xFF:  # fill byte before marker (T.81 B.1.1.2)
            p += 1
            continue
        if m == 0xD9:  # EOI
            return p + 2
        if m == 0x01 or 0xD0 <= m <= 0xD8:  # standalone markers
            p += 2
            continue
        if p + 4 > n:
            raise ValueError("mjpeg: truncated marker segment")
        seglen = int.from_bytes(buf[p + 2 : p + 4], "big")
        if seglen < 2:
            raise ValueError(f"mjpeg: bad segment length at offset {p}")
        p += 2 + seglen
        if m != 0xDA:  # header segment: skip by length, done
            continue
        # SOS: entropy-coded data follows until the next real marker
        while True:
            q = buf.find(b"\xff", p)
            if q < 0 or q + 1 >= n:
                raise ValueError("mjpeg: unterminated frame (no EOI)")
            b2 = buf[q + 1]
            if b2 == 0x00 or 0xD0 <= b2 <= 0xD7:  # stuffed / RSTn
                p = q + 2
            elif b2 == 0xFF:  # fill byte
                p = q + 1
            elif b2 == 0xD9:  # EOI ends the frame
                return q + 2
            else:  # next scan / DNL etc. — back to the marker walk
                p = q
                break


def _split_mjpeg(buf: bytes):
    frames = []
    pos = 0
    n = len(buf)
    while pos < n:
        end = _mjpeg_frame_end(buf, pos)
        frames.append(buf[pos:end])
        pos = end
    return frames


def _decode_frames(buf: bytes, fmt: str, w: int, h: int):
    if fmt == "fakevid":
        frame_size = w * h * 3
        return "raw", [
            buf[i : i + frame_size] for i in range(0, len(buf), frame_size)
        ]
    if fmt == "mjpeg":
        return "jpeg", _split_mjpeg(buf)
    if fmt == "gif":
        # animated GIF: full-canvas snapshots composited per frame
        # (do-not-dispose semantics, see imageio._gif_canvas_frames);
        # emitted as raw so downstream decode is a reshape. Header
        # dims are peeked BEFORE the canvas allocation (same
        # pre-allocation guard as imageio._decode_gif: the 16-bit
        # fields could otherwise demand a ~12 GB canvas)
        import struct as _struct

        from ..codec_errors import DimensionMismatchError
        from ..imageio import _gif_canvas_frames

        if len(buf) < 10 or buf[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("missing GIF signature")
        gw, gh = _struct.unpack_from("<HH", buf, 6)
        if (gw, gh) != (w, h):
            raise DimensionMismatchError(
                f"gif {gw}x{gh} != metadata {w}x{h}"
            )
        _gw, _gh, frames = _gif_canvas_frames(buf)
        return "raw", [f.tobytes() for f in frames]
    if fmt == "webp":
        # animated webp (round 7): ANIM/ANMF VP8L frames composite
        # onto a persistent canvas exactly like the gif branch
        # (sub-rects + blending mean frame N needs frames 0..N-1);
        # webp_canvas_frames guards the canvas allocation against the
        # table metadata BEFORE sizing anything from the 24-bit VP8X
        # dim fields. Lossy VP8 frames decline as CodecUnavailable.
        from ..webp import webp_canvas_frames

        if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
            raise ValueError("missing WEBP signature")
        _ww, _wh, frames = webp_canvas_frames(buf, expect=(w, h))
        return "raw", [f.tobytes() for f in frames]
    raise NotImplementedError(
        f"video codec for fmt={fmt!r} not available in this environment"
    )


def psnr_refine_pairs(pairs: DataFrame, images: DataFrame,
                      id_col: str = "image_id",
                      psnr_db: float = 40.0) -> DataFrame:
    """Exact-pixel verification of candidate near-duplicate pairs.

    The second stage of the image dedup pipeline: cheap phash bands
    (`dedup.phash_neardup_pairs`) generate candidates, this decodes
    ONLY the candidate pairs and computes the integer sum of squared
    RGB differences over the real codec path (raw/png). The verdict
    `psnr_ok` (PSNR >= psnr_db) is decided by cross-multiplication —
    PSNR >= T  <=>  sse * 10^(T/10) <= 255^2 * n_vals — so for integer
    10^(T/10) no float log enters the result and it reproduces
    bit-for-bit cross-engine. This is the input_hint per-row invariant
    (decoded-pixel closeness at a dB threshold) as an operator.

    Plan shape: two shuffle equi-joins on the id (broadcastable when
    the candidate list is small), then one Arrow-batched kernel over
    the joined rows; only candidates are ever decoded, so cost scales
    with the band collision rate, not the corpus.
    """
    from pyspark.sql import functions as F

    # psnr_db a multiple of 10 -> 10^(T/10) is an exact integer and the
    # verdict is pure int64 arithmetic (safe while n_vals * 65025 *
    # mult < 2^63, i.e. any image under ~10^10 px at 40 dB); other
    # thresholds fall back to float with the documented rounding caveat
    if psnr_db % 10.0 == 0.0:
        mult = 10 ** (int(psnr_db) // 10)
    else:
        mult = 10.0 ** (psnr_db / 10.0)
    a = images.select(
        F.col(id_col).alias("id_a"), F.col("bytes").alias("bytes_a"),
        F.col("fmt").alias("fmt_a"), F.col("w").alias("w_a"), F.col("h").alias("h_a"),
    )
    b = images.select(
        F.col(id_col).alias("id_b"), F.col("bytes").alias("bytes_b"),
        F.col("fmt").alias("fmt_b"), F.col("w").alias("w_b"), F.col("h").alias("h_b"),
    )
    joined = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            sse = np.zeros(n, np.int64)
            nv = np.zeros(n, np.int32)
            for r in range(n):
                pa = decode_image(
                    pdf["bytes_a"].iloc[r], pdf["fmt_a"].iloc[r],
                    int(pdf["w_a"].iloc[r]), int(pdf["h_a"].iloc[r]),
                ).astype(np.int64)
                pb = decode_image(
                    pdf["bytes_b"].iloc[r], pdf["fmt_b"].iloc[r],
                    int(pdf["w_b"].iloc[r]), int(pdf["h_b"].iloc[r]),
                ).astype(np.int64)
                sse[r] = int(((pa - pb) ** 2).sum())
                nv[r] = pa.size
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].astype(str),
                    "id_b": pdf["id_b"].astype(str),
                    "sse": sse,
                    "n_vals": nv,
                    "psnr_ok": (
                        sse * mult <= 65025 * nv.astype(np.int64)
                        if isinstance(mult, int)
                        else sse * mult <= 65025.0 * nv
                    ),
                }
            )

    return joined.mapInPandas(
        kernel,
        "id_a string, id_b string, sse long, n_vals int, psnr_ok boolean",
    )


# Error codes for validate_images, in check order (first failing check
# wins — same error-precedence discipline as the geometry validator,
# reference src/errors.rs / kernels/validity.py)
IMG_ERR_CODEC_UNAVAILABLE = "CodecUnavailable"
IMG_ERR_UNKNOWN_FORMAT = "UnknownFormat"
IMG_ERR_TRUNCATED = "TruncatedPayload"
IMG_ERR_BAD_SIGNATURE = "BadSignature"
IMG_ERR_CORRUPT_STREAM = "CorruptStream"
IMG_ERR_DIMENSION_MISMATCH = "DimensionMismatch"
IMG_ERR_PHASH_MISMATCH = "PhashMismatch"
IMG_ERR_NULL_PAYLOAD = "NullPayload"
IMG_ERR_NULL_METADATA = "NullMetadata"
IMG_ERR_INTERNAL = "InternalError"


def validate_images(images: DataFrame, check_phash: bool = False) -> DataFrame:
    """Payload validity for the image table — errors as DATA, not
    exceptions, mirroring the geometry validator's contract
    (reference errors.rs: every failure is a typed result the query
    can filter/aggregate; one bad row must never kill a 10^12-row
    ingest job).

    Output: (image_id, ok, err_code, err_detail). Checks in order
    (first failure wins): NULL payload/metadata, known format, payload
    length / container signature, stream decode, decoded dimensions,
    and optionally the stored phash against a recompute
    (check_phash=True; uses the engine's standard phash64).

    Two-tier plan: every metadata-decidable check (NULLs, format
    whitelist, raw payload length, PNG signature) runs as pure
    Catalyst column expressions at scan speed; only rows that NEED a
    stream decode (structurally-valid PNGs, plus raw rows when
    check_phash re-hashes pixels) enter the Arrow kernel. On a
    mostly-clean raw corpus without phash checking, NO row pays the
    Python round trip.
    """
    import zlib
    from struct import error as struct_error

    from pyspark.sql import functions as F

    from ..codec_errors import DimensionMismatchError
    from ..imageio import _PNG_SIG as PNG_SIG, phash64

    schema = "image_id string, ok boolean, err_code string, err_detail string"

    def _pre(code: str, detail) -> "F.Column":
        return F.struct(F.lit(code).alias("c"), detail.alias("d"))

    want_len = (F.col("w").cast("long") * F.col("h").cast("long") * 3)
    pre = (
        F.when(F.col("bytes").isNull(), _pre(IMG_ERR_NULL_PAYLOAD, F.lit("bytes is NULL")))
        .when(
            F.col("fmt").isNull() | F.col("w").isNull() | F.col("h").isNull(),
            _pre(
                IMG_ERR_NULL_METADATA,
                F.format_string(
                    "fmt=%s w=%s h=%s",
                    F.coalesce(F.concat(F.lit("'"), F.col("fmt"), F.lit("'")), F.lit("None")),
                    F.coalesce(F.col("w").cast("string"), F.lit("None")),
                    F.coalesce(F.col("h").cast("string"), F.lit("None")),
                ),
            ),
        )
        .when(
            # non-positive dims before any length equation: w=-1,h=-1
            # with 3 payload bytes satisfies length==w*h*3, but the
            # decode contract (reshape to (h,w,3)) can never hold —
            # the Catalyst tier must agree with the kernel tier on
            # pathological metadata, not just clean rows
            (F.col("w") <= 0) | (F.col("h") <= 0),
            _pre(
                IMG_ERR_DIMENSION_MISMATCH,
                F.format_string(
                    "w=%d h=%d must be positive", F.col("w"), F.col("h")
                ),
            ),
        )
        .when(
            # inter-frame video codecs: VALID formats this engine has
            # no still-frame decoder for (webp graduated to a real
            # codec in round 6, as tiff did in r5 and jpeg in r4)
            F.col("fmt").isin("mp4", "h264", "webm"),
            _pre(IMG_ERR_CODEC_UNAVAILABLE, F.concat(F.lit("fmt="), F.col("fmt"))),
        )
        .when(
            ~F.col("fmt").isin("raw", "png", "jpeg", "bmp", "gif", "tiff", "webp"),
            _pre(IMG_ERR_UNKNOWN_FORMAT, F.concat(F.lit("fmt="), F.col("fmt"))),
        )
        .when(
            (F.col("fmt") == "raw") & (F.length("bytes") != want_len),
            _pre(
                IMG_ERR_TRUNCATED,
                F.format_string("%d bytes, want %d", F.length("bytes"), want_len),
            ),
        )
        .when(
            (F.col("fmt") == "png")
            & (F.expr("substring(bytes, 1, 8)") != F.lit(PNG_SIG)),
            _pre(IMG_ERR_BAD_SIGNATURE, F.lit("missing PNG signature")),
        )
        .when(
            (F.col("fmt") == "jpeg")
            & (F.expr("substring(bytes, 1, 2)") != F.lit(b"\xff\xd8")),
            _pre(IMG_ERR_BAD_SIGNATURE, F.lit("missing JPEG SOI")),
        )
        .when(
            (F.col("fmt") == "bmp")
            & (F.expr("substring(bytes, 1, 2)") != F.lit(b"BM")),
            _pre(IMG_ERR_BAD_SIGNATURE, F.lit("missing BMP signature")),
        )
        .when(
            (F.col("fmt") == "gif")
            & (F.expr("substring(bytes, 1, 4)") != F.lit(b"GIF8")),
            _pre(IMG_ERR_BAD_SIGNATURE, F.lit("missing GIF signature")),
        )
        .when(
            (F.col("fmt") == "tiff")
            & (F.expr("substring(bytes, 1, 4)") != F.lit(b"II\x2a\x00"))
            & (F.expr("substring(bytes, 1, 4)") != F.lit(b"MM\x00\x2a")),
            _pre(IMG_ERR_BAD_SIGNATURE, F.lit("missing TIFF signature")),
        )
        .when(
            (F.col("fmt") == "webp")
            & (
                (F.expr("substring(bytes, 1, 4)") != F.lit(b"RIFF"))
                | (F.expr("substring(bytes, 9, 4)") != F.lit(b"WEBP"))
            ),
            _pre(IMG_ERR_BAD_SIGNATURE, F.lit("missing WEBP signature")),
        )
    )

    def classify(buf, fmt, w, h, stored_phash):
        if w <= 0 or h <= 0:  # mirrors the Catalyst prefilter exactly
            return IMG_ERR_DIMENSION_MISMATCH, f"w={w} h={h} must be positive"
        if fmt in ("mp4", "h264", "webm"):
            return IMG_ERR_CODEC_UNAVAILABLE, f"fmt={fmt}"
        if fmt not in ("raw", "png", "jpeg", "bmp", "gif", "tiff", "webp"):
            return IMG_ERR_UNKNOWN_FORMAT, f"fmt={fmt}"
        if fmt == "jpeg":
            from ..jpegio import JPEG_SOI, JpegError, decode_jpeg

            if buf[:2] != JPEG_SOI:
                return IMG_ERR_BAD_SIGNATURE, "missing JPEG SOI"
            try:
                # expect pins SOF dims to the metadata BEFORE plane
                # allocation — corrupt 16-bit dim fields would
                # otherwise demand multi-GB buffers (executor OOM,
                # not an errors-as-data row)
                px = decode_jpeg(buf, expect=(w, h))
            except NotImplementedError as e:
                # a VALID T.81 family member this codec declines
                # (arithmetic, lossless/hierarchical, 12-bit) is a
                # codec gap, not corruption — same split as the
                # png/bmp/gif/tiff branch below; progressive (SOF2)
                # now DECODES and never lands here
                return IMG_ERR_CODEC_UNAVAILABLE, str(e)[:80]
            except DimensionMismatchError as e:
                # SOF dims disagree with metadata: a metadata defect
                # in a decodable file, checked pre-allocation (the
                # subclass must be caught before its ValueError base)
                return IMG_ERR_DIMENSION_MISMATCH, str(e)[:80]
            except (JpegError, ValueError, IndexError, struct_error) as e:
                # decode_jpeg raises JpegError for every corruption it
                # can name; belt-and-braces for slice/unpack shapes a
                # fuzzer finds first — still CorruptStream, never
                # InternalError (the taxonomy contract)
                return IMG_ERR_CORRUPT_STREAM, str(e)[:80]
        elif fmt == "raw":
            want = w * h * 3
            if len(buf) != want:
                return IMG_ERR_TRUNCATED, f"{len(buf)} bytes, want {want}"
            px = np.frombuffer(buf, np.uint8).reshape(h, w, 3)
        else:  # png / bmp / gif / tiff / webp
            sig_ok = {
                "png": buf[:8] == PNG_SIG,
                "bmp": buf[:2] == b"BM",
                "gif": buf[:4] == b"GIF8",
                "tiff": buf[:4] in (b"II\x2a\x00", b"MM\x00\x2a"),
                "webp": buf[:4] == b"RIFF" and buf[8:12] == b"WEBP",
            }[fmt]
            if not sig_ok:
                return IMG_ERR_BAD_SIGNATURE, f"missing {fmt.upper()} signature"
            try:
                px = decode_image(buf, fmt, w, h)
            except NotImplementedError as e:
                # a VALID file this engine's decoder doesn't cover
                # (lossy VP8 webp, planar/16-bit TIFF) is a codec gap, not
                # corruption — the taxonomy keeps the two apart so a
                # curation job can route them differently
                return IMG_ERR_CODEC_UNAVAILABLE, str(e)[:80]
            except DimensionMismatchError as e:
                # header dims disagree with metadata (pre-allocation
                # check in every decoder): metadata defect, not
                # stream corruption
                return IMG_ERR_DIMENSION_MISMATCH, str(e)[:80]
            except (zlib.error, ValueError, IndexError, struct_error) as e:
                return IMG_ERR_CORRUPT_STREAM, str(e)[:80]
        if px.shape != (h, w, 3):
            return IMG_ERR_DIMENSION_MISMATCH, f"{px.shape} != ({h}, {w}, 3)"
        if check_phash and stored_phash is not None:
            got = phash64(px)
            if int(got) != int(stored_phash):
                return IMG_ERR_PHASH_MISMATCH, f"stored {stored_phash}, decoded {got}"
        return None, None

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            ok = np.empty(n, bool)
            codes, details = [], []
            has_ph = "phash" in pdf.columns
            # column-wise extraction once per batch (per-row .iloc is
            # one pandas positional lookup per field per row)
            bufs = pdf["bytes"].to_numpy()
            fmts = pdf["fmt"].to_numpy()
            ws = pdf["w"].to_numpy()
            hs = pdf["h"].to_numpy()
            if has_ph:
                ph_null = pdf["_phash_null"].to_numpy()
                phs = pdf["phash"].to_numpy()
            for r in range(n):
                buf = bufs[r]
                fmt = fmts[r]
                wv, hv = ws[r], hs[r]
                # phash arrives as (coalesced long, null flag), never a
                # raw nullable long: Arrow->pandas widens a long column
                # WITH nulls to float64, silently rounding any stored
                # hash beyond 2^53 — a partially-phashed corpus would
                # flag spurious PhashMismatch on every large hash
                sp = None if not has_ph or ph_null[r] else int(phs[r])
                if buf is None:
                    code, detail = IMG_ERR_NULL_PAYLOAD, "bytes is NULL"
                elif fmt is None or pd.isna(wv) or pd.isna(hv):
                    code, detail = IMG_ERR_NULL_METADATA, (
                        f"fmt={fmt!r} w={wv!r} h={hv!r}"
                    )
                else:
                    try:
                        code, detail = classify(
                            bytes(buf), str(fmt), int(wv), int(hv), sp,
                        )
                    except Exception as e:  # contract: errors are DATA
                        code, detail = IMG_ERR_INTERNAL, str(e)[:80]
                ok[r] = code is None
                codes.append(code)
                details.append(detail)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].astype(str),
                    "ok": ok,
                    "err_code": pd.Series(codes, dtype="object"),
                    "err_detail": pd.Series(details, dtype="object"),
                }
            )

    cols = [F.col(c) for c in ("image_id", "bytes", "fmt", "w", "h")]
    if check_phash:
        # split nullable long -> (coalesced long, flag) BEFORE the
        # kernel boundary: see the Arrow float64-widening note there
        cols += [
            F.coalesce(F.col("phash"), F.lit(0)).alias("phash"),
            F.col("phash").isNull().alias("_phash_null"),
        ]
    src = images.select(*cols).withColumn("pre", pre)
    decided_err = src.filter(F.col("pre").isNotNull()).select(
        F.col("image_id").cast("string").alias("image_id"),
        F.lit(False).alias("ok"),
        F.col("pre.c").alias("err_code"),
        F.col("pre.d").alias("err_detail"),
    )
    if check_phash:
        # every structurally-valid row still decodes (phash recompute)
        needs_kernel = F.col("pre").isNull()
        decided_ok = None
    else:
        # raw rows with the right length are fully valid — reshape
        # cannot fail and nothing else is checked: pure Catalyst verdict.
        # compressed-format rows that passed the signature prefilter
        # still need a stream decode to rule on CorruptStream / dims.
        # This list must be exactly the non-raw formats the UnknownFormat
        # prefilter admits: a format admitted there but missing here is
        # silently DROPPED from the output (clean webp rows vanished
        # between rounds 6 and 7 exactly this way — caught by the
        # row-conservation test, now asserted for every format)
        needs_kernel = F.col("pre").isNull() & F.col("fmt").isin(
            "png", "jpeg", "bmp", "gif", "tiff", "webp"
        )
        decided_ok = src.filter(
            F.col("pre").isNull() & (F.col("fmt") == "raw")
        ).select(
            F.col("image_id").cast("string").alias("image_id"),
            F.lit(True).alias("ok"),
            F.lit(None).cast("string").alias("err_code"),
            F.lit(None).cast("string").alias("err_detail"),
        )
    out = decided_err.unionByName(
        src.filter(needs_kernel).drop("pre").mapInPandas(kernel, schema)
    )
    if decided_ok is not None:
        out = out.unionByName(decided_ok)
    return out
