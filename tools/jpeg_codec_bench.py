"""Throughput record for the pure-NumPy JPEG codec: encode/decode
walls per image at thumbnail sizes. Writes BENCH/jpeg_codec.json.
The honest framing: the entropy layer is per-symbol Python, so this
codec is for thumbnail-scale corpora and correctness work; swap a
native codec behind decode_image() for photo-scale production."""

import json
import os
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from segment_rtree_spark.imageio import psnr  # noqa: E402
from segment_rtree_spark.jpegio import decode_jpeg, encode_jpeg  # noqa: E402


def bench(h, w, reps=20, progressive=False):
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack(
        [yy * 255 // max(1, h - 1), xx * 255 // max(1, w - 1),
         (yy + xx) * 255 // max(1, h + w - 2)], axis=-1
    ).astype(np.uint8)
    buf = encode_jpeg(px, 90, progressive=progressive)
    t0 = time.time()
    for _ in range(reps):
        buf = encode_jpeg(px, 90, progressive=progressive)
    enc_ms = (time.time() - t0) / reps * 1000
    out = decode_jpeg(buf)  # warm: one-time memoized Huffman-LUT build
    t0 = time.time()
    for _ in range(reps):
        out = decode_jpeg(buf)
    dec_ms = (time.time() - t0) / reps * 1000
    return {
        "size": f"{h}x{w}", "bytes": len(buf),
        "encode_ms": round(enc_ms, 2), "decode_ms": round(dec_ms, 2),
        "psnr_db": round(psnr(px, out), 1),
    }


if __name__ == "__main__":
    rec = {
        "what": "pure-NumPy baseline JPEG codec throughput (single core, smooth gradient content, quality 90)",
        "sizes": [bench(8, 8), bench(32, 32), bench(64, 64), bench(128, 128), bench(256, 256, reps=5)],
        "progressive_what": (
            "SOF2 spectral-selection layout of the same coefficients "
            "(per-symbol primitives instead of the baseline combined-LUT "
            "block kernel; successive-approximation streams are "
            "fixture-tested in pytest, not benched)"
        ),
        "progressive_sizes": [
            bench(64, 64, progressive=True),
            bench(128, 128, progressive=True),
            bench(256, 256, reps=5, progressive=True),
        ],
    }
    with open(os.path.join(REPO, "BENCH", "jpeg_codec.json"), "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec["sizes"]))
