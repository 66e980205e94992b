"""Multimodal image operator plumbing: stats, resize, frame sampling."""

import numpy as np
import pandas as pd
import pytest

from segment_rtree_spark.imageio import decode_image
from segment_rtree_spark.operators.images import (
    resize_images,
    sample_video_frames,
    with_pixel_stats,
)
from segment_rtree_spark.synth import images_df, synth_image


def test_pixel_stats_and_phash_verify(spark):
    imgs = images_df(spark, 60)
    out = with_pixel_stats(imgs).toPandas()
    assert len(out) == 60
    assert out["phash_ok"].all()  # stored phash == recomputed from pixels
    assert out["mean_r"].between(100, 155).all()  # uniform random pixels
    assert (out["luma_std"] > 0).all()


def test_resize_roundtrip(spark):
    imgs = images_df(spark, 12)
    out = resize_images(imgs, 8, 8).toPandas()
    assert (out["w"] == 8).all() and (out["h"] == 8).all()
    # resized pixels equal a local nearest-neighbor resample
    row = out[out["image_id"] == "img000000000000"].iloc[0]
    got = decode_image(bytes(row["bytes"]), "raw", 8, 8)
    w, h, fmt, px, ph, buf = synth_image(0)
    yi = (np.arange(8) * h // 8).astype(int)
    xi = (np.arange(8) * w // 8).astype(int)
    assert np.array_equal(got, px[yi[:, None], xi[None, :]])


def test_video_frame_sampling_fake_codec(spark):
    w = h = 4
    frame = lambda v: bytes([v]) * (w * h * 3)
    pdf = pd.DataFrame(
        {
            "video_id": ["v0"],
            "bytes": [b"".join(frame(i) for i in range(10))],
            "w": np.int32(w),
            "h": np.int32(h),
            "fmt": "fakevid",
        }
    )
    vids = spark.createDataFrame(pdf)
    out = sample_video_frames(vids, every_n=3).toPandas()
    assert out["frame_idx"].tolist() == [0, 3, 6, 9]
    assert bytes(out["bytes"].iloc[1])[0] == 3


def test_video_unknown_codec_raises(spark):
    pdf = pd.DataFrame(
        {"video_id": ["v0"], "bytes": [b"xx"], "w": np.int32(2), "h": np.int32(2), "fmt": "mp4"}
    )
    vids = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        sample_video_frames(vids).collect()
