"""Streaming tile counts: availableNow drain equals batch aggregation."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from segment_rtree_spark.streaming.tile_stream import (
    run_to_completion,
    stream_images,
    streaming_tile_counts,
)
from segment_rtree_spark.tiles import cell_of_sql

SCHEMA = "image_id string, lat double, lng double, ts timestamp"


def test_stream_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(2)
    n = 5000
    pdf = pd.DataFrame(
        {
            "image_id": [f"i{k}" for k in range(n)],
            "lat": rng.uniform(-80, 80, n),
            "lng": rng.uniform(-170, 170, n),
            "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.integers(0, 3600, n), "s"),
        }
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).write.parquet(src)

    result = streaming_tile_counts(stream_images(spark, src, SCHEMA), res=5)
    run_to_completion(result, str(tmp_path / "ckpt"), table="t_counts")
    got = spark.sql("select cell, sum(n) as n from t_counts group by cell").toPandas()

    want = (
        spark.read.parquet(src)
        .withColumn("cell", F.expr(cell_of_sql("lat", "lng", 5)))
        .groupBy("cell")
        .count()
        .toPandas()
    )
    g = got.sort_values("cell").reset_index(drop=True)
    w = want.sort_values("cell").reset_index(drop=True)
    assert g["cell"].tolist() == w["cell"].tolist()
    assert g["n"].tolist() == w["count"].tolist()
