"""point_distance_join vs brute force; zonal_stats vs local PIP."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from segment_rtree_spark.operators.point_join import (
    point_distance_join,
    radius_res,
    zonal_stats,
)


@pytest.mark.parametrize("radius", [0.3, 1.7, 11.0])
def test_point_distance_join_matches_brute(spark, radius):
    rng = np.random.default_rng(5)
    na, nb = 800, 1200
    ax, ay = rng.uniform(-30, 30, na), rng.uniform(-20, 20, na)
    bx, by = rng.uniform(-30, 30, nb), rng.uniform(-20, 20, nb)
    a = spark.createDataFrame(pd.DataFrame({"a_id": np.arange(na), "lng": ax, "lat": ay}))
    b = spark.createDataFrame(pd.DataFrame({"b_id": np.arange(nb), "lng": bx, "lat": by}))
    got = point_distance_join(a, b, radius).toPandas()
    got_pairs = set(zip(got["a_id"], got["b_id"]))

    d2 = (ax[:, None] - bx[None, :]) ** 2 + (ay[:, None] - by[None, :]) ** 2
    ii, jj = np.nonzero(d2 <= radius * radius)
    want_pairs = set(zip(ii.tolist(), jj.tolist()))
    assert got_pairs == want_pairs
    assert len(got) == len(got_pairs)  # stencil produces no duplicate pairs

    # the chosen grid really is radius-safe
    res = radius_res(radius)
    assert 360.0 / (1 << res) >= radius and 180.0 / (1 << res) >= radius


def test_point_distance_join_is_pure_catalyst(spark):
    a = spark.range(10).select(F.col("id").alias("a_id"),
                               (F.col("id") * 1.0).alias("lng"),
                               (F.col("id") * 0.5).alias("lat"))
    b = a.select(F.col("a_id").alias("b_id"), "lng", "lat")
    df = point_distance_join(a, b, 2.0)
    jvm = spark._sc._jvm
    p = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Python" not in p and "Arrow" not in p  # no UDF in the plan
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_zonal_stats_matches_local(spark):
    from segment_rtree_spark.kernels.pip import BOUNDARY, RELATION_NAMES
    from segment_rtree_spark.plans.entry_queries import entry_layer

    rng = np.random.default_rng(6)
    n = 4000
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n),
            "lng": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-90, 90, n),
            "val": rng.integers(0, 1000, n),
        }
    )
    layer = entry_layer()
    out = zonal_stats(spark.createDataFrame(pdf), layer, values=["val"]).toPandas()
    qi, pids, rel = layer.pip(pdf["lng"].to_numpy(), pdf["lat"].to_numpy())
    want = pd.DataFrame({"polygon_id": pids, "rel": rel, "val": pdf["val"].to_numpy()[qi]})
    for pid, grp in want.groupby("polygon_id"):
        row = out[out.polygon_id == pid].iloc[0]
        assert row["n_points"] == len(grp)
        assert row["n_boundary"] == int((grp["rel"] == BOUNDARY).sum())
        assert row["sum_val"] == grp["val"].sum()
        assert row["min_val"] == grp["val"].min()
        assert row["max_val"] == grp["val"].max()
    assert set(out["polygon_id"]) == set(want["polygon_id"].unique())
