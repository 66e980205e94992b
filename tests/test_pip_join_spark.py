"""End-to-end Spark PIP join: broadcast == partitioned == local kernel,
caption/pixel invariants through the shuffle, salting correctness."""

import numpy as np
import pandas as pd
import pytest

from segment_rtree_spark.imageio import decode_image
from segment_rtree_spark.kernels.pip import RELATION_NAMES
from segment_rtree_spark.layer import PolygonLayer
from segment_rtree_spark.operators.pip_join import pip_join_broadcast, pip_join_partitioned
from segment_rtree_spark.synth import images_df, synth_image

# a small world: 5 polygons incl. one with a hole and one touching pair
LAYER_ROWS = [
    # big box around the hot cell (Paris-ish)
    (1, 0, [2.0, 2.0, 3.0, 3.0, 2.0], [48.0, 49.5, 49.5, 48.0, 48.0]),
    # box with a hole
    (2, 0, [-10.0, -10.0, 10.0, 10.0, -10.0], [-10.0, 10.0, 10.0, -10.0, -10.0]),
    (2, 1, [-5.0, -5.0, 5.0, 5.0, -5.0], [-5.0, 5.0, 5.0, -5.0, -5.0]),
    # triangle in the southern hemisphere
    (3, 0, [100.0, 140.0, 120.0, 100.0], [-60.0, -60.0, -20.0, -60.0]),
    # thin sliver crossing the antimeridian-ish region
    (4, 0, [170.0, 179.0, 179.0, 170.0, 170.0], [0.0, 0.0, 30.0, 30.0, 0.0]),
    # tiny polygon inside polygon 2's hole (so exterior of 2)
    (5, 0, [-1.0, -1.0, 1.0, 1.0, -1.0], [-1.0, 1.0, 1.0, -1.0, -1.0]),
]


@pytest.fixture(scope="module")
def layer():
    return PolygonLayer.from_ring_rows(LAYER_ROWS)


@pytest.fixture(scope="module")
def points(spark):
    return images_df(spark, 3000, skew_frac=0.3).cache()


def _collect_pairs(df):
    rows = df.select("image_id", "polygon_id", "relation").collect()
    return sorted((r["image_id"], r["polygon_id"], r["relation"]) for r in rows)


def _local_oracle(points_pdf, layer):
    qi, pid, rel = layer.pip(
        points_pdf["lng"].to_numpy(np.float64), points_pdf["lat"].to_numpy(np.float64)
    )
    ids = points_pdf["image_id"].to_numpy()
    return sorted(zip(ids[qi], pid.tolist(), RELATION_NAMES[rel].tolist()))


def test_broadcast_matches_local(spark, layer, points):
    pdf = points.toPandas()
    got = _collect_pairs(
        pip_join_broadcast(points, layer, keep=["image_id"])
    )
    assert got == _local_oracle(pdf, layer)
    assert len(got) > 100  # skewed points land in polygon 1


def test_partitioned_matches_broadcast(spark, layer, points):
    b = _collect_pairs(pip_join_broadcast(points, layer, keep=["image_id"]))
    p = _collect_pairs(
        pip_join_partitioned(points, layer, keep=["image_id"], res=5)
    )
    assert b == p


def test_partitioned_salted_matches(spark, layer, points):
    base = _collect_pairs(pip_join_partitioned(points, layer, keep=["image_id"], res=5))
    salted = _collect_pairs(
        pip_join_partitioned(
            points, layer, keep=["image_id"], res=5, salt_threshold=100, n_salt=4
        )
    )
    assert base == salted


def test_partitioned_rings_matches_broadcast_corpus(spark, points):
    """Verdict item: partitioned PIP from a RINGS DataFrame (polyfill
    cover built executor-side, no PolygonLayer on the driver) equals
    the broadcast path on the africa+europe corpus."""
    from segment_rtree_spark.operators.pip_join import pip_join_partitioned_rings
    from segment_rtree_spark.sources.wkt import parse_wkt_file_polygons, read_wkt_rings

    rows = list(parse_wkt_file_polygons("data/wkt/africa.wkt"))
    off = max(r[0] for r in rows) + 1
    rows += [(pid + off, part, xs, ys)
             for pid, part, xs, ys in parse_wkt_file_polygons("data/wkt/europe.wkt")]
    layer = PolygonLayer.from_ring_rows(rows)
    rings = spark.createDataFrame(
        pd.DataFrame(
            {
                "polygon_id": [r[0] for r in rows],
                "part_id": [r[1] for r in rows],
                "xs": [r[2].tolist() for r in rows],
                "ys": [r[3].tolist() for r in rows],
            }
        )
    )
    # scatter points over both continents (reuse the synthetic ids)
    from pyspark.sql import functions as F

    pts = points.select(
        "image_id",
        (F.pmod(F.xxhash64("image_id"), 9000) / 100.0 - 25.0).alias("lng"),
        (F.pmod(F.xxhash64("image_id", F.lit(1)), 10500) / 100.0 - 38.0).alias("lat"),
    )
    b = _collect_pairs(pip_join_broadcast(pts, layer, keep=["image_id"]))
    r = _collect_pairs(
        pip_join_partitioned_rings(
            pts, rings, res=6, keep=["image_id"], salt_threshold=500, n_salt=4
        )
    )
    assert b == r
    assert len(b) > 100


def test_row_invariants_through_shuffle(spark, layer, points):
    """Per-row invariant (input_hint): decoded pixels + caption survive
    the join/shuffle byte-identical."""
    out = pip_join_broadcast(
        points, layer, keep=["image_id", "bytes", "w", "h", "fmt", "caption"]
    )
    got = {r["image_id"]: r for r in out.collect()}
    assert got
    for image_id, row in list(got.items())[:25]:
        i = int(image_id[3:])
        w, h, fmt, px, ph, buf = synth_image(i)
        assert row["caption"].startswith(f"synthetic image {i} at (")
        assert bytes(row["bytes"]) == buf
        assert np.array_equal(decode_image(bytes(row["bytes"]), row["fmt"], row["w"], row["h"]), px)


def test_relation_values(spark, layer, points):
    out = pip_join_broadcast(points, layer, keep=["image_id"])
    rels = {r["relation"] for r in out.select("relation").distinct().collect()}
    assert rels <= {"interior", "boundary"}
    # a point inside polygon 2's hole must NOT match polygon 2
    pdf = pd.DataFrame({"image_id": ["probe"], "lat": [0.0], "lng": [0.0]})
    probe = spark.createDataFrame(pdf)
    pairs = _collect_pairs(pip_join_broadcast(probe, layer, keep=["image_id"]))
    assert pairs == [("probe", 5, "interior")]
