"""Geometry measure functions: known values + Spark/local agreement."""

import numpy as np
from pyspark.sql import functions as F

from segment_rtree_spark.plans.entry_queries import q_geom_measures


def test_known_areas_and_perimeters(spark):
    out = {(r["polygon_id"], r["part_id"]): r for r in q_geom_measures(spark, "").collect()}
    # polygon 4: box [-20,20] x [75,89] -> area 40*14, perimeter 2*(40+14)
    r4 = out[(4, 0)]
    assert abs(r4["ring_area"]) == 560.0 and r4["perimeter"] == 108.0
    # B 101: 20x20 box
    r101 = out[(101, 0)]
    assert abs(r101["ring_area"]) == 400.0 and r101["perimeter"] == 80.0
    # polygon 2: triangle base 60, height 70 -> area 2100
    r2 = out[(2, 0)]
    assert abs(r2["ring_area"]) == 2100.0
    # hole areas are reported per ring: polygon 1's hole is 30x30
    assert abs(out[(1, 1)]["ring_area"]) == 900.0


def test_measures_match_numpy_shoelace(spark):
    rows = q_geom_measures(spark, "").collect()
    from segment_rtree_spark.plans.entry_queries import (
        ENTRY_LAYER_B_ROWS,
        ENTRY_LAYER_ROWS,
    )

    fixture = {(r[0], r[1]): (np.asarray(r[2]), np.asarray(r[3]))
               for r in ENTRY_LAYER_ROWS + ENTRY_LAYER_B_ROWS}
    for r in rows:
        xs, ys = fixture[(r["polygon_id"], r["part_id"])]
        # sequential-fold reference (same order as the SQL)
        acc = 0.0
        for i in range(len(xs) - 1):
            acc = acc + (xs[i] * ys[i + 1] - xs[i + 1] * ys[i])
        assert r["ring_area"] == acc / 2.0
        per = 0.0
        for i in range(len(xs) - 1):
            per = per + float(np.sqrt((xs[i + 1] - xs[i]) ** 2 + (ys[i + 1] - ys[i]) ** 2))
        assert r["perimeter"] == per
