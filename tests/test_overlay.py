"""polygon_overlap_join: fixture expectations + corpus sanity."""

import pytest

from segment_rtree_spark.operators.overlay import polygon_overlap_join
from segment_rtree_spark.plans.entry_queries import entry_layer, entry_layer_b


def test_overlap_fixture_pairs(spark):
    out = polygon_overlap_join(spark, entry_layer(), entry_layer_b(), res=6)
    got = {(r["a_id"], r["b_id"]): r["relation"] for r in out.collect()}
    assert got == {
        (1, 101): "boundary",   # 101 crosses polygon 1's edges
        (2, 103): "boundary",   # 103's bottom edge passes through 2's apex
        (3, 102): "b_in_a",     # 102 inside 3's shell, outside its holes
        (4, 103): "a_in_b",     # 103 contains polygon 4 entirely
        # NOT present: 104 (inside 1's hole), 105 (disjoint),
        # 106 (inside 3's second hole)
    }


def test_overlap_res_invariance(spark):
    a, b = entry_layer(), entry_layer_b()
    r5 = sorted(map(tuple, polygon_overlap_join(spark, a, b, res=5).collect()))
    r7 = sorted(map(tuple, polygon_overlap_join(spark, a, b, res=7).collect()))
    assert r5 == r7


def test_overlap_packed_matches_broadcast(spark):
    """The no-broadcast (packs-ride-covers) path equals the broadcast
    path — on the fixture AND on real geometry."""
    from segment_rtree_spark.layer import PolygonLayer
    from segment_rtree_spark.operators.overlay import polygon_overlap_join_packed

    a, b = entry_layer(), entry_layer_b()
    got = sorted(map(tuple, polygon_overlap_join_packed(spark, a, b, res=6).collect()))
    want = sorted(map(tuple, polygon_overlap_join(spark, a, b, res=6).collect()))
    assert got == want

    # real geometry: africa self-join (uk.wkt etc. are PLANAR-coordinate
    # corpora outside the lat/lng tile domain — tile-partitioned paths
    # are degree-domain by design; broadcast PIP serves planar corpora)
    africa = PolygonLayer.from_wkt_file("data/wkt/africa.wkt")
    g2 = sorted(map(tuple, polygon_overlap_join_packed(spark, africa, africa, res=5).collect()))
    w2 = sorted(map(tuple, polygon_overlap_join(spark, africa, africa, res=5).collect()))
    assert g2 == w2
    assert len(g2) >= len(africa.ids)  # at least every self-pair


def test_overlap_rings_matches_broadcast(spark):
    """Fully table-native overlay (both sides ring DataFrames, covers
    built executor-side) equals the broadcast path."""
    import pandas as pd

    from segment_rtree_spark.operators.overlay import polygon_overlap_join_rings
    from segment_rtree_spark.plans.entry_queries import (
        ENTRY_LAYER_B_ROWS,
        ENTRY_LAYER_ROWS,
    )

    def rings_df(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "polygon_id": [r[0] for r in rows],
                    "part_id": [r[1] for r in rows],
                    "xs": [list(map(float, r[2])) for r in rows],
                    "ys": [list(map(float, r[3])) for r in rows],
                }
            )
        )

    got = sorted(map(tuple, polygon_overlap_join_rings(
        spark, rings_df(ENTRY_LAYER_ROWS), rings_df(ENTRY_LAYER_B_ROWS), res=6
    ).collect()))
    want = sorted(map(tuple, polygon_overlap_join(
        spark, entry_layer(), entry_layer_b(), res=6
    ).collect()))
    assert got == want


def test_overlap_self_join_corpus(spark):
    """africa vs africa: every polygon at least meets itself
    ('boundary' — identical segments intersect), and neighbors sharing
    borders show up symmetrically."""
    from segment_rtree_spark.layer import PolygonLayer

    layer = PolygonLayer.from_wkt_file("data/wkt/africa.wkt")
    out = polygon_overlap_join(spark, layer, layer, res=5).collect()
    rels = {(r["a_id"], r["b_id"]): r["relation"] for r in out}
    for pid in layer.ids.tolist():
        assert rels.get((pid, pid)) == "boundary"
    # symmetry: (a,b) boundary implies (b,a) boundary
    for (a, b), rel in rels.items():
        if rel == "boundary":
            assert rels.get((b, a)) == "boundary", (a, b)
