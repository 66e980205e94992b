"""Real-geometry correctness: reference WKT corpus vs brute-force PIP.

SURVEY.md §5 test-strategy item 5: africa / uk-arrows rings validate
and PIP grids match an O(N*V) brute-force winding oracle (no tree, no
shortcut) — exercising the Claim-1 shortcut and the arena descent on
real boundary chains with thousands of vertices.
"""

import numpy as np
import pytest

from segment_rtree_spark.kernels.geom import WN_LEFT, WN_ON, WN_RIGHT, winding_position
from segment_rtree_spark.kernels.pip import EXTERIOR, INTERIOR, BOUNDARY
from segment_rtree_spark.layer import PolygonLayer
from segment_rtree_spark.sources.wkt import parse_wkt_file_polygons


def brute_pip_layer(px, py, rows):
    """(point, polygon_id) interior/boundary pairs, plain winding loop."""
    out = set()
    by_poly = {}
    for pid, part, xs, ys in rows:
        by_poly.setdefault(pid, []).append((part, xs, ys))
    for i in range(len(px)):
        for pid, rings in by_poly.items():
            rel = None
            for part, xs, ys in sorted(rings):
                wn = 0
                on = False
                w = winding_position(px[i], py[i], xs[:-1], ys[:-1], xs[1:], ys[1:])
                onmask = (w == WN_ON) & (
                    (np.minimum(xs[:-1], xs[1:]) <= px[i]) & (px[i] <= np.maximum(xs[:-1], xs[1:]))
                    & (np.minimum(ys[:-1], ys[1:]) <= py[i]) & (py[i] <= np.maximum(ys[:-1], ys[1:]))
                )
                if onmask.any():
                    on = True
                else:
                    wn = int((w == WN_LEFT).sum()) - int((w == WN_RIGHT).sum())
                r = BOUNDARY if on else (INTERIOR if wn != 0 else EXTERIOR)
                if part == 0:
                    rel = r
                    if rel == EXTERIOR:
                        break
                else:
                    if rel == INTERIOR and r == INTERIOR:
                        rel = EXTERIOR
                        break
                    if rel == INTERIOR and r == BOUNDARY:
                        rel = BOUNDARY
            if rel in (INTERIOR, BOUNDARY):
                out.add((i, pid, int(rel)))
    return out


@pytest.mark.parametrize("corpus,grid", [
    ("africa", (-20.0, 55.0, -37.0, 40.0)),
    ("uk-arrows", (1240.0, 1400.0, 1190.0, 1350.0)),
    ("papua", (140.0, 160.0, -12.0, -1.0)),
])
def test_corpus_pip_matches_bruteforce(corpus, grid):
    rows = parse_wkt_file_polygons(f"data/wkt/{corpus}.wkt")
    layer = PolygonLayer.from_ring_rows(rows)
    rng = np.random.default_rng(99)
    x0, x1, y0, y1 = grid
    px = rng.uniform(x0, x1, 800)
    py = rng.uniform(y0, y1, 800)
    # sprinkle exact vertices (boundary hits)
    vx = np.concatenate([r[2][:3] for r in rows[:30]])
    vy = np.concatenate([r[3][:3] for r in rows[:30]])
    px = np.concatenate([px, vx])
    py = np.concatenate([py, vy])

    q, pid, rel = layer.pip(px, py)
    got = set(zip(q.tolist(), pid.tolist(), rel.astype(int).tolist()))
    want = brute_pip_layer(px, py, rows)
    assert got == want


def test_corpus_rings_are_valid():
    from segment_rtree_spark.kernels.validity import validate_ring

    for corpus in ("uk-arrows", "papua", "uk", "usa-lower48"):
        for pid, part, xs, ys in parse_wkt_file_polygons(f"data/wkt/{corpus}.wkt"):
            issue = validate_ring(xs, ys)
            assert issue is None, (corpus, pid, part, issue)


def test_corpus_dirty_data_is_flagged_not_crashed():
    """africa/europe contain genuinely invalid rings (real-world data!)
    — the validity operator flags them as data instead of raising, and
    PIP still matches brute force on them (winding is well-defined even
    for self-touching chains)."""
    from segment_rtree_spark.kernels.validity import validate_ring

    issues = [
        validate_ring(xs, ys)
        for _, _, xs, ys in parse_wkt_file_polygons("data/wkt/africa.wkt")
    ]
    n_bad = sum(1 for i in issues if i is not None)
    assert n_bad == 12  # deterministic: the corpus is what it is
    assert {i.code for i in issues if i} <= {
        "SelfIntersection", "OverlappingSegments", "DegenerateSegment",
    }
