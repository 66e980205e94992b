"""Point-in-polygon goldens + brute-force oracle.

Goldens from reference src/algorithms/point_in_polygon.rs:86-145
(FIXTURES.md F3); the oracle is a straight O(N*V) winding-number loop
(no tree) that must agree with the Claim-1 shortcut kernel exactly.
"""

import numpy as np

from segment_rtree_spark.kernels.geom import WN_LEFT, WN_ON, WN_RIGHT, winding_position
from segment_rtree_spark.kernels.pip import (
    BOUNDARY,
    EXTERIOR,
    INTERIOR,
    PreparedPolygon,
    PreparedRing,
    points_in_polygon,
    points_in_ring,
)

UNIT_SQUARE = ([0.0, 0.0, 1.0, 1.0, 0.0], [0.0, 1.0, 1.0, 0.0, 0.0])

P1_SHELL = ([0.0, 0.0, 10.0, 10.0, 0.0], [0.0, 10.0, 10.0, 0.0, 0.0])
P1_HOLE_A = ([1.0, 1.0, 3.0, 3.0, 1.0], [1.0, 8.0, 8.0, 1.0, 1.0])
P1_HOLE_B = ([6.0, 6.0, 9.0, 9.0, 6.0], [6.0, 9.0, 10.0, 6.0, 6.0])


def test_containment_loop_goldens():
    # reference point_in_polygon.rs:86-110
    ring = PreparedRing(*UNIT_SQUARE)
    px = np.array([0.5, 0.0, 0.5, 0.0, 1.1])
    py = np.array([0.5, 0.0, 0.0, 0.5, 0.0])
    rel = points_in_ring(px, py, ring)
    assert rel.tolist() == [INTERIOR, BOUNDARY, BOUNDARY, BOUNDARY, EXTERIOR]


def test_containment_polygon_goldens():
    # reference point_in_polygon.rs:111-145
    poly = PreparedPolygon.from_arrays([P1_SHELL, P1_HOLE_A, P1_HOLE_B])
    px = np.array([0.5, 0.0, 1.0, 1.5, 9.0, 10.1])
    py = np.array([0.5, 0.0, 1.0, 1.5, 10.0, 0.0])
    rel = points_in_polygon(px, py, poly)
    assert rel.tolist() == [
        INTERIOR,
        BOUNDARY,
        BOUNDARY,  # hole corner
        EXTERIOR,  # inside hole
        BOUNDARY,  # hole touching shell
        EXTERIOR,
    ]


def brute_force_ring(px, py, xs, ys):
    """O(N*V) oracle: plain winding accumulation over every segment."""
    n = len(px)
    out = np.zeros(n, dtype=np.int8)
    for i in range(n):
        wn = 0
        boundary = False
        for s in range(len(xs) - 1):
            w = winding_position(px[i], py[i], xs[s], ys[s], xs[s + 1], ys[s + 1])
            if w == WN_ON:
                # On the support line; on-boundary only if within the
                # segment's envelope
                if (
                    min(xs[s], xs[s + 1]) <= px[i] <= max(xs[s], xs[s + 1])
                    and min(ys[s], ys[s + 1]) <= py[i] <= max(ys[s], ys[s + 1])
                ):
                    boundary = True
                    break
            elif w == WN_LEFT:
                wn += 1
            elif w == WN_RIGHT:
                wn -= 1
        if boundary:
            out[i] = BOUNDARY
        elif wn != 0:
            out[i] = INTERIOR
    return out


def _random_star_ring(rng, n_vertices, cx=0.0, cy=0.0, rmin=1.0, rmax=5.0):
    """Random star-shaped (hence simple) closed ring."""
    angles = np.sort(rng.uniform(0, 2 * np.pi, n_vertices))
    # ensure distinct angles
    angles += np.arange(n_vertices) * 1e-9
    radii = rng.uniform(rmin, rmax, n_vertices)
    xs = cx + radii * np.cos(angles)
    ys = cy + radii * np.sin(angles)
    xs = np.append(xs, xs[0])
    ys = np.append(ys, ys[0])
    return xs, ys


def test_kernel_matches_brute_force_random():
    rng = np.random.default_rng(1234)
    for trial in range(5):
        xs, ys = _random_star_ring(rng, 60 + trial * 37)
        ring = PreparedRing(xs, ys, degree=4)
        px = rng.uniform(-6, 6, 400)
        py = rng.uniform(-6, 6, 400)
        # mix in exact vertices and edge midpoints (boundary cases)
        px = np.concatenate([px, xs[:10], (xs[:10] + xs[1:11]) / 2])
        py = np.concatenate([py, ys[:10], (ys[:10] + ys[1:11]) / 2])
        got = points_in_ring(px, py, ring)
        want = brute_force_ring(px, py, xs, ys)
        # brute force boundary-detection via envelope check may diverge
        # from the reference semantics only where it claims boundary off
        # the path — compare non-boundary lanes strictly, boundary
        # lanes as a set
        np.testing.assert_array_equal(got, want)


def test_envelope_prereject():
    ring = PreparedRing(*UNIT_SQUARE)
    rel = points_in_ring(np.array([5.0, -5.0]), np.array([5.0, 0.5]), ring)
    assert rel.tolist() == [EXTERIOR, EXTERIOR]


def test_claim1_shortcut_on_large_ring():
    # ring large enough to force multi-level descent with degree 2
    theta = np.linspace(0, 2 * np.pi, 257)
    xs = np.cos(theta)
    ys = np.sin(theta)
    xs[-1], ys[-1] = xs[0], ys[0]
    ring = PreparedRing(xs, ys, degree=2)
    px = np.array([0.0, 0.99, -0.99, 2.0, 0.0])
    py = np.array([0.0, 0.0, 0.0, 0.0, 0.999])
    rel = points_in_ring(px, py, ring)
    assert rel.tolist() == [INTERIOR, INTERIOR, INTERIOR, EXTERIOR, INTERIOR]
