"""Hypothesis property fuzz: kernels vs brute force / invariants.

Generators build geometry the cheap-to-verify way (star polygons are
simple by construction), then check the packed-tree kernels against
segment-by-segment brute force and against themselves at different
tree degrees — the tree/descent logic is what these catch; the scalar
math is pinned by the golden fixtures.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from segment_rtree_spark.kernels.clip import clip_path
from segment_rtree_spark.kernels.pip import (
    BOUNDARY,
    EXTERIOR,
    INTERIOR,
    PreparedRing,
    points_in_ring,
)
from segment_rtree_spark.kernels.segtree import PackedSegTree
from segment_rtree_spark.kernels.validity import validate_ring


def star_ring(seed: int, n: int):
    """Simple (non-self-intersecting) closed ring: points at strictly
    increasing angles around a center, positive radii."""
    rng = np.random.default_rng(seed)
    # strictly increasing angles with a REAL minimum gap: near-equal
    # angles make adjacent segments near-collinear, where the float
    # intersection point of the adjacent pair no longer lands exactly
    # on the shared vertex and the validator (faithfully) flags it
    gaps = rng.uniform(0.2, 1.0, n)
    ang = 2 * np.pi * np.cumsum(gaps) / gaps.sum()
    r = rng.uniform(0.5, 10.0, n)
    # snap to a 2^-10 grid: coordinates then round-trip EXACTLY through
    # start + (end - start), which the adjacent-touch check requires —
    # the reference's intersect_segments (utils.rs:74-126) computes the
    # touch point as start_a + da * 1.0 with no endpoint snapping, so
    # coordinates that don't round-trip get (faithfully) flagged as
    # self-intersections by both engines
    xs = np.round(r * np.cos(ang) * 1024) / 1024
    ys = np.round(r * np.sin(ang) * 1024) / 1024
    return np.append(xs, xs[0]), np.append(ys, ys[0])


def brute_relation(px, py, xs, ys):
    """Reference-semantics PIP, zero cleverness: full winding sum plus
    collinear-and-within-bbox boundary test per segment (the same
    closed forms as the SQL oracle)."""
    n = len(px)
    rel = np.zeros(n, np.int8)
    wn = np.zeros(n, np.int64)
    on_b = np.zeros(n, bool)
    for i in range(len(xs) - 1):
        sx, sy, ex, ey = xs[i], ys[i], xs[i + 1], ys[i + 1]
        cross = (ex - sx) * (py - sy) - (ey - sy) * (px - sx)
        on_seg = (
            (cross == 0.0)
            & (px >= min(sx, ex)) & (px <= max(sx, ex))
            & (py >= min(sy, ey)) & (py <= max(sy, ey))
        )
        on_b |= on_seg
        up = (sy <= py) & (ey > py) & (cross > 0.0)
        dn = (sy > py) & (ey <= py) & (cross < 0.0)
        wn += np.where(cross == 0.0, 0, up.astype(np.int64) - dn.astype(np.int64))
    rel[wn != 0] = INTERIOR
    rel[on_b] = BOUNDARY
    return rel


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(4, 120))
def test_pip_matches_brute_winding(seed, n):
    xs, ys = star_ring(seed, n)
    rng = np.random.default_rng(seed + 1)
    px = rng.uniform(-12, 12, 200)
    py = rng.uniform(-12, 12, 200)
    # include exact vertices (boundary hits) and the center (interior)
    px = np.concatenate([px, xs[:3], [0.0]])
    py = np.concatenate([py, ys[:3], [0.0]])
    ring = PreparedRing(xs, ys)
    got = points_in_ring(px, py, ring)
    want = brute_relation(px, py, xs, ys)
    assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(4, 120))
def test_pip_degree_invariance(seed, n):
    xs, ys = star_ring(seed, n)
    rng = np.random.default_rng(seed + 2)
    px = rng.uniform(-12, 12, 300)
    py = rng.uniform(-12, 12, 300)
    a = points_in_ring(px, py, PreparedRing(xs, ys, degree=2))
    b = points_in_ring(px, py, PreparedRing(xs, ys, degree=16))
    assert np.array_equal(a, b)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(4, 100),
    x0=st.floats(-8, 6),
    y0=st.floats(-8, 6),
    w=st.floats(0.5, 12),
    h=st.floats(0.5, 12),
)
def test_clip_invariants_and_degree_invariance(seed, n, x0, y0, w, h):
    xs, ys = star_ring(seed, n)
    x1, y1 = x0 + w, y0 + h
    paths2 = clip_path(x0, y0, x1, y1, xs, ys, degree=2)
    paths16 = clip_path(x0, y0, x1, y1, xs, ys, degree=16)
    # tree degree must not change the output AT ALL (bitwise)
    assert len(paths2) == len(paths16)
    for (ax, ay), (bx, by) in zip(paths2, paths16):
        assert np.array_equal(ax, bx) and np.array_equal(ay, by)
    eps = 1e-9
    for cx, cy in paths16:
        assert len(cx) >= 1
        # every output coordinate lies in the (slightly padded) rect
        assert (cx >= x0 - eps).all() and (cx <= x1 + eps).all()
        assert (cy >= y0 - eps).all() and (cy <= y1 + eps).all()
        # non-original coordinates sit on the rect boundary (NEAR an
        # original vertex also counts: an inside endpoint cut at t=1.0
        # is sx + 1.0*(ex-sx), which is the vertex up to 1 ulp)
        for X, Y in zip(cx.tolist(), cy.tolist()):
            near_orig = (np.abs(xs - X) + np.abs(ys - Y)).min() < 1e-9
            if not near_orig:
                on_edge = (
                    abs(X - x0) < 1e-7 or abs(X - x1) < 1e-7
                    or abs(Y - y0) < 1e-7 or abs(Y - y1) < 1e-7
                )
                assert on_edge, (X, Y)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(4, 80))
def test_star_rings_validate_clean(seed, n):
    xs, ys = star_ring(seed, n)
    assert validate_ring(xs, ys) is None


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(6, 80), i=st.integers(1, 4))
def test_scrambled_star_validation_degree_invariant(seed, n, i):
    """Scrambling vertices often (not always) breaks simplicity; either
    way the reported issue is a function of the GEOMETRY alone — the
    candidate tree's degree (hence candidate ORDER) must not change
    which error precedence picks."""
    xs, ys = star_ring(seed, n)
    j = i + 2
    xs[[i, j]] = xs[[j, i]]
    ys[[i, j]] = ys[[j, i]]
    from segment_rtree_spark.kernels.validity import validate_linestring

    a = validate_linestring(xs, ys, degree=2)
    b = validate_linestring(xs, ys, degree=16)
    c = validate_linestring(xs, ys, degree=5)
    assert a == b == c


def test_bowtie_always_flagged():
    """Deterministic broken ring: the classic bowtie self-intersection."""
    issue = validate_ring(
        np.array([0.0, 10.0, 10.0, 0.0, 0.0]), np.array([0.0, 10.0, 0.0, 10.0, 0.0])
    )
    assert issue is not None and issue.code == "SelfIntersection"


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(1, 200))
def test_segtree_query_rect_matches_brute(seed, n):
    rng = np.random.default_rng(seed)
    xs = rng.uniform(-100, 100, n + 1)
    ys = rng.uniform(-100, 100, n + 1)
    tree = PackedSegTree.from_coords(xs, ys, degree=4)
    qx0, qy0 = rng.uniform(-120, 80, 5), rng.uniform(-120, 80, 5)
    qx1, qy1 = qx0 + rng.uniform(0, 80, 5), qy0 + rng.uniform(0, 80, 5)
    q, s = tree.query_rect(qx0, qy0, qx1, qy1)
    got = set(zip(q.tolist(), s.tolist()))
    want = set()
    ex0, ex1 = np.minimum(xs[:-1], xs[1:]), np.maximum(xs[:-1], xs[1:])
    ey0, ey1 = np.minimum(ys[:-1], ys[1:]), np.maximum(ys[:-1], ys[1:])
    for k in range(5):
        hit = (ex0 <= qx1[k]) & (ex1 >= qx0[k]) & (ey0 <= qy1[k]) & (ey1 >= qy0[k])
        want |= {(k, int(i)) for i in np.nonzero(hit)[0]}
    assert got == want
