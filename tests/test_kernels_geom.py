"""Golden tests for geometry kernels, ported from the reference suite.

Sources: reference src/rectangle.rs:197-225 (Liang-Barsky goldens),
src/utils.rs:73-126 branch coverage (FIXTURES.md F6), src/utils.rs:35-60
winding semantics, src/coordinate.rs cross/dot properties.
"""

import numpy as np
import pytest

from segment_rtree_spark.kernels.geom import (
    WN_LEFT,
    WN_OFF,
    WN_ON,
    WN_RIGHT,
    clip_segments,
    envelope_of,
    intersect_segments,
    rect_contains,
    rect_intersects,
    segment_envelopes,
    winding_position,
)


def clip_one(rect, s, e):
    hit, x0, y0, x1, y1 = clip_segments(
        rect[0], rect[1], rect[2], rect[3], s[0], s[1], e[0], e[1]
    )
    if not bool(np.atleast_1d(hit)[0]):
        return None
    g = lambda a: float(np.atleast_1d(a)[0])
    return ((g(x0), g(y0)), (g(x1), g(y1)))


UNIT = (0.0, 0.0, 1.0, 1.0)


class TestLiangBarsky:
    # reference src/rectangle.rs:202-224
    def test_outside_parallel(self):
        assert clip_one(UNIT, (0.2, -0.2), (0.1, -0.1)) is None

    def test_cross_bottom(self):
        assert clip_one(UNIT, (0.2, -0.2), (0.2, 0.2)) == ((0.2, 0.0), (0.2, 0.2))

    def test_corner_to_corner(self):
        assert clip_one(UNIT, (-0.2, -0.2), (1.2, 1.2)) == ((0.0, 0.0), (1.0, 1.0))

    def test_fully_inside(self):
        assert clip_one(UNIT, (0.2, 0.2), (0.8, 0.8)) == ((0.2, 0.2), (0.8, 0.8))

    def test_degenerate_touch(self):
        assert clip_one(UNIT, (0.0, -1.0), (0.0, 0.0)) == ((0.0, 0.0), (0.0, 0.0))

    # extra cases from clip_path goldens that exercise segment level
    def test_corner_touch_only(self):
        assert clip_one(UNIT, (-1.0, 0.0), (1.0, 2.0)) == ((0.0, 1.0), (0.0, 1.0))

    def test_miss_above_diagonal(self):
        assert clip_one(UNIT, (-1.5, 0.0), (1.0, 2.0)) is None

    def test_zero_length_outside(self):
        assert clip_one(UNIT, (2.0, 2.0), (2.0, 2.0)) is None

    def test_zero_length_inside(self):
        assert clip_one(UNIT, (0.5, 0.5), (0.5, 0.5)) == ((0.5, 0.5), (0.5, 0.5))


def isect_one(a0, a1, b0, b1):
    hit, x0, y0, x1, y1 = intersect_segments(
        a0[0], a0[1], a1[0], a1[1], b0[0], b0[1], b1[0], b1[1]
    )
    if not bool(np.atleast_1d(hit)[0]):
        return None
    g = lambda a: float(np.atleast_1d(a)[0])
    return ((g(x0), g(y0)), (g(x1), g(y1)))


class TestIntersectSegments:
    # FIXTURES.md F6 / reference src/utils.rs:73-126 branch coverage
    def test_identical(self):
        assert isect_one((0, 0), (1, 1), (0, 0), (1, 1)) == ((0, 0), (1, 1))

    def test_reversed(self):
        assert isect_one((0, 0), (1, 1), (1, 1), (0, 0)) == ((0, 0), (1, 1))

    def test_parallel_disjoint(self):
        assert isect_one((0, 0), (1, 0), (0, 1), (1, 1)) is None

    def test_collinear_disjoint(self):
        assert isect_one((0, 0), (1, 0), (2, 0), (3, 0)) is None

    def test_collinear_partial_overlap(self):
        assert isect_one((0, 0), (2, 0), (1, 0), (3, 0)) == ((1, 0), (2, 0))

    def test_collinear_containing(self):
        assert isect_one((0, 0), (3, 0), (1, 0), (2, 0)) == ((1, 0), (2, 0))

    def test_collinear_touch_endpoint(self):
        assert isect_one((0, 0), (1, 0), (1, 0), (2, 0)) == ((1, 0), (1, 0))

    def test_crossing_interior(self):
        assert isect_one((0, 0), (1, 1), (1, 0), (0, 1)) == ((0.5, 0.5), (0.5, 0.5))

    def test_crossing_shared_endpoint(self):
        assert isect_one((0, 0), (1, 1), (1, 1), (2, 0)) == ((1, 1), (1, 1))

    def test_near_miss(self):
        assert isect_one((0, 0), (1, 1), (1.01, 0), (2, -1)) is None

    def test_t_touch_at_one(self):
        # crossing exactly at t=1 of A is inclusive
        assert isect_one((0, 0), (1, 0), (1, -1), (1, 1)) == ((1, 0), (1, 0))

    def test_reference_overlap_case(self):
        # reference line_string.rs e3: segments (0,0)-(0,1) and (0,1)-(0,0.5)
        # overlap between (0,0.5) and (0,1)
        assert isect_one((0, 0), (0, 1), (0, 1), (0, 0.5)) == ((0, 0.5), (0, 1))

    def test_vectorized_matches_scalar(self):
        rng = np.random.default_rng(7)
        n = 500
        coords = rng.integers(-3, 4, size=(n, 8)).astype(float)
        hit, x0, y0, x1, y1 = intersect_segments(*coords.T)
        for i in range(0, n, 17):
            got = isect_one(coords[i, 0:2], coords[i, 2:4], coords[i, 4:6], coords[i, 6:8])
            if got is None:
                assert not hit[i]
            else:
                assert hit[i]
                assert got == ((x0[i], y0[i]), (x1[i], y1[i]))


class TestWinding:
    # reference src/utils.rs:35-60
    def test_on(self):
        assert winding_position(0.5, 0.5, 0.0, 0.0, 1.0, 1.0) == WN_ON

    def test_on_extension(self):
        # collinear but beyond the segment is still On (lx == rx)
        assert winding_position(2.0, 2.0, 0.0, 0.0, 1.0, 1.0) == WN_ON

    def test_left_upward(self):
        assert winding_position(0.0, 0.5, 1.0, 0.0, 1.0, 1.0) == WN_LEFT

    def test_right_downward(self):
        assert winding_position(0.0, 0.5, 1.0, 1.0, 1.0, 0.0) == WN_RIGHT

    def test_off_below(self):
        assert winding_position(0.0, -1.0, 1.0, 0.0, 1.0, 1.0) == WN_OFF

    def test_upward_excludes_end(self):
        # end.y must be strictly > point.y for an upward crossing
        assert winding_position(0.0, 1.0, 1.0, 0.0, 1.0, 1.0) == WN_OFF

    def test_downward_includes_end(self):
        # end.y <= point.y counts for downward crossing
        assert winding_position(0.0, 0.0, 1.0, 1.0, 1.0, 0.0) == WN_RIGHT


class TestRects:
    def test_segment_envelopes(self):
        xs = np.array([0.0, 2.0, 1.0])
        ys = np.array([1.0, -1.0, 3.0])
        xmin, ymin, xmax, ymax = segment_envelopes(xs, ys)
        assert xmin.tolist() == [0.0, 1.0]
        assert ymin.tolist() == [-1.0, -1.0]
        assert xmax.tolist() == [2.0, 2.0]
        assert ymax.tolist() == [1.0, 3.0]

    def test_envelope_of_empty_is_nan(self):
        e = envelope_of(np.array([]), np.array([]))
        assert all(np.isnan(v) for v in e)

    def test_intersects_touching_counts(self):
        assert rect_intersects(0, 0, 1, 1, 1, 1, 2, 2)

    def test_contains_closed(self):
        assert rect_contains(0, 0, 2, 2, 0, 0, 2, 2)
        assert not rect_contains(0, 0, 2, 2, -0.1, 0, 2, 2)
