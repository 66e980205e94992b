"""Clip-path goldens — reference src/algorithms/clip.rs:204-284 (F5)."""

import numpy as np
import pytest

from segment_rtree_spark.kernels.clip import clip_path, segment_union_merge

UNIT = (0.0, 0.0, 1.0, 1.0)


def clip(coords, rect=UNIT, degree=16):
    xs = np.array([c[0] for c in coords], float)
    ys = np.array([c[1] for c in coords], float)
    paths = clip_path(rect[0], rect[1], rect[2], rect[3], xs, ys, degree=degree)
    return [list(zip(px.tolist(), py.tolist())) for px, py in paths]


class TestBasicClips:
    def test_contained_full(self):
        assert clip([(0, 0), (1, 1)]) == [[(0, 0), (1, 1)]]

    def test_contained_inner(self):
        assert clip([(0.1, 0.7), (0.5, 0.2)]) == [[(0.1, 0.7), (0.5, 0.2)]]

    def test_outside_to_in(self):
        assert clip([(-1.0, 0.5), (0.5, 0.5)]) == [[(0.0, 0.5), (0.5, 0.5)]]

    def test_outside_to_edge(self):
        assert clip([(-1.0, 0.5), (0.0, 0.5)]) == [[(0.0, 0.5)]]

    def test_inside_to_out(self):
        assert clip([(0.5, 0.5), (1.5, 0.5)]) == [[(0.5, 0.5), (1.0, 0.5)]]

    def test_edge_to_out(self):
        assert clip([(1.0, 0.5), (1.5, 0.5)]) == [[(1.0, 0.5)]]

    def test_miss(self):
        assert clip([(-1.5, 0.0), (1.0, 2.0)]) == []

    def test_corner_touch(self):
        assert clip([(-1.0, 0.0), (1.0, 2.0)]) == [[(0.0, 1.0)]]

    def test_diagonal_through(self):
        assert clip([(-1.0, -1.0), (1.0, 1.0)]) == [[(0.0, 0.0), (1.0, 1.0)]]


class TestSmallClips:
    def test_multi_segment_path(self):
        assert clip([(-1.0, 0.25), (0.25, 0.25), (0.5, 0.75), (0.5, 2.0)]) == [
            [(0.0, 0.25), (0.25, 0.25), (0.5, 0.75), (0.5, 1.0)]
        ]

    def test_enter_exit_twice(self):
        assert clip([(-0.25, 0.5), (0.5, 1.25), (1.25, 0.5)]) == [
            [(0.0, 0.75), (0.25, 1.0)],
            [(0.75, 1.0), (1.0, 0.75)],
        ]


class TestLoops:
    def test_contained_loop_unchanged(self):
        sq = [(0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75), (0.25, 0.25)]
        assert clip(sq) == [sq]

    def test_loop_cut_and_reconnected(self):
        loop = [(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5)]
        assert clip(loop) == [[(0.5, 1.0), (0.5, 0.5), (1.0, 0.5)]]


@pytest.mark.parametrize("degree", [2, 4, 16])
def test_degree_invariance(degree):
    loop = [(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5)]
    assert clip(loop, degree=degree) == [[(0.5, 1.0), (0.5, 0.5), (1.0, 0.5)]]
    path = [(-1.0, 0.25), (0.25, 0.25), (0.5, 0.75), (0.5, 2.0)]
    assert clip(path, degree=degree) == [
        [(0.0, 0.25), (0.25, 0.25), (0.5, 0.75), (0.5, 1.0)]
    ]


def test_segment_union_merge():
    lo, hi = segment_union_merge(np.array([0, 3, 10]), np.array([3, 5, 12]))
    assert lo.tolist() == [0, 10]
    assert hi.tolist() == [5, 12]
    lo, hi = segment_union_merge(np.array([], np.int64), np.array([], np.int64))
    assert len(lo) == 0


def test_big_ring_against_bruteforce_sections():
    """Clip a 400-vertex star ring to a window; verify every output
    point lies in the rect and consecutive output points are either
    original vertices or on the rect border."""
    rng = np.random.default_rng(8)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 400))
    radii = rng.uniform(1, 4, 400)
    xs = np.append(radii * np.cos(angles), radii[0] * np.cos(angles[0]))
    ys = np.append(radii * np.sin(angles), radii[0] * np.sin(angles[0]))
    rect = (-1.0, -1.5, 2.0, 1.0)
    paths = clip_path(*rect, xs, ys)
    assert paths
    total = 0
    for px, py in paths:
        total += len(px)
        assert (px >= rect[0] - 1e-12).all() and (px <= rect[2] + 1e-12).all()
        assert (py >= rect[1] - 1e-12).all() and (py <= rect[3] + 1e-12).all()
    assert total > 10
