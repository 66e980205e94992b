"""Hilbert key goldens — reference src/flatbush/hilbert.rs:138-200 (FIXTURES.md F8)."""

import numpy as np

from segment_rtree_spark.kernels.hilbert import HilbertScaler, hilbert_normalized


def test_normalized_golden():
    assert int(hilbert_normalized(12345, 67890)) == 99_289_669


def test_scaled_golden():
    h = HilbertScaler(1.0, 2.0, 2.0, 8.0)
    assert int(h.hilbert(1.25, 5.0)) == 805_306_368


def test_out_of_bounds_is_max():
    h = HilbertScaler(1.0, 2.0, 2.0, 3.0)
    got = h.safe_hilbert(np.array([4.0, np.nan, 1.5]), np.array([4.0, 2.5, 2.5]))
    assert got[0] == 0xFFFFFFFF
    assert got[1] == 0xFFFFFFFF
    assert got[2] != 0xFFFFFFFF


def test_degenerate_rect_is_zero():
    h = HilbertScaler(1.0, 1.0, 1.0, 1.0)
    assert int(h.hilbert(1.0, 1.0)) == 0


def test_quadrant_ordering():
    h = HilbertScaler(0.0, 0.0, 4.0, 4.0)
    keys = h.hilbert(np.array([0.0, 1.0, 1.0, 3.0, 3.0]), np.array([0.0, 1.0, 3.0, 3.0, 1.0]))
    assert all(keys[i] < keys[i + 1] for i in range(4))


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(5)
    xs = rng.integers(0, 1 << 16, 1000).astype(np.uint32)
    ys = rng.integers(0, 1 << 16, 1000).astype(np.uint32)
    batch = hilbert_normalized(xs, ys)
    for i in range(0, 1000, 97):
        assert batch[i] == hilbert_normalized(xs[i], ys[i])
