"""SegRTree structure/query goldens + oracle tests.

Sources: reference src/seg_rtree/rtree.rs:251-365 (FIXTURES.md F9),
src/utils.rs:10-26 level-index goldens, and brute-force oracles in the
style of the reference flatbush tests (flatbush_impl.rs:471-494).
"""

import numpy as np

from segment_rtree_spark.kernels.segtree import PackedSegTree, calculate_level_indices


def test_level_indices_golden():
    # FIXTURES.md F9: calculate_level_indices(2, 6) == [0, 6, 10, 12]
    assert calculate_level_indices(2, 6).tolist() == [0, 6, 10, 12]
    assert calculate_level_indices(16, 1).tolist() == [0]
    assert calculate_level_indices(2, 1).tolist() == [0]
    # 17 leaves pad to 32; the 2-node level pads to a full degree-16 block
    assert calculate_level_indices(16, 17).tolist() == [0, 32, 48]


def build_point_tree(n, degree=2):
    pts = np.arange(n, dtype=np.float64)
    return PackedSegTree.build(pts, pts, pts, pts, degree=degree)


def test_empty_tree():
    t = PackedSegTree.build([], [], [], [], degree=2)
    assert t.is_empty
    q, s = t.query_point(0.0, 0.0)
    assert len(q) == 0
    q, s = t.query_rect(-10.0, -5.0, 1.0, 5.0)
    assert len(q) == 0


def test_build_and_query_goldens():
    # reference rtree.rs:288-345: 6 point-rects at (i,i), degree 2
    t = build_point_tree(6)
    assert t.height == 3  # level_indices [0,6,10,12] -> 3 levels up
    for i in range(6):
        q, s = t.query_rect(float(i), float(i), float(i), float(i))
        assert sorted(s.tolist()) == [i]
    q, s = t.query_rect(0.0, 0.0, 5.0, 5.0)
    assert sorted(s.tolist()) == [0, 1, 2, 3, 4, 5]
    q, s = t.query_rect(1.0, 1.0, 3.0, 3.0)
    assert sorted(s.tolist()) == [1, 2, 3]


def test_batched_queries_match_scalar():
    rng = np.random.default_rng(42)
    n = 200
    x0 = rng.uniform(0, 100, n)
    y0 = rng.uniform(0, 100, n)
    xmin, xmax = np.minimum(x0, x0 + rng.uniform(0, 5, n)), np.maximum(x0, x0 + 5)
    ymin, ymax = y0, y0 + rng.uniform(0, 5, n)
    t = PackedSegTree.build(xmin, ymin, xmax, ymax, degree=16)

    qx0 = rng.uniform(0, 100, 50)
    qy0 = rng.uniform(0, 100, 50)
    qx1 = qx0 + rng.uniform(0, 20, 50)
    qy1 = qy0 + rng.uniform(0, 20, 50)
    q, s = t.query_rect(qx0, qy0, qx1, qy1)
    got = set(zip(q.tolist(), s.tolist()))
    expect = set()
    for qi in range(50):
        for si in range(n):
            if (
                xmin[si] <= qx1[qi]
                and xmax[si] >= qx0[qi]
                and ymin[si] <= qy1[qi]
                and ymax[si] >= qy0[qi]
            ):
                expect.add((qi, si))
    assert got == expect


def test_low_high_property():
    # reference rtree.rs:353-365: 50 random sizes, degree 16
    rng = np.random.default_rng(177)
    for _ in range(50):
        size = int(rng.integers(1, 1000))
        z = np.zeros(size)
        t = PackedSegTree.build(z, z, z, z, degree=16)
        low, high = t.get_low_high(t.height, 0)
        assert int(low) <= size and int(high) <= size


def test_self_intersections_oracle():
    rng = np.random.default_rng(9)
    n = 120
    cx = rng.uniform(0, 50, n)
    cy = rng.uniform(0, 50, n)
    w = rng.uniform(0, 6, n)
    h = rng.uniform(0, 6, n)
    xmin, ymin, xmax, ymax = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
    t = PackedSegTree.build(xmin, ymin, xmax, ymax, degree=4)
    a, b = t.query_self_intersections()
    got = set(zip(a.tolist(), b.tolist()))
    expect = set()
    for i in range(n):
        for j in range(i + 1, n):
            if (
                xmin[i] <= xmax[j]
                and xmax[i] >= xmin[j]
                and ymin[i] <= ymax[j]
                and ymax[i] >= ymin[j]
            ):
                expect.add((i, j))
    assert got == expect
    assert len(a) == len(got)  # no duplicate pairs emitted


def test_other_intersections_oracle():
    rng = np.random.default_rng(11)

    def mk(n, seed_shift):
        cx = rng.uniform(0, 40, n)
        cy = rng.uniform(0, 40, n)
        return cx, cy, cx + rng.uniform(0, 4, n), cy + rng.uniform(0, 4, n)

    ax0, ay0, ax1, ay1 = mk(80, 0)
    bx0, by0, bx1, by1 = mk(150, 1)
    ta = PackedSegTree.build(ax0, ay0, ax1, ay1, degree=3)
    tb = PackedSegTree.build(bx0, by0, bx1, by1, degree=16)
    a, b = ta.query_other_intersections(tb)
    got = set(zip(a.tolist(), b.tolist()))
    expect = set()
    for i in range(80):
        for j in range(150):
            if (
                ax0[i] <= bx1[j]
                and ax1[i] >= bx0[j]
                and ay0[i] <= by1[j]
                and ay1[i] >= by0[j]
            ):
                expect.add((i, j))
    assert got == expect


def test_envelope_merges_ignore_nan_padding():
    # one leaf + degree 16 -> heavy NaN padding must not poison the root
    t = PackedSegTree.build([1.0], [2.0], [3.0], [4.0], degree=16)
    assert t.envelope() == (1.0, 2.0, 3.0, 4.0)


def test_incremental_add_level_schedule():
    # reference rtree.rs:288-345: degree 2, 6 point rects at (i,i);
    # current_level follows 0,1,2,2,3,3 and every prior rect stays queryable
    from segment_rtree_spark.kernels.segtree import tree_add, tree_new

    t = tree_new(2, 6)
    assert t.size == 0 and t.height == 0
    expected_levels = [0, 1, 2, 2, 3, 3]
    for i in range(6):
        assert tree_add(t, 6, float(i), float(i), float(i), float(i))
        assert t.size == i + 1
        assert t.height == expected_levels[i]
        for j in range(i + 1):
            q, s = t.query_rect(float(j), float(j), float(j), float(j))
            assert sorted(s.tolist()) == [j]
    q, s = t.query_rect(0.0, 0.0, 5.0, 5.0)
    assert sorted(s.tolist()) == [0, 1, 2, 3, 4, 5]
    q, s = t.query_rect(1.0, 1.0, 3.0, 3.0)
    assert sorted(s.tolist()) == [1, 2, 3]
    assert not tree_add(t, 6, 0.0, 0.0, 0.0, 0.0)  # capacity exceeded


def test_empty_incremental_tree():
    from segment_rtree_spark.kernels.segtree import tree_add, tree_new

    t = tree_new(2, 0)
    q, s = t.query_point(0.0, 0.0)
    assert len(s) == 0
    assert not tree_add(t, 0, -10.0, -5.0, 1.0, 5.0)
