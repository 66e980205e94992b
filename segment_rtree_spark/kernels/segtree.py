"""Flat-packed implicit segment R-tree, NumPy-native.

Re-expresses the reference's pointer-free packed R-tree
(jagill/segment-rtree src/seg_rtree/rtree.rs) as NumPy arrays:
`tree` becomes four float64 arrays (xmin/ymin/xmax/ymax), node
addressing stays purely arithmetic:

  * level start offsets: calculate_level_indices (src/utils.rs:10-26)
  * node rect:           tree[level_indices[level] + offset]   (rtree.rs:235-237)
  * children of (L,o):   (L-1, degree*o .. degree*o+degree)    (rtree.rs:146-151)
  * coord span of node:  get_low_high                          (rtree.rs:239-244)

Construction is the bulk bottom-up build of rtree.rs:63-91 — NO
sorting, leaves stay in input (boundary-chain) order; each level is a
reshape(-1, degree) + fmin/fmax reduction, so an n-segment tree costs
O(log n) NumPy calls. Padding slots are all-NaN "empty" rectangles,
absorbed by np.fmin/np.fmax exactly like Rust's f64::min/max.

Queries are batched-frontier descents: a whole array of queries walks
the tree level-synchronously using np.repeat fan-out + boolean-mask
pruning — no per-row Python recursion.
"""

from __future__ import annotations

import numpy as np

__all__ = ["calculate_level_indices", "PackedSegTree"]


def calculate_level_indices(degree: int, num_items: int) -> np.ndarray:
    """Level start offsets; each level padded to a multiple of degree.

    Parity with reference src/utils.rs:10-26 (tests: FIXTURES.md F9 —
    calculate_level_indices(2, 6) == [0, 6, 10, 12]).
    """
    indices = [0]
    level_size = num_items
    while level_size > 1:
        capacity = degree * -(-level_size // degree)  # least multiple >= size
        indices.append(indices[-1] + capacity)
        level_size = capacity // degree
    return np.asarray(indices, dtype=np.int64)


class PackedSegTree:
    """Packed implicit R-tree over an ordered rectangle list.

    Attributes (all NumPy, zero pointers):
      degree:        fan-out (>= 2)
      size:          number of leaf rectangles
      level_indices: int64[num_levels] start offset of each level
      xmin/ymin/xmax/ymax: float64[tree_size] packed node envelopes,
                     leaves first, root last; padding slots are NaN.
    """

    __slots__ = ("degree", "size", "level_indices", "xmin", "ymin", "xmax", "ymax", "_current_level")

    def __init__(self, degree, size, level_indices, xmin, ymin, xmax, ymax):
        self.degree = int(degree)
        self.size = int(size)
        self.level_indices = level_indices
        self.xmin, self.ymin, self.xmax, self.ymax = xmin, ymin, xmax, ymax

    # -- construction ------------------------------------------------

    @classmethod
    def build(cls, xmin, ymin, xmax, ymax, degree: int = 16) -> "PackedSegTree":
        """Bulk bottom-up build (parity: rtree.rs:63-91).

        Leaves keep input order (no Hilbert sort) — within one polygon
        boundary chain, consecutive segments are spatially adjacent, so
        input order IS the locality order (segment_rtree.md:10-15).
        """
        degree = max(2, int(degree))
        leaf_xmin = np.ascontiguousarray(xmin, dtype=np.float64)
        leaf_ymin = np.ascontiguousarray(ymin, dtype=np.float64)
        leaf_xmax = np.ascontiguousarray(xmax, dtype=np.float64)
        leaf_ymax = np.ascontiguousarray(ymax, dtype=np.float64)
        n = len(leaf_xmin)

        li = calculate_level_indices(degree, n)
        tree_size = int(li[-1]) + 1
        txmin = np.full(tree_size, np.nan)
        tymin = np.full(tree_size, np.nan)
        txmax = np.full(tree_size, np.nan)
        tymax = np.full(tree_size, np.nan)
        txmin[:n], tymin[:n], txmax[:n], tymax[:n] = (
            leaf_xmin,
            leaf_ymin,
            leaf_xmax,
            leaf_ymax,
        )

        for level in range(1, len(li)):
            lo, hi = int(li[level - 1]), int(li[level])
            cap = hi - lo
            # grouped min/max of `degree` consecutive children; NaN pad
            # slots are ignored by fmin/fmax (Rust f64::min/max parity)
            txmin[hi : hi + cap // degree] = np.fmin.reduce(
                txmin[lo:hi].reshape(-1, degree), axis=1
            )
            tymin[hi : hi + cap // degree] = np.fmin.reduce(
                tymin[lo:hi].reshape(-1, degree), axis=1
            )
            txmax[hi : hi + cap // degree] = np.fmax.reduce(
                txmax[lo:hi].reshape(-1, degree), axis=1
            )
            tymax[hi : hi + cap // degree] = np.fmax.reduce(
                tymax[lo:hi].reshape(-1, degree), axis=1
            )

        return cls(degree, n, li, txmin, tymin, txmax, tymax)

    @classmethod
    def from_coords(cls, xs, ys, degree: int = 16) -> "PackedSegTree":
        """Tree over the segments of a packed coordinate chain."""
        from .geom import segment_envelopes

        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        if len(xs) == 0:
            return cls.build([], [], [], [], degree)
        return cls.build(*segment_envelopes(xs, ys), degree=degree)

    # -- arithmetic addressing ----------------------------------------

    @property
    def height(self) -> int:
        cl = getattr(self, "_current_level", None)
        return (len(self.level_indices) - 1) if cl is None else cl

    @property
    def is_empty(self) -> bool:
        return self.size == 0

    def node_index(self, level, offset):
        return self.level_indices[level] + offset

    def envelope(self):
        r = int(self.level_indices[self.height])
        return (self.xmin[r], self.ymin[r], self.xmax[r], self.ymax[r])

    def get_low_high(self, level, offset):
        """Coordinate span covered by node(s) — derived, not stored.

        Parity: rtree.rs:239-244. Vectorized over offset arrays.
        """
        width = self.degree ** np.asarray(level, dtype=np.int64)
        offset = np.asarray(offset, dtype=np.int64)
        return width * offset, np.minimum(self.size, width * (offset + 1))

    # -- batched queries ----------------------------------------------

    def _descend(self, qidx, test_node):
        """Generic batched frontier descent.

        qidx: int64[q] query ids. test_node(qsel, level, offsets) must
        return a bool mask. Yields (query_id, leaf_offset) arrays.
        """
        if self.is_empty or len(qidx) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)

        level = self.height
        root_ok = test_node(qidx, level, np.zeros(len(qidx), np.int64))
        fq = qidx[root_ok]
        fo = np.zeros(len(fq), np.int64)

        out_q, out_s = [], []
        d = self.degree
        while level > 0 and len(fq) > 0:
            child_level = level - 1
            cq = np.repeat(fq, d)
            co = (fo[:, None] * d + np.arange(d, dtype=np.int64)).ravel()
            # prune children past this level's capacity
            cap = (
                int(self.level_indices[child_level + 1])
                - int(self.level_indices[child_level])
            )
            valid = co < cap
            cq, co = cq[valid], co[valid]
            keep = test_node(cq, child_level, co)
            fq, fo = cq[keep], co[keep]
            level = child_level
        # leaves beyond size are NaN-padded; test_node already rejects them
        out_q.append(fq)
        out_s.append(fo)
        return np.concatenate(out_q), np.concatenate(out_s)

    def query_rect(self, qxmin, qymin, qxmax, qymax):
        """Batched rect query (parity: rtree.rs:119-121,127-156).

        Accepts scalar or array queries; returns (query_id, segment_idx).
        """
        qxmin = np.atleast_1d(np.asarray(qxmin, dtype=np.float64))
        qymin = np.atleast_1d(np.asarray(qymin, dtype=np.float64))
        qxmax = np.atleast_1d(np.asarray(qxmax, dtype=np.float64))
        qymax = np.atleast_1d(np.asarray(qymax, dtype=np.float64))

        def test(qsel, level, offs):
            idx = self.level_indices[level] + offs
            return (
                (self.xmin[idx] <= qxmax[qsel])
                & (self.xmax[idx] >= qxmin[qsel])
                & (self.ymin[idx] <= qymax[qsel])
                & (self.ymax[idx] >= qymin[qsel])
            )

        return self._descend(np.arange(len(qxmin), dtype=np.int64), test)

    def query_point(self, px, py):
        """Batched point query (parity: rtree.rs:123-125)."""
        px = np.atleast_1d(np.asarray(px, dtype=np.float64))
        py = np.atleast_1d(np.asarray(py, dtype=np.float64))

        def test(qsel, level, offs):
            idx = self.level_indices[level] + offs
            return (
                (self.xmin[idx] <= px[qsel])
                & (self.xmax[idx] >= px[qsel])
                & (self.ymin[idx] <= py[qsel])
                & (self.ymax[idx] >= py[qsel])
            )

        return self._descend(np.arange(len(px), dtype=np.int64), test)

    # -- pair queries (dual descent) ----------------------------------

    def _expand_pairs(self, la, oa, lb, ob, other):
        """One dual-descent step: expand the deeper side (or A on ties
        for self-joins / A>=B for other-joins, matching rtree.rs:178-229)."""
        d = self.degree
        expand_a = la >= lb
        n_a = int(expand_a.sum())
        parts = []
        if n_a:
            ca = np.repeat(np.arange(d, dtype=np.int64)[None, :], n_a, axis=0)
            na_l = np.repeat(la[expand_a] - 1, d)
            na_o = (oa[expand_a][:, None] * d + ca).ravel()
            nb_l = np.repeat(lb[expand_a], d)
            nb_o = np.repeat(ob[expand_a], d)
            valid = na_o < (self.level_indices[na_l + 1] - self.level_indices[na_l])
            parts.append((na_l[valid], na_o[valid], nb_l[valid], nb_o[valid]))
        if n_a < len(la):
            sel = ~expand_a
            n_b = len(la) - n_a
            db = other.degree  # B side fans out with ITS degree
            cb = np.repeat(np.arange(db, dtype=np.int64)[None, :], n_b, axis=0)
            nb_l = np.repeat(lb[sel] - 1, db)
            nb_o = (ob[sel][:, None] * db + cb).ravel()
            na_l = np.repeat(la[sel], db)
            na_o = np.repeat(oa[sel], db)
            valid = nb_o < (other.level_indices[nb_l + 1] - other.level_indices[nb_l])
            parts.append((na_l[valid], na_o[valid], nb_l[valid], nb_o[valid]))
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
            np.concatenate([p[3] for p in parts]),
        )

    def _dual_descend(self, other: "PackedSegTree", self_join: bool):
        la = np.array([self.height], dtype=np.int64)
        oa = np.zeros(1, np.int64)
        lb = np.array([other.height], dtype=np.int64)
        ob = np.zeros(1, np.int64)

        out_a, out_b = [], []
        while len(la) > 0:
            ia = self.level_indices[la] + oa
            ib = other.level_indices[lb] + ob
            keep = (
                (self.xmin[ia] <= other.xmax[ib])
                & (self.xmax[ia] >= other.xmin[ib])
                & (self.ymin[ia] <= other.ymax[ib])
                & (self.ymax[ia] >= other.ymin[ib])
            )
            la, oa, lb, ob = la[keep], oa[keep], lb[keep], ob[keep]
            if len(la) == 0:
                break
            leaf = (la == 0) & (lb == 0)
            if leaf.any():
                pa, pb = oa[leaf], ob[leaf]
                if self_join:
                    m = pa < pb
                    pa, pb = pa[m], pb[m]
                out_a.append(pa)
                out_b.append(pb)
                la, oa, lb, ob = la[~leaf], oa[~leaf], lb[~leaf], ob[~leaf]
            if len(la) == 0:
                break
            la, oa, lb, ob = self._expand_pairs(la, oa, lb, ob, other)

        if not out_a:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_a), np.concatenate(out_b)

    def query_self_intersections(self):
        """Candidate leaf pairs (i<j) with intersecting envelopes.

        Parity: rtree.rs:158-196 (dual descent of the tree against
        itself; the reference expands side A when levels are equal and
        emits only offset_a < offset_b at the leaves).
        """
        if self.is_empty:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return self._dual_descend(self, self_join=True)

    def query_other_intersections(self, other: "PackedSegTree"):
        """Candidate leaf pairs between two trees (rtree.rs:198-233)."""
        if self.is_empty or other.is_empty:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return self._dual_descend(other, self_join=False)


def tree_add(tree: "PackedSegTree", max_size: int, xmin, ymin, xmax, ymax) -> bool:
    """Incremental append of one leaf, expanding ancestors along the
    right spine (parity: reference rtree.rs:93-117). Returns False when
    capacity is exceeded (the reference errors).

    The bulk builder covers every library call site (prepare() only uses
    new_loaded); this exists for reference-fixture parity and for
    "rebuild partition index incrementally" experiments. `tree` must
    have been created with `PackedSegTree.new(degree, max_size)`.
    """
    if tree.size >= max_size:
        return False
    level, offset = 0, tree.size
    exmin, eymin, exmax, eymax = float(xmin), float(ymin), float(xmax), float(ymax)
    while True:
        idx = int(tree.level_indices[level]) + offset
        exmin = min(exmin, tree.xmin[idx]) if not np.isnan(tree.xmin[idx]) else exmin
        eymin = min(eymin, tree.ymin[idx]) if not np.isnan(tree.ymin[idx]) else eymin
        exmax = max(exmax, tree.xmax[idx]) if not np.isnan(tree.xmax[idx]) else exmax
        eymax = max(eymax, tree.ymax[idx]) if not np.isnan(tree.ymax[idx]) else eymax
        tree.xmin[idx], tree.ymin[idx] = exmin, eymin
        tree.xmax[idx], tree.ymax[idx] = exmax, eymax
        if offset == 0:
            break
        if offset == 1:  # the parent needs the other child
            j = idx - 1
            exmin = min(exmin, tree.xmin[j]) if not np.isnan(tree.xmin[j]) else exmin
            eymin = min(eymin, tree.ymin[j]) if not np.isnan(tree.ymin[j]) else eymin
            exmax = max(exmax, tree.xmax[j]) if not np.isnan(tree.xmax[j]) else exmax
            eymax = max(eymax, tree.ymax[j]) if not np.isnan(tree.ymax[j]) else eymax
        offset //= tree.degree
        level += 1
    tree._current_level = level
    tree.size += 1
    return True


def tree_new(degree: int, max_size: int) -> "PackedSegTree":
    """Preallocated empty tree for incremental adds (rtree.rs:48-61)."""
    degree = max(2, int(degree))
    li = calculate_level_indices(degree, max_size)
    tree_size = int(li[-1]) + 1
    nanarr = lambda: np.full(tree_size, np.nan)
    t = PackedSegTree(degree, 0, li, nanarr(), nanarr(), nanarr(), nanarr())
    t._current_level = 0
    return t
