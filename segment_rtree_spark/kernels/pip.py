"""Batched winding-number point-in-polygon over packed segment R-trees.

The flagship kernel: classifies a whole ARRAY of points against one
ring / polygon per call with a level-synchronous frontier descent —
no per-point Python. Behavioral parity with the reference
(jagill/segment-rtree):

  * 3-valued result (exterior / boundary / interior):
      src/algorithms/point_in_polygon.rs:5-10
  * envelope pre-reject:                      point_in_polygon.rs:27-29
  * check_point_rect (in rect or left of it): point_in_polygon.rs:77-79
  * Claim-1 monotone-chain shortcut — a node wholly right of the point
    contributes the winding number of the single VIRTUAL segment
    coords[low] -> coords[high]:              point_in_polygon.rs:42-51,
    proof in reference segment_rtree.md:56-83
  * leaf winding with Boundary early-exit:    point_in_polygon.rs:52-58
  * hole logic (in-hole -> Exterior, on-hole -> Boundary):
      point_in_polygon.rs:12-24

Relation encoding: int8 0=exterior, 1=boundary, 2=interior
(RELATION_NAMES maps to the string column used at table level).
"""

from __future__ import annotations

import numpy as np

from .geom import winding_position, WN_ON, WN_LEFT, WN_RIGHT
from .segtree import PackedSegTree

__all__ = [
    "EXTERIOR",
    "BOUNDARY",
    "INTERIOR",
    "RELATION_NAMES",
    "PreparedRing",
    "PreparedPolygon",
    "points_in_ring",
    "points_in_polygon",
]

EXTERIOR = np.int8(0)
BOUNDARY = np.int8(1)
INTERIOR = np.int8(2)
RELATION_NAMES = np.array(["exterior", "boundary", "interior"])


class PreparedRing:
    """A closed ring with its packed segment tree (Prepared/Validated state).

    Mirrors LinearRing<Prepared> (reference src/linear_ring.rs,
    src/line_string.rs:34-44): coords + degree-16 SegRTree built over
    the ring's segments in chain order.
    """

    __slots__ = ("xs", "ys", "tree")

    def __init__(self, xs, ys, degree: int = 16):
        self.xs = np.ascontiguousarray(xs, dtype=np.float64)
        self.ys = np.ascontiguousarray(ys, dtype=np.float64)
        if len(self.xs) < 3 or self.xs[0] != self.xs[-1] or self.ys[0] != self.ys[-1]:
            raise ValueError("ring must be closed with >= 3 distinct coordinates")
        self.tree = PackedSegTree.from_coords(self.xs, self.ys, degree=degree)

    def envelope(self):
        return self.tree.envelope()


class PreparedPolygon:
    """Shell + holes, each a PreparedRing (reference src/polygon.rs:7-26)."""

    __slots__ = ("shell", "holes")

    def __init__(self, shell: PreparedRing, holes=()):
        self.shell = shell
        self.holes = list(holes)

    @classmethod
    def from_arrays(cls, rings, degree: int = 16):
        """rings: iterable of (xs, ys); first is the shell."""
        rings = [PreparedRing(xs, ys, degree=degree) for xs, ys in rings]
        return cls(rings[0], rings[1:])

    def envelope(self):
        return self.shell.envelope()


def points_in_ring(px, py, ring: PreparedRing) -> np.ndarray:
    """Batched point_in_loop (parity: point_in_polygon.rs:26-74).

    Returns int8[len(px)] relations. Level-synchronous frontier:
    each iteration classifies every live (point, node) pair at once —
    right-of-point shortcut / leaf winding / child expansion are all
    vectorized masks; winding sums accumulate via np.add.at.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(px)
    out = np.full(n, EXTERIOR, dtype=np.int8)
    if n == 0 or ring.tree.is_empty:
        return out

    xmin, ymin, xmax, ymax = ring.envelope()
    live = (xmin <= px) & (px <= xmax) & (ymin <= py) & (py <= ymax)
    if not live.any():
        return out

    t = ring.tree
    xs, ys = ring.xs, ring.ys
    wn = np.zeros(n, dtype=np.int64)
    boundary = np.zeros(n, dtype=bool)

    # frontier: (point id, node offset) at the current level
    pid = np.nonzero(live)[0].astype(np.int64)
    level = t.height
    # root check_point_rect: x <= xmax && ymin <= y <= ymax
    ridx = int(t.level_indices[level])
    keep = (
        (px[pid] <= t.xmax[ridx]) & (py[pid] >= t.ymin[ridx]) & (py[pid] <= t.ymax[ridx])
    )
    pid = pid[keep]
    off = np.zeros(len(pid), np.int64)
    d = t.degree

    while len(pid) > 0:
        idx = t.level_indices[level] + off
        # Claim-1 shortcut: node strictly right of the point -> winding
        # of virtual segment coords[low] -> coords[high]
        right = t.xmin[idx] > px[pid]
        if right.any():
            rp = pid[right]
            low, high = t.get_low_high(level, off[right])
            w = winding_position(px[rp], py[rp], xs[low], ys[low], xs[high], ys[high])
            np.add.at(wn, rp[w == WN_LEFT], 1)
            np.add.at(wn, rp[w == WN_RIGHT], -1)
            # WN_ON is unreachable here (point strictly left of node)
            pid, off = pid[~right], off[~right]
            if len(pid) == 0:
                break

        if level == 0:
            w = winding_position(px[pid], py[pid], xs[off], ys[off], xs[off + 1], ys[off + 1])
            boundary[pid[w == WN_ON]] = True
            np.add.at(wn, pid[w == WN_LEFT], 1)
            np.add.at(wn, pid[w == WN_RIGHT], -1)
            break

        # expand children passing check_point_rect
        child_level = level - 1
        cp = np.repeat(pid, d)
        co = (off[:, None] * d + np.arange(d, dtype=np.int64)).ravel()
        cap = int(t.level_indices[child_level + 1]) - int(t.level_indices[child_level])
        valid = co < cap
        cp, co = cp[valid], co[valid]
        cidx = t.level_indices[child_level] + co
        keep = (
            (px[cp] <= t.xmax[cidx]) & (py[cp] >= t.ymin[cidx]) & (py[cp] <= t.ymax[cidx])
        )
        # drop points already known to be on the boundary
        keep &= ~boundary[cp]
        pid, off = cp[keep], co[keep]
        level = child_level

    out[(wn != 0) & ~boundary] = INTERIOR
    out[boundary] = BOUNDARY
    return out


def points_in_polygon(px, py, polygon: PreparedPolygon) -> np.ndarray:
    """Batched point_in_polygon (parity: point_in_polygon.rs:12-24).

    Shell relation first; only shell-Interior points consult holes:
    hole-Interior flips to Exterior, hole-Boundary to Boundary.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    rel = points_in_ring(px, py, polygon.shell)
    interior = rel == INTERIOR
    if interior.any() and polygon.holes:
        sel = np.nonzero(interior)[0]
        for hole in polygon.holes:
            if len(sel) == 0:
                break
            hrel = points_in_ring(px[sel], py[sel], hole)
            rel[sel[hrel == INTERIOR]] = EXTERIOR
            rel[sel[hrel == BOUNDARY]] = BOUNDARY
            # points still Interior w.r.t. the polygon keep checking holes
            sel = sel[hrel == EXTERIOR]
    return rel
