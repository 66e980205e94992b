"""PolygonLayer: the prepared/broadcastable polygon side of every join.

Mirrors the reference's Raw -> Prepared -> Validated typestate pipeline
(src/geometry_state.rs, src/line_string.rs:34-44) at TABLE altitude:
a layer is a list of polygons whose rings carry packed segment trees,
plus a layer-level envelope index (the reference's Flatbush,
src/flatbush/flatbush_impl.rs:40-63: Hilbert-sort by envelope center,
then bottom-up pack — here reusing PackedSegTree for the packing).

Small layers broadcast whole (sc.broadcast of the NumPy packs); large
layers ship as the exploded (polygon_id, cell) cover table for the
cell-partitioned join path. Both paths produce identical output rows
(asserted in tests — the broadcast==partitioned equality gate).
"""

from __future__ import annotations

import numpy as np

from .kernels.hilbert import HilbertScaler
from .kernels.pip import PreparedPolygon, PreparedRing, points_in_polygon
from .kernels.segtree import PackedSegTree
from .tiles import polyfill

__all__ = ["PolygonLayer"]


class PolygonLayer:
    """Prepared polygon collection + envelope index.

    polygons: list[PreparedPolygon]; ids: int64 array of polygon ids.
    The envelope index keeps Hilbert-sorted order with a permutation
    back to layer positions (the reference Flatbush's node_indices,
    flatbush_impl.rs:15-21).
    """

    def __init__(self, ids, polygons, hilbert_sort: bool = True, degree: int = 16):
        self.ids = np.asarray(ids, dtype=np.int64)
        self.polygons = list(polygons)
        envs = np.array([p.envelope() for p in self.polygons], dtype=np.float64)
        if len(envs) == 0:
            envs = np.empty((0, 4))
        self.xmin, self.ymin, self.xmax, self.ymax = (envs.T if len(envs) else (np.empty(0),) * 4)

        if hilbert_sort and len(self.polygons) > 1:
            exmin, eymin = self.xmin.min(), self.ymin.min()
            exmax, eymax = self.xmax.max(), self.ymax.max()
            scaler = HilbertScaler(exmin, eymin, exmax, eymax)
            keys = scaler.hilbert((self.xmin + self.xmax) / 2, (self.ymin + self.ymax) / 2)
            self.order = np.argsort(keys, kind="stable").astype(np.int64)
        else:
            self.order = np.arange(len(self.polygons), dtype=np.int64)

        self.index = PackedSegTree.build(
            self.xmin[self.order], self.ymin[self.order],
            self.xmax[self.order], self.ymax[self.order], degree=degree,
        )

        # ring arena: every ring (shells + holes) in one packed node
        # space so PIP refinement is one batched descent per point batch
        from .kernels.pip import RingArena

        rings = []
        self.shell_ring = np.empty(len(self.polygons), np.int64)
        hole_rings = []
        hole_off = [0]
        for i, poly in enumerate(self.polygons):
            self.shell_ring[i] = len(rings)
            rings.append(poly.shell)
            for h in poly.holes:
                hole_rings.append(len(rings))
                rings.append(h)
            hole_off.append(len(hole_rings))
        self.arena = RingArena(rings, degree=degree)
        self.hole_ring_idx = np.asarray(hole_rings, dtype=np.int64)
        self.hole_off = np.asarray(hole_off, dtype=np.int64)

    # -- construction -------------------------------------------------

    @classmethod
    def from_ring_rows(cls, rows, degree: int = 16, hilbert_sort: bool = True):
        """rows: iterable of (polygon_id, part_id, xs, ys); part 0 = shell."""
        grouped: dict[int, list] = {}
        for pid, part, xs, ys in rows:
            grouped.setdefault(int(pid), []).append((int(part), xs, ys))
        ids, polys = [], []
        for pid in sorted(grouped):
            parts = sorted(grouped[pid], key=lambda t: t[0])
            rings = [(np.asarray(xs, np.float64), np.asarray(ys, np.float64)) for _, xs, ys in parts]
            ids.append(pid)
            polys.append(PreparedPolygon.from_arrays(rings, degree=degree))
        return cls(ids, polys, hilbert_sort=hilbert_sort, degree=degree)

    @classmethod
    def from_wkt_file(cls, path: str, degree: int = 16):
        """Load polygons from a reference-style WKT corpus file."""
        from .sources.wkt import parse_wkt_file_polygons

        return cls.from_ring_rows(parse_wkt_file_polygons(path), degree=degree)

    def __len__(self):
        return len(self.polygons)

    # -- query --------------------------------------------------------

    def candidates(self, px, py):
        """Envelope-index probe: (point_idx, layer_pos) candidate pairs."""
        q, s = self.index.query_point(px, py)
        return q, self.order[s]

    def pip(self, px, py, emit_exterior: bool = False):
        """Full PIP of a point batch against the whole layer.

        Returns (point_idx, polygon_id, relation int8) arrays for pairs
        with relation != exterior (unless emit_exterior). Candidate
        pruning via the envelope index, then ONE arena descent for all
        shell pairs and one for all hole pairs — kernel cost scales
        with pair count, not polygon count.

        Hole combination is order-free (any hole Interior -> Exterior,
        else any hole Boundary -> Boundary), equivalent to the
        reference's first-hole-wins loop on VALID polygons (two holes
        of a valid polygon cannot both claim a point except at a shared
        touch point, where both say Boundary).
        """
        from .kernels.pip import BOUNDARY, EXTERIOR, INTERIOR

        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        q, pos = self.candidates(px, py)
        if len(q) == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int8))

        rel = self.arena.query_pairs(px, py, q, self.shell_ring[pos])

        n_holes = self.hole_off[pos + 1] - self.hole_off[pos]
        need = (rel == INTERIOR) & (n_holes > 0)
        if need.any():
            sel = np.nonzero(need)[0]
            cnt = n_holes[sel]
            rep = np.repeat(sel, cnt)
            # ragged gather of each polygon's hole-ring indices
            starts = self.hole_off[pos[sel]]
            within = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt
            )
            hrings = self.hole_ring_idx[np.repeat(starts, cnt) + within]
            hrel = self.arena.query_pairs(px, py, q[rep], hrings)
            hmax = np.zeros(len(q), np.int8)
            np.maximum.at(hmax, rep, hrel)
            rel = np.where(hmax == INTERIOR, EXTERIOR, np.where(hmax == BOUNDARY, BOUNDARY, rel)).astype(np.int8)

        keep = slice(None) if emit_exterior else rel != 0
        return q[keep], self.ids[pos[keep]], rel[keep]

    def cover_cells(self, res: int):
        """(polygon_id, cell) cover rows at resolution res — the equi-join
        side of the partitioned PIP path."""
        pids, cells = [], []
        for pid, poly in zip(self.ids, self.polygons):
            cs = polyfill(poly, res)
            pids.append(np.full(len(cs), pid, np.int64))
            cells.append(cs)
        if not pids:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(pids), np.concatenate(cells)

    def by_id(self, pid: int) -> PreparedPolygon:
        # lazy id->position map: per-pair lookups (overlap join, cover
        # build) would otherwise linear-scan the id array per call
        m = getattr(self, "_id_pos", None)
        if m is None:
            m = {int(i): k for k, i in enumerate(self.ids)}
            self._id_pos = m
        return self.polygons[m[int(pid)]]
