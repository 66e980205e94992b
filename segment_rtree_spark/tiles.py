"""Hierarchical quadtree tile index (from-scratch H3/S2 stand-in).

No geo library exists in this environment (and the north rule demands a
from-scratch build), so the engine defines its own hierarchical cell
scheme over the lat/lng plate-carree plane:

  * resolution r in [0, 26]; the world splits into 4^r cells;
  * ix = floor((lng+180)/360 * 2^r), iy = floor((lat+90)/180 * 2^r)
    (clamped so lng=180 / lat=90 land in the last cell);
  * path = Morton interleave of (ix, iy), x in the odd (high) bit of
    each 2-bit quadrant digit;
  * cell id (int64) = path LEFT-ALIGNED to the res-26 grid, with the
    resolution in the low 5 bits:
        cell = (path << (2*(26-r) + 5)) | r
    Left-alignment gives the ANCESTOR-PREFIX property: for any res
    r' <= r, parent and child agree on all bits above 2*(26-r')+5, so
    `cell >> k` is a spatial prefix key independent of resolution —
    this is the cell-prefix partition column the north rule requires.

The SAME spec is emitted three ways so plans stay JVM-side and oracles
stay honest:
  * NumPy kernels (cell_of / cell_parent / cell_bounds / polyfill) for
    use inside pandas UDFs;
  * a SQL expression string (cell_of_sql) valid in BOTH Spark SQL and
    DuckDB (bitwise << >> & | are shared syntax) — tile assignment in
    Spark is a pure Catalyst expression, fully codegen'd, no Python;
  * cell_parent_sql for rollups.

Morton spreading uses the classic mask-doubling trick (public-domain
bit twiddling, cf. the interleave in reference
src/flatbush/hilbert.rs:124-132 which uses the same masks at 16 bits).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 26
_RES_BITS = 5
_RES_MASK = (1 << _RES_BITS) - 1

# 64-bit Morton spread masks (26 significant input bits)
_SPREAD_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

__all__ = [
    "MAX_RES",
    "cell_of",
    "cell_res",
    "cell_parent",
    "cell_children",
    "cell_bounds",
    "cell_prefix",
    "polyfill",
    "cell_of_sql",
    "cell_parent_sql",
    "cell_prefix_sql",
]


# ----------------------------------------------------------------------
# NumPy kernels
# ----------------------------------------------------------------------

def _spread(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    for shift, mask in _SPREAD_MASKS:
        v = (v | (v << shift)) & mask
    return v


def _unspread(v: np.ndarray) -> np.ndarray:
    v = v & 0x5555555555555555
    for shift, mask in reversed(_SPREAD_MASKS):
        v = (v | (v >> shift)) & (
            {16: 0x00000000FFFFFFFF, 8: 0x0000FFFF0000FFFF, 4: 0x00FF00FF00FF00FF,
             2: 0x0F0F0F0F0F0F0F0F, 1: 0x3333333333333333}[shift]
        )
    return v


def _grid_xy(lat, lng, res: int):
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    n = np.int64(1) << res
    ix = np.minimum(np.floor((lng + 180.0) / 360.0 * n), n - 1).astype(np.int64)
    iy = np.minimum(np.floor((lat + 90.0) / 180.0 * n), n - 1).astype(np.int64)
    ix = np.maximum(ix, 0)
    iy = np.maximum(iy, 0)
    return ix, iy


def cell_of(lat, lng, res: int):
    """Cell id of (lat, lng) at resolution res. Vectorized int64."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    ix, iy = _grid_xy(lat, lng, res)
    path = (_spread(ix) << 1) | _spread(iy)
    return (path << np.int64(2 * (MAX_RES - res) + _RES_BITS)) | np.int64(res)


def cell_res(cell):
    return np.asarray(cell, dtype=np.int64) & _RES_MASK


def cell_parent(cell, parent_res: int):
    """Ancestor cell at a coarser resolution (prefix truncation)."""
    cell = np.asarray(cell, dtype=np.int64)
    shift = np.int64(2 * (MAX_RES - parent_res) + _RES_BITS)
    return ((cell >> shift) << shift) | np.int64(parent_res)


def cell_children(cell):
    """The 4 children one resolution finer. Input scalar or array."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res = cell & _RES_MASK
    child_res = res + 1
    shift = 2 * (MAX_RES - child_res) + _RES_BITS
    base = (cell >> _RES_BITS) << _RES_BITS  # strip res bits (path is left-aligned)
    quads = np.arange(4, dtype=np.int64)
    return (base[:, None] | (quads[None, :] << shift[:, None])) | child_res[:, None]


def cell_grid_xy(cell):
    """Back out (res, ix, iy) from a cell id."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell & _RES_MASK
    path = cell >> (2 * (MAX_RES - res) + _RES_BITS)
    return res, _unspread(path >> 1), _unspread(path)


def cell_bounds(cell):
    """(lngmin, latmin, lngmax, latmax) of cells. Vectorized."""
    res, ix, iy = cell_grid_xy(cell)
    n = (np.int64(1) << res).astype(np.float64)
    lngmin = ix / n * 360.0 - 180.0
    latmin = iy / n * 180.0 - 90.0
    return lngmin, latmin, lngmin + 360.0 / n, latmin + 180.0 / n


def cell_prefix(cell, prefix_bits: int = 12):
    """Spatial partition key: top `prefix_bits` path bits, res-independent.

    The path's MSB sits at bit 2*MAX_RES + _RES_BITS - 1 = 56, so the
    top k path bits are `cell >> (57 - k)`.
    """
    return np.asarray(cell, dtype=np.int64) >> np.int64(
        2 * MAX_RES + _RES_BITS - prefix_bits
    )


def polyfill(polygon, res: int, mode: str = "intersect") -> np.ndarray:
    """Cells at `res` that intersect (or are contained in) a polygon.

    BFS refinement from res 0, the quadtree analog of the reference's
    tree descent (contained node -> emit whole subtree, cf. the clip
    descent in reference src/algorithms/clip.rs:81-107):

      * cell envelope disjoint from polygon envelope -> prune;
      * polygon boundary does not cross the cell and the cell center is
        interior -> the whole cell (and all its descendants) intersects:
        emit its descendants at target res without further tests;
      * at target res: keep if boundary crosses it or center inside;
      * else split into 4 children.

    `polygon` is a kernels.pip.PreparedPolygon. mode='intersect' emits
    every cell touching the polygon; mode='contained' only cells fully
    inside. Returns sorted unique int64 cell ids.
    """
    from .kernels.pip import points_in_polygon, EXTERIOR
    from .kernels.geom import rect_intersects

    rings = [polygon.shell] + list(polygon.holes)
    exmin, eymin, exmax, eymax = polygon.envelope()

    frontier = np.array([0], dtype=np.int64)  # the res-0 world cell
    out = []

    for r in range(0, res + 1):
        if len(frontier) == 0:
            break
        lngmin, latmin, lngmax, latmax = cell_bounds(frontier)
        # envelope prune (lng ~ x, lat ~ y)
        alive = rect_intersects(lngmin, latmin, lngmax, latmax, exmin, eymin, exmax, eymax)
        frontier = frontier[alive]
        if len(frontier) == 0:
            break
        lngmin, latmin, lngmax, latmax = (a[alive] for a in (lngmin, latmin, lngmax, latmax))

        # does any ring segment's envelope overlap each cell, with a true
        # Liang-Barsky refine? -> boundary-crossing cells
        crossed = np.zeros(len(frontier), dtype=bool)
        for ring in rings:
            q, s = ring.tree.query_rect(lngmin, latmin, lngmax, latmax)
            if len(q) == 0:
                continue
            from .kernels.geom import clip_segments

            hit, *_ = clip_segments(
                lngmin[q], latmin[q], lngmax[q], latmax[q],
                ring.xs[s], ring.ys[s], ring.xs[s + 1], ring.ys[s + 1],
            )
            np.logical_or.at(crossed, q[hit], True)

        cx = (lngmin + lngmax) / 2.0
        cy = (latmin + latmax) / 2.0
        center_in = points_in_polygon(cy * 0 + cx, cy, polygon) != EXTERIOR

        interior = ~crossed & center_in  # fully inside -> all descendants count
        touching = crossed | center_in

        if r == res:
            keep = interior if mode == "contained" else touching
            out.append(frontier[keep])
            break

        # fully-interior cells expand without further testing
        if interior.any():
            sub = frontier[interior]
            for _ in range(res - r):
                sub = cell_children(sub).ravel()
            out.append(sub)

        frontier = cell_children(frontier[crossed]).ravel()

    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


# ----------------------------------------------------------------------
# SQL expression generators (valid in Spark SQL AND DuckDB)
# ----------------------------------------------------------------------

def _spread_sql(v: str) -> str:
    expr = v
    for shift, mask in _SPREAD_MASKS:
        expr = f"((({expr}) | (({expr}) << {shift})) & {mask})"
    return expr


def cell_of_sql(lat: str, lng: str, res: int) -> str:
    """Pure-SQL cell_of — same closed form both engines, no UDF.

    In Spark this whole expression stays inside WholeStageCodegen; tile
    assignment of 10^12 rows is a scan-local projection with zero
    Python involvement.
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    n = 1 << res
    ix = f"greatest(0, least(cast(floor((({lng}) + 180.0) / 360.0 * {n}) as bigint), {n - 1}))"
    iy = f"greatest(0, least(cast(floor((({lat}) + 90.0) / 180.0 * {n}) as bigint), {n - 1}))"
    path = f"(({_spread_sql(ix)} << 1) | {_spread_sql(iy)})"
    return f"((({path}) << {2 * (MAX_RES - res) + _RES_BITS}) | {res})"


def cell_parent_sql(cell: str, parent_res: int) -> str:
    shift = 2 * (MAX_RES - parent_res) + _RES_BITS
    return f"(((({cell}) >> {shift}) << {shift}) | {parent_res})"


def cell_prefix_sql(cell: str, prefix_bits: int = 12) -> str:
    return f"(({cell}) >> {2 * MAX_RES + _RES_BITS - prefix_bits})"
