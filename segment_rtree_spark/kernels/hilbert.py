"""Vectorized 32-bit Hilbert curve index.

NumPy uint32 translation of the bit-twiddling Hilbert algorithm used by
the reference (jagill/segment-rtree src/flatbush/hilbert.rs:82-135,
itself a port of the public-domain rawrunprotected/hilbert_curves).
Doubles as the engine's spatial shuffle / range-partitioning key.

Goldens (FIXTURES.md F8): hilbert_normalized(12345, 67890) == 99_289_669;
scaled envelope (1,2)-(2,8) point (1.25,5) -> 805_306_368.
"""

from __future__ import annotations

import numpy as np

__all__ = ["hilbert_normalized", "HilbertScaler"]

_U16 = np.uint32(0xFFFF)
_MAXU32 = np.uint32(0xFFFFFFFF)


def hilbert_normalized(x, y):
    """Hilbert d-index of 16-bit grid coords, vectorized uint32.

    Parity: reference src/flatbush/hilbert.rs:82-135.
    """
    x = np.asarray(x, dtype=np.uint32)
    y = np.asarray(y, dtype=np.uint32)

    a = x ^ y
    b = _U16 ^ a
    c = _U16 ^ (x | y)
    d = x & (y ^ _U16)

    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d

    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = C ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = D ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))

    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = C ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = D ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))

    a, b, c, d = A, B, C, D
    C = C ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = D ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))

    a = C ^ (C >> 1)
    b = D ^ (D >> 1)

    i0 = x ^ y
    i1 = b | (_U16 ^ (i0 | a))

    i0 = (i0 | (i0 << 8)) & np.uint32(0x00FF00FF)
    i0 = (i0 | (i0 << 4)) & np.uint32(0x0F0F0F0F)
    i0 = (i0 | (i0 << 2)) & np.uint32(0x33333333)
    i0 = (i0 | (i0 << 1)) & np.uint32(0x55555555)

    i1 = (i1 | (i1 << 8)) & np.uint32(0x00FF00FF)
    i1 = (i1 | (i1 << 4)) & np.uint32(0x0F0F0F0F)
    i1 = (i1 | (i1 << 2)) & np.uint32(0x33333333)
    i1 = (i1 | (i1 << 1)) & np.uint32(0x55555555)

    return (i1 << 1) | i0


class HilbertScaler:
    """Scales an envelope to the 16-bit Hilbert grid.

    Parity: reference src/flatbush/hilbert.rs:13-74 — degenerate axes
    get scale 0 (all points map to grid 0 on that axis); out-of-range /
    missing positions map to u32::MAX via `safe_hilbert`.
    """

    __slots__ = ("xmin", "ymin", "xmax", "ymax", "x_min", "y_min", "x_scale", "y_scale")

    def __init__(self, xmin: float, ymin: float, xmax: float, ymax: float):
        self.xmin, self.ymin, self.xmax, self.ymax = xmin, ymin, xmax, ymax
        hilbert_max = float((1 << 16) - 1)
        empty = any(np.isnan(v) for v in (xmin, ymin, xmax, ymax))
        if empty or xmin == xmax:
            self.x_scale, self.x_min = 0.0, 0.0
        else:
            self.x_scale, self.x_min = hilbert_max / (xmax - xmin), xmin
        if empty or ymin == ymax:
            self.y_scale, self.y_min = 0.0, 0.0
        else:
            self.y_scale, self.y_min = hilbert_max / (ymax - ymin), ymin

    def hilbert(self, px, py):
        """Unchecked Hilbert keys (caller guarantees in-envelope)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        gx = np.floor(self.x_scale * (px - self.x_min)).astype(np.uint32)
        gy = np.floor(self.y_scale * (py - self.y_min)).astype(np.uint32)
        return hilbert_normalized(gx, gy)

    def safe_hilbert(self, px, py):
        """NaN or out-of-envelope points -> u32::MAX (hilbert.rs:57-62)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        ok = (
            (self.xmin <= px) & (px <= self.xmax) & (self.ymin <= py) & (py <= self.ymax)
        )
        gx = np.floor(self.x_scale * (np.where(ok, px, self.x_min) - self.x_min)).astype(
            np.uint32
        )
        gy = np.floor(self.y_scale * (np.where(ok, py, self.y_min) - self.y_min)).astype(
            np.uint32
        )
        return np.where(ok, hilbert_normalized(gx, gy), _MAXU32)


def hilbert_sql(gx: str, gy: str, dialect: str = "duckdb", carry: str = "") -> list:
    """Generate a SQL expression tree computing hilbert_normalized(gx, gy)
    for integer grid columns — the cross-engine oracle of the kernel.

    Chained subquery stages mirror the kernel's statement order exactly;
    integer ops on BIGINT never overflow (no additions, values < 2^32).
    dialect handles xor: Spark SQL uses `^`, DuckDB uses xor().
    """
    X = (lambda a, b: f"xor({a}, {b})") if dialect == "duckdb" else (
        lambda a, b: f"(({a}) ^ ({b}))"
    )

    stages = [f"select ({gx}) as x, ({gy}) as y from __T__"]
    stages.append(
        f"select x, y, {X('x','y')} as a, {X('65535', X('x','y'))} as b, "
        f"{X('65535','(x | y)')} as c, (x & {X('y','65535')}) as d from __T__"
    )
    stages.append(
        "select x, y, (a | (b >> 1)) as a2, " + X("(a >> 1)", "a") + " as b2, "
        + X(X("(c >> 1)", "(b & (d >> 1))"), "c") + " as c2, "
        + X(X("(a & (c >> 1))", "(d >> 1)"), "d") + " as d2 from __T__"
    )
    stages.append(
        "select x, y, "
        + X("(a2 & (a2 >> 2))", "(b2 & (b2 >> 2))") + " as a3, "
        + X("(a2 & (b2 >> 2))", "(b2 & (" + X("a2", "b2") + " >> 2))") + " as b3, "
        + X("c2", X("(a2 & (c2 >> 2))", "(b2 & (d2 >> 2))")) + " as c3, "
        + X("d2", X("(b2 & (c2 >> 2))", "((" + X("a2", "b2") + ") & (d2 >> 2))")) + " as d3 from __T__"
    )
    stages.append(
        "select x, y, "
        + X("(a3 & (a3 >> 4))", "(b3 & (b3 >> 4))") + " as a4, "
        + X("(a3 & (b3 >> 4))", "(b3 & (" + X("a3", "b3") + " >> 4))") + " as b4, "
        + X("c3", X("(a3 & (c3 >> 4))", "(b3 & (d3 >> 4))")) + " as c4, "
        + X("d3", X("(b3 & (c3 >> 4))", "((" + X("a3", "b3") + ") & (d3 >> 4))")) + " as d4 from __T__"
    )
    stages.append(
        "select x, y, "
        + X("c4", X("(a4 & (c4 >> 8))", "(b4 & (d4 >> 8))")) + " as C, "
        + X("d4", X("(b4 & (c4 >> 8))", "((" + X("a4", "b4") + ") & (d4 >> 8))")) + " as D from __T__"
    )
    stages.append(
        "select " + X("x", "y") + " as i0, "
        + "(" + X("D", "(D >> 1)") + " | "
        + X("65535", "((" + X("x", "y") + ") | (" + X("C", "(C >> 1)") + "))")
        + ") as i1 from __T__"
    )
    # interleave spreads
    def spread(v):
        e = v
        for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
            e = f"(({e} | ({e} << {shift})) & {mask})"
        return e

    stages.append(f"select ((({spread('i1')}) << 1) | ({spread('i0')})) as hkey from __T__")
    if carry:
        stages = [st.replace("select ", f"select {carry}, ", 1) for st in stages]
    return stages


def hilbert_sql_query(base: str, gx: str, gy: str, dialect: str, carry: str = "") -> str:
    """Fold the stages into one nested query over `base`."""
    q = base
    for st in hilbert_sql(gx, gy, dialect, carry=carry):
        q = st.replace("__T__", f"({q})")
    return q
