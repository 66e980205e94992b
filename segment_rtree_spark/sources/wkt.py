"""WKT ingest (reference src/from_wkt.rs re-expressed for table output).

Parses the reference's corpus format — geometries separated by blank
lines (benches/my_benchmark.rs:65-95) — into packed-array ring rows
(geom_id, part_id, xs, ys). Coordinate runs are parsed with
np.fromstring-style bulk conversion, not per-token Python floats.

Supported: POINT, MULTIPOINT, LINESTRING, MULTILINESTRING, POLYGON,
MULTIPOLYGON, EMPTY variants. Malformed input raises ValueError (the
reference returns Err strings, from_wkt.rs:44-60).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["parse_wkt", "parse_wkt_file_polygons", "read_wkt_rings"]

_TYPE_RE = re.compile(r"^\s*([A-Za-z]+)\s*(.*)$", re.S)


def _parse_coord_run(text: str) -> tuple[np.ndarray, np.ndarray]:
    """'x0 y0, x1 y1, ...' -> (xs, ys) float64 arrays (bulk conversion)."""
    flat = np.array(text.replace(",", " ").split(), dtype=np.float64)
    if len(flat) % 2 != 0:
        raise ValueError(f"odd coordinate count in WKT run: {text[:60]!r}")
    return flat[0::2], flat[1::2]


def _split_parens(body: str):
    """Split a '(...),(...),(...)' body into top-level paren groups."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def parse_wkt(text: str):
    """One WKT string -> (geom_type, parts) where parts is a list of
    (xs, ys) arrays (rings for polygons, lines for multilinestrings)."""
    m = _TYPE_RE.match(text.strip())
    if not m:
        raise ValueError(f"unparseable WKT: {text[:60]!r}")
    gtype = m.group(1).upper()
    body = m.group(2).strip()
    if body.upper() == "EMPTY":
        return gtype, []

    groups = _split_parens(body)
    if len(groups) != 1:
        raise ValueError(f"bad WKT body: {body[:60]!r}")
    outer = groups[0]  # contents of the outermost paren pair

    if gtype in ("POINT", "LINESTRING"):
        return gtype, [_parse_coord_run(outer)]
    if gtype == "MULTIPOINT":
        subs = _split_parens(outer)
        if subs:  # MULTIPOINT ((1 2), (3 4))
            return gtype, [_parse_coord_run(s) for s in subs]
        # bare form MULTIPOINT (1 2, 3 4): one part per point
        xs, ys = _parse_coord_run(outer)
        return gtype, [(xs[i : i + 1], ys[i : i + 1]) for i in range(len(xs))]
    if gtype in ("MULTILINESTRING", "POLYGON"):
        return gtype, [_parse_coord_run(s) for s in _split_parens(outer)]
    if gtype == "MULTIPOLYGON":
        return gtype, [
            [_parse_coord_run(r) for r in _split_parens(g)]
            for g in _split_parens(outer)
        ]
    raise ValueError(f"unsupported WKT type: {gtype}")


def parse_wkt_file_polygons(path: str):
    """Reference corpus file -> ring rows (polygon_id, part_id, xs, ys).

    Polygon shells and holes keep their part order; MULTIPOLYGON members
    become separate polygon ids (matching the bench reader's flatten,
    benches/my_benchmark.rs:72-95).
    """
    with open(path) as f:
        blob = f.read()
    rows = []
    pid = 0
    # geometries separated by blank lines OR starting on fresh lines
    chunks = re.split(
        r"(?m)^(?=(?:POLYGON|MULTIPOLYGON|POINT|LINESTRING|MULTIPOINT|MULTILINESTRING)\b)",
        blob,
    )
    for chunk in chunks:
        chunk = chunk.strip()
        if not chunk:
            continue
        gtype, parts = parse_wkt(chunk)
        if gtype == "POLYGON" and parts:
            for part_id, (xs, ys) in enumerate(parts):
                rows.append((pid, part_id, xs, ys))
            pid += 1
        elif gtype == "MULTIPOLYGON":
            for rings in parts:
                for part_id, (xs, ys) in enumerate(rings):
                    rows.append((pid, part_id, xs, ys))
                pid += 1
    return rows


def read_wkt_rings(spark, path: str):
    """WKT corpus -> Spark DataFrame of packed ring rows with envelope
    columns (top-level doubles so Catalyst can prune on bbox)."""
    import pandas as pd

    rows = parse_wkt_file_polygons(path)
    pdf = pd.DataFrame(
        {
            "polygon_id": [r[0] for r in rows],
            "part_id": [r[1] for r in rows],
            "xs": [r[2].tolist() for r in rows],
            "ys": [r[3].tolist() for r in rows],
            "xmin": [float(np.min(r[2])) for r in rows],
            "ymin": [float(np.min(r[3])) for r in rows],
            "xmax": [float(np.max(r[2])) for r in rows],
            "ymax": [float(np.max(r[3])) for r in rows],
        }
    )
    return spark.createDataFrame(pdf)
