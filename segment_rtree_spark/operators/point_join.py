"""Point<->point radius distance join and zonal statistics.

point_distance_join: every pair (a, b) with euclidean distance <=
radius, where BOTH sides are large point tables (neither broadcasts).
The classic grid-stencil plan: pick the coarsest grid whose cells are
at least `radius` wide, key both sides by integer grid coordinates,
explode ONE side by the 3x3 neighbor stencil, and equi-join — Catalyst
plans a plain shuffled hash join on (ix, iy); the exact distance
predicate refines pairs. No UDF anywhere: the whole operator is
codegen'd column arithmetic, and a DuckDB oracle reproduces it
bit-for-bit (identical floor/compare expression trees).

zonal_stats: per-polygon aggregation of the points a PIP join assigns
to it (the raster/vector "zonal statistics" shape): one broadcast PIP
join, one hash aggregate.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..layer import PolygonLayer
from .pip_join import pip_join_broadcast

__all__ = ["point_distance_join", "radius_res", "zonal_stats"]


def radius_res(radius: float, max_res: int = 20) -> int:
    """Coarsest grid resolution whose cell WIDTH and HEIGHT are both
    >= radius, so every pair within `radius` lands in the same or an
    adjacent (3x3) cell. Cells are 360/2^r x 180/2^r degrees."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    r = int(math.floor(math.log2(180.0 / radius))) if radius < 180.0 else 0
    return max(0, min(max_res, r))


def _grid_exprs(x: str, y: str, res: int):
    n = 1 << res
    ix = f"greatest(0, least(cast(floor((({x}) + 180.0) / 360.0 * {n}) as bigint), {n - 1}))"
    iy = f"greatest(0, least(cast(floor((({y}) + 90.0) / 180.0 * {n}) as bigint), {n - 1}))"
    return ix, iy


def point_distance_join(
    a: DataFrame,
    b: DataFrame,
    radius: float,
    a_id: str = "a_id",
    b_id: str = "b_id",
    x: str = "lng",
    y: str = "lat",
    res: int | None = None,
) -> DataFrame:
    """All pairs within `radius` (euclidean, coordinate units).

    Output: (a_id, b_id, dist). `a` and `b` must expose id columns
    named `a_id`/`b_id` plus x/y. The stencil explode multiplies the A
    side by 9 BEFORE its shuffle — the side with fewer rows should be
    passed as `a`."""
    if res is None:
        res = radius_res(radius)
    n = 1 << res
    aix, aiy = _grid_exprs("ax", "ay", res)
    bix, biy = _grid_exprs("bx", "by", res)

    sa = (
        a.select(a_id, F.col(x).alias("ax"), F.col(y).alias("ay"))
        .withColumn("ix0", F.expr(aix))
        .withColumn("iy0", F.expr(aiy))
        .withColumn("dx", F.explode(F.array(*[F.lit(v) for v in (-1, 0, 1)])))
        .withColumn("dy", F.explode(F.array(*[F.lit(v) for v in (-1, 0, 1)])))
        .withColumn("ix", F.col("ix0") + F.col("dx"))
        .withColumn("iy", F.col("iy0") + F.col("dy"))
        .filter((F.col("ix") >= 0) & (F.col("ix") < n) & (F.col("iy") >= 0) & (F.col("iy") < n))
        .drop("ix0", "iy0", "dx", "dy")
    )
    sb = (
        b.select(b_id, F.col(x).alias("bx"), F.col(y).alias("by"))
        .withColumn("ix", F.expr(bix))
        .withColumn("iy", F.expr(biy))
    )
    # explicit multiplication (not pow): bit-identical in both engines
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        sa.join(sb, ["ix", "iy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= float(radius) * float(radius))
        .select(a_id, b_id, F.sqrt(F.col("d2")).alias("dist"))
    )


def zonal_stats(
    points: DataFrame,
    layer: PolygonLayer,
    values: Sequence[str] = (),
    x: str = "lng",
    y: str = "lat",
) -> DataFrame:
    """Per-polygon statistics over contained/boundary points: count,
    boundary count, plus sum/min/max of each `values` column. One
    broadcast PIP join + one hash aggregate (partial aggregation
    map-side, so the shuffle carries polygon-count rows)."""
    joined = pip_join_broadcast(points, layer, x=x, y=y, keep=list(values))
    aggs = [
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.when(F.col("relation") == "boundary", 1).otherwise(0)).alias("n_boundary"),
    ]
    for v in values:
        aggs += [
            F.sum(v).alias(f"sum_{v}"),
            F.min(v).alias(f"min_{v}"),
            F.max(v).alias(f"max_{v}"),
        ]
    return joined.groupBy("polygon_id").agg(*aggs)
