"""Point-in-polygon join: the engine's flagship operator.

Two physical strategies, identical output rows (tested):

* broadcast ('broadcast'): the whole PolygonLayer pack (NumPy arrays)
  ships to executors via sc.broadcast; the probe side streams through
  mapInPandas, each Arrow batch probed against the layer's envelope
  index then refined by the batched winding kernel. Zero shuffle of
  the (big) point side — the 10^12-row path when the layer fits in
  executor memory. This is the Spark analog of the reference lifecycle
  point_in_polygon.rs:12-74 with the envelope prefilter as the
  candidate join.

* cell-partitioned ('partitioned'): points get a quadtree cell id via
  a pure Catalyst expression (no UDF); polygons polyfill to a
  (polygon_id, cell) cover table; the bbox theta-join becomes a cell
  EQUI-join Catalyst can hash-partition, then the winding kernel
  refines per matched pair group. Optional hot-cell salting: cells
  whose point-count exceeds a threshold are split into n_salt
  sub-keys (points pick a salt by id hash, cover rows explode all
  salts) so one hot city doesn't pin a single reducer — the skew
  answer the north rule requires on top of AQE.

Semantics: emits (point passthrough cols..., polygon_id, relation) for
relation in {'interior','boundary'}; exterior pairs are dropped (use
emit_exterior for the 3-valued relation of every candidate pair).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels.pip import RELATION_NAMES
from ..layer import PolygonLayer
from ..tiles import cell_of_sql

__all__ = ["pip_join_broadcast", "pip_join_partitioned", "pip_join"]


def _result_schema(points: DataFrame, keep: Sequence[str]) -> str:
    by_name = {f.name: f.dataType.simpleString() for f in points.schema.fields}
    fields = [f"{c} {by_name[c]}" for c in keep]
    return ", ".join(fields + ["polygon_id long", "relation string"])


def pip_join_broadcast(
    points: DataFrame,
    layer: PolygonLayer,
    x: str = "lng",
    y: str = "lat",
    keep: Sequence[str] | None = None,
    emit_exterior: bool = False,
) -> DataFrame:
    """Broadcast PIP join; see module docstring."""
    keep = list(keep) if keep is not None else [c for c in points.columns]
    schema = _result_schema(points, keep)
    spark = points.sparkSession
    blayer = spark.sparkContext.broadcast(layer)
    # column-prune BEFORE the UDF: mapInPandas ships every input column
    # through Arrow, so an unpruned image table would drag its pixel
    # blobs through the kernel for an id-only join output
    points = points.select(*dict.fromkeys([*keep, x, y]))

    def kernel(batches):
        lyr = blayer.value
        for pdf in batches:
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            qi, pid, rel = lyr.pip(px, py, emit_exterior=emit_exterior)
            out = pdf.iloc[qi][keep].reset_index(drop=True)
            out["polygon_id"] = pid
            out["relation"] = RELATION_NAMES[rel]
            yield out

    return points.mapInPandas(kernel, schema)


def pip_join_partitioned(
    points: DataFrame,
    layer: PolygonLayer,
    x: str = "lng",
    y: str = "lat",
    keep: Sequence[str] | None = None,
    emit_exterior: bool = False,
    res: int = 7,
    salt_threshold: int | None = None,
    n_salt: int = 8,
) -> DataFrame:
    """Cell-partitioned PIP join; see module docstring.

    The polygon side ships per-cell: every matched (cell) group refines
    points only against the polygons covering that cell. `res` trades
    cover-table size against candidate selectivity.
    """
    keep = list(keep) if keep is not None else [c for c in points.columns]
    schema = _result_schema(points, keep)
    spark = points.sparkSession
    points = points.select(*dict.fromkeys([*keep, x, y]))  # prune pre-UDF

    pids, cells = layer.cover_cells(res)
    cover = spark.createDataFrame(
        pd.DataFrame({"polygon_id": pids, "cell": cells})
    )
    blayer = spark.sparkContext.broadcast(layer)

    pts = points.withColumn("cell", F.expr(cell_of_sql(y, x, res)))

    join_keys = ["cell"]
    if salt_threshold is not None:
        # hot-cell detection: cheap pre-agg on the point side
        hot = (
            pts.groupBy("cell").count().filter(F.col("count") > salt_threshold).select("cell")
        )
        hot_cells = {r["cell"] for r in hot.collect()}
        if hot_cells:
            hot_arr = F.array(*[F.lit(c) for c in hot_cells])
            pts = pts.withColumn(
                "salt",
                F.when(
                    F.array_contains(hot_arr, F.col("cell")),
                    F.pmod(F.xxhash64(*[F.col(c) for c in keep[:1]]), F.lit(n_salt)),
                ).otherwise(F.lit(0)),
            )
            salts = spark.range(n_salt).select(F.col("id").alias("salt"))
            cover = (
                cover.join(salts, F.array_contains(hot_arr, cover["cell"]), "left")
                .fillna({"salt": 0})
                .withColumn("salt", F.col("salt").cast("long"))
            )
            join_keys = ["cell", "salt"]
        else:
            pts = pts.withColumn("salt", F.lit(0))
            cover = cover.withColumn("salt", F.lit(0).cast("long"))
            join_keys = ["cell", "salt"]

    matched = pts.join(F.broadcast(cover), join_keys, "inner")

    def kernel(batches):
        lyr = blayer.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs = []
            for pid, grp in pdf.groupby("polygon_id", sort=False):
                poly = lyr.by_id(int(pid))
                from ..kernels.pip import points_in_polygon

                rel = points_in_polygon(
                    grp[x].to_numpy(dtype=np.float64),
                    grp[y].to_numpy(dtype=np.float64),
                    poly,
                )
                m = slice(None) if emit_exterior else rel != 0
                out = grp.iloc[np.arange(len(grp))[m] if not isinstance(m, slice) else m][keep]
                out = out.reset_index(drop=True)
                out["polygon_id"] = int(pid)
                out["relation"] = RELATION_NAMES[rel[m]]
                outs.append(out)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return matched.mapInPandas(kernel, schema)


def pip_join(
    points: DataFrame,
    layer: PolygonLayer,
    how: str = "broadcast",
    **kw,
) -> DataFrame:
    if how == "broadcast":
        kw.pop("res", None)
        kw.pop("salt_threshold", None)
        kw.pop("n_salt", None)
        return pip_join_broadcast(points, layer, **kw)
    if how == "partitioned":
        return pip_join_partitioned(points, layer, **kw)
    raise ValueError(f"how must be 'broadcast' or 'partitioned', got {how!r}")
