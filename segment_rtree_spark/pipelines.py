"""End-to-end training-data curation pipelines.

The composition layer: each stage is an operator this engine already
oracles individually (tile/PIP region filter, caption filters, phash
near-dup clustering); `curate_images` chains them in the order a
100 TB curation job runs them — cheap row-local filters first, the
clustering join last over the already-reduced survivor set.

Plan shape at scale: the PIP region filter is a broadcast join (zero
image-side shuffle), the caption filter is pure Catalyst, and the
near-dup stage shuffles only the REGION-PASSING subset on the 64-bit
phash (distinct-value collapse first, so degenerate corpora stay
linear) — the full-width image bytes are never shuffled at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .layer import PolygonLayer
from .operators.dedup import phash_components
from .operators.pip_join import pip_join_broadcast

__all__ = ["curate_images"]


def curate_images(images: DataFrame, layer: PolygonLayer,
                  min_caption_tokens: int = 2,
                  max_hamming: int = 8,
                  how: str = "broadcast",
                  n_bands: int = 4,
                  materialize: bool = True,
                  id_col: str = "image_id",
                  caption: str = "caption",
                  phash: str = "phash",
                  x: str = "lng",
                  y: str = "lat") -> DataFrame:
    """Region filter -> caption filter -> near-dup cluster -> keep one
    representative per cluster.

    Returns the curated set: (id_col, caption, n_regions,
    cluster_size) where n_regions counts containing/boundary polygons
    and cluster_size is how many surviving images the kept
    representative stands for (1 = unique).

    `how` selects the PIP strategy like SpatialFrame.pip_join:
    'broadcast' (default — layer pack ships to executors, zero
    image-side shuffle), 'partitioned' (cell-cover equi-join for
    layers too big to broadcast), or 'auto'. Column names default to
    the input_hint schema (image_id, caption, phash, lng, lat) and
    thread through to the composed operators.
    """
    # Narrow projection FIRST: nothing downstream needs the pixel
    # bytes, and projecting here keeps every subsequent shuffle at a
    # few dozen bytes/row instead of the full payload (at the scan,
    # parquet column pruning makes this free).
    narrow = images.select(id_col, caption, phash, y, x)
    if how == "auto":
        import pickle

        from .frame import BROADCAST_LIMIT_BYTES

        how = (
            "broadcast"
            if len(pickle.dumps(layer)) <= BROADCAST_LIMIT_BYTES
            else "partitioned"
        )
    if how == "broadcast":
        hits = pip_join_broadcast(narrow, layer, x=x, y=y, keep=[id_col])
    else:
        from .operators.pip_join import pip_join

        hits = pip_join(narrow, layer, how=how, x=x, y=y, keep=[id_col])
    nreg = hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_regions"))
    # The survivor set feeds three consumers (clustering, the size agg,
    # and the final representative join); without materialization each
    # one would re-execute the PIP join. localCheckpoint runs it once
    # (on a cluster: .checkpoint() against the durable checkpoint dir).
    ok = (
        narrow.join(nreg, id_col)
        .filter(F.size(F.split(F.col(caption), " ")) >= min_caption_tokens)
    )
    if materialize:
        # (materialize=False keeps the full lineage — used by the plan
        # audit test to inspect the scan, and by callers who prefer
        # their own persistence strategy)
        ok = ok.localCheckpoint()
    comp = phash_components(
        ok, id_col=id_col, phash=phash, max_hamming=max_hamming, n_bands=n_bands
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        ok.join(comp, id_col)
        .filter(F.col(id_col) == F.col("component"))
        .join(sizes, "component")
        .select(id_col, caption, "n_regions", "cluster_size")
    )
