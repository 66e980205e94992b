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

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, functions as F

from .layer import PolygonLayer
from .operators.dedup import phash_components
from .operators.pip_join import pip_join_broadcast

__all__ = ["curate_images", "curate_images_checkpointed"]


def curate_images(images: DataFrame, layer: PolygonLayer,
                  min_caption_tokens: int = 2,
                  max_hamming: int = 8,
                  how: str = "broadcast",
                  n_bands: int = 4,
                  materialize: bool = True,
                  hot_threshold: int | None = 4096,
                  max_bucket: int | None = None,
                  drop_observation=None,
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

    `max_bucket` / `drop_observation` thread to the near-dup band
    join (phash_components): pass a pyspark Observation and a 100 TB
    curation run can read dropped_buckets / dropped_rows directly
    from the pipeline call — filled EAGERLY at build (zeros when the
    cap is unarmed), so observation.get never blocks and never loses
    the metric to AQE empty-relation pruning (see _cap_buckets).
    dropped_rows counts DISTINCT phash values whose bucket exceeded
    the cap (the clustering runs over distinct hashes).
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
    # caption+phash ride THROUGH the PIP kernel (keep=), so the
    # survivor set is ONE groupBy on the hit stream — no join of the
    # point table back against its own aggregated hits (two shuffles +
    # a join became one shuffle; lat/lng are dead after the PIP and
    # are dropped here)
    keep = [id_col, caption, phash]
    if how == "broadcast":
        hits = pip_join_broadcast(narrow, layer, x=x, y=y, keep=keep)
    else:
        from .operators.pip_join import pip_join

        hits = pip_join(narrow, layer, how=how, x=x, y=y, keep=keep)
    # The survivor set feeds three consumers (clustering, the size agg,
    # and the final representative join); without materialization each
    # one would re-execute the PIP join. localCheckpoint runs it once
    # (on a cluster: .checkpoint() against the durable checkpoint dir).
    ok = (
        hits.groupBy(id_col)
        .agg(
            F.first(caption).alias(caption),
            F.first(phash).alias(phash),
            F.count(F.lit(1)).alias("n_regions"),
        )
        .filter(F.size(F.split(F.col(caption), " ")) >= min_caption_tokens)
    )
    if materialize:
        # (materialize=False keeps the full lineage — used by the plan
        # audit test to inspect the scan, and by callers who prefer
        # their own persistence strategy)
        ok = ok.localCheckpoint()
    comp = phash_components(
        ok, id_col=id_col, phash=phash, max_hamming=max_hamming, n_bands=n_bands,
        hot_threshold=hot_threshold, max_bucket=max_bucket,
        drop_observation=drop_observation,
    )
    return _keep_representatives(ok, comp, id_col, caption)


def _keep_representatives(ok: DataFrame, comp: DataFrame,
                          id_col: str, caption: str) -> DataFrame:
    """One representative per cluster with its cluster_size, in a
    single shuffle on the component key (window count) — the
    groupBy-sizes-then-rejoin formulation computed the component
    labelling twice (once for the representative join, once under the
    size aggregate; exchange reuse does not always cover both)."""
    from pyspark.sql import Window

    w = Window.partitionBy("component")
    return (
        ok.join(comp, id_col)
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .filter(F.col(id_col) == F.col("component"))
        .select(id_col, caption, "n_regions", "cluster_size")
    )


def curate_images_checkpointed(images: DataFrame, layer: PolygonLayer,
                               root: str, job_id: str = "curate",
                               min_caption_tokens: int = 2,
                               max_hamming: int = 8,
                               n_bands: int = 4,
                               hot_threshold: int | None = 4096,
                               max_bucket: int | None = None,
                               drop_observation=None,
                               res: int = 4,
                               keys_per_batch: int = 8,
                               max_batches: int | None = None,
                               id_col: str = "image_id",
                               caption: str = "caption",
                               phash: str = "phash",
                               x: str = "lng",
                               y: str = "lat"):
    """Durable, resumable curate_images: the north rule's per-partition
    checkpointing applied to the flagship composed pipeline.

    Two stages:
      1. SURVIVOR stage, resumable per spatial cell (CheckpointJob):
         work is keyed by the res-`res` quadtree cell of the geotag;
         each key batch runs the row-local part of the pipeline
         (narrow projection -> broadcast PIP -> n_regions -> caption
         filter) and its output commits atomically under the key's
         parquet partition with a progress/lineage row. A killed job
         re-runs only the keys with no progress row.
      2. CLUSTER stage, global: phash near-dup clustering + one
         representative per cluster over the (much smaller) survivor
         set read back from the checkpoint — clusters span cells, so
         this stage is inherently global; it is cheap relative to
         stage 1 and simply re-runs on resume.

    Returns (n_keys_processed, curated DataFrame | None): None while
    stage 1 is incomplete (resume by calling again with the same
    root/job_id; `max_batches` exists for tests to simulate a kill).
    Matches curate_images() exactly when complete.

    `max_bucket` / `drop_observation` behave as in curate_images, but
    the cluster stage (where the band join lives) only runs once
    stage 1 is complete — on an incomplete invocation the observation
    is NOT filled (observation.get would block), so read it only when
    the curated frame is returned.
    """
    from .checkpoint import CheckpointJob
    from .operators.tile_ops import assign_tiles

    spark = images.sparkSession
    narrow = assign_tiles(
        images.select(id_col, caption, phash, y, x), res=res, y=y, x=x
    )
    job = CheckpointJob(spark, job_id, root)

    def survivors(batch: DataFrame) -> DataFrame:
        # same one-shuffle shape as curate_images: payload rides the
        # kernel, survivors aggregate the hit stream (cell kept — it is
        # the checkpoint partition key)
        hits = pip_join_broadcast(
            batch, layer, x=x, y=y, keep=[id_col, caption, phash, "cell"]
        )
        return (
            hits.groupBy(id_col)
            .agg(
                F.first(caption).alias(caption),
                F.first(phash).alias(phash),
                F.first("cell").alias("cell"),
                F.count(F.lit(1)).alias("n_regions"),
            )
            .filter(F.size(F.split(F.col(caption), " ")) >= min_caption_tokens)
        )

    done = job.run(narrow, "cell", survivors,
                   keys_per_batch=keys_per_batch, max_batches=max_batches)
    # run() already computed the remaining key set — re-deriving it via
    # progress_remaining() would repeat the same distinct+collect pass
    # over the full input every invocation
    if job.remaining_keys:
        return done, None

    try:
        ok = job.output().drop("cell")
    except AnalysisException:
        # every key produced zero survivors: the output dir holds no
        # parquet files, so the read cannot infer a schema — the
        # correct result is an EMPTY curated frame, not an error
        # (schema from the transform's plan; no action runs). ONLY
        # AnalysisException means "nothing to read" — permissions,
        # corrupt footers, and transient FS failures propagate instead
        # of masquerading as an empty result
        ok = spark.createDataFrame(
            [], survivors(narrow.limit(0)).schema
        ).drop("cell")
    comp = phash_components(
        ok, id_col=id_col, phash=phash, max_hamming=max_hamming, n_bands=n_bands,
        hot_threshold=hot_threshold, max_bucket=max_bucket,
        drop_observation=drop_observation,
    )
    return done, _keep_representatives(ok, comp, id_col, caption)
