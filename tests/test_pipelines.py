"""End-to-end curation pipeline invariants (stage composition; each
stage's value-level correctness is oracled via the curate_images
registry query)."""

from pyspark.sql import functions as F


def test_curate_images_invariants(spark):
    from segment_rtree_spark.pipelines import curate_images
    from segment_rtree_spark.plans.entry_queries import entry_layer
    from segment_rtree_spark.synth import images_df_arith

    imgs = images_df_arith(spark, 600, skew_frac=0.1)
    layer = entry_layer()
    out = curate_images(imgs, layer, max_hamming=1).collect()
    assert out, "curation must keep at least one representative"

    # representatives only, each with >=1 containing region
    assert all(r["n_regions"] >= 1 for r in out)
    # cluster sizes account for exactly the region-passing survivors
    from segment_rtree_spark.operators.pip_join import pip_join_broadcast

    n_pass = (
        pip_join_broadcast(imgs, layer, keep=["image_id"])
        .select("image_id").distinct().count()
    )
    assert sum(r["cluster_size"] for r in out) == n_pass
    # keeping only representatives means ids are unique
    ids = [r["image_id"] for r in out]
    assert len(ids) == len(set(ids))


def test_curate_images_partitioned_equals_broadcast(spark):
    """The curation output is strategy-invariant: the partitioned PIP
    path (the too-big-to-broadcast layer shape) produces exactly the
    broadcast result."""
    from segment_rtree_spark.pipelines import curate_images
    from segment_rtree_spark.plans.entry_queries import entry_layer
    from segment_rtree_spark.synth import images_df_arith

    imgs = images_df_arith(spark, 400, skew_frac=0.1)
    layer = entry_layer()
    a = sorted(map(tuple, curate_images(imgs, layer, max_hamming=1).collect()))
    b = sorted(map(tuple, curate_images(
        imgs, layer, max_hamming=1, how="partitioned").collect()))
    assert a == b
