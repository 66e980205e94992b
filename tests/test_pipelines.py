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


def test_curate_checkpointed_kill_resume_matches_oneshot(spark, tmp_path):
    """Durable-checkpoint curation: a job killed after one batch and
    resumed must produce exactly the one-shot curate_images result,
    and the resume must NOT re-run completed keys."""
    from segment_rtree_spark.pipelines import (
        curate_images,
        curate_images_checkpointed,
    )
    from segment_rtree_spark.plans.entry_queries import entry_layer
    from segment_rtree_spark.synth import images_df_arith

    imgs = images_df_arith(spark, 600).cache()
    layer = entry_layer()
    root = str(tmp_path / "curate_ckpt")

    # simulated kill: only the first batch of keys commits
    done1, final1 = curate_images_checkpointed(
        imgs, layer, root, max_hamming=1, n_bands=2,
        keys_per_batch=4, max_batches=1,
    )
    assert final1 is None and done1 == 4

    # resume: completes the remaining keys only
    done2, final2 = curate_images_checkpointed(
        imgs, layer, root, max_hamming=1, n_bands=2, keys_per_batch=4,
    )
    assert final2 is not None

    oneshot = curate_images(imgs, layer, max_hamming=1, n_bands=2).toPandas()
    got = final2.toPandas()
    cols = ["image_id", "caption", "n_regions", "cluster_size"]
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = oneshot[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)

    # lineage: every key has exactly one progress row (no double work)
    from segment_rtree_spark.checkpoint import CheckpointJob

    prog = CheckpointJob(spark, "curate", root).progress().toPandas()
    assert prog["partition_key"].is_unique
    assert done2 == len(prog) - done1

    # idempotent third call: nothing left to do, result unchanged
    done3, final3 = curate_images_checkpointed(
        imgs, layer, root, max_hamming=1, n_bands=2,
    )
    assert done3 == 0
    assert final3.count() == len(got)


def test_curate_checkpointed_all_empty(spark, tmp_path):
    """Every key producing zero survivors must yield an EMPTY curated
    frame, not an unreadable output dir (ADVICE r3)."""
    from pyspark.sql import functions as F

    from segment_rtree_spark.pipelines import curate_images_checkpointed
    from segment_rtree_spark.plans.entry_queries import entry_layer
    from segment_rtree_spark.synth import images_df_arith

    imgs = images_df_arith(spark, 60, skew_frac=0.1).withColumn(
        "caption", F.lit("x")
    )
    done, curated = curate_images_checkpointed(
        imgs, entry_layer(), str(tmp_path / "job"), min_caption_tokens=99
    )
    assert curated is not None
    assert curated.count() == 0
    assert {"image_id", "caption", "n_regions", "cluster_size"} <= set(curated.columns)


def test_curate_drop_observation_surfaces_capped_buckets(spark):
    """r5 verdict item 3: a curation run can read what the armed
    max_bucket cap dropped FROM THE PIPELINE CALL itself — no
    separate stats job — and the unarmed default fills zeros eagerly
    (the AQE empty-relation-prune gotcha, see _cap_buckets)."""
    from pyspark.sql import Observation

    from segment_rtree_spark.pipelines import curate_images
    from segment_rtree_spark.plans.entry_queries import entry_layer
    from segment_rtree_spark.synth import HOT_CELL_LAT, HOT_CELL_LNG

    n = 40
    rows = [
        (f"img{i:03d}", "two tokens", (i << 32) | 0x0F0F0F0F,
         HOT_CELL_LNG, HOT_CELL_LAT)
        for i in range(n)
    ]
    imgs = spark.createDataFrame(
        rows, "image_id string, caption string, phash long, lng double, lat double"
    )
    layer = entry_layer()
    obs = Observation("curate_drops")
    got = curate_images(
        imgs, layer, max_hamming=1, n_bands=2,
        max_bucket=10, drop_observation=obs,
    ).collect()
    # all 40 DISTINCT hashes share the low-32 band-0 bucket (> cap
    # 10): that bucket drops whole; every band-1 bucket is a
    # singleton and survives, so no pairs form and each image stands
    # as its own cluster — and the drop is visible in-band
    assert obs.get == {"dropped_buckets": 1, "dropped_rows": 40}
    assert len(got) == n and all(r["cluster_size"] == 1 for r in got)

    # unarmed default: zeros fill at BUILD, before any action on the
    # curated frame, so observation.get cannot block
    obs2 = Observation("no_cap")
    curate_images(imgs, layer, max_hamming=1, n_bands=2, drop_observation=obs2)
    assert obs2.get == {"dropped_buckets": 0, "dropped_rows": 0}


def test_curate_checkpointed_threads_drop_observation(spark, tmp_path):
    """The checkpointed pipeline threads the same drop observability;
    filled when the cluster stage runs (job complete)."""
    from pyspark.sql import Observation

    from segment_rtree_spark.pipelines import curate_images_checkpointed
    from segment_rtree_spark.plans.entry_queries import entry_layer
    from segment_rtree_spark.synth import HOT_CELL_LAT, HOT_CELL_LNG

    rows = [
        (f"img{i:03d}", "two tokens", (i << 32) | 0x0F0F0F0F,
         HOT_CELL_LNG, HOT_CELL_LAT)
        for i in range(30)
    ]
    imgs = spark.createDataFrame(
        rows, "image_id string, caption string, phash long, lng double, lat double"
    )
    obs = Observation("ckpt_drops")
    done, curated = curate_images_checkpointed(
        imgs, entry_layer(), str(tmp_path), max_hamming=1, n_bands=2,
        max_bucket=10, drop_observation=obs,
    )
    assert curated is not None
    assert curated.count() == 30
    assert obs.get == {"dropped_buckets": 1, "dropped_rows": 30}
