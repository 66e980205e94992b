"""Standing evidence for checkpointed curation at scale: run
curate_images_checkpointed over a 3M-image synthetic table, kill it at
~50% of keys (max_batches), resume to completion, assert the resumed
output EQUALS the one-shot curate_images result, and record the
resume's skipped-key savings. Writes BENCH/curate_checkpoint.json.

The kill/resume equality pytest runs at toy scale (600 images); this
records the same contract at the scale the north rule cares about,
with wall-clock evidence that a resume pays only for the remaining
keys (the whole point of per-partition checkpointing on a 100 TB
input).

Usage: python tools/curate_checkpoint_bench.py [n_images]
"""

import json
import os
import shutil
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

ROOT = "/tmp/spark_graft_curate_ckpt"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000

    from pyspark.sql import functions as F

    from segment_rtree_spark.pipelines import (
        curate_images,
        curate_images_checkpointed,
    )
    from segment_rtree_spark.session import get_spark
    from segment_rtree_spark.layer import PolygonLayer
    from segment_rtree_spark.synth import images_df_fast

    spark = get_spark(cores=32, app="curate-ckpt-bench")
    spark.sparkContext.setLogLevel("ERROR")

    wkt = os.path.join(REPO, "data", "wkt", "africa.wkt")
    layer = PolygonLayer.from_wkt_file(wkt)
    imgs = (
        images_df_fast(spark, n, skew_frac=0.1)
        .withColumn("lng", F.col("lng") / 360.0 * 75.0 + 17.0)
        .withColumn("lat", F.col("lat") / 180.0 * 80.0 + 1.5)
        .cache()
    )
    imgs.count()

    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)

    # discover the key count first (res-4 cells over africa's window)
    # via a dry sizing identical to the job's own key derivation
    kw = dict(max_hamming=1, n_bands=2, res=4, keys_per_batch=8)

    t0 = time.time()
    done1, final1 = curate_images_checkpointed(
        imgs, layer, ROOT, max_batches=2, **kw
    )
    wall_killed = round(time.time() - t0, 2)
    assert final1 is None, "kill point must leave the job incomplete"

    t0 = time.time()
    done2, final2 = curate_images_checkpointed(imgs, layer, ROOT, **kw)
    assert final2 is not None, "resume must complete"
    resumed = final2.cache()
    n_curated = resumed.count()
    wall_resume = round(time.time() - t0, 2)

    t0 = time.time()
    oneshot = curate_images(imgs, layer, max_hamming=1, n_bands=2).cache()
    n_oneshot = oneshot.count()
    wall_oneshot = round(time.time() - t0, 2)

    # equality: identical row multisets (join on all output columns)
    cols = ["image_id", "caption", "n_regions", "cluster_size"]
    mismatch = (
        resumed.select(cols).exceptAll(oneshot.select(cols)).count()
        + oneshot.select(cols).exceptAll(resumed.select(cols)).count()
    )

    from segment_rtree_spark.checkpoint import CheckpointJob

    prog = CheckpointJob(spark, "curate", ROOT).progress()
    n_keys = prog.count()
    dup_keys = n_keys - prog.select("partition_key").distinct().count()

    rec = {
        "what": ("curate_images_checkpointed at scale: killed after 2 "
                 "key-batches, resumed to completion; output equality vs "
                 "one-shot curate_images; per-key progress lineage"),
        "n_images": n,
        "keys_total": n_keys,
        "keys_before_kill": done1,
        "keys_on_resume": done2,
        "resume_skipped_keys": done1,
        "wall_killed_sec": wall_killed,
        "wall_resume_sec": wall_resume,
        "wall_oneshot_sec": wall_oneshot,
        "n_curated_rows": n_curated,
        "oneshot_rows": n_oneshot,
        "output_mismatch_rows": mismatch,
        "duplicate_progress_keys": dup_keys,
        "pass": mismatch == 0 and dup_keys == 0 and done1 + done2 == n_keys,
    }
    with open(os.path.join(REPO, "BENCH", "curate_checkpoint.json"), "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
