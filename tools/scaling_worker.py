"""One scaling-study run: scan parquet images -> assign tiles -> PIP
join vs africa layer -> count. Prints one JSON line.

Usage: python tools/scaling_worker.py <cores> <input_parquet>
"""

import json
import os
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    cores = int(sys.argv[1])
    path = sys.argv[2]

    from segment_rtree_spark.layer import PolygonLayer
    from segment_rtree_spark.operators.pip_join import pip_join_broadcast
    from segment_rtree_spark.operators.tile_ops import assign_tiles
    from segment_rtree_spark.session import get_spark

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    layer = PolygonLayer.from_wkt_file(os.path.join(repo, "data", "wkt", "africa.wkt"))

    spark = get_spark(cores=cores, app=f"scaling-{cores}")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/Python-worker pool so the timed run measures the job,
    # not process spawning
    spark.range(1000000).selectExpr("sum(id)").collect()

    t0 = time.time()
    imgs = spark.read.parquet(path)
    tiled = assign_tiles(imgs, res=8)
    n_pairs = pip_join_broadcast(tiled, layer, keep=["image_id"]).count()
    wall = time.time() - t0
    n = spark.read.parquet(path).count()
    print(json.dumps({"cores": cores, "wall_sec": round(wall, 3), "n_images": n,
                      "n_pairs": n_pairs, "images_per_sec": round(n / wall, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
