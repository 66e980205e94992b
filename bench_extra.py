"""Round-8 optimization harness: per-query isolation on top of the
FROZEN bench.py (which must not change — the driver times the
round-start copy).

Modes:
  python bench_extra.py explain [query ...]   -> .explain("formatted")
      for each bench query's DataFrame, written to plans/r08/ (the
      bench functions call .count(); here we rebuild the same frames
      and explain them instead).
  python bench_extra.py time [query ...]      -> noop-sink timing per
      query (guide §1.4), BENCH_EXTRA_REPEAT reps (default 3),
      printed as one JSON line per query.
  python bench_extra.py stages                -> stage-by-stage wall
      clock of curate_multimodal (the dominant bench line), each
      stage materialized with count()/noop so the cascade's cost
      attribution is visible.

Uses the same fixtures, env contract and session as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench as B  # the frozen harness: reuse fixtures + warmup


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def get_session():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from segment_rtree_spark.session import get_spark

    spark = get_spark(cores=cores, app="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    return spark, sf_dir, cores


def warmup(spark, imgs, cores):
    import pandas as _pd  # noqa: F401

    def _hold(batches):
        import time as _t

        _t.sleep(0.4)
        for b in batches:
            yield b

    spark.range(2 * cores).repartition(2 * cores, "id").mapInPandas(
        _hold, "id long"
    ).count()
    from segment_rtree_spark.operators.pip_join import (
        pip_join_broadcast as _pb,
        pip_join_partitioned as _pp,
    )

    layer = B.build_layer()
    tiny = imgs.limit(2000)
    _pb(tiny, layer, keep=["image_id"]).count()
    _pp(tiny, layer, keep=["image_id"], res=6, salt_threshold=20000, n_salt=8).count()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or None
    spark, sf_dir, cores = get_session()
    only = set(names) if names else None
    queries, imgs = B.bench_queries(spark, sf_dir, only)
    imgs.count()
    warmup(spark, imgs, cores)

    if mode == "time":
        repeat = int(os.environ.get("BENCH_EXTRA_REPEAT", "3"))
        times = {n: float("inf") for n in queries}
        for _ in range(repeat):
            for name, fn in queries.items():
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                fn()
                times[name] = min(times[name], time.time() - t0)
        t0 = time.time()
        acc = 0
        for i in range(10_000_000):
            acc += i
        canary = round(time.time() - t0, 3)
        print(json.dumps({
            "queries": {n: round(t, 3) for n, t in times.items()},
            "total": round(sum(times.values()), 3),
            "cpu_canary_sec": canary,
        }))
    elif mode == "stages":
        stages_curate_multimodal(spark, imgs)
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


def stages_curate_multimodal(spark, imgs):
    """Time each stage of the curate_multimodal cascade in isolation
    by materializing successive prefixes (count actions), reporting
    the deltas. Build mirrors bench.py q_curate_multimodal."""
    from pyspark.sql import functions as F

    from segment_rtree_spark import pipelines as P
    from segment_rtree_spark.operators.dedup import (
        _fold_labels,
        crossmodal_group_labels,
        label_map,
    )
    from segment_rtree_spark.operators.embed import embedding_neardup_pairs

    layer = B.build_layer()
    corpus = imgs.withColumn(
        "caption", F.expr("concat('cap ', pmod(xxhash64(image_id), 30000))")
    ).withColumn(
        "embedding",
        F.expr(
            "transform(sequence(0, 15), d -> cast(pmod("
            "xxhash64(image_id, d), 1000) as double) / 500.0 - 1.0)"
        ),
    )
    t = {}

    def mark(name, t0):
        t[name] = round(time.time() - t0, 3)
        print(f"{name}: {t[name]}s", flush=True)

    id_col, caption, phash = "image_id", "caption", "phash"
    cols = [
        F.col(id_col), F.col(caption), F.col(phash), F.col("lat"), F.col("lng"),
        F.coalesce(F.md5(F.col("bytes")), F.col(id_col)).alias("_content"),
        F.col("embedding"),
    ]
    keep = [id_col, caption, phash, "_content", "embedding"]
    narrow = corpus.select(*cols)

    t0 = time.time()
    ok = P._survivors_multimodal(
        narrow, layer, 2, "broadcast", keep, id_col, caption, "lng", "lat"
    ).localCheckpoint()
    mark("survivors(pip+agg+filter+ckpt)", t0)

    rep_cols = [c for c in ok.columns if c != "_content"]
    t0 = time.time()
    s1 = (
        ok.groupBy("_content")
        .agg(
            F.min_by(F.struct(*rep_cols), F.col(id_col)).alias("_rep"),
            F.count(F.lit(1)).alias("n_exact"),
        )
        .select("_rep.*", "n_exact")
    ).localCheckpoint()
    mark("s1 exact collapse", t0)

    t0 = time.time()
    s1x = crossmodal_group_labels(
        s1, id_col=id_col, phash=phash, caption=caption,
        max_hamming=8, n_bands=4, hot_threshold=4096,
    ).localCheckpoint()
    mark("crossmodal_group_labels", t0)

    rep2 = [c for c in s1.columns if c != "n_exact"]
    t0 = time.time()
    s2 = (
        s1x.groupBy("_xlabel")
        .agg(
            F.min_by(F.struct(*rep2), F.col(id_col)).alias("_rep"),
            F.sum("n_exact").alias("_csize"),
        )
        .select("_rep.*", "_csize")
    ).localCheckpoint()
    mark("s2 crossmodal collapse", t0)

    t0 = time.time()
    pairs = embedding_neardup_pairs(
        s2.filter(F.col("embedding").isNotNull()).select(id_col, "embedding"),
        threshold=0.95, id_col=id_col, vec="embedding",
        n_bits=None, n_probe=1, max_bucket="auto", refine="kernel",
    ).localCheckpoint()
    mark("embedding_neardup_pairs", t0)

    t0 = time.time()
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    mapping, bc = label_map(edges)
    final = (
        _fold_labels(s2, F.col(id_col), mapping, bc)
        .groupBy("label")
        .agg(
            F.min_by(F.struct(caption, "n_regions"), F.col(id_col)).alias("_rep"),
            F.sum("_csize").alias("cluster_size"),
        )
        .select(F.col("label").alias(id_col), "_rep.*", "cluster_size")
    )
    n = final.count()
    mark("label fold+final agg", t0)
    print(json.dumps({"stages": t, "rows": n,
                      "total": round(sum(t.values()), 3)}))


if __name__ == "__main__":
    main()
