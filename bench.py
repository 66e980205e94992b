"""Headline benchmark: one JSON line to stdout.

Runs the engine's flagship queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. The flagship
workload is the north-star metric: tile assignment + PIP join of a
synthetic image+caption table against a real polygon layer
(africa.wkt, 49 shells), reported as images/sec.

Output: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "images_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_IMAGES = int(os.environ.get("BENCH_IMAGES", "300000"))


def build_layer():
    from segment_rtree_spark.layer import PolygonLayer

    wkt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "wkt", "africa.wkt")
    return PolygonLayer.from_wkt_file(wkt)


def bench_queries(spark, sf_dir, only=None, force_fixtures=False):
    """name -> zero-arg callable that runs the query to completion.

    `only` (set of names) skips building fixtures whose queries are
    excluded, so a reduced layout reproduces an earlier round's bench
    shape exactly; `force_fixtures=True` builds them anyway (isolates
    fixture cache pressure from query interleave in drift A/Bs)."""

    def want(name):
        return force_fixtures or only is None or name in only
    from pyspark.sql import functions as F

    from segment_rtree_spark.operators.dedup import lsh_pairs, phash_neardup_pairs
    from segment_rtree_spark.operators.embed import cosine_topk
    from segment_rtree_spark.operators.pip_join import (
        pip_join_broadcast,
        pip_join_partitioned,
    )
    from segment_rtree_spark.operators.tile_ops import tile_pyramid
    from segment_rtree_spark.plans.entry_queries import REGISTRY
    from segment_rtree_spark.synth import images_df_fast

    layer = build_layer()
    # africa spans roughly lng [-18, 52], lat [-35, 38]; remap the
    # synthetic geotags into that window so the join has real work
    def images(n, skew=0.0):
        df = images_df_fast(spark, n, skew_frac=skew)
        return df.withColumn("lng", F.col("lng") / 360.0 * 75.0 + 17.0).withColumn(
            "lat", F.col("lat") / 180.0 * 80.0 + 1.5
        )

    imgs = images(N_IMAGES, skew=0.1).cache()

    def q_pip_broadcast():
        return pip_join_broadcast(imgs, layer, keep=["image_id"]).count()

    def q_pip_partitioned():
        return pip_join_partitioned(
            imgs, layer, keep=["image_id"], res=6, salt_threshold=20000, n_salt=8
        ).count()

    def q_tile_pyramid():
        return tile_pyramid(imgs, base_res=10, min_res=4).count()

    def q_phash_neardup():
        return phash_neardup_pairs(imgs.sample(0.1, seed=7), max_hamming=8).count()

    def q_minhash_lsh():
        return lsh_pairs(spark.read.parquet(f"{sf_dir}/documents.parquet")).count()

    def q_cosine_topk():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return cosine_topk(emb, emb.filter(F.col("vec_id") < 20), k=10).count()

    def q_clip_segment():
        return REGISTRY["clip_segment"][0](spark, sf_dir).count()

    def q_curate_images():
        from segment_rtree_spark.pipelines import curate_images

        return curate_images(imgs, layer, max_hamming=1, n_bands=2).count()

    def q_validate_images():
        # clean raw corpus: every verdict is metadata-decidable, so the
        # two-tier plan keeps ALL rows out of the Python decode kernel
        from segment_rtree_spark.operators.images import validate_images

        return validate_images(imgs).count()

    # 100k synthetic 64-dim embeddings (deterministic hash components,
    # no parquet dependency): big enough that the ANN path's corpus
    # scaling (auto n_bits, multi-probe, default cap, per-bucket BLAS
    # refine) actually engages — the sf parquet embeddings table is
    # only 2k rows
    if want("ann_topk"):
        n_vec = max(100_000, N_IMAGES // 3)
        vecs = (
            spark.range(n_vec)
            .select(
                F.col("id").alias("vec_id"),
                F.expr(
                    "transform(sequence(0, 63), "
                    "d -> cast(pmod(xxhash64(id * 64 + d), 1000) as double) / 500.0 - 1.0)"
                ).alias("embedding"),
            )
            .cache()
        )

    def q_ann_topk():
        from segment_rtree_spark.operators.embed import ann_topk

        return ann_topk(vecs, k=5, target_bucket=256, refine="kernel").count()

    def _jpeg_rows(n):
        # synthesized-on-executor jpeg payloads (gradient content,
        # quality 90) — built once and cached outside the timings
        import pandas as pd

        def kernel(batches):
            import numpy as np

            from segment_rtree_spark.jpegio import encode_jpeg

            for pdf in batches:
                ids, bufs, ws, hs = [], [], [], []
                for i in pdf["id"]:
                    h = 8 + int(i) % 24
                    w = 8 + (int(i) * 7) % 24
                    yy, xx = np.mgrid[0:h, 0:w]
                    px = np.stack(
                        [yy * 255 // max(1, h - 1), xx * 255 // max(1, w - 1),
                         (yy + xx) * 255 // max(1, h + w - 2)], axis=-1
                    ).astype(np.uint8)
                    ids.append(f"jp{int(i)}")
                    bufs.append(encode_jpeg(px, 90))
                    ws.append(w)
                    hs.append(h)
                yield pd.DataFrame(
                    {"image_id": ids, "bytes": bufs, "w": ws, "h": hs,
                     "fmt": ["jpeg"] * len(ids)}
                )

        return spark.range(n).mapInPandas(
            kernel, "image_id string, bytes binary, w int, h int, fmt string"
        )

    if want("validate_mixed"):
        jpeg_imgs = _jpeg_rows(2000).cache()
        jpeg_imgs.count()  # encode once, outside the timings

    def q_validate_mixed():
        # the two-tier validator over a MIXED corpus: 60k raw rows stay
        # pure-Catalyst, 2k jpeg rows route through the decode kernel
        from segment_rtree_spark.operators.images import validate_images

        mixed = imgs.sample(0.2, seed=11).select(
            "image_id", "bytes", "w", "h", "fmt"
        ).unionByName(jpeg_imgs)
        return validate_images(mixed).count()

    def q_phash_incremental():
        # the round-4 two-sided tiled band join: 150k arrivals vs a
        # 150k kept corpus (sizing pass + equi-join; cold buckets here,
        # so this line prices the adaptive machinery itself)
        from segment_rtree_spark.operators.dedup import phash_neardup_against

        new = imgs.filter(F.col("phash").bitwiseAND(F.lit(1)) == 0)
        corp = imgs.filter(F.col("phash").bitwiseAND(F.lit(1)) != 0)
        return phash_neardup_against(new, corp, max_hamming=8).count()

    def q_knn_boundary():
        # 20% sample: exact boundary-distance kNN is ~57us/point against
        # the 49-ring layer; the full 300k would dominate the bench
        # total without adding regression signal
        from segment_rtree_spark.operators.knn_join import knn_join_broadcast

        return knn_join_broadcast(
            imgs.sample(0.2, seed=3), layer, k=2, keep=["image_id"]
        ).count()

    def q_crossmodal_neardup():
        # the round-6 caption-folded band join over the full 300k
        # corpus, armed defaults: synth captions are unique (zero
        # work), so group them ~10 images/caption via a hash modulus —
        # the join then has real bucket crowds to band, tile and verify
        from segment_rtree_spark.operators.dedup import crossmodal_neardup_pairs

        grouped = imgs.withColumn(
            "caption",
            F.expr("concat('cap ', pmod(xxhash64(image_id), 30000))"),
        )
        return crossmodal_neardup_pairs(grouped, max_hamming=8).count()

    def _codec_rows(n_per_fmt):
        # the full gated codec stack, synthesized on executors: raw /
        # png / jpeg baseline / jpeg PROGRESSIVE / bmp / gif / tiff /
        # webp (VP8L) / CCITT G4 fax tiff (r7, bilevel content),
        # gradient content so every stream decodes clean
        import pandas as pd

        fmts = ["raw", "png", "jpeg", "jpeg_prog", "bmp", "gif", "tiff",
                "webp", "tiff_g4"]

        def kernel(batches):
            import numpy as np

            from segment_rtree_spark.ccitt import encode_tiff_g4
            from segment_rtree_spark.imageio import (
                encode_bmp,
                encode_gif,
                encode_png,
                encode_raw,
                encode_tiff,
                encode_webp,
            )
            from segment_rtree_spark.jpegio import encode_jpeg

            enc = {
                "raw": encode_raw, "png": encode_png,
                "jpeg": lambda p: encode_jpeg(p, 90),
                "jpeg_prog": lambda p: encode_jpeg(p, 90, progressive=True),
                "bmp": encode_bmp, "gif": encode_gif,
                "tiff": encode_tiff, "webp": encode_webp,
                "tiff_g4": encode_tiff_g4,
            }
            for pdf in batches:
                ids, bufs, ws, hs, fs = [], [], [], [], []
                for i in pdf["id"]:
                    i = int(i)
                    fmt = fmts[i % len(fmts)]
                    h = 8 + i % 24
                    w = 8 + (i * 7) % 24
                    yy, xx = np.mgrid[0:h, 0:w]
                    px = np.stack(
                        [yy * 255 // max(1, h - 1), xx * 255 // max(1, w - 1),
                         (yy + xx) * 255 // max(1, h + w - 2)], axis=-1
                    ).astype(np.uint8)
                    if fmt == "gif":  # palette codec: <= 64 colors
                        px = (px >> 6) << 6
                    elif fmt == "tiff_g4":  # fax codec: bilevel
                        px = np.repeat(
                            ((px[:, :, :1] >= 128) * 255).astype(np.uint8),
                            3, axis=2,
                        )
                    ids.append(f"cx{i}")
                    bufs.append(enc[fmt](px))
                    ws.append(w)
                    hs.append(h)
                    # jpeg_prog / tiff_g4 are fmt='jpeg' / 'tiff' at
                    # the table level
                    fs.append({"jpeg_prog": "jpeg", "tiff_g4": "tiff"}
                              .get(fmt, fmt))
                yield pd.DataFrame(
                    {"image_id": ids, "bytes": bufs, "w": ws, "h": hs, "fmt": fs}
                )

        return (
            spark.range(n_per_fmt * len(fmts))
            .repartition(32)
            .mapInPandas(
                kernel, "image_id string, bytes binary, w int, h int, fmt string"
            )
        )

    if want("validate_codecs"):
        codec_imgs = _codec_rows(1000).cache()
        codec_imgs.count()  # encode once, outside the timings

    def q_validate_codecs():
        # the validator over ALL seven real formats (jpeg rows split
        # baseline/progressive): prices the complete decode stack the
        # correctness gate exercises — raw stays Catalyst-tier, every
        # compressed row routes through its codec
        from segment_rtree_spark.operators.images import validate_images

        return validate_images(codec_imgs).count()

    def q_curate_multimodal():
        # the composed flagship a 100 TB training-data run executes:
        # region filter -> caption filter -> exact content collapse ->
        # crossmodal (caption+phash) near-dup -> embedding near-dup.
        # Captions grouped ~10/caption (synth captions are unique);
        # 16-dim hash embeddings so the embed stage has real buckets
        from segment_rtree_spark.pipelines import curate_multimodal

        corpus = imgs.withColumn(
            "caption",
            F.expr("concat('cap ', pmod(xxhash64(image_id), 30000))"),
        ).withColumn(
            "embedding",
            F.expr(
                "transform(sequence(0, 15), d -> cast(pmod("
                "xxhash64(image_id, d), 1000) as double) / 500.0 - 1.0)"
            ),
        )
        return curate_multimodal(
            corpus, layer, max_hamming=8, n_bands=4,
            embedding="embedding", embed_threshold=0.95,
        ).count()

    def _audio_rows(n):
        # synthesized-on-executor WAV clips (2048-sample bilevel-energy
        # content, i16 mono, every 5th row headerless pcm) — built once
        # and cached outside the timings, like the jpeg/codec fixtures
        import pandas as pd

        def kernel(batches):
            import numpy as np

            from segment_rtree_spark.audioio import encode_wav

            for pdf in batches:
                out = {k: [] for k in ("audio_id", "bytes", "sr",
                                       "n_samples", "channels", "fmt")}
                for i in pdf["id"]:
                    i = int(i)
                    amps = np.where(
                        (np.arange(64) * 2654435761 + i) % 7 < 3, 9000, 150
                    )
                    signs = np.where(np.arange(64) % 2 == 0, 1, -1)
                    x = np.repeat(amps * signs, 32).astype(np.int32)[:, None]
                    pcm = i % 5 == 0
                    out["audio_id"].append(f"au{i}")
                    out["bytes"].append(
                        x.astype("<i2").tobytes() if pcm
                        else encode_wav(x, 16000, "i16")
                    )
                    out["sr"].append(16000)
                    out["n_samples"].append(2048)
                    out["channels"].append(1)
                    out["fmt"].append("pcm" if pcm else "wav")
                yield pd.DataFrame(out)

        return spark.range(n).repartition(32).mapInPandas(
            kernel,
            "audio_id string, bytes binary, sr int, n_samples int, "
            "channels int, fmt string",
        )

    if want("audio_features"):
        audio_clips = _audio_rows(max(20000, N_IMAGES // 5)).cache()
        audio_clips.count()  # encode once, outside the timings

    def q_audio_features():
        # the audio leg of the multimodal surface (round 7): WAV/PCM
        # decode + exact integer stats + 64-bit energy fingerprint
        # per clip, the column audio_neardup_pairs bands on
        from segment_rtree_spark.operators.audio import audio_features

        return audio_features(audio_clips).count()

    registry = {
        "pip_broadcast": q_pip_broadcast,
        "pip_partitioned": q_pip_partitioned,
        "tile_pyramid": q_tile_pyramid,
        "phash_neardup": q_phash_neardup,
        "minhash_lsh": q_minhash_lsh,
        "cosine_topk": q_cosine_topk,
        "clip_segment": q_clip_segment,
        "curate_images": q_curate_images,
        "validate_images": q_validate_images,
        "ann_topk": q_ann_topk,
        "knn_boundary": q_knn_boundary,
        "phash_incremental": q_phash_incremental,
        "validate_mixed": q_validate_mixed,
        # appended round 7 (standing rule: append, never reorder, so
        # the 13-query totals stay comparable across rounds)
        "crossmodal_neardup": q_crossmodal_neardup,
        "validate_codecs": q_validate_codecs,
        "curate_multimodal": q_curate_multimodal,
        "audio_features": q_audio_features,
    }
    if only is not None:
        unknown = set(only) - set(registry)
        if unknown:
            raise SystemExit(f"BENCH_QUERIES: unknown query names {sorted(unknown)}")
        registry = {k: v for k, v in registry.items() if k in only}
    return registry, imgs


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from segment_rtree_spark.session import get_spark

    spark = get_spark(cores=cores, app="bench")
    spark.sparkContext.setLogLevel("ERROR")

    only_env = os.environ.get("BENCH_QUERIES")
    only = {s.strip() for s in only_env.split(",") if s.strip()} if only_env else None
    force_fixtures = os.environ.get("BENCH_FORCE_FIXTURES") == "1"
    queries, imgs = bench_queries(spark, sf_dir, only, force_fixtures)
    n_images = imgs.count()  # materialize the cache outside the timings

    # Steady-state warmup, outside the timings: real clusters run with
    # long-lived executors whose Python workers and JIT'd stages are
    # warm; a fresh local JVM pays ~0.5-1.2s PER python worker spawn on
    # its first wide pandas-UDF stage (32 workers!) plus catalyst/JIT
    # first-plan costs. Warm the pool by holding every task slot, then
    # run each operator shape once on a tiny input.
    import pandas as _pd  # noqa: F401

    def _hold(batches):
        import time as _t

        _t.sleep(0.4)
        for b in batches:
            yield b

    spark.range(2 * cores).repartition(2 * cores, "id").mapInPandas(_hold, "id long").count()
    from segment_rtree_spark.operators.pip_join import (
        pip_join_broadcast as _pb,
        pip_join_partitioned as _pp,
    )

    _layer = build_layer()
    _tiny = imgs.limit(2000)
    _pb(_tiny, _layer, keep=["image_id"]).count()
    _pp(_tiny, _layer, keep=["image_id"], res=6, salt_threshold=20000, n_salt=8).count()

    # Best-of-N per query: this box is a shared VM and single runs show
    # 2x run-to-run noise from host contention; the min is the stable
    # estimate of the plan's actual cost (same data, same plan).
    # Default 3: round-3 measurements caught multi-minute neighbor-load
    # bursts (canary 0.17 -> 0.97 within one run) that best-of-2 can
    # straddle entirely.
    repeat = int(os.environ.get("BENCH_REPEAT", "3"))
    # Round-robin the reps (all queries once, then again) instead of
    # back-to-back per query: this host's noise arrives in multi-minute
    # bursts, and back-to-back reps let one burst poison every rep of
    # the query unlucky enough to run inside it. Spreading a query's
    # reps across the whole run gives each one draws from different
    # host windows, so the min is far more often a clean-window sample.
    times = {name: float("inf") for name in queries}
    for _ in range(repeat):
        for name, fn in queries.items():
            t0 = time.time()
            fn()
            times[name] = min(times[name], time.time() - t0)
    times = {name: round(t, 3) for name, t in times.items()}

    # CPU-speed canary: the same fixed pure-python loop, timed alongside
    # the queries. On this host the single-core speed swings ~2.5x
    # between boots/minutes (measured 0.38s..0.92s for this loop);
    # reporting it lets any two bench JSONs be compared fairly.
    t0 = time.time()
    acc = 0
    for i in range(10_000_000):
        acc += i
    cpu_canary = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    pip_tp = (
        round(n_images / times["pip_broadcast"], 1)
        if "pip_broadcast" in times else None
    )
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "spatial-join + tile-assignment throughput",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "n_images": n_images,
                "images_per_sec": pip_tp,
                "cores": cores,
                "cpu_canary_sec": cpu_canary,
                "bench_repeat": repeat,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
