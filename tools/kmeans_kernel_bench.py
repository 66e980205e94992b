"""Microbench for the kmeans_fit partial kernel at production codebook
size (n_lists=4096): records per-batch cost of (a) the chunked
nearest-centroid assignment and (b) the vectorized per-list emit that
replaced the k*dim scalar-row Python-list build in round 4, plus rows
emitted per batch (<= k array rows, was k*dim scalar rows), plus one
end-to-end distributed fit. Writes BENCH/kmeans_kernel.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def batch_bench(k=4096, n=10_000, dim=64, reps=3):
    from segment_rtree_spark.operators.embed import _argmin_list

    rng = np.random.default_rng(7)
    emb = rng.standard_normal((n, dim))
    cent = rng.standard_normal((k, dim))
    out = {"k": k, "batch_rows": n, "dim": dim}
    t = []
    for _ in range(reps):
        t0 = time.time()
        a = _argmin_list(emb, cent)
        t.append(time.time() - t0)
    out["assign_ms_per_batch"] = round(min(t) * 1000, 1)
    t = []
    for _ in range(reps):
        t0 = time.time()
        order = np.argsort(a, kind="stable")
        srt = a[order]
        uniq, starts = np.unique(srt, return_index=True)
        bounds = np.append(starts, len(srt))
        sums = [
            emb[order[bounds[u]:bounds[u + 1]]].sum(axis=0).tolist()
            for u in range(len(uniq))
        ]
        t.append(time.time() - t0)
    out["emit_ms_per_batch"] = round(min(t) * 1000, 1)
    out["rows_emitted_per_batch"] = int(len(uniq))
    out["rows_old_scheme_would_emit"] = int(len(uniq) * dim)
    return out


def fit_bench(n=50_000, k=4096, iters=1, cores=8):
    from pyspark.sql import functions as F

    from segment_rtree_spark.operators.embed import kmeans_fit
    from segment_rtree_spark.session import get_spark

    spark = get_spark(cores=cores, app="kmeans-bench")
    spark.sparkContext.setLogLevel("ERROR")
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), "
            "d -> cast(pmod(xxhash64(id * 64 + d), 1000) as double) / 500.0 - 1.0)"
        ).alias("embedding"),
    ).cache()
    vecs.count()
    kmeans_fit(vecs, k=64, iters=1)  # warm the python workers
    t0 = time.time()
    cent = kmeans_fit(vecs, k=k, iters=iters)
    wall = round(time.time() - t0, 2)
    spark.stop()
    return {
        "n_vectors": n, "n_lists": k, "iters": iters, "cores": cores,
        "fit_sec": wall, "codebook_shape": list(cent.shape),
    }


if __name__ == "__main__":
    rec = {"per_batch": batch_bench(), "distributed_fit": fit_bench()}
    path = os.path.join(REPO, "BENCH", "kmeans_kernel.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))
