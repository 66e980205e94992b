"""Embedding similarity search: brute-force cosine top-k + LSH ANN.

* cosine_topk — the exactness baseline: broadcast the (small) query
  set, fold the dot product with F.aggregate/zip_with (sequential
  fold -> bit-exact vs the DuckDB list_reduce oracle), window top-k.
  At scale the target side stays partitioned; only queries broadcast.

* lsh_buckets — the scale path: sign-random-projection buckets from
  deterministic arithmetic hyperplanes, computed in a NumPy kernel
  whose accumulation order matches the SQL fold (sequential over
  dims) so the oracle reproduces buckets exactly. ANN search = equi
  join on bucket, refine with exact cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "cosine_topk",
    "lsh_buckets",
    "ann_topk",
    "embedding_neardup_pairs",
    "hyperplane",
    "ivf_topk",
    "kmeans_fit",
    "ivf_topk_fixed",
    "ivf_centroid_fixed",
    "DIM",
    "N_BITS",
]

DIM = 64
N_BITS = 8


def hyperplane(i: int, dim: int = DIM) -> np.ndarray:
    """Deterministic pseudo-random hyperplane i (exact decimal values,
    reproducible as SQL literals)."""
    j = np.arange(dim, dtype=np.int64)
    return ((i * 2654435761 + j * 40503) % 1000) / 1000.0 - 0.5


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"


def _dot_expr(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


def cosine_topk(
    targets: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against all targets.

    Output: (query_id, vec_id, score, rank). Ties break by target id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec).cast("array<double>").alias("qv")
    )
    t = targets.select(
        F.col(id_col), F.col(vec).cast("array<double>").alias("tv")
    )
    dot = F.expr(_dot_expr("qv", "tv"))
    nq = F.sqrt(F.expr(_dot_expr("qv", "qv")))
    nt = F.sqrt(F.expr(_dot_expr("tv", "tv")))
    joined = (
        t.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col(id_col))  # exclude self BEFORE ranking
        .withColumn("score", dot / (nq * nt))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def lsh_buckets(
    vectors: DataFrame,
    n_bits: int = N_BITS,
    id_col: str = "vec_id",
    vec: str = "embedding",
    dim: int = DIM,
) -> DataFrame:
    """Sign-random-projection bucket id per vector (NumPy kernel).

    Accumulates the dot product SEQUENTIALLY over dimensions so the
    result is bit-identical to the SQL fold oracle.
    """
    planes = np.stack([hyperplane(i, dim) for i in range(n_bits)])  # [bits, dim]

    def kernel(batches):
        for pdf in batches:
            emb = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec]], dtype=np.float64
            )
            n = len(pdf)
            bucket = np.zeros(n, dtype=np.int64)
            for b in range(n_bits):
                acc = np.zeros(n)
                for d in range(dim):  # sequential: matches the SQL fold
                    acc = acc + emb[:, d] * planes[b, d]
                bucket |= (acc > 0.0).astype(np.int64) << b
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": bucket})

    return vectors.mapInPandas(kernel, f"{id_col} long, bucket long")


def ann_topk(
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_bits: int = N_BITS,
) -> DataFrame:
    """Approximate all-pairs top-k: bucket equi-join then exact cosine
    refine inside each bucket. Output (query_id, vec_id, score, rank)."""
    b = lsh_buckets(vectors, n_bits, id_col, vec)
    v = vectors.join(b, id_col).select(
        F.col(id_col), F.col(vec).cast("array<double>").alias("v"), "bucket"
    )
    a, t = v.alias("a"), v.alias("b")
    dot = F.expr(_dot_expr("a.v", "b.v"))
    na = F.sqrt(F.expr(_dot_expr("a.v", "a.v")))
    nb = F.sqrt(F.expr(_dot_expr("b.v", "b.v")))
    joined = (
        a.join(t, "bucket")
        .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias(id_col),
            (dot / (na * nb)).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_bits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, score) with
    cosine >= threshold, candidates from a sign-LSH bucket equi-join
    (never all-pairs — near-identical vectors share all hyperplane
    signs, so a coarse n_bits bucket has high recall at high
    thresholds; the exact cosine filter keeps precision exact)."""
    b = lsh_buckets(vectors, n_bits, id_col, vec)
    v = vectors.join(b, id_col).select(
        F.col(id_col), F.col(vec).cast("array<double>").alias("v"), "bucket"
    )
    a, t = v.alias("a"), v.alias("b")
    dot = F.expr(_dot_expr("a.v", "b.v"))
    na = F.sqrt(F.expr(_dot_expr("a.v", "a.v")))
    nb = F.sqrt(F.expr(_dot_expr("b.v", "b.v")))
    return (
        a.join(t, "bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (dot / (na * nb)).alias("score"),
        )
        .filter(F.col("score") >= threshold)
        .distinct()
    )


def ivf_centroid_fixed(j: int, dim: int = DIM) -> np.ndarray:
    """Deterministic closed-form centroid j (exact decimal values,
    reproducible as SQL literals — the coarse-quantizer analog of
    hyperplane())."""
    d = np.arange(dim, dtype=np.int64)
    return ((j * 2654435761 + d * 40503) % 2000) / 1000.0 - 1.0


def ivf_topk_fixed(
    vectors: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """IVF ANN with a FIXED closed-form coarse quantizer.

    List assignment is a pure Catalyst expression: sequential-fold
    squared-L2 to each literal centroid, collected into an array,
    argmin via array_position(array_min) (first match = lowest list on
    ties) — no UDF anywhere, and a DuckDB oracle reproduces the whole
    ANN path bit-for-bit. ivf_topk (k-means) learns better centroids;
    this is its oracle-visible twin with the identical join shape
    (equi-join on list, exact cosine refine, window top-k)."""
    v0 = vectors.select(
        F.col(id_col), F.col(vec).cast("array<double>").alias("v")
    )
    d_exprs = []
    for j in range(n_lists):
        lits = ",".join(repr(float(x)) for x in ivf_centroid_fixed(j))
        d_exprs.append(
            f"aggregate(zip_with(v, array({lits}), (x, y) -> (x - y) * (x - y)), "
            f"cast(0 as double), (acc, u) -> acc + u)"
        )
    darr = "array(" + ",".join(d_exprs) + ")"
    assign = f"cast(array_position({darr}, array_min({darr})) - 1 as bigint)"
    v = v0.withColumn("list", F.expr(assign))

    a, t = v.alias("a"), v.alias("b")
    dot = F.expr(_dot_expr("a.v", "b.v"))
    na = F.sqrt(F.expr(_dot_expr("a.v", "a.v")))
    nb = F.sqrt(F.expr(_dot_expr("b.v", "b.v")))
    joined = (
        a.join(t, "list")
        .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias(id_col),
            (dot / (na * nb)).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_centroids(vectors_pdf, k: int = 8, iters: int = 3, vec: str = "embedding"):
    """Deterministic IVF coarse quantizer: centroids seeded from the
    first k vectors (by id order), refined by `iters` Lloyd steps.
    Driver-side NumPy over a SAMPLE — at scale the sample is a
    `.limit(n)` pull, the assignment stays distributed."""
    emb = np.stack([np.asarray(v, np.float64) for v in vectors_pdf[vec]])
    cent = emb[:k].copy()
    for _ in range(iters):
        d = ((emb[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                cent[j] = emb[m].mean(axis=0)
    return cent


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> np.ndarray:
    """Fully distributed Lloyd k-means over an embedding column.

    Per iteration: the k x dim codebook broadcasts out, an Arrow
    kernel computes per-BATCH partial sums per list (k*dim tiny rows
    out per batch — a map-side combine), one shuffle reduces them,
    and only the k x dim result returns to the driver. No iteration
    ever pulls vectors driver-side, so the fit scales to any corpus
    (unlike the `ivf_centroids` sample fit, whose Lloyd steps are
    driver NumPy over a .limit() pull).

    Seeds = the first k vectors by id (deterministic). Note: the
    reduce sums float64 in partition order, so centroids can differ
    in final ulps across cluster layouts — consumers needing
    bit-stable plans should use `ivf_topk_fixed`.
    """
    spark = vectors.sparkSession
    seed = vectors.select(id_col, vec).orderBy(id_col).limit(k).collect()
    cent = np.stack([np.asarray(r[vec], np.float64) for r in seed])
    dim = cent.shape[1]
    src = vectors.select(vec)
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cent)

        def partial(batches):
            c = bc.value
            for pdf in batches:
                emb = np.stack([np.asarray(v, np.float64) for v in pdf[vec]])
                a = ((emb[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
                lists, poss, ss, ns = [], [], [], []
                for j in range(len(c)):
                    m = a == j
                    if m.any():
                        lists += [j] * dim
                        poss += list(range(dim))
                        ss += list(emb[m].sum(axis=0))
                        ns += [int(m.sum())] * dim
                yield pd.DataFrame(
                    {
                        "list": pd.Series(lists, dtype="int64"),
                        "pos": pd.Series(poss, dtype="int32"),
                        "s": pd.Series(ss, dtype="float64"),
                        "n": pd.Series(ns, dtype="int64"),
                    }
                )

        rows = (
            src.mapInPandas(partial, "list long, pos int, s double, n long")
            .groupBy("list", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new = cent.copy()
        for r in rows:
            new[r["list"], r["pos"]] = r["s"] / r["n"]
        cent = new
        bc.destroy()
    return cent


def ivf_topk(
    vectors: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    id_col: str = "vec_id",
    vec: str = "embedding",
    sample: int | None = None,
    fit: str = "distributed",
) -> DataFrame:
    """IVF ANN: coarse-quantize every vector to its nearest centroid
    (one mapInPandas pass with the broadcast codebook), then exact
    cosine refine INSIDE each list (equi-join on list id). The scale
    shape: candidate generation is a hash join on `list`, never an
    all-pairs cross join."""
    spark = vectors.sparkSession
    # an explicit sample size implies the sample fit — callers who
    # tuned `sample` keep their driver-side cost profile rather than
    # silently switching to full distributed passes
    if sample is not None:
        fit = "sample"
    if fit == "distributed":
        cent = kmeans_fit(vectors, k=n_lists, id_col=id_col, vec=vec)
    else:
        head = (
            vectors.select(id_col, vec).orderBy(id_col).limit(sample or 512).toPandas()
        )
        cent = ivf_centroids(head, k=n_lists, vec=vec)
    bc = spark.sparkContext.broadcast(cent)

    def assign(batches):
        c = bc.value
        for pdf in batches:
            emb = np.stack([np.asarray(v, np.float64) for v in pdf[vec]])
            d = ((emb[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame({id_col: pdf[id_col], "list": d.argmin(axis=1).astype(np.int64)})

    lists = vectors.select(id_col, vec).mapInPandas(assign, f"{id_col} long, list long")

    v = vectors.join(lists, id_col).select(
        F.col(id_col), F.col(vec).cast("array<double>").alias("v"), "list"
    )
    a, t = v.alias("a"), v.alias("b")
    dot = F.expr(_dot_expr("a.v", "b.v"))
    na = F.sqrt(F.expr(_dot_expr("a.v", "a.v")))
    nb = F.sqrt(F.expr(_dot_expr("b.v", "b.v")))
    joined = (
        a.join(t, "list")
        .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias(id_col),
            (dot / (na * nb)).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
