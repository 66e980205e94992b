"""Embedding similarity search: brute-force cosine top-k + LSH ANN.

* cosine_topk — the exactness baseline: broadcast the (small) query
  set, fold the dot product with F.aggregate/zip_with (sequential
  fold -> bit-exact vs the DuckDB list_reduce oracle), window top-k.
  At scale the target side stays partitioned; only queries broadcast.

* lsh_buckets — the scale path: sign-random-projection buckets from
  deterministic splitmix64-mixed hyperplanes, computed in a NumPy
  kernel whose accumulation order matches the SQL fold (sequential
  over dims) so the oracle reproduces buckets exactly. ANN search =
  equi join on bucket, refine with exact cosine — refine='expr' is
  the bit-exact cross-engine reference, refine='kernel' the
  production per-bucket BLAS path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "cosine_topk",
    "lsh_buckets",
    "ann_topk",
    "ann_bucket_stats",
    "auto_n_bits",
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
# average vectors per LSH bucket the auto-scaler aims for: the refine
# join is O(target^2 / 2) comparisons per bucket, so 1024 keeps every
# bucket's self-join ~500k cosine evals — one comfortable Spark task
TARGET_BUCKET = 1024
# score-matrix memory bound for the cogrouped refine kernels (float64
# elements; 1<<25 = 256 MB). Module-level so tests can shrink it to
# force the multi-chunk path.
REFINE_CHUNK_ELEMS = 1 << 25


def auto_n_bits(n_rows: int, target_bucket: int = TARGET_BUCKET,
                lo: int = 1, hi: int = 24) -> int:
    """Corpus-scaled hyperplane count: 2^n_bits buckets sized so the
    AVERAGE bucket holds ~target_bucket vectors, making the per-bucket
    refine join O(target^2) instead of O((N/2^fixed_bits)^2) — the
    fix for fixed-bit LSH re-going quadratic at 10^9 vectors.
    (hi=24 caps the bucket-id space; beyond that raise target_bucket.)
    """
    import math

    if n_rows <= target_bucket:
        return lo
    return max(lo, min(hi, int(math.ceil(math.log2(n_rows / target_bucket)))))


def hyperplane(i: int, dim: int = DIM) -> np.ndarray:
    """Deterministic pseudo-random hyperplane i (exact decimal values,
    reproducible as SQL literals — the oracles regenerate their
    literal arrays from this function, so it IS the cross-engine
    spec).

    splitmix64-style avalanche per (i, j): the earlier affine form
    (i*C1 + j*C2) % 1000 made every plane the SAME progression at a
    shifted phase — pairwise sign correlations near 1, so 2^n_bits
    nominal buckets collapsed to a handful of occupied ones (measured
    36 of 128 with one 28k-row bucket on 100k uniform vectors) and
    the per-bucket refine re-went quadratic. Mixed planes spread the
    same corpus across all 128 within ~2x of uniform."""
    j = np.arange(dim, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the mix
        x = np.uint64(i % (1 << 64)) * np.uint64(0x9E3779B97F4A7C15) + j * np.uint64(
            0xBF58476D1CE4E5B9
        )
        x ^= x >> np.uint64(31)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(27)
    return (x % np.uint64(1000)).astype(np.float64) / 1000.0 - 0.5


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"


def _dot_expr(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


def _list_matrix(col) -> np.ndarray:
    """Arrow list<double> column -> float64 [n, dim] matrix via the
    offsets/values buffers — one reshape over the contiguous values
    buffer instead of one np.asarray per ROW (the pandas-object-array
    path costs an interpreter round trip per vector; at 10^5-10^6
    probe rows that loop dominated the kernel stages). Raises on
    ragged rows (the np.stack path errored there too) and on NULL
    vectors (callers filter them — same contract as before)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.list_(pa.float64()))
    if col.null_count:
        raise ValueError("NULL embedding in kernel input")
    off = col.offsets.to_numpy()
    widths = np.diff(off)
    if len(widths) == 0:
        return np.empty((0, 0), np.float64)
    if not (widths == widths[0]).all():
        raise ValueError("ragged embedding column")
    vals = col.values.to_numpy(zero_copy_only=False)
    return vals[off[0]: off[-1]].reshape(len(widths), int(widths[0]))


def _col_np(col) -> np.ndarray:
    """Arrow column -> numpy (object dtype for strings — the same
    values the pandas path produced)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


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
    dim: int | None = None,
    bit_exact: bool = False,
    keep_vec: bool = False,
) -> DataFrame:
    """Sign-random-projection bucket id per vector (NumPy kernel).

    bit_exact=False (default) uses one BLAS matmul per batch — the
    PRODUCTION path (~10x per kernel call). bit_exact=True accumulates
    the dot product SEQUENTIALLY over dimensions so the result is
    bit-identical to the SQL fold oracle — the oracle registry pins it
    for cross-engine hashing; production callers should not. A sign
    can only differ between the two when the projection is within
    float-reassociation error of 0, where bucket membership is
    arbitrary anyway (LSH semantics unaffected; the exact cosine
    refine downstream is identical).

    keep_vec=True passes the embedding column through the kernel
    (cast to array<double>), so consumers that need (id, v, bucket)
    get it map-side instead of shuffle-joining the bucket table back
    to the vectors on id — at 10^9 vectors that join is a full
    embedding-column shuffle that exists only to re-attach a column
    the kernel already had in hand."""
    # dim=None (default) infers the vector dimension from the data —
    # the hyperplane family is parametrized by (index, dim), so every
    # consumer of the same column sees the same planes; the oracle
    # registry pins hyperplane literals at the table's actual dim.
    # Planes build lazily inside the kernel (first non-empty batch),
    # so inference costs no extra job.
    weights = (np.int64(1) << np.arange(n_bits, dtype=np.int64))
    # id dtype from the input, not hard-coded long: the curation
    # pipelines bucket by string image ids, the embeddings table by
    # bigint vec ids — the kernel passes the column through either way
    id_dtype = dict(vectors.select(id_col).dtypes)[id_col]
    schema = f"{id_col} {id_dtype}, bucket long"
    if keep_vec:
        schema += f", {vec} array<double>"

    # Arrow-native kernel (mapInArrow): the embedding column reads as
    # ONE contiguous values buffer + offsets (_list_matrix) and, with
    # keep_vec, passes BACK as the same Arrow list array (cast to
    # float64) — the pandas form paid one np.asarray per row on the
    # way in and one list(map(float, row)) per row on the way out,
    # millions of interpreter ops per 10^5-vector batch that this
    # kernel spends in two buffer views instead. Bucket arithmetic is
    # unchanged (bit_exact keeps the sequential fold the SQL oracle
    # pins).
    def kernel(batches):
        import pyarrow as pa

        planes = None
        vdim = dim
        for batch in batches:
            if batch.num_rows == 0:  # zero-row Arrow batches reach kernels
                continue
            names = batch.schema.names
            vc = batch.column(names.index(vec)).cast(pa.list_(pa.float64()))
            emb = _list_matrix(vc)
            if planes is None:
                if vdim is None:
                    vdim = emb.shape[1]
                planes = np.stack(
                    [hyperplane(i, vdim) for i in range(n_bits)]
                )  # [bits, dim]
            n = batch.num_rows
            if bit_exact:
                bucket = np.zeros(n, dtype=np.int64)
                for b in range(n_bits):
                    acc = np.zeros(n)
                    for d in range(vdim):  # sequential: matches the SQL fold
                        acc = acc + emb[:, d] * planes[b, d]
                    bucket |= (acc > 0.0).astype(np.int64) << b
            else:
                acc = emb @ planes.T  # [n, bits]
                bucket = ((acc > 0.0).astype(np.int64) * weights).sum(axis=1)
            cols = [batch.column(names.index(id_col)), pa.array(bucket)]
            out_names = [id_col, "bucket"]
            if keep_vec:
                cols.append(vc)
                out_names.append(vec)
            yield pa.RecordBatch.from_arrays(cols, out_names)

    return vectors.select(id_col, vec).mapInArrow(kernel, schema)


def ann_bucket_stats(
    vectors: DataFrame,
    n_bits: int = N_BITS,
    id_col: str = "vec_id",
    vec: str = "embedding",
    max_bucket: int | str | None = None,
    target_bucket: int = TARGET_BUCKET,
    bit_exact: bool = False,
) -> DataFrame:
    """Per-bucket size monitor for the ANN joins: (bucket, bucket_n,
    truncated) — the embedding-side twin of dedup.lsh_bucket_stats.
    Run alongside a capped ann_topk/embedding_neardup_pairs to see
    exactly which mega-buckets were dropped. Accepts the same
    max_bucket='auto' (= 32 * target_bucket) and bit_exact the
    operators default to, so the monitor and the guard always agree
    on both the cap and the bucket arithmetic."""
    if max_bucket == "auto":
        max_bucket = 32 * target_bucket
    stats = lsh_buckets(
        vectors, n_bits, id_col, vec, bit_exact=bit_exact
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    cap = F.lit(max_bucket) if max_bucket is not None else F.lit(None).cast("int")
    return stats.withColumn("truncated", cap.isNotNull() & (F.col("bucket_n") > cap))


def _bucketed_vectors(
    vectors: DataFrame, n_bits: int, id_col: str, vec: str,
    max_bucket: int | None, bit_exact: bool = False,
    drop_observation=None,
) -> DataFrame:
    """(id, v, bucket) with over-cap buckets dropped WHOLE before any
    join over them (the dedup._cap_buckets discipline): a degenerate
    bucket of near-identical vectors would otherwise self-join O(n^2)
    in one task. Its members are exact/near-exact dups better handled
    by exact dedup; the dropped buckets stay visible via
    ann_bucket_stats with the same cap.

    The bucket kernel passes the embedding through (keep_vec), so
    bucketing is one map-side pass — no shuffle join back to the
    vector table just to re-attach the embedding column. The bucketed
    frame is checkpointed: both self-join sides (and the cap's sizing
    aggregate) consume it, and Python-kernel stages are not
    exchange-reusable, so the kernel would otherwise run once per
    consumer — materializing the bucketed vectors IS the classic
    'build the ANN index once' step."""
    v = lsh_buckets(
        vectors, n_bits, id_col, vec, bit_exact=bit_exact, keep_vec=True
    ).select(
        F.col(id_col), F.col(vec).alias("v"), "bucket"
    ).localCheckpoint(eager=False)
    if max_bucket is None and drop_observation is not None:
        from .dedup import _observe_zero_drops

        _observe_zero_drops(drop_observation, vectors.sparkSession)
    if max_bucket is not None:
        # drop via broadcast ANTI-join against the OVER-cap keys only:
        # over-cap buckets number at most N/max_bucket (tiny by
        # definition), so the cap costs one partial-agg pass + a
        # map-side anti join — never a shuffle of the wide vector
        # frame keyed by bucket (the inner-join-on-sizes formulation
        # measured ~2 s of the 4 s ann bench at 100k just re-attaching
        # a filter verdict)
        over = (
            v.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("bucket_n"))
            .filter(F.col("bucket_n") > max_bucket)
        )
        if drop_observation is not None:
            # filled EAGERLY at operator build (one tiny job, which
            # also materializes the bucketed checkpoint the main query
            # reuses): drop_observation.get is ready before any action
            # on the result. Lazy in-plan metrics are not an option —
            # AQE reads observed metrics from the FINAL plan and its
            # empty-relation propagation prunes the CollectMetrics
            # node exactly when every vector was dropped (see
            # dedup._cap_buckets).
            drop_observation_df = over.observe(
                drop_observation,
                F.count(F.lit(1)).alias("dropped_buckets"),
                F.coalesce(F.sum("bucket_n"), F.lit(0)).alias("dropped_rows"),
            )
            drop_observation_df.collect()
        v = v.join(F.broadcast(over.select("bucket")), "bucket", "left_anti")
    return v


def _probe_flips(n_bits: int, n_probe: int) -> list[int]:
    """Multi-probe XOR masks: every bucket id within Hamming distance
    n_probe of the vector's own bucket. Radius 1 adds n_bits probes,
    radius 2 adds n_bits*(n_bits-1)/2 more — the standard multi-probe
    LSH trade that lets n_bits scale with the corpus (smaller buckets)
    without collapsing recall for pairs that disagree on 1-2 signs."""
    if n_probe not in (0, 1, 2):
        raise ValueError(f"n_probe must be 0, 1 or 2, got {n_probe}")
    flips = [0]
    if n_probe >= 1:
        flips += [1 << i for i in range(n_bits)]
    if n_probe >= 2:
        flips += [
            (1 << i) | (1 << j) for i in range(n_bits) for j in range(i + 1, n_bits)
        ]
    return flips


def _probed(v: DataFrame, n_bits: int, n_probe: int) -> DataFrame:
    """Explode the probe side into its probe buckets. Each candidate
    pair meets EXACTLY once (the single flip f = bucket_a XOR bucket_b
    satisfies the join), so downstream ranking needs no dedup."""
    flips = _probe_flips(n_bits, n_probe)
    if len(flips) == 1:
        return v
    return v.withColumn(
        "bucket",
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(f)) for f in flips])
        ),
    )


def _probed_self(v: DataFrame, n_bits: int, n_probe: int) -> DataFrame:
    """Probe explosion for the SELF-pairs join. For radius 1 the flip
    set halves by symmetry: a pair whose buckets differ in bit i has
    that bit SET on exactly one side, so only rows with bit i set
    probe across flip e_i (the clear side is reached, never probes)
    and every cross-bucket candidate still meets exactly once — the
    exploded frame shrinks from (n_bits+1)*N rows to (n_bits/2+1)*N
    expected, which is the probe side's exchange, Arrow transfer and
    kernel-conversion volume. Requires the downstream emit to
    canonicalize pair order (min id first): which side is Q is now
    decided by bucket bits, not id order. Radius 2 keeps the full
    two-sided explosion (a 2-bit-apart pair can split its set bits
    across the sides, so one-siding would miss it); radius 0 has
    nothing to halve.

    The output carries an `_own` flag (probe bucket == home bucket).
    Downstream MUST dedupe own-bucket meetings with the classic
    id-order filter (they occur in both directions) and emit probe
    meetings unconditionally (each occurs exactly once) — relying on
    distinct() instead is WRONG for the BLAS kernel path: the two
    directions of an own-bucket meeting score the same pair in
    different chunk layouts, and a one-ulp reassociation difference
    defeats the distinct (caught by a real duplicate at threshold
    0.3749... vs ...46 in test_ann_refine_kernel_matches_expr).
    Two-sided fallbacks mark every row `_own` so the id-order filter
    reduces to the classic dedup."""
    if n_probe != 1:
        return _probed(v, n_bits, n_probe).withColumn("_own", F.lit(True))
    flips = F.array(F.lit(0), *[F.lit(1 << i) for i in range(n_bits)])
    own = F.filter(
        flips,
        lambda f: (f == F.lit(0)) | (F.col("bucket").bitwiseAND(f) != F.lit(0)),
    )
    probe = F.explode(
        F.transform(
            own,
            lambda f: F.struct(
                F.col("bucket").bitwiseXOR(f).alias("b"),
                (f == F.lit(0)).alias("o"),
            ),
        )
    )
    return (
        v.withColumn("_p", probe)
        .withColumn("bucket", F.col("_p.b"))
        .withColumn("_own", F.col("_p.o"))
        .drop("_p")
    )


def _pa_empty(names: list, types: list):
    """Typed empty Arrow table (cogrouped kernels must return the
    declared schema even for one-sided groups)."""
    import pyarrow as pa

    return pa.table({n: pa.array([], type=t) for n, t in zip(names, types)})


def _pa_id_type(id_dtype: str):
    import pyarrow as pa

    return {
        "string": pa.string(), "bigint": pa.int64(), "int": pa.int32(),
        "smallint": pa.int16(), "tinyint": pa.int8(),
    }[id_dtype]


def _bucket_topk_kernel_bidir(id_col: str, id_dtype: str, k: int):
    """Bidirectional per-bucket BLAS top-k for the HALVED self-probe
    explosion (_probed_self, n_probe=1): with one-sided radius-1
    probing a bucket's visitors cover only the flips where the
    bucket's bit is 0, so the kernel emits BOTH directions of every
    meeting — row-wise (each probe row's top-k over the bucket's
    targets, exactly the classic kernel) and column-wise (each
    TARGET's top-k over the bucket's VISITOR rows, recovering the
    candidates whose one-sided probe landed here instead of being
    probed from the target's side). Every ordered (query, candidate)
    pair within bucket-Hamming <= 1 is emitted exactly once across
    the two directions (visitors are never own-bucket rows, own-
    bucket pairs emit from each member's own probe row), and both
    directions prune with the SAME total order as the global merge
    (-score, then id), so the merged top-k is identical to the
    two-sided explosion's — while the probe side of the exchange
    shrinks from (n_bits+1) x N to (n_bits/2+1) x N expected rows,
    which is the bulk of the cogroup's shuffle and Arrow volume."""
    import pyarrow as pa

    idt = _pa_id_type(id_dtype)
    empty = _pa_empty(["query_id", id_col, "score"],
                      [idt, idt, pa.float64()])

    def kernel(qtab, ttab):
        max_elems = REFINE_CHUNK_ELEMS
        if qtab.num_rows == 0 or ttab.num_rows == 0:
            return empty
        t_order = np.argsort(_col_np(ttab.column(id_col)), kind="stable")
        tids = _col_np(ttab.column(id_col))[t_order]
        T = _list_matrix(ttab.column("v"))[t_order]
        Q = _list_matrix(qtab.column("v"))
        qids = _col_np(qtab.column(id_col))
        qown = _col_np(qtab.column("_own")).astype(bool)
        tn = np.linalg.norm(T, axis=1)[None, :]
        qn = np.linalg.norm(Q, axis=1)
        kk = min(k, len(tids))
        out_q, out_t, out_s = [], [], []
        # column-wise candidates accumulate across row chunks and
        # reduce at the end (k per column per chunk, tiny)
        col_v, col_s = [], []
        step = max(1, max_elems // max(1, len(tids)))
        for s in range(0, len(qids), step):
            e = min(len(qids), s + step)
            S = (Q[s:e] @ T.T) / (qn[s:e, None] * tn)
            S[qids[s:e, None] == tids[None, :]] = -np.inf  # exclude self
            # row-wise: top-k per probe row (targets pre-sorted by id,
            # stable argsort -> (-score, id) order, the merge's order)
            part = np.sort(np.argpartition(-S, kk - 1, axis=1)[:, :kk], axis=1)
            ps = np.take_along_axis(S, part, axis=1)
            idx = np.take_along_axis(
                part, np.argsort(-ps, axis=1, kind="stable"), axis=1
            )
            scores = np.take_along_axis(S, idx, axis=1).ravel()
            keep = np.isfinite(scores)
            out_q.append(np.repeat(qids[s:e], kk)[keep])
            out_t.append(tids[idx].ravel()[keep])
            out_s.append(scores[keep])
            # column-wise: per TARGET top-k over this chunk's visitor
            # rows (own rows excluded — their pairs emit row-wise)
            vis = ~qown[s:e]
            nv = int(vis.sum())
            if nv:
                Sv = S[vis]
                vids = qids[s:e][vis]
                kv = min(k, nv)
                cpart = np.argpartition(-Sv, kv - 1, axis=0)[:kv]
                col_v.append(vids[cpart])        # [kv, n_t]
                col_s.append(np.take_along_axis(Sv, cpart, axis=0))
        if col_v:
            CV = np.concatenate(col_v, axis=0)   # [sum kv, n_t]
            CS = np.concatenate(col_s, axis=0)
            kc = min(k, CV.shape[0])
            # per column: order candidates by (-score, id) — lexsort
            # keys are (id, -score) with the LAST key primary
            order = np.lexsort((CV, -CS), axis=0)[:kc]
            cs = np.take_along_axis(CS, order, axis=0).ravel(order="F")
            cv = np.take_along_axis(CV, order, axis=0).ravel(order="F")
            cq = np.repeat(tids[None, :], kc, axis=0).ravel(order="F")
            keep = np.isfinite(cs)
            out_q.append(cq[keep])
            out_t.append(cv[keep])
            out_s.append(cs[keep])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=idt),
            id_col: pa.array(np.concatenate(out_t), type=idt),
            "score": pa.array(np.concatenate(out_s)),
        })

    schema = f"query_id {id_dtype}, {id_col} {id_dtype}, score double"
    return kernel, schema


def _bucket_topk_kernel(id_col: str, id_dtype: str, k: int):
    """Per-bucket BLAS refine for ann_topk: one cogrouped kernel per
    bucket computes the FULL query x target cosine matrix with one
    matmul, then keeps each query's local top-k (stable argsort over
    targets pre-sorted by id, so score ties break by lowest id exactly
    like the window rank downstream). Emits k rows per (query, probe
    bucket) instead of bucket_n — the candidate stream shrinks from
    N x probes x bucket_n to N x probes x k BEFORE the shuffle, and
    the scoring runs at BLAS speed instead of one interpreted Catalyst
    fold per candidate (the refine='expr' path's cost). Arrow-native
    (applyInArrow): the vector columns arrive as contiguous list
    buffers and reshape in one view (_list_matrix) instead of one
    np.asarray per row through pandas object arrays."""
    import pyarrow as pa

    idt = _pa_id_type(id_dtype)
    empty = _pa_empty(["query_id", id_col, "score"],
                      [idt, idt, pa.float64()])

    def kernel(qtab, ttab):
        max_elems = REFINE_CHUNK_ELEMS
        if qtab.num_rows == 0 or ttab.num_rows == 0:
            return empty
        t_order = np.argsort(_col_np(ttab.column(id_col)), kind="stable")
        tids = _col_np(ttab.column(id_col))[t_order]
        T = _list_matrix(ttab.column("v"))[t_order]
        Q = _list_matrix(qtab.column("v"))
        qids = _col_np(qtab.column(id_col))
        tn = np.linalg.norm(T, axis=1)[None, :]
        qn = np.linalg.norm(Q, axis=1)
        kk = min(k, len(tids))
        outs = []
        # chunk the query side so the score matrix never exceeds
        # ~max_elems float64s (256 MB): a degenerate mega-bucket at
        # the cap boundary would otherwise allocate |Q| x |T| in one go
        step = max(1, max_elems // max(1, len(tids)))
        for s in range(0, len(qids), step):
            e = min(len(qids), s + step)
            S = (Q[s:e] @ T.T) / (qn[s:e, None] * tn)
            S[qids[s:e, None] == tids[None, :]] = -np.inf  # exclude self
            # O(nt) argpartition to the kk winners, then order just
            # those by (-score, id): re-sorting the partition indices
            # ascending makes positions == ascending target id (tids
            # are pre-sorted), so the stable score argsort breaks ties
            # by lowest id like the rank window. (A tie ACROSS the
            # partition boundary can admit either member — same class
            # of near-tie freedom the refine='kernel' contract already
            # grants.)
            part = np.sort(np.argpartition(-S, kk - 1, axis=1)[:, :kk], axis=1)
            ps = np.take_along_axis(S, part, axis=1)
            idx = np.take_along_axis(
                part, np.argsort(-ps, axis=1, kind="stable"), axis=1
            )
            scores = np.take_along_axis(S, idx, axis=1).ravel()
            keep = np.isfinite(scores)  # drop self rows that slipped in
            outs.append((
                np.repeat(qids[s:e], kk)[keep],
                tids[idx].ravel()[keep],
                scores[keep],
            ))
        return pa.table({
            "query_id": pa.array(np.concatenate([o[0] for o in outs]), type=idt),
            id_col: pa.array(np.concatenate([o[1] for o in outs]), type=idt),
            "score": pa.array(np.concatenate([o[2] for o in outs])),
        })

    schema = f"query_id {id_dtype}, {id_col} {id_dtype}, score double"
    return kernel, schema


def ann_topk(
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_bits: int | None = None,
    target_bucket: int = TARGET_BUCKET,
    n_probe: int = 1,
    max_bucket: int | str | None = "auto",
    refine: str = "kernel",
    bit_exact: bool = False,
    drop_observation=None,
) -> DataFrame:
    """Approximate all-pairs top-k: bucket equi-join then exact cosine
    refine inside each bucket. Output (query_id, vec_id, score, rank).

    `drop_observation` (a pyspark Observation) makes the default-armed
    max_bucket guard observable from the operator itself: it is filled
    eagerly at operator build (one tiny job that doubles as the index
    materialization), so observation.get carries dropped_buckets /
    dropped_rows as soon as the call returns — no separate
    ann_bucket_stats run needed to learn that the cap fired.

    n_bits=None (default) scales the bucket count with the corpus
    (auto_n_bits: ~log2(N / target_bucket), one count() job) so the
    per-bucket refine stays O(target_bucket^2) at any N; multi-probe
    (n_probe bit flips on the query side) keeps recall as n_bits
    grows; max_bucket drops degenerate mega-buckets whole (visible via
    ann_bucket_stats). Default max_bucket='auto' = 32 * target_bucket:
    with auto n_bits the MEAN bucket holds ~target_bucket vectors, so
    a bucket 32x over the mean is a degenerate pile of near-identical
    vectors whose O(n^2) refine belongs to exact dedup — the guard is
    armed by default (opt out with max_bucket=None), and only such
    degenerate piles are affected.

    refine='kernel' (default) is the PRODUCTION path: a cogrouped
    per-bucket Arrow kernel scores each bucket with one BLAS matmul
    and emits only each query's bucket-local top-k (candidate stream
    N x probes x k instead of N x probes x bucket_n), then a window
    merges the per-bucket winners. refine='expr' scores candidates
    with sequential Catalyst folds — bit-identical to the DuckDB
    oracle, the cross-engine reference the oracle registry pins
    (~75x slower at 100k vectors; never the production choice). Same
    candidate set and tie rules either way; kernel scores may differ
    from the fold path in final ulps (matmul reassociation), so
    near-exact score ties can rank differently — the standard ANN
    trade, not a correctness surface. `bit_exact` (default False)
    selects the bucket-assignment arithmetic the same way — the
    oracle registry pins True alongside refine='expr'."""
    if max_bucket == "auto":
        max_bucket = 32 * target_bucket
    if n_bits is None:
        n_bits = auto_n_bits(vectors.count(), target_bucket)
    v = _bucketed_vectors(
        vectors, n_bits, id_col, vec, max_bucket, bit_exact, drop_observation
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    if refine == "kernel":
        id_dtype = dict(vectors.select(id_col).dtypes)[id_col]
        # HALVED probe explosion (_probed_self): at radius 1 only rows
        # with the flip bit SET probe across it, and the bidirectional
        # kernel emits the reverse direction column-wise — the probe
        # side of the cogroup exchange (the dominant shuffle: every
        # probe row carries the full vector) shrinks ~45% with an
        # identical merged result. Radius 0/2 fall back to the full
        # two-sided explosion inside _probed_self (all rows _own), in
        # which case the column-wise pass is a no-op.
        a = _probed_self(v, n_bits, n_probe)
        kernel, schema = _bucket_topk_kernel_bidir(id_col, id_dtype, k)
        # fresh exprIds on the target side (self-cogroup ambiguity)
        t = v.select(*[F.col(c).alias(c) for c in v.columns])
        scored = (
            a.groupBy("bucket")
            .cogroup(t.groupBy("bucket"))
            .applyInArrow(kernel, schema)
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    a = _probed(v, n_bits, n_probe)
    if refine != "expr":
        raise ValueError(f"refine must be 'expr' or 'kernel', got {refine!r}")
    a = a.alias("a")
    t = v.alias("b")
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
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_bits: int | None = None,
    target_bucket: int = TARGET_BUCKET,
    n_probe: int = 1,
    max_bucket: int | str | None = "auto",
    refine: str = "kernel",
    bit_exact: bool = False,
    drop_observation=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, score) with
    cosine >= threshold, candidates from a sign-LSH bucket equi-join
    (never all-pairs — near-identical vectors share all hyperplane
    signs; the exact cosine filter keeps precision exact).

    Same corpus-scaling controls as ann_topk: n_bits auto-scales with
    N (default), n_probe bit-flip probes protect recall at high bit
    counts, max_bucket is the degenerate-corpus skew guard — default
    'auto' = 32 * target_bucket (see ann_topk: armed by default, only
    degenerate near-identical piles are dropped; opt out with None).

    refine='kernel' (default, the production path) scores each bucket
    with one BLAS matmul and emits only above-threshold pairs map-side
    (see ann_topk) — same pair set; scores differ from the fold path
    only in final ulps, so a pair whose cosine sits EXACTLY on the
    threshold could flip. refine='expr' + bit_exact=True is the
    cross-engine reference the oracle registry pins."""
    if max_bucket == "auto":
        max_bucket = 32 * target_bucket
    if n_bits is None:
        n_bits = auto_n_bits(vectors.count(), target_bucket)
    v = _bucketed_vectors(
        vectors, n_bits, id_col, vec, max_bucket, bit_exact, drop_observation
    )
    if refine == "kernel":
        id_dtype = dict(vectors.select(id_col).dtypes)[id_col]
        import pyarrow as pa

        idt = _pa_id_type(id_dtype)
        empty = _pa_empty(["id_a", "id_b", "score"],
                          [idt, idt, pa.float64()])

        # Arrow-native (applyInArrow): vector columns reshape from the
        # contiguous list buffers (_list_matrix) instead of paying one
        # np.asarray per row via pandas object arrays — on the probe
        # side that loop ran once per exploded row
        def kernel(qtab, ttab):
            max_elems = REFINE_CHUNK_ELEMS
            if qtab.num_rows == 0 or ttab.num_rows == 0:
                return empty
            Q = _list_matrix(qtab.column("v"))
            T = _list_matrix(ttab.column("v"))
            qids = _col_np(qtab.column(id_col))
            qown = _col_np(qtab.column("_own")).astype(bool)
            tids = _col_np(ttab.column(id_col))
            qn = np.linalg.norm(Q, axis=1)
            tn = np.linalg.norm(T, axis=1)[None, :]
            outs = []
            # chunked like the top-k kernel: score-matrix memory bound
            step = max(1, max_elems // max(1, len(tids)))
            for s in range(0, len(qids), step):
                e = min(len(qids), s + step)
                S = (Q[s:e] @ T.T) / (qn[s:e, None] * tn)
                # score mask FIRST, ids only at surviving cells:
                # string ids make the broadcast id matrix object-dtype
                # (b^2 interpreted compares per bucket — measured +7 s
                # over the whole 146k corpus); above-threshold hits
                # number ~0 per bucket, so touching ids there is free.
                # Own-bucket meetings occur in BOTH directions: keep
                # qid < tid there (exactly one survives — relying on
                # distinct() instead fails when the two directions'
                # BLAS chunk layouts differ by an ulp). A probe
                # meeting occurs exactly once with bucket-bit-decided
                # sides, so it is kept unconditionally and the pair
                # order CANONICALIZED (min id first) at emit.
                qi, ti = np.nonzero(S >= threshold)
                if len(qi):
                    qsel, tsel = qids[s:e][qi], tids[ti]
                    keep = np.where(qown[s:e][qi], qsel < tsel, qsel != tsel)
                    qi, ti = qi[keep], ti[keep]
                qsel, tsel = qids[s:e][qi], tids[ti]
                a_first = qsel < tsel
                outs.append((
                    np.where(a_first, qsel, tsel),
                    np.where(a_first, tsel, qsel),
                    S[qi, ti],
                ))
            return pa.table({
                "id_a": pa.array(
                    np.concatenate([o[0] for o in outs]), type=idt
                ),
                "id_b": pa.array(
                    np.concatenate([o[1] for o in outs]), type=idt
                ),
                "score": pa.array(np.concatenate([o[2] for o in outs])),
            })

        schema = f"id_a {id_dtype}, id_b {id_dtype}, score double"
        # fresh exprIds on the target side: a cogroup of two frames
        # sharing a lineage is an ambiguous self-join to the analyzer
        t = v.select(*[F.col(c).alias(c) for c in v.columns])
        return (
            _probed_self(v, n_bits, n_probe)
            .groupBy("bucket")
            .cogroup(t.groupBy("bucket"))
            .applyInArrow(kernel, schema)
            .distinct()
        )
    if refine != "expr":
        raise ValueError(f"refine must be 'expr' or 'kernel', got {refine!r}")
    a = _probed_self(v, n_bits, n_probe).alias("a")
    t = v.alias("b")
    dot = F.expr(_dot_expr("a.v", "b.v"))
    na = F.sqrt(F.expr(_dot_expr("a.v", "a.v")))
    nb = F.sqrt(F.expr(_dot_expr("b.v", "b.v")))
    # own-bucket meetings dedupe by id order, probe meetings are
    # unique and keep both orders (the side assignment is bucket-
    # decided, see _probed_self); least/greatest canonicalizes at
    # emit. The fold score is side-symmetric at the bit level even
    # under bit_exact (a_i*b_i == b_i*a_i exactly in IEEE, same
    # summation order).
    return (
        a.join(t, "bucket")
        .filter(
            F.when(
                F.col("a._own"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ).otherwise(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
            (dot / (na * nb)).alias("score"),
        )
        .filter(F.col("score") >= threshold)
        .distinct()
    )


def embedding_neardup_against(
    new_vecs: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_bits: int | None = None,
    target_bucket: int = TARGET_BUCKET,
    n_probe: int = 1,
    max_bucket: int | str | None = "auto",
    refine: str = "kernel",
    bit_exact: bool = False,
    drop_observation=None,
) -> DataFrame:
    """Incremental embedding dedup: (new_id, corpus_id, score) pairs
    with cosine >= threshold between a NEW batch and an EXISTING
    corpus — the embedding member of the `*_against` family
    (lsh_pairs_against for text, phash_neardup_against for images).
    The daily-ingest shape: the corpus is bucketed once per query, each
    arriving batch probes it through the shared sign-LSH bucket space;
    cost scales with |batch| x collision rate, not |corpus|^2.

    Corpus-scaling controls mirror embedding_neardup_pairs: n_bits
    auto-scales with the CORPUS count (the static side — also the only
    side a streaming caller can count), multi-probe protects recall,
    max_bucket='auto' (32 x target_bucket) drops degenerate corpus
    piles by default (opt out with None; drops visible via
    `drop_observation`, filled eagerly at build).

    `new_vecs` may be a STREAMING DataFrame: the plan then stays a
    stream-static bucket equi-join with expr-fold refine (a cogrouped
    kernel needs applyInPandas, which stream-static cannot host) and
    only the corpus side caps — the streaming ingest filter
    `streaming_embed_matches` wraps exactly this.

    A pair is emitted only for ids on opposite sides; a vector present
    in both frames matches itself (identical signs) — filter ids
    upstream if re-ingestion is possible."""
    streaming = new_vecs.isStreaming
    if max_bucket == "auto":
        max_bucket = 32 * target_bucket
    if n_bits is None:
        n_bits = auto_n_bits(corpus.count(), target_bucket)
    b = _bucketed_vectors(
        corpus, n_bits, id_col, vec, max_bucket, bit_exact, drop_observation
    )
    a = lsh_buckets(
        new_vecs, n_bits, id_col, vec, bit_exact=bit_exact, keep_vec=True
    ).select(F.col(id_col), F.col(vec).alias("v"), "bucket")
    if not streaming:
        a = a.localCheckpoint(eager=False)
        if max_bucket is not None:
            # both sides capped in batch mode (the _cap_buckets
            # discipline); the stream side cannot size itself
            over = (
                a.groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("bucket_n"))
                .filter(F.col("bucket_n") > max_bucket)
                .select("bucket")
            )
            a = a.join(F.broadcast(over), "bucket", "left_anti")
    a = _probed(a, n_bits, n_probe)
    if refine == "kernel" and not streaming:
        id_dtype = dict(corpus.select(id_col).dtypes)[id_col]
        import pyarrow as pa

        idt = _pa_id_type(id_dtype)
        empty = _pa_empty(["new_id", "corpus_id", "score"],
                          [idt, idt, pa.float64()])

        # Arrow-native (applyInArrow; see embedding_neardup_pairs)
        def kernel(qtab, ttab):
            if qtab.num_rows == 0 or ttab.num_rows == 0:
                return empty
            Q = _list_matrix(qtab.column("v"))
            T = _list_matrix(ttab.column("v"))
            qids = _col_np(qtab.column(id_col))
            tids = _col_np(ttab.column(id_col))
            qn = np.linalg.norm(Q, axis=1)
            tn = np.linalg.norm(T, axis=1)[None, :]
            outs = []
            step = max(1, REFINE_CHUNK_ELEMS // max(1, len(tids)))
            for s in range(0, len(qids), step):
                e = min(len(qids), s + step)
                S = (Q[s:e] @ T.T) / (qn[s:e, None] * tn)
                qi, ti = np.nonzero(S >= threshold)
                outs.append((qids[s:e][qi], tids[ti], S[qi, ti]))
            return pa.table({
                "new_id": pa.array(
                    np.concatenate([o[0] for o in outs]), type=idt
                ),
                "corpus_id": pa.array(
                    np.concatenate([o[1] for o in outs]), type=idt
                ),
                "score": pa.array(np.concatenate([o[2] for o in outs])),
            })

        schema = f"new_id {id_dtype}, corpus_id {id_dtype}, score double"
        t = b.select(*[F.col(c).alias(c) for c in b.columns])
        return (
            a.groupBy("bucket")
            .cogroup(t.groupBy("bucket"))
            .applyInArrow(kernel, schema)
            .distinct()
        )
    if refine != "expr" and not streaming:
        raise ValueError(f"refine must be 'expr' or 'kernel', got {refine!r}")
    aj, bj = a.alias("a"), b.alias("b")
    dot = F.expr(_dot_expr("a.v", "b.v"))
    na = F.sqrt(F.expr(_dot_expr("a.v", "a.v")))
    nb_ = F.sqrt(F.expr(_dot_expr("b.v", "b.v")))
    out = (
        aj.join(bj, "bucket")
        .select(
            F.col(f"a.{id_col}").alias("new_id"),
            F.col(f"b.{id_col}").alias("corpus_id"),
            (dot / (na * nb_)).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
    # multi-probe can meet a pair once per probe on the batch path;
    # a stream cannot host the distinct (stateful agg in append mode)
    # — consumers keying on new_id are unaffected (same contract as
    # the capped band joins)
    return out if streaming else out.distinct()


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


def _argmin_list(emb: np.ndarray, cent: np.ndarray,
                 max_elems: int = 1 << 25) -> np.ndarray:
    """Nearest-centroid assignment via the expansion
    d^2 = |e|^2 - 2 e.c + |c|^2: the |e|^2 term is constant per row and
    drops out of the argmin, so assignment is ONE BLAS matmul plus a
    broadcast add — measured 21 s -> ~0.2 s per 10k x 4096 x 64 batch
    vs the (rows, k, dim) subtract-square-sum tensor, which is pure
    memory traffic (the tensor would also be 20 GB dense). The
    (rows, k) score matrix is CHUNKED over rows to ~max_elems float64s
    (256 MB) so corpus-scaled codebooks stay memory-bounded.

    Note: the expansion reassociates the arithmetic, so a vector
    EXACTLY equidistant to two centroids may tie-break differently
    than the textbook form — standard k-means freedom, and the
    bit-stable consumers use ivf_topk_fixed's Catalyst fold instead."""
    n = emb.shape[0]
    k = cent.shape[0]
    c2 = (cent * cent).sum(axis=1)[None, :]
    ct = cent.T.copy()
    step = max(1, max_elems // max(1, k))
    out = np.empty(n, np.int64)
    for s in range(0, n, step):
        e = min(n, s + step)
        d = c2 - 2.0 * (emb[s:e] @ ct)
        out[s:e] = d.argmin(axis=1)
    return out


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> np.ndarray:
    """Fully distributed Lloyd k-means over an embedding column.

    Per iteration: the k x dim codebook broadcasts out, an Arrow
    kernel computes per-BATCH partial sums per list (at most k rows
    out per batch, each carrying one array<double> sum — a map-side
    combine; the earlier k*dim scalar-row emit built Python lists
    per centroid and pushed up to 4.2M tiny rows per batch at
    n_lists=2^16), one grouped reduce sums the partials per list,
    and only the k x dim result returns to the driver (k rows). No
    iteration ever pulls vectors driver-side, so the fit scales to
    any corpus (unlike the `ivf_centroids` sample fit, whose Lloyd
    steps are driver NumPy over a .limit() pull).

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
                if len(pdf) == 0:  # zero-row Arrow batch: np.stack would raise
                    continue
                emb = np.stack([np.asarray(v, np.float64) for v in pdf[vec]])
                a = _argmin_list(emb, c)
                # group rows by assigned list via one stable argsort;
                # each present list's sum is one vectorized np.sum over
                # its slice (rows stay in original order, so the
                # pairwise summation is bit-identical to a mask-based
                # per-centroid fold). Emits ONE array row per present
                # list — k rows per batch, not k*dim scalar rows.
                order = np.argsort(a, kind="stable")
                srt = a[order]
                uniq, starts = np.unique(srt, return_index=True)
                bounds = np.append(starts, len(srt))
                sums = [
                    emb[order[bounds[u]:bounds[u + 1]]].sum(axis=0).tolist()
                    for u in range(len(uniq))
                ]
                yield pd.DataFrame(
                    {
                        "list": uniq.astype("int64"),
                        "s": sums,
                        "n": np.diff(bounds).astype("int64"),
                    }
                )

        def reduce_list(pdf):
            s = np.zeros(dim, np.float64)
            for arr in pdf["s"]:
                s += np.asarray(arr, np.float64)
            return pd.DataFrame(
                {
                    "list": [int(pdf["list"].iloc[0])],
                    "s": [s.tolist()],
                    "n": [int(pdf["n"].sum())],
                }
            )

        rows = (
            src.mapInPandas(partial, "list long, s array<double>, n long")
            .groupBy("list")
            .applyInPandas(reduce_list, "list long, s array<double>, n long")
            .collect()
        )
        new = cent.copy()
        for r in rows:
            new[r["list"]] = np.asarray(r["s"], np.float64) / r["n"]
        cent = new
        bc.destroy()
    return cent


def ivf_topk(
    vectors: DataFrame,
    k: int = 5,
    n_lists: int | None = 8,
    id_col: str = "vec_id",
    vec: str = "embedding",
    sample: int | None = None,
    fit: str = "distributed",
    refine: str = "kernel",
) -> DataFrame:
    """IVF ANN: coarse-quantize every vector to its nearest centroid
    (one mapInPandas pass with the broadcast codebook), then exact
    cosine refine INSIDE each list (equi-join on list id). The scale
    shape: candidate generation is a hash join on `list`, never an
    all-pairs cross join.

    n_lists=None scales the list count with the corpus (~sqrt(N),
    the standard IVF sizing: fit cost k*dim*N and per-list refine
    (N/k)^2 balance at k ~ sqrt(N)); assignment kernels chunk the
    distance tensor so large codebooks stay memory-bounded.

    refine='kernel' (default) scores each list with one cogrouped
    BLAS matmul and emits per-query local top-k (the same production
    kernel as ann_topk); refine='expr' is the fold-based cross-engine
    reference — the oracle registry exercises that arithmetic through
    ivf_topk_fixed (see ann_topk for the near-tie caveat)."""
    import math

    spark = vectors.sparkSession
    if n_lists is None:
        n_lists = max(2, min(1 << 16, int(round(math.sqrt(vectors.count())))))
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
        # passes the embedding through (cast to float64) so list
        # assignment is one map-side pass — no shuffle join back to
        # the vector table just to re-attach the embedding column
        c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emb = np.stack([np.asarray(v, np.float64) for v in pdf[vec]])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "list": _argmin_list(emb, c),
                    "v": [list(map(float, r)) for r in emb],
                }
            )

    # checkpoint the assigned frame: both join sides consume it and
    # Python-kernel stages are not exchange-reusable (the 'build the
    # IVF index once' step)
    v = vectors.select(id_col, vec).mapInPandas(
        assign, f"{id_col} long, list long, v array<double>"
    ).localCheckpoint(eager=False)
    if refine == "kernel":
        id_dtype = dict(vectors.select(id_col).dtypes)[id_col]
        kernel, schema = _bucket_topk_kernel(id_col, id_dtype, k)
        t = v.select(*[F.col(c).alias(c) for c in v.columns])
        scored = (
            v.groupBy("list").cogroup(t.groupBy("list")).applyInArrow(kernel, schema)
        )
        wk = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col(id_col).asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
        )
    if refine != "expr":
        raise ValueError(f"refine must be 'expr' or 'kernel', got {refine!r}")
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
