"""Corpus-scaled ANN: auto bucket counts, multi-probe recall, and the
degenerate-corpus bucket cap (the round-2 verdict's one weak spot).

Scale contract under test: bucket count grows with N (per-bucket
refine stays O(target^2)), recall survives higher n_bits via bit-flip
probes, and a pathological corpus of identical vectors cannot create
a quadratic bucket when max_bucket is set.
"""

import numpy as np
import pandas as pd
import pytest

from segment_rtree_spark.operators.embed import (
    _argmin_list,
    _probe_flips,
    ann_bucket_stats,
    ann_topk,
    auto_n_bits,
    cosine_topk,
    embedding_neardup_pairs,
)


def test_auto_n_bits_scaling():
    # <= target -> minimum (single split is pointless but harmless)
    assert auto_n_bits(100, target_bucket=1024) == 1
    assert auto_n_bits(1024, target_bucket=1024) == 1
    # average bucket ~ target: N / 2^bits <= target
    for n in (10_000, 1_000_000, 10**9, 10**12):
        bits = auto_n_bits(n, target_bucket=1024)
        assert bits <= 24
        if bits < 24:
            assert n / (1 << bits) <= 1024
            assert n / (1 << (bits - 1)) > 1024  # not over-split
    # 10^9 vectors no longer live in 16 buckets
    assert auto_n_bits(10**9) == 20


def test_probe_flips():
    assert _probe_flips(4, 0) == [0]
    assert sorted(_probe_flips(4, 1)) == [0, 1, 2, 4, 8]
    r2 = _probe_flips(4, 2)
    assert len(r2) == 1 + 4 + 6 and len(set(r2)) == len(r2)
    assert all(bin(f).count("1") <= 2 for f in r2)
    with pytest.raises(ValueError):
        _probe_flips(4, 3)


def test_argmin_list_chunked_matches_dense():
    rng = np.random.default_rng(7)
    emb = rng.normal(size=(257, 16))
    cent = rng.normal(size=(13, 16))
    dense = ((emb[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    # tiny max_elems forces many chunks
    assert (_argmin_list(emb, cent, max_elems=64) == dense).all()
    assert (_argmin_list(emb, cent) == dense).all()


def _neardup_corpus(spark, n_base=120, dim=64, seed=3):
    """Base vectors + a tiny-noise twin for each: every base's true
    top-1 neighbor is its twin at cosine ~0.9999."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, dim))
    twin = base + 0.01 * rng.normal(size=(n_base, dim))
    emb = np.concatenate([base, twin])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(2 * n_base, dtype=np.int64),
         "embedding": [list(map(float, v)) for v in emb]}
    )
    return spark.createDataFrame(pdf), n_base


def test_multiprobe_recall_at_high_bits(spark):
    """At n_bits far above what 240 vectors need, plain bucketing loses
    twin pairs that disagree on one hyperplane sign; 1-bit multi-probe
    recovers them. Recall = fraction of twins found as top-1."""
    df, n_base = _neardup_corpus(spark)
    df = df.cache()

    def top1_recall(n_probe):
        out = ann_topk(df, k=1, n_bits=10, n_probe=n_probe).toPandas()
        got = dict(zip(out["query_id"], out["vec_id"]))
        hits = sum(1 for i in range(n_base) if got.get(i) == i + n_base)
        return hits / n_base

    r0, r1 = top1_recall(0), top1_recall(1)
    assert r1 >= r0  # probes only add candidates
    assert r1 >= 0.95  # twins differ on <=1 sign at cosine ~0.9999


def test_auto_bits_default_end_to_end(spark):
    """Defaults (n_bits=None -> auto, n_probe=1) find near-dup twins
    without any manual tuning, and exactly match brute force top-1."""
    df, n_base = _neardup_corpus(spark, n_base=80)
    df = df.cache()
    out = ann_topk(df, k=1).toPandas()  # 160 rows -> auto bits = 1
    got = dict(zip(out["query_id"], out["vec_id"]))
    hits = sum(1 for i in range(n_base) if got.get(i) == i + n_base)
    assert hits / n_base >= 0.99
    pairs = embedding_neardup_pairs(df, threshold=0.99).toPandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert all((i, i + n_base) in found for i in range(n_base))


def test_degenerate_corpus_bucket_cap(spark):
    """10k identical vectors: one mega-bucket. With max_bucket the
    whole bucket drops BEFORE the self-join (0 pairs instead of ~50M
    inside one task) and the stats table shows the truncation."""
    n = 10_000
    v = [0.25, -0.5, 1.0, 0.125] * 16
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [v] * n}
    )
    df = spark.createDataFrame(pdf).cache()
    pairs = embedding_neardup_pairs(df, threshold=0.99, max_bucket=100)
    assert pairs.count() == 0
    stats = ann_bucket_stats(
        df, n_bits=auto_n_bits(n), max_bucket=100
    ).toPandas()
    assert stats["truncated"].any()
    assert stats.loc[stats["truncated"], "bucket_n"].max() == n
    # and the exactness baseline still finds them (docs say: route
    # identical vectors through exact dedup, not ANN)
    exact = cosine_topk(df.filter("vec_id < 3"), df.filter("vec_id < 2"), k=2)
    assert exact.count() == 4


def test_lsh_buckets_matmul_parity(spark):
    """bit_exact=False (BLAS matmul) must bucket well-conditioned
    vectors identically to the sequential-fold oracle path; signs can
    only diverge within reassociation error of zero."""
    from segment_rtree_spark.operators.embed import lsh_buckets

    rng = np.random.default_rng(11)
    emb = rng.normal(size=(500, 64))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(500, dtype=np.int64),
         "embedding": [list(map(float, v)) for v in emb]}
    )
    df = spark.createDataFrame(pdf).cache()
    exact = lsh_buckets(df, n_bits=8, bit_exact=True).toPandas().set_index("vec_id")["bucket"]
    fast = lsh_buckets(df, n_bits=8, bit_exact=False).toPandas().set_index("vec_id")["bucket"]
    assert (exact.sort_index() == fast.sort_index()).all()


def test_embed_auto_max_bucket_guard(spark):
    """max_bucket defaults to 'auto' (32 x target_bucket): a degenerate
    pile of identical vectors exceeding the cap is dropped WHOLE from
    the candidate join without caller opt-in; max_bucket=None re-arms
    the unguarded O(n^2) bucket."""
    from pyspark.sql import functions as F

    from segment_rtree_spark.operators.embed import embedding_neardup_pairs

    vecs = spark.range(150).select(
        F.col("id").alias("vec_id"),
        F.expr("array_repeat(1.0d, 64)").alias("embedding"),
    )
    # auto cap = 32 * 2 = 64 < 150 -> the single degenerate bucket drops
    armed = embedding_neardup_pairs(vecs, threshold=0.9, n_bits=1, target_bucket=2)
    assert armed.count() == 0
    disarmed = embedding_neardup_pairs(
        vecs, threshold=0.9, n_bits=1, target_bucket=2, max_bucket=None
    )
    assert disarmed.count() == 150 * 149 // 2


def test_ann_refine_kernel_matches_expr(spark):
    """refine='kernel' (per-bucket BLAS + bucket-local top-k) returns
    the same neighbors and ranks as the bit-exact fold path on data
    without score ties."""
    from segment_rtree_spark.operators.embed import ann_topk, embedding_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e = ann_topk(emb, k=3, n_bits=4, n_probe=1, refine="expr", bit_exact=True).toPandas()
    g = ann_topk(emb, k=3, n_bits=4, n_probe=1, refine="kernel").toPandas()
    key = lambda df: sorted(zip(df.query_id, df.vec_id, df["rank"]))  # noqa: E731
    assert key(e) == key(g) and len(g)
    # scores agree to float-reassociation tolerance
    es = {(q, v): s for q, v, s in zip(e.query_id, e.vec_id, e.score)}
    for q, v, s in zip(g.query_id, g.vec_id, g.score):
        assert abs(es[(q, v)] - s) < 1e-12

    ep = embedding_neardup_pairs(emb, threshold=0.35, n_bits=4, refine="expr", bit_exact=True).toPandas()
    gp = embedding_neardup_pairs(
        emb, threshold=0.35, n_bits=4, refine="kernel"
    ).toPandas()
    assert sorted(zip(ep.id_a, ep.id_b)) == sorted(zip(gp.id_a, gp.id_b)) and len(gp)
    # no duplicate pairs on either path: own-bucket double meetings
    # dedupe by id order IN the operator, not via distinct (a one-ulp
    # BLAS chunk-layout difference between the two directions would
    # defeat distinct — a real duplicate caught at threshold 0.374904)
    assert not ep.duplicated(["id_a", "id_b"]).any()
    assert not gp.duplicated(["id_a", "id_b"]).any()


def test_ivf_refine_kernel_matches_expr(spark):
    """ivf_topk refine='kernel' == the fold path (same lists, same
    neighbors, same ranks on tie-free data)."""
    from segment_rtree_spark.operators.embed import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e = ivf_topk(emb, k=3, n_lists=4, refine="expr").toPandas()
    g = ivf_topk(emb, k=3, n_lists=4, refine="kernel").toPandas()
    key = lambda df: sorted(zip(df.query_id, df.vec_id, df["rank"]))  # noqa: E731
    assert key(e) == key(g) and len(g)


def test_refine_kernel_chunked_parity(spark, monkeypatch):
    """Tiny REFINE_CHUNK_ELEMS forces the multi-chunk score-matrix path
    in both cogrouped kernels; results must not change."""
    import segment_rtree_spark.operators.embed as E

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ref_topk = sorted(
        map(tuple, ann_topk(emb, k=3, n_bits=4, refine="kernel")
            .select("query_id", "vec_id", "rank").collect())
    )
    ref_pairs = sorted(
        map(tuple, embedding_neardup_pairs(emb, threshold=0.35, n_bits=4,
                                           refine="kernel")
            .select("id_a", "id_b").collect())
    )
    monkeypatch.setattr(E, "REFINE_CHUNK_ELEMS", 64)  # ~1 query row/chunk
    got_topk = sorted(
        map(tuple, ann_topk(emb, k=3, n_bits=4, refine="kernel")
            .select("query_id", "vec_id", "rank").collect())
    )
    got_pairs = sorted(
        map(tuple, embedding_neardup_pairs(emb, threshold=0.35, n_bits=4,
                                           refine="kernel")
            .select("id_a", "id_b").collect())
    )
    assert got_topk == ref_topk and got_pairs == ref_pairs and ref_topk


def test_ann_bucket_stats_auto_cap(spark):
    """The stats monitor accepts max_bucket='auto' and flags exactly
    the buckets the auto-capped operators drop."""
    from pyspark.sql import functions as F

    vecs = spark.range(150).select(
        F.col("id").alias("vec_id"),
        F.expr("array_repeat(1.0d, 64)").alias("embedding"),
    )
    stats = ann_bucket_stats(
        vecs, n_bits=1, max_bucket="auto", target_bucket=2
    ).toPandas()
    assert stats["truncated"].any()
    assert int(stats.loc[stats["truncated"], "bucket_n"].max()) == 150


def test_embed_drop_observation(spark):
    """The default-armed max_bucket guard is observable from the
    operator itself: drop_observation.get carries dropped_buckets /
    dropped_rows after one action (the r4 advisor's silent-drop
    finding)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from segment_rtree_spark.operators.embed import embedding_neardup_pairs

    vecs = spark.range(150).select(
        F.col("id").alias("vec_id"),
        F.expr("array_repeat(1.0d, 64)").alias("embedding"),
    )
    obs = Observation("embed_drops")
    out = embedding_neardup_pairs(
        vecs, threshold=0.9, n_bits=1, target_bucket=2, drop_observation=obs
    )
    assert out.count() == 0  # the degenerate pile was dropped...
    # ...and the observation says so in-band: 1 bucket, 150 vectors
    assert obs.get == {"dropped_buckets": 1, "dropped_rows": 150}


def test_embed_drop_observation_eager_and_optout(spark):
    """The drop observation is filled at operator BUILD (no action on
    the result needed), and an explicit max_bucket=None opt-out fills
    zeros instead of leaving observation.get to block forever."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from segment_rtree_spark.operators.embed import ann_topk

    vecs = spark.range(150).select(
        F.col("id").alias("vec_id"),
        F.expr("array_repeat(1.0d, 64)").alias("embedding"),
    )
    obs = Observation("eager")
    ann_topk(vecs, k=2, n_bits=1, target_bucket=2, drop_observation=obs)
    # no .count()/.collect() on the result: metrics already present
    assert obs.get == {"dropped_buckets": 1, "dropped_rows": 150}

    obs2 = Observation("optout")
    ann_topk(vecs, k=2, n_bits=1, target_bucket=2, max_bucket=None,
             drop_observation=obs2)
    assert obs2.get == {"dropped_buckets": 0, "dropped_rows": 0}


def test_embedding_neardup_against_matches_selfjoin(spark):
    """The incremental operator == the cross-side subset of the
    self-join operator at the same parameters (caps off), and its
    kernel refine == the expr reference."""
    from pyspark.sql import functions as F

    from segment_rtree_spark.operators.embed import (
        embedding_neardup_against,
        embedding_neardup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    new = emb.filter(F.col("vec_id") % 2 == 1)
    corp = emb.filter(F.col("vec_id") % 2 == 0)
    kw = dict(threshold=0.35, n_bits=4, n_probe=1, max_bucket=None)
    got_expr = {
        (r["new_id"], r["corpus_id"])
        for r in embedding_neardup_against(
            new, corp, refine="expr", bit_exact=True, **kw
        ).collect()
    }
    got_kern = {
        (r["new_id"], r["corpus_id"])
        for r in embedding_neardup_against(new, corp, **kw).collect()
    }
    assert got_expr == got_kern and got_expr
    # cross-side subset of the self-join (its pairs are id_a < id_b,
    # i.e. unordered; the against op is (new, corpus)-directed)
    self_pairs = embedding_neardup_pairs(
        emb, refine="expr", bit_exact=True, **kw
    ).collect()
    want = {
        (a, b) if a % 2 == 1 else (b, a)
        for a, b in ((r["id_a"], r["id_b"]) for r in self_pairs)
        if (a % 2) != (b % 2)
    }
    assert got_expr == want


def test_streaming_embed_matches_batch(spark, tmp_path, caplog):
    """Embedding stream-static ingest filter == the batch operator over
    the same arrivals, the default corpus-side cap drops a degenerate
    pile (with a build-time warning), and max_bucket=None restores the
    fan-out."""
    import logging
    import time

    from pyspark.sql import functions as F

    from segment_rtree_spark.operators.embed import embedding_neardup_against
    from segment_rtree_spark.streaming.ingest_stream import streaming_embed_matches

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") % 2 == 0).cache()
    arrivals = emb.filter(F.col("vec_id") % 2 == 1)
    src = str(tmp_path / "vec_arrivals")
    arrivals.coalesce(1).write.parquet(src)
    time.sleep(0.2)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(src)

    def drain(out, name):
        q = (
            out.writeStream.outputMode("append").format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"{name}_ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.sql(f"select * from {name}").collect()

    got = {
        (r["new_id"], r["corpus_id"])
        for r in drain(
            streaming_embed_matches(stream, corpus, threshold=0.35,
                                    n_bits=4, n_probe=1), "em_matches"
        )
    }
    want = {
        (r["new_id"], r["corpus_id"])
        for r in embedding_neardup_against(
            arrivals, corpus, threshold=0.35, n_bits=4, n_probe=1
        ).collect()
    }
    assert got == want and got

    # degenerate corpus: one 200-vector identical pile over the cap
    pile = spark.range(200).select(
        (F.col("id") * 2 + 10000).alias("vec_id"),
        F.expr("array_repeat(1.0d, 64)").alias("embedding"),
    )
    deg = corpus.select("vec_id", "embedding").unionAll(pile).cache()
    with caplog.at_level(logging.WARNING,
                         logger="segment_rtree_spark.streaming.ingest_stream"):
        guarded = streaming_embed_matches(
            stream, deg, threshold=0.9, n_bits=4, target_bucket=2
        )  # cap = 64 < 200
    warned = [r for r in caplog.records if "skew cap" in r.getMessage()]
    assert warned
    import re

    n_dropped = int(re.search(r"\((\d+) corpus vectors\)",
                              warned[0].getMessage()).group(1))
    assert n_dropped >= 200  # the pile (+ any real vectors sharing its bucket)
    hot_arrival = spark.createDataFrame(
        [(99999, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    # batch twin of the guarded stream plan: the pile contributes zero
    bat = embedding_neardup_against(
        hot_arrival, deg, threshold=0.9, n_bits=4, target_bucket=2
    )
    assert not any(r["corpus_id"] >= 10000 for r in bat.collect())


def test_neardup_pairs_one_sided_probe_exact_set(spark):
    """The radius-1 probe explosion is ONE-SIDED (only the bucket-bit-
    set side probes across each flip, see _probed_self); the candidate
    predicate must stay exactly {bucket Hamming <= 1} regardless of
    which side holds the smaller id. Reference: brute-force cosine +
    bucket Hamming over the same lsh_buckets assignment, checked for
    both refine paths."""
    from segment_rtree_spark.operators.embed import (
        embedding_neardup_pairs,
        lsh_buckets,
    )

    rng = np.random.default_rng(23)
    base = rng.normal(size=(60, 16))
    # near-dup twins BOTH directions: twin id above AND below its base
    # id, so a probing side with the larger id occurs by construction
    rows, vid = [], 0
    for b in base:
        for jitter in (0.0, 0.015):
            v = b + jitter * rng.normal(size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    ).cache()
    n_bits = 6
    buckets = (
        lsh_buckets(df, n_bits=n_bits, bit_exact=True)
        .toPandas().set_index("vec_id")["bucket"].to_dict()
    )
    V = np.array([r[1] for r in rows])
    nrm = np.linalg.norm(V, axis=1)
    S = (V @ V.T) / (nrm[:, None] * nrm[None, :])
    expected = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if S[i, j] >= 0.99 and bin(buckets[i] ^ buckets[j]).count("1") <= 1:
                expected.add((i, j))
    assert expected  # the fixture must actually exercise the probe
    for kwargs in ({"refine": "kernel"},
                   {"refine": "expr", "bit_exact": True}):
        got = embedding_neardup_pairs(
            df, threshold=0.99, n_bits=n_bits, max_bucket=None, **kwargs
        ).toPandas()
        assert set(zip(got.id_a, got.id_b)) == expected, kwargs
        assert (got.id_a < got.id_b).all()
        assert not got.duplicated(["id_a", "id_b"]).any()
