"""Deterministic synthesis of the graft input table (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
  image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
  caption:string, phash:int64  (+ derived lat:double, lng:double)

Everything is seeded and index-addressable, so ANY slice of the table
can be generated independently on any executor — `synth_partition`
is called inside mapInPandas with disjoint index ranges, which is how
the table scales out without a driver-side loop. An Iceberg table is a
writer-config swap; parquet stands in locally.

Geotag derivation: lng from the low 32 bits of phash, lat from the
high 32 bits (FIXTURES.md F1). skew_frac of rows are remapped into one
hot cell to exercise the salting path (north_rule requirement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .imageio import encode_png, encode_raw, phash64

SEED = 42
HOT_CELL_LAT, HOT_CELL_LNG = 48.85, 2.35  # the hot cell's anchor point

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lat double, lng double"
)

_SIZES = (16, 32, 64)
_FMTS = ("raw", "png")


def synth_image(i: int, seed: int = SEED):
    """One deterministic image row; pure function of (seed, i)."""
    rng = np.random.default_rng(seed ^ i)
    w = h = _SIZES[i % len(_SIZES)]
    fmt = _FMTS[i % len(_FMTS)]
    pixels = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ph = phash64(pixels)
    buf = encode_raw(pixels) if fmt == "raw" else encode_png(pixels)
    return w, h, fmt, pixels, ph, buf


def _geotag(phash: np.ndarray, i: np.ndarray, skew_frac: float):
    u = np.uint64
    ph = phash.astype(np.int64).view(np.uint64)
    lng = (ph & u(0xFFFFFFFF)).astype(np.float64) / 2**32 * 360.0 - 180.0
    lat = (ph >> u(32)).astype(np.float64) / 2**32 * 180.0 - 90.0
    if skew_frac > 0:
        # Knuth-scramble the index so hot rows are uniformly interleaved
        # regardless of the slice being generated
        scram = (i.view(np.uint64) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        hot = scram < np.uint64(int(skew_frac * 2**32))
        # scatter within a tight ~0.01 degree box: one res-12 cell's worth
        lat = np.where(hot, HOT_CELL_LAT + (i % 997) * 1e-5, lat)
        lng = np.where(hot, HOT_CELL_LNG + (i % 991) * 1e-5, lng)
    return lat, lng


def synth_partition(lo: int, hi: int, seed: int = SEED, skew_frac: float = 0.0) -> pd.DataFrame:
    """Rows [lo, hi) of the synthetic image table, as a pandas frame."""
    rows_w, rows_h, rows_fmt, rows_ph, rows_buf, rows_id, rows_cap = [], [], [], [], [], [], []
    idx = np.arange(lo, hi, dtype=np.int64)
    for i in idx:
        w, h, fmt, _, ph, buf = synth_image(int(i), seed)
        rows_w.append(w)
        rows_h.append(h)
        rows_fmt.append(fmt)
        rows_ph.append(ph)
        rows_buf.append(buf)
        rows_id.append(f"img{int(i):012d}")
    ph = np.asarray(rows_ph, dtype=np.int64)
    lat, lng = _geotag(ph, idx, skew_frac)
    for i, la, ln in zip(idx, lat, lng):
        rows_cap.append(f"synthetic image {int(i)} at ({la:.4f},{ln:.4f})")
    return pd.DataFrame(
        {
            "image_id": rows_id,
            "bytes": rows_buf,
            "w": np.asarray(rows_w, np.int32),
            "h": np.asarray(rows_h, np.int32),
            "fmt": rows_fmt,
            "caption": rows_cap,
            "phash": ph,
            "lat": lat,
            "lng": lng,
        }
    )


def images_df(spark, n: int, seed: int = SEED, skew_frac: float = 0.0, slice_size: int = 2000):
    """Distributed synthesis: the index space is split into slices and
    each executor generates its own rows inside mapInPandas — no
    driver-side materialization, scales to any n."""
    from pyspark.sql import functions as F

    bounds = [(lo, min(lo + slice_size, n)) for lo in range(0, n, slice_size)]
    bdf = spark.createDataFrame(bounds, "lo long, hi long").repartition(
        max(1, min(len(bounds), spark.sparkContext.defaultParallelism))
    )

    def gen(batches):
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                yield synth_partition(int(lo), int(hi), seed, skew_frac)

    return bdf.mapInPandas(gen, IMAGES_SCHEMA)


# ----------------------------------------------------------------------
# ORACLE-grade arithmetic synthesis (every derived value SQL-exact)
# ----------------------------------------------------------------------
#
# The PCG-based synth above is great for bench realism but its pixels
# cannot be regenerated in SQL, so image queries over it are invisible
# to the DuckDB correctness gate. This variant derives EVERYTHING from
# closed-form integer arithmetic (31-bit LCG pixels, integer-luma
# 60-bit average hash, geotag from hash bits), so an oracle can
# recompute the whole pipeline — synthesis -> (png|raw) encode ->
# decode -> hash -> geotag -> join — from `range(n)` alone. Every
# intermediate stays < 2^53 (exact in both engines; DuckDB BIGINT
# multiply would raise on 64-bit overflow, so operands are masked to
# 31 bits between steps).

ARITH_SIZE = 8  # 8x8 px, one avg-hash grid cell per pixel


def arith_pixels(idx: np.ndarray, size: int = ARITH_SIZE) -> np.ndarray:
    """uint8[n, size, size, 3]: pix = (((i*2654435761 + k*97) & (2^31-1))
    * 48271 & (2^31-1)) >> 7 mod 256, k = flat pixel index."""
    idx = np.asarray(idx, np.int64)
    k = np.arange(size * size * 3, dtype=np.int64)
    a = (idx[:, None] * 2654435761 + k[None, :] * 97) & 0x7FFFFFFF
    b = (a * 48271) & 0x7FFFFFFF
    return ((b >> 7) % 256).astype(np.uint8).reshape(len(idx), size, size, 3)


def phash_arith(pixels: np.ndarray) -> np.ndarray:
    """60-bit integer average hash of uint8[n, 8, 8, 3].

    Integer luma 299r+587g+114b per cell; bit p (p < 60) set iff
    64*lum > total. Bits 60-63 stay clear so the value is positive in
    BOTH engines' int64 (no sign/overflow traps in << or geotag math).
    """
    p = pixels.astype(np.int64)
    lum = 299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]  # (n,8,8)
    flat = lum.reshape(len(pixels), 64)
    total = flat.sum(axis=1, keepdims=True)
    bits = (64 * flat) > total
    weights = np.concatenate(
        [np.int64(1) << np.arange(60, dtype=np.int64), np.zeros(4, np.int64)]
    )
    return (bits.astype(np.int64) * weights[None, :]).sum(axis=1)


def geotag_arith(ph: np.ndarray, idx: np.ndarray, skew_frac: float = 0.0):
    """lng from hash bits 0-29, lat from bits 30-59; optional hot-cell
    remap with the same Knuth scramble as _geotag."""
    lng = (ph & 0x3FFFFFFF).astype(np.float64) / 1073741824.0 * 360.0 - 180.0
    lat = ((ph >> 30) & 0x3FFFFFFF).astype(np.float64) / 1073741824.0 * 180.0 - 90.0
    if skew_frac > 0:
        scram = (idx * 2654435761) & 0xFFFFFFFF
        hot = scram < int(skew_frac * 2**32)
        lat = np.where(hot, HOT_CELL_LAT + (idx % 997).astype(np.float64) * 1e-05, lat)
        lng = np.where(hot, HOT_CELL_LNG + (idx % 991).astype(np.float64) * 1e-05, lng)
    return lat, lng


def synth_partition_arith(lo: int, hi: int, skew_frac: float = 0.0) -> pd.DataFrame:
    """Rows [lo, hi) of the arithmetic image table. fmt alternates
    raw/png by index so both decode paths run under the oracle."""
    idx = np.arange(lo, hi, dtype=np.int64)
    pixels = arith_pixels(idx)
    ph = phash_arith(pixels)
    lat, lng = geotag_arith(ph, idx, skew_frac)
    bufs, fmts = [], []
    for j, i in enumerate(idx):
        if i % 2 == 0:
            bufs.append(encode_raw(pixels[j]))
            fmts.append("raw")
        else:
            bufs.append(encode_png(pixels[j]))
            fmts.append("png")
    return pd.DataFrame(
        {
            "image_id": [f"img{int(i):012d}" for i in idx],
            "bytes": bufs,
            "w": np.full(len(idx), ARITH_SIZE, np.int32),
            "h": np.full(len(idx), ARITH_SIZE, np.int32),
            "fmt": fmts,
            "caption": [f"image {int(i)}" for i in idx],
            "phash": ph,
            "lat": lat,
            "lng": lng,
        }
    )


def images_df_arith(spark, n: int, skew_frac: float = 0.0, slice_size: int = 2000):
    """Distributed arithmetic synthesis (see images_df)."""
    bounds = [(lo, min(lo + slice_size, n)) for lo in range(0, n, slice_size)]
    bdf = spark.createDataFrame(bounds, "lo long, hi long").repartition(
        max(1, min(len(bounds), spark.sparkContext.defaultParallelism))
    )

    def gen(batches):
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                yield synth_partition_arith(int(lo), int(hi), skew_frac)

    return bdf.mapInPandas(gen, IMAGES_SCHEMA)


def arith_images_sql(n: int, skew_frac: float = 0.0) -> str:
    """DuckDB CTE regenerating the arithmetic image table's DERIVED
    columns (i, image_id, phash, lat, lng) from range(n) — the
    independent recomputation the oracle joins against. Returns a
    fragment usable as `with imgs as (<this>) ...`."""
    step = ("((((((i * 2654435761 + {k} * 97) & 2147483647) * 48271) "
            "& 2147483647) >> 7) % 256)")
    r = step.format(k="(p * 3 + 0)")
    g = step.format(k="(p * 3 + 1)")
    b = step.format(k="(p * 3 + 2)")
    lum = f"(299 * ({r}) + 587 * ({g}) + 114 * ({b}))"
    lng = "cast(ph & 1073741823 as double) / 1073741824.0 * 360.0 - 180.0"
    lat = "cast((ph >> 30) & 1073741823 as double) / 1073741824.0 * 180.0 - 90.0"
    if skew_frac > 0:
        thr = int(skew_frac * 2**32)
        hot = f"((i * 2654435761) & 4294967295) < {thr}"
        lat = (f"case when {hot} then {HOT_CELL_LAT!r} + "
               f"cast(i % 997 as double) * 1e-05 else {lat} end")
        lng = (f"case when {hot} then {HOT_CELL_LNG!r} + "
               f"cast(i % 991 as double) * 1e-05 else {lng} end")
    return f"""
select i, printf('img%012d', i) as image_id, ph as phash, {lat} as lat, {lng} as lng
from (
  select i, cast(sum(case when 64 * {lum} > total and p < 60
                then (1::bigint << cast(p as int)) else 0::bigint end) as bigint) as ph
  from (
    select i, p, sum({lum}) over (partition by i) as total
    from (select unnest(range(0, {n})) as i), (select unnest(range(0, 64)) as p)
  )
  group by i
)
"""

def phash64_batch(pixels: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit average-hash of uint8[n,h,w,3] (h,w multiples
    of 8). Same definition as imageio.phash64, batched."""
    p = pixels.astype(np.float64)
    luma = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    n, h, w = luma.shape
    grid = luma.reshape(n, 8, h // 8, 8, w // 8).mean(axis=(2, 4))
    bits = grid > grid.mean(axis=(1, 2), keepdims=True)
    weights = (1 << np.arange(63, -1, -1)).astype(np.uint64)
    vals = (bits.reshape(n, 64).astype(np.uint64) * weights).sum(axis=1)
    return vals.view(np.int64)


def synth_partition_fast(lo: int, hi: int, seed: int = SEED, skew_frac: float = 0.0,
                         size: int = 16) -> pd.DataFrame:
    """Bench-grade slice generator: one size, raw fmt, all-vectorized.
    Deterministic per (seed, lo, hi) slice."""
    n = hi - lo
    idx = np.arange(lo, hi, dtype=np.int64)
    rng = np.random.default_rng(seed ^ (lo * 1_000_003 + hi))
    pixels = rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8)
    ph = phash64_batch(pixels)
    lat, lng = _geotag(ph, idx, skew_frac)
    flat = pixels.reshape(n, -1)
    return pd.DataFrame(
        {
            "image_id": [f"img{int(i):012d}" for i in idx],
            "bytes": [flat[k].tobytes() for k in range(n)],
            "w": np.full(n, size, np.int32),
            "h": np.full(n, size, np.int32),
            "fmt": "raw",
            "caption": [f"synthetic image {int(i)}" for i in idx],
            "phash": ph,
            "lat": lat,
            "lng": lng,
        }
    )


def images_df_fast(spark, n: int, seed: int = SEED, skew_frac: float = 0.0,
                   slice_size: int = 20000, size: int = 16):
    """Distributed fast synthesis (see images_df)."""
    bounds = [(lo, min(lo + slice_size, n)) for lo in range(0, n, slice_size)]
    bdf = spark.createDataFrame(bounds, "lo long, hi long").repartition(
        max(1, min(len(bounds), spark.sparkContext.defaultParallelism))
    )

    def gen(batches):
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                yield synth_partition_fast(int(lo), int(hi), seed, skew_frac, size)

    out = bdf.mapInPandas(gen, IMAGES_SCHEMA)
    par = spark.sparkContext.defaultParallelism
    if len(bounds) < par:
        # Fewer slices than task slots (bench-scale corpora: 300k rows
        # = 15 slices on 32 cores): every downstream scan of the cached
        # frame would run at slice parallelism, idling half the machine
        # on CPU-heavy kernel stages. Spread the rows once at build
        # time — slice content is (seed, lo, hi)-deterministic, so the
        # shuffle changes partitioning only, never values. Corpora with
        # >= par slices already scan wide and skip the extra shuffle.
        out = out.repartition(par)
    return out
