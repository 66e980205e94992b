"""Audio-table operators: validation, exact features, fingerprint
near-dup, clip sampling — the audio leg of the multimodal ingest
pipeline, mirroring the image operators' contracts.

Table shape (the audio analog of the image input_hint): audio_id
string, bytes binary, sr int, n_samples int, channels int, fmt
string ('wav' container rows, 'pcm' headerless interleaved LE int16
— the analog of fmt='raw').

Design carried over from operators/images.py:
* `validate_audio` is two-tier — every metadata-decidable verdict
  (NULLs, format whitelist, positive metadata, pcm length equation,
  RIFF signature) is a pure Catalyst column expression; only
  structurally-plausible WAV rows enter the Arrow kernel, and a
  clean pcm corpus pays ZERO Python. Errors are DATA (same taxonomy
  codes as the image validator; reference errors.rs:5-47).
* `audio_features` returns EXACT integer features (duration_ms,
  peak, energy = sum of squares, zcross, afp fingerprint), so the
  Spark/DuckDB oracle hash compare is bit-stable — no float
  thresholds anywhere.
* `audio_neardup_pairs` is a CONFIG of the shared banded core
  (dedup.phash_neardup_pairs on the 64-bit energy fingerprint):
  banding, two-sided tiling, skew caps and drop observability all
  inherit — a new modality is a column name, not a new join.
* `sample_audio_clips` slices fixed-length windows as standalone WAV
  rows (the audio analog of sample_video_frames: byte/array slicing
  only, decode of the sampled subset happens downstream).

Row-conservation contract (learned the hard way from the webp route
gap): the kernel route list is exactly the non-pcm formats the
UnknownFormat prefilter admits, and the pytest suite pins output
ids == input ids across all formats and error classes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..codec_errors import DimensionMismatchError
from .images import (
    IMG_ERR_BAD_SIGNATURE,
    IMG_ERR_CODEC_UNAVAILABLE,
    IMG_ERR_CORRUPT_STREAM,
    IMG_ERR_DIMENSION_MISMATCH,
    IMG_ERR_INTERNAL,
    IMG_ERR_NULL_METADATA,
    IMG_ERR_NULL_PAYLOAD,
    IMG_ERR_TRUNCATED,
    IMG_ERR_UNKNOWN_FORMAT,
)

_AUDIO_FMTS = ("wav", "pcm")
_DECLINED_FMTS = ("mp3", "aac", "opus", "flac", "ogg")


def validate_audio(audio: DataFrame) -> DataFrame:
    """(audio_id, ok, err_code, err_detail) — one verdict per input
    row, errors as data. See the module docstring for the tier
    split; the taxonomy codes are shared with validate_images so a
    mixed-modality curation job filters one vocabulary."""
    from struct import error as struct_error

    from ..audioio import decode_audio

    schema = "audio_id string, ok boolean, err_code string, err_detail string"

    def _pre(code: str, detail) -> "F.Column":
        return F.struct(F.lit(code).alias("c"), detail.alias("d"))

    pcm_want = (
        F.col("n_samples").cast("long") * F.col("channels").cast("long") * 2
    )
    pre = (
        F.when(F.col("bytes").isNull(),
               _pre(IMG_ERR_NULL_PAYLOAD, F.lit("bytes is NULL")))
        .when(
            F.col("fmt").isNull() | F.col("sr").isNull()
            | F.col("n_samples").isNull() | F.col("channels").isNull(),
            _pre(
                IMG_ERR_NULL_METADATA,
                F.format_string(
                    "fmt=%s sr=%s n=%s ch=%s",
                    F.coalesce(F.col("fmt"), F.lit("None")),
                    F.coalesce(F.col("sr").cast("string"), F.lit("None")),
                    F.coalesce(F.col("n_samples").cast("string"), F.lit("None")),
                    F.coalesce(F.col("channels").cast("string"), F.lit("None")),
                ),
            ),
        )
        .when(
            (F.col("sr") <= 0) | (F.col("n_samples") <= 0)
            | (F.col("channels") <= 0),
            _pre(
                IMG_ERR_DIMENSION_MISMATCH,
                F.format_string(
                    "sr=%d n_samples=%d channels=%d must be positive",
                    F.col("sr"), F.col("n_samples"), F.col("channels"),
                ),
            ),
        )
        .when(
            # entropy-coded audio: VALID formats this engine has no
            # decoder for (the audio analog of mp4/h264 on the image
            # side) — CodecUnavailable, never UnknownFormat
            F.col("fmt").isin(*_DECLINED_FMTS),
            _pre(IMG_ERR_CODEC_UNAVAILABLE,
                 F.concat(F.lit("fmt="), F.col("fmt"))),
        )
        .when(
            ~F.col("fmt").isin(*_AUDIO_FMTS),
            _pre(IMG_ERR_UNKNOWN_FORMAT,
                 F.concat(F.lit("fmt="), F.col("fmt"))),
        )
        .when(
            (F.col("fmt") == "pcm") & (F.length("bytes") != pcm_want),
            _pre(
                IMG_ERR_TRUNCATED,
                F.format_string(
                    "%d bytes, want %d", F.length("bytes"), pcm_want
                ),
            ),
        )
        .when(
            (F.col("fmt") == "wav")
            & (
                (F.expr("substring(bytes, 1, 4)") != F.lit(b"RIFF"))
                | (F.expr("substring(bytes, 9, 4)") != F.lit(b"WAVE"))
            ),
            _pre(IMG_ERR_BAD_SIGNATURE, F.lit("missing RIFF/WAVE signature")),
        )
    )

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            ok = np.empty(n, bool)
            codes, details = [], []
            for r in range(n):
                try:
                    decode_audio(
                        bytes(pdf["bytes"].iloc[r]),
                        str(pdf["fmt"].iloc[r]),
                        int(pdf["sr"].iloc[r]),
                        int(pdf["n_samples"].iloc[r]),
                        int(pdf["channels"].iloc[r]),
                    )
                    code, detail = None, None
                except NotImplementedError as e:
                    code, detail = IMG_ERR_CODEC_UNAVAILABLE, str(e)[:80]
                except DimensionMismatchError as e:
                    code, detail = IMG_ERR_DIMENSION_MISMATCH, str(e)[:80]
                except (ValueError, IndexError, struct_error) as e:
                    code, detail = IMG_ERR_CORRUPT_STREAM, str(e)[:80]
                except Exception as e:  # contract: errors are DATA
                    code, detail = IMG_ERR_INTERNAL, str(e)[:80]
                ok[r] = code is None
                codes.append(code)
                details.append(detail)
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"].astype(str),
                    "ok": ok,
                    "err_code": pd.Series(codes, dtype="object"),
                    "err_detail": pd.Series(details, dtype="object"),
                }
            )

    src = audio.select(
        "audio_id", "bytes", "fmt", "sr", "n_samples", "channels"
    ).withColumn("pre", pre)
    decided_err = src.filter(F.col("pre").isNotNull()).select(
        F.col("audio_id").cast("string").alias("audio_id"),
        F.lit(False).alias("ok"),
        F.col("pre.c").alias("err_code"),
        F.col("pre.d").alias("err_detail"),
    )
    # pcm rows with the right length are fully valid (frombuffer +
    # reshape cannot fail): pure Catalyst verdict. Only wav rows that
    # passed the RIFF prefilter need the container walk + decode —
    # the route list is exactly the prefilter whitelist minus pcm
    decided_ok = src.filter(
        F.col("pre").isNull() & (F.col("fmt") == "pcm")
    ).select(
        F.col("audio_id").cast("string").alias("audio_id"),
        F.lit(True).alias("ok"),
        F.lit(None).cast("string").alias("err_code"),
        F.lit(None).cast("string").alias("err_detail"),
    )
    needs_kernel = F.col("pre").isNull() & (F.col("fmt") == "wav")
    return decided_err.unionByName(
        src.filter(needs_kernel).drop("pre").mapInPandas(kernel, schema)
    ).unionByName(decided_ok)


def audio_features(audio: DataFrame, n_windows: int = 64) -> DataFrame:
    """Exact integer features per clip: (audio_id, sr, n_samples,
    duration_ms, peak, energy, zcross, afp).

    The metadata columns (sr, n_samples, and duration_ms =
    n_samples * 1000 // sr) ride THROUGH the kernel rather than
    re-joining the table afterwards — a join-back would be an extra
    exchange of the full (id, metadata) projection at 10^12 rows,
    the exact shape the crossmodal carried-column verify replaced.

    Features are computed on the 16-BIT-NORMALIZED signal
    (audioio.decode_audio_norm16): scale-invariant across container
    widths — a clip has the same peak/energy/zcross/afp whether it
    shipped as 16/24/32-bit PCM, float, G.711 or ADPCM — and the
    int64 energy accumulator is exact to ~8.6e9 samples (native
    32-bit-scale energy is unstorable in a long at all).
    peak/energy/zcross are channel-0 integer stats
    (audioio.audio_stats_exact); afp is the 64-bit energy
    fingerprint (audioio.audio_fingerprint64), the banding column
    for audio_neardup_pairs. Clips shorter than n_windows cannot
    fingerprint: they emit afp = NULL (a data outcome, not a stage
    failure) and near-dup skips them."""
    from ..audioio import (
        audio_fingerprint64,
        audio_stats_exact,
        decode_audio_norm16,
    )

    schema = ("audio_id string, sr int, n_samples int, duration_ms long, "
              "peak long, energy long, zcross long, afp long")

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "sr", "n_samples",
                                   "duration_ms", "peak", "energy",
                                   "zcross", "afp")}
            # column-wise extraction once per batch: per-row .iloc is
            # a pandas positional lookup per FIELD per row (6 per
            # clip), pure interpreter overhead in the hot loop
            ids = pdf["audio_id"].to_numpy()
            bufs = pdf["bytes"].to_numpy()
            fmts = pdf["fmt"].to_numpy()
            srs = pdf["sr"].to_numpy()
            ns = pdf["n_samples"].to_numpy()
            chs = pdf["channels"].to_numpy()
            for r in range(len(pdf)):
                sr = int(srs[r])
                n = int(ns[r])
                x = decode_audio_norm16(
                    bytes(bufs[r]), str(fmts[r]), sr, n, int(chs[r])
                )
                st = audio_stats_exact(x)
                out["audio_id"].append(str(ids[r]))
                out["sr"].append(sr)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // sr)
                out["peak"].append(st["peak"])
                out["energy"].append(st["energy"])
                out["zcross"].append(st["zcross"])
                out["afp"].append(
                    audio_fingerprint64(x, n_windows)
                    if n >= n_windows else None
                )
            yield pd.DataFrame(out)

    return audio.select(
        "audio_id", "bytes", "fmt", "sr", "n_samples", "channels"
    ).mapInPandas(kernel, schema)


def audio_neardup_pairs(
    audio: DataFrame,
    max_hamming: int = 2,
    n_bands: int = 4,
    n_windows: int = 64,
    hot_threshold: int | None = 4096,
    max_bucket: int | None = None,
    drop_observation=None,
) -> DataFrame:
    """Near-duplicate clips by energy-fingerprint Hamming distance:
    (id_a, id_b, hamming). A pure CONFIG of the shared banded core —
    fingerprint column in, phash_neardup_pairs machinery (banding,
    guaranteed recall for max_hamming < n_bands, adaptive two-sided
    tiling, armed caps with drop observability) unchanged."""
    from .dedup import phash_neardup_pairs

    feats = audio_features(audio, n_windows).select("audio_id", "afp") \
        .filter(F.col("afp").isNotNull())  # sub-n_windows clips: no fp
    return phash_neardup_pairs(
        feats, max_hamming=max_hamming, id_col="audio_id", phash="afp",
        n_bands=n_bands, hot_threshold=hot_threshold,
        max_bucket=max_bucket, drop_observation=drop_observation,
    )


def sample_audio_clips(
    audio: DataFrame, clip_samples: int, n_clips: int = 4
) -> DataFrame:
    """Fixed-length clip sampling (the audio analog of
    sample_video_frames): n_clips windows of clip_samples frames at
    deterministic evenly-spaced offsets, re-emitted as standalone
    16-bit WAV rows (audio_id, clip_idx, t0 = exact sample offset,
    t0_ms, bytes, sr, n_samples, channels, fmt='wav') the rest of
    the audio suite decodes. Sources decode through the 16-bit
    NORMALIZED path (deep PCM shifts down rather than saturating at
    +-32767 — re-encoding native 24/32-bit values into an i16
    container would square-wave anything above -48 dBFS). Clips
    shorter than clip_samples emit nothing (same posture as frame
    sampling past EOF)."""
    from ..audioio import decode_audio_norm16, encode_wav

    schema = ("audio_id string, clip_idx int, t0 long, t0_ms long, "
              "bytes binary, sr int, n_samples int, channels int, "
              "fmt string")

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "clip_idx", "t0", "t0_ms",
                                   "bytes", "sr", "n_samples", "channels",
                                   "fmt")}
            for r in range(len(pdf)):
                sr = int(pdf["sr"].iloc[r])
                n = int(pdf["n_samples"].iloc[r])
                ch = int(pdf["channels"].iloc[r])
                if n < clip_samples:
                    continue
                x = decode_audio_norm16(
                    bytes(pdf["bytes"].iloc[r]), str(pdf["fmt"].iloc[r]),
                    sr, n, ch,
                )
                span = n - clip_samples
                for k in range(n_clips):
                    t0 = span * k // max(1, n_clips - 1) if n_clips > 1 else 0
                    w = x[t0 : t0 + clip_samples]
                    out["audio_id"].append(str(pdf["audio_id"].iloc[r]))
                    out["clip_idx"].append(k)
                    out["t0"].append(t0)
                    out["t0_ms"].append(t0 * 1000 // sr)
                    out["bytes"].append(encode_wav(w, sr, "i16"))
                    out["sr"].append(sr)
                    out["n_samples"].append(clip_samples)
                    out["channels"].append(ch)
                    out["fmt"].append("wav")
            yield pd.DataFrame(out)

    return audio.select(
        "audio_id", "bytes", "fmt", "sr", "n_samples", "channels"
    ).mapInPandas(kernel, schema)
