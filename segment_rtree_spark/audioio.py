"""WAV/RIFF audio codec: the audio leg of the multimodal ingest
surface, built from the public RIFF/WAVE container layout and the
ITU-T G.711 companding formulas.

The engine treats audio like images: an opaque `binary` column plus
typed metadata (sample_rate, n_samples, channels, fmt), decoded
per-row inside Arrow-batched kernels. Real decode for everything a
header-level codec can honestly do — PCM at 8/16/24/32-bit and
IEEE-float 32/64, G.711 mu-law and A-law (LUTs built from the ITU
formulas, javax.sound-conformance-tested), and IMA/DVI ADPCM
(tag 0x0011, block-vectorized nibble prediction, core
conformance-tested against CPython's independent audioop C
implementation) — while entropy-coded
audio (mp3/aac/opus, WAVE tags 0x55/0xFF00/...) declines as
`NotImplementedError` -> CodecUnavailable, the same errors-as-data
posture as lossy VP8 on the image side (reference errors.rs:5-47:
malformed input is a typed value, never a crash).

Guard posture matches the image stack (codec_errors.py):
* header fields are validated against the TABLE metadata before any
  buffer math (DimensionMismatchError), so a corrupt header cannot
  demand memory;
* chunk walks are bounds-checked (ValueError -> CorruptStream);
* valid-but-out-of-scope codec tags raise NotImplementedError
  (-> CodecUnavailable).

Scale posture: decode is NumPy views + 256-entry LUTs — no
per-sample Python — parallelized per-row by Spark like the image
decoders.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec_errors import DimensionMismatchError

# WAVE format tags (public registry, mmreg.h / RFC 2361)
WAVE_PCM = 0x0001
WAVE_IEEE_FLOAT = 0x0003
WAVE_ALAW = 0x0006
WAVE_MULAW = 0x0007
WAVE_EXTENSIBLE = 0xFFFE


def _g711_mulaw_table() -> np.ndarray:
    """ITU-T G.711 mu-law byte -> 16-bit linear (the classic
    +-32124-range expansion; bias 0x84)."""
    u = ~np.arange(256, dtype=np.int32) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _g711_alaw_table() -> np.ndarray:
    """ITU-T G.711 A-law byte -> 16-bit linear (+-32256 range;
    even-bit toggle 0x55; sign bit SET after the toggle = positive,
    per the Sun g711.c reference convention)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, mag, -mag).astype(np.int16)


_MULAW_DEC = _g711_mulaw_table()
_ALAW_DEC = _g711_alaw_table()


def _compand_encoder(table: np.ndarray):
    """decode-table -> nearest-value encoder (the canonical quantizer
    for OUR decode: argmin |x - table[b]| over the 256 bytes), so
    decode(encode(x)) is exactly the nearest representable level by
    construction — no separate segment formula to keep in sync."""
    order = np.argsort(table, kind="stable").astype(np.uint8)
    svals = table[order].astype(np.int32)
    mids = (svals[1:] + svals[:-1]) // 2  # decision boundaries

    def enc(x: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(mids, x.astype(np.int32), side="right")
        return order[idx]

    return enc


_mulaw_encode = _compand_encoder(_MULAW_DEC)
_alaw_encode = _compand_encoder(_ALAW_DEC)


WAVE_IMA_ADPCM = 0x0011

_TAG_NAMES = {
    0x0002: "MS-ADPCM", 0x0055: "MP3",
    0x0031: "GSM", 0x2000: "AC3",
}

# --- IMA/DVI ADPCM (WAVE tag 0x0011) --------------------------------
# Fixed-rate 4-bit nibble prediction (IMA "Recommended Practices for
# Enhancing Digital Audio Compatibility", the same tables audioop and
# every IMA decoder share) — NOT entropy-coded, so it belongs on the
# decodable side of the scope boundary with PCM and G.711.

_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
], np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _ima_core_decode(
    nibbles: np.ndarray, pred0: np.ndarray, idx0: np.ndarray
) -> np.ndarray:
    """[n_seq, k] 4-bit codes + per-sequence initial (predictor,
    index) -> [n_seq, k] 16-bit samples. The within-sequence loop is
    inherently sequential (each sample updates the predictor); the
    vectorization axis is across sequences (blocks x channels), which
    is the parallelism the WAV block structure provides."""
    pred = pred0.astype(np.int32).copy()
    idx = np.clip(idx0.astype(np.int32), 0, 88).copy()
    out = np.empty(nibbles.shape, np.int32)
    for t in range(nibbles.shape[1]):
        d = nibbles[:, t].astype(np.int32)
        step = _IMA_STEP[idx]
        vp = (step >> 3) + np.where(d & 4, step, 0) \
            + np.where(d & 2, step >> 1, 0) + np.where(d & 1, step >> 2, 0)
        pred = np.where(d & 8, pred - vp, pred + vp)
        np.clip(pred, -32768, 32767, out=pred)
        idx = np.clip(idx + _IMA_INDEX[d & 7], 0, 88)
        out[:, t] = pred
    return out


def _ima_core_encode(x: np.ndarray) -> tuple:
    """[n_seq, k] 16-bit samples -> ([n_seq, k] 4-bit codes, with
    per-sequence initial predictor = x[:, 0] and index 0 evolving per
    the standard quantizer). Returns (nibbles, preds0)."""
    n_seq, k = x.shape
    pred = x[:, 0].astype(np.int32).copy()
    idx = np.zeros(n_seq, np.int32)
    nibbles = np.empty((n_seq, k), np.uint8)
    for t in range(k):
        step = _IMA_STEP[idx]
        diff = x[:, t].astype(np.int32) - pred
        sign = (diff < 0).astype(np.int32)
        mag = np.abs(diff)
        b2 = (mag >= step).astype(np.int32)
        mag -= b2 * step
        b1 = (mag >= (step >> 1)).astype(np.int32)
        mag -= b1 * (step >> 1)
        b0 = (mag >= (step >> 2)).astype(np.int32)
        d = (sign << 3) | (b2 << 2) | (b1 << 1) | b0
        # decoder-mirrored reconstruction
        vp = (step >> 3) + b2 * step + b1 * (step >> 1) + b0 * (step >> 2)
        pred = np.where(sign, pred - vp, pred + vp)
        np.clip(pred, -32768, 32767, out=pred)
        idx = np.clip(idx + _IMA_INDEX[d & 7], 0, 88)
        nibbles[:, t] = d.astype(np.uint8)
    return nibbles, x[:, 0].astype(np.int32)


def _ima_decode_blocks(
    raw: bytes, channels: int, block_align: int, n_samples: int
) -> np.ndarray:
    """WAV IMA-ADPCM data chunk -> int32[n_samples, channels].

    Block layout per the IMA/Microsoft registration: a 4-byte header
    per channel (predictor int16 LE = sample 0, step index uint8,
    reserved), then the body in 4-byte-per-channel interleaved
    groups, low nibble first. Blocks are independent — the decode
    vectorizes across blocks x channels, and at table scale Spark
    parallelizes across rows on top."""
    hdr = 4 * channels
    if block_align <= hdr or (block_align - hdr) % (4 * channels):
        raise ValueError(
            f"IMA-ADPCM block_align {block_align} invalid for "
            f"{channels} channel(s)"
        )
    if len(raw) % block_align:
        raise ValueError("IMA-ADPCM data not a whole number of blocks")
    n_blocks = len(raw) // block_align
    if n_blocks == 0:
        raise ValueError("IMA-ADPCM stream has no blocks")
    spb = (block_align - hdr) * 2 // channels + 1  # incl. header sample
    capacity = n_blocks * spb
    if not (capacity - spb < n_samples <= capacity):
        raise DimensionMismatchError(
            f"IMA-ADPCM blocks hold {capacity} frames (block {spb}) != "
            f"metadata n_samples={n_samples}"
        )
    blocks = np.frombuffer(raw, np.uint8).reshape(n_blocks, block_align)
    head = blocks[:, :hdr].reshape(n_blocks, channels, 4)
    pred0 = (
        head[:, :, 0].astype(np.int32)
        | (head[:, :, 1].astype(np.int32) << 8)
    )
    pred0 -= (pred0 & 0x8000) << 1  # sign-extend int16
    idx0 = head[:, :, 2].astype(np.int32)
    if (idx0 > 88).any() or (head[:, :, 3] != 0).any():
        raise ValueError("IMA-ADPCM block header out of range")
    body = blocks[:, hdr:].reshape(n_blocks, -1, channels, 4)
    lo = body & 0x0F
    hi = body >> 4
    # low nibble first within each byte; 4-byte channel groups
    nib = np.stack([lo, hi], axis=-1).reshape(n_blocks, -1, channels, 8)
    nib = nib.transpose(0, 2, 1, 3).reshape(n_blocks * channels, -1)
    dec = _ima_core_decode(
        nib, pred0.reshape(-1), idx0.reshape(-1)
    ).reshape(n_blocks, channels, -1)
    # header predictor IS the block's first sample
    full = np.concatenate([pred0[:, :, None], dec], axis=2)
    out = full.transpose(0, 2, 1).reshape(n_blocks * spb, channels)
    return np.ascontiguousarray(out[:n_samples])


def _ima_encode_blocks(
    x: np.ndarray, block_align: int = 1024
) -> bytes:
    """int [n, channels] 16-bit-scale samples -> IMA-ADPCM data
    chunk bytes (full blocks; the tail pads by repeating the last
    sample, callers record true n_samples in the fact chunk)."""
    n, ch = x.shape
    hdr = 4 * ch
    spb = (block_align - hdr) * 2 // ch + 1
    n_blocks = -(-n // spb)
    pad = n_blocks * spb - n
    if pad:
        x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
    xb = x.reshape(n_blocks, spb, ch).transpose(0, 2, 1)  # [blk, ch, spb]
    seqs = xb.reshape(n_blocks * ch, spb)
    nib, pred0 = _ima_core_encode(seqs)
    nib = nib[:, 1:]  # sample 0 travels in the header verbatim
    head = np.zeros((n_blocks, ch, 4), np.uint8)
    p = pred0.reshape(n_blocks, ch)
    head[:, :, 0] = (p & 0xFF).astype(np.uint8)
    head[:, :, 1] = ((p >> 8) & 0xFF).astype(np.uint8)
    # index 0 at block start (the encoder restarts each block)
    groups = nib.reshape(n_blocks, ch, -1, 8)
    body = (groups[..., 0::2] | (groups[..., 1::2] << 4)).astype(np.uint8)
    body = body.transpose(0, 2, 1, 3).reshape(n_blocks, -1)
    return np.concatenate(
        [head.reshape(n_blocks, hdr), body], axis=1
    ).tobytes()


def parse_wav(buf: bytes) -> dict:
    """Walk the RIFF container -> {tag, channels, sr, bits,
    block_align, data_off, data_len}. Structural breakage raises
    ValueError; fields are NOT yet trusted for allocation (the caller
    checks them against table metadata first)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("missing RIFF/WAVE signature")
    pos, n = 12, len(buf)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = buf[pos : pos + 4]
        (csz,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            if csz < 16 or body + 16 > n:
                raise ValueError("truncated WAV fmt chunk")
            tag, ch, sr, _br, ba, bits = struct.unpack_from("<HHIIHH", buf, body)
            if tag == WAVE_EXTENSIBLE:
                # subformat GUID: first two bytes are the real tag
                if csz < 40 or body + 26 > n:
                    raise ValueError("truncated WAVE_EXTENSIBLE fmt chunk")
                (tag,) = struct.unpack_from("<H", buf, body + 24)
            fmt = {"tag": tag, "channels": ch, "sr": sr,
                   "block_align": ba, "bits": bits}
        elif cid == b"data":
            if body + csz > n:
                raise ValueError("truncated WAV data chunk")
            data = (body, csz)
        # chunks are word-aligned: odd sizes carry a pad byte
        pos = body + csz + (csz & 1)
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    if data is None:
        raise ValueError("WAV missing data chunk")
    if fmt["channels"] == 0 or fmt["sr"] == 0:
        raise ValueError("WAV zero channels or sample rate")
    fmt["data_off"], fmt["data_len"] = data
    return fmt


def _lin_decode(raw: bytes, tag: int, bits: int) -> np.ndarray:
    """data bytes -> int32 (PCM/G.711) or float32 (IEEE) flat array
    in the codec's native scale."""
    if tag == WAVE_PCM:
        if bits == 8:  # unsigned, offset-binary
            return np.frombuffer(raw, np.uint8).astype(np.int32) - 128
        if bits == 16:
            return np.frombuffer(raw, "<i2").astype(np.int32)
        if bits == 24:
            b = np.frombuffer(raw, np.uint8)
            if b.size % 3:
                raise ValueError("WAV 24-bit data not a multiple of 3 bytes")
            b = b.reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            return v - ((v & 0x800000) << 1)  # sign-extend
        if bits == 32:
            return np.frombuffer(raw, "<i4").astype(np.int32)
        raise NotImplementedError(f"WAV PCM bits={bits} unsupported")
    if tag == WAVE_IEEE_FLOAT:
        if bits == 32:
            return np.frombuffer(raw, "<f4").astype(np.float32)
        if bits == 64:
            return np.frombuffer(raw, "<f8").astype(np.float32)
        raise NotImplementedError(f"WAV float bits={bits} unsupported")
    if tag == WAVE_MULAW:
        if bits != 8:
            raise ValueError(f"mu-law requires 8-bit samples, got {bits}")
        return _MULAW_DEC[np.frombuffer(raw, np.uint8)].astype(np.int32)
    if tag == WAVE_ALAW:
        if bits != 8:
            raise ValueError(f"A-law requires 8-bit samples, got {bits}")
        return _ALAW_DEC[np.frombuffer(raw, np.uint8)].astype(np.int32)
    name = _TAG_NAMES.get(tag, hex(tag))
    raise NotImplementedError(
        f"WAV codec tag {name} unsupported (PCM 8/16/24/32, IEEE float "
        "32/64, G.711 mu-law/A-law only; entropy-coded audio declines "
        "as data, like lossy VP8 on the image side)"
    )


def decode_audio(
    buf: bytes, fmt: str, sr: int, n_samples: int, channels: int
) -> np.ndarray:
    """Audio payload -> [n_samples, channels] int32 (integer codecs,
    native scale: 16-bit for G.711, the container width for PCM) or
    float32 (IEEE-float WAV).

    fmt='wav' parses the RIFF container; fmt='pcm' is the headerless
    raw lane (interleaved little-endian int16 — the audio analog of
    the image table's fmt='raw'). Header fields must MATCH the table
    metadata (DimensionMismatchError otherwise) before any
    sample math, mirroring decode_image's dim-guard contract."""
    return _decode_audio_hdr(buf, fmt, sr, n_samples, channels)[0]


def _decode_audio_hdr(
    buf: bytes, fmt: str, sr: int, n_samples: int, channels: int
) -> tuple:
    """decode_audio plus the parsed WAV header: (samples, hdr) with
    hdr=None for the headerless pcm lane. Internal — lets the
    normalized analytics decode reuse the container walk instead of
    re-parsing the RIFF chunks per row (the hot audio_features /
    sample_audio_clips path)."""
    if sr <= 0 or n_samples <= 0 or channels <= 0:
        raise DimensionMismatchError(
            f"sr={sr} n_samples={n_samples} channels={channels} "
            "must be positive"
        )
    if fmt == "pcm":
        want = n_samples * channels * 2
        if len(buf) != want:
            raise ValueError(
                f"pcm payload {len(buf)} bytes != {want} expected"
            )
        flat = np.frombuffer(buf, "<i2").astype(np.int32)
        return flat.reshape(n_samples, channels), None
    if fmt != "wav":
        raise NotImplementedError(f"audio fmt={fmt} unsupported")
    hdr = parse_wav(buf)
    if hdr["sr"] != sr or hdr["channels"] != channels:
        raise DimensionMismatchError(
            f"WAV header sr={hdr['sr']} ch={hdr['channels']} != "
            f"metadata sr={sr} ch={channels}"
        )
    bits = hdr["bits"]
    tag = hdr["tag"]
    if tag == WAVE_IMA_ADPCM:
        if bits != 4:
            raise ValueError(f"IMA-ADPCM requires 4-bit samples, got {bits}")
        raw = buf[hdr["data_off"] : hdr["data_off"] + hdr["data_len"]]
        return _ima_decode_blocks(
            raw, channels, hdr["block_align"], n_samples
        ), hdr
    unit = (1 if tag in (WAVE_MULAW, WAVE_ALAW) else bits // 8) * channels
    if unit == 0:
        raise ValueError("WAV zero-width sample format")
    got = hdr["data_len"] // unit
    if got != n_samples:
        raise DimensionMismatchError(
            f"WAV data holds {got} frames != metadata n_samples={n_samples}"
        )
    raw = buf[hdr["data_off"] : hdr["data_off"] + hdr["data_len"]]
    flat = _lin_decode(raw[: got * unit], tag, bits)
    if flat.size != n_samples * channels:
        raise ValueError("WAV sample count mismatch after decode")
    return flat.reshape(n_samples, channels), hdr


def decode_audio_norm16(
    buf: bytes, fmt: str, sr: int, n_samples: int, channels: int
) -> np.ndarray:
    """decode_audio + normalization of every codec to 16-BIT SCALE
    (int32 container): deep PCM shifts down (24-bit >> 8, 32-bit >>
    16), 8-bit PCM shifts up, IEEE float quantizes via rint, and
    i16/G.711/IMA pass through (already 16-bit scale).

    This is the ANALYTICS decode: features computed on it are
    scale-invariant across containers, peak is bounded by 32768, and
    the int64 energy accumulator is exact to ~8.6e9 samples (50+
    hours at 48 kHz) — whereas native-scale 32-bit PCM energy
    overflows int64 at TWO full-scale samples, i.e. is unstorable in
    a long no matter how it is computed. validate_audio keeps the
    raw decode_audio (validity is scale-independent).

    The container is walked ONCE (_decode_audio_hdr hands the parsed
    header back alongside the samples) — the earlier form re-ran
    parse_wav per row just to read tag/bits for the scale shift,
    doubling the RIFF chunk walk in the hot analytics kernels."""
    x, hdr = _decode_audio_hdr(buf, fmt, sr, n_samples, channels)
    if x.dtype == np.float32:
        return np.clip(
            np.rint(x.astype(np.float64) * 32767), -32768, 32767
        ).astype(np.int32)
    if fmt == "pcm":
        return x  # headerless lane is i16 by definition
    if hdr["tag"] == WAVE_PCM and hdr["bits"] > 16:
        return x >> (hdr["bits"] - 16)
    if hdr["tag"] == WAVE_PCM and hdr["bits"] == 8:
        return x << 8
    return x


def encode_wav(
    samples: np.ndarray, sr: int, codec: str = "i16"
) -> bytes:
    """[n, channels] samples -> WAV bytes. codec: i16/u8/i24/i32
    (PCM, int input in the native scale), f32 (IEEE float),
    mulaw/alaw (16-bit int input, G.711-companded to 8-bit)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if codec == "u8":
        data = (samples.astype(np.int32) + 128).astype(np.uint8).tobytes()
        tag, bits = WAVE_PCM, 8
    elif codec == "i16":
        data = samples.astype("<i2").tobytes()
        tag, bits = WAVE_PCM, 16
    elif codec == "i24":
        v = samples.astype(np.int32).ravel()
        b = np.empty((v.size, 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        data = b.tobytes()
        tag, bits = WAVE_PCM, 24
    elif codec == "i32":
        data = samples.astype("<i4").tobytes()
        tag, bits = WAVE_PCM, 32
    elif codec == "f32":
        data = samples.astype("<f4").tobytes()
        tag, bits = WAVE_IEEE_FLOAT, 32
    elif codec == "mulaw":
        data = _mulaw_encode(samples.ravel()).tobytes()
        tag, bits = WAVE_MULAW, 8
    elif codec == "alaw":
        data = _alaw_encode(samples.ravel()).tobytes()
        tag, bits = WAVE_ALAW, 8
    elif codec == "ima":
        block_align = 4 * ch + 252 * 4 * ch  # 1012/ch-group blocks
        data = _ima_encode_blocks(samples.astype(np.int32), block_align)
        tag, bits = WAVE_IMA_ADPCM, 4
    else:
        raise ValueError(f"unknown encode codec {codec}")
    if codec == "ima":
        ba = block_align
        spb = (block_align - 4 * ch) * 2 // ch + 1
        byte_rate = sr * block_align // spb
        fmt_body = struct.pack(
            "<HHIIHHHH", tag, ch, sr, byte_rate, ba, bits, 2, spb
        )
    else:
        ba = ch * (bits // 8)
        fmt_body = struct.pack("<HHIIHH", tag, ch, sr, sr * ba, ba, bits)
        if tag != WAVE_PCM:
            fmt_body += struct.pack("<H", 0)  # cbSize, required non-PCM
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if tag != WAVE_PCM:
        # fact chunk: true frame count (required for compressed WAVE;
        # the ADPCM tail pad is invisible to a fact-aware reader)
        chunks += b"fact" + struct.pack("<II", 4, n)
    chunks += (
        b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def audio_stats_exact(samples: np.ndarray) -> dict:
    """Exact integer stats over channel 0 (the analytics contract:
    integers, so the Spark/DuckDB hash compare is bit-stable):
    peak = max |sample|, energy = sum of squared samples (int64),
    zcross = strict sign alternations (zero samples break a run)."""
    x = samples[:, 0].astype(np.int64)
    peak = int(np.abs(x).max()) if x.size else 0
    _energy_guard(x.size, peak)
    energy = int((x * x).sum())
    s = np.sign(x)
    nz = s[s != 0]
    zcross = int((nz[1:] != nz[:-1]).sum()) if nz.size > 1 else 0
    return {"peak": peak, "energy": energy, "zcross": zcross}


def _energy_guard(n: int, peak: int) -> None:
    """int64 energy accumulators are exact only while n * peak^2 <
    2^63 — true for any realistic clip at <= 24-bit amplitudes, but a
    full-scale 32-bit PCM clip could wrap silently; refuse loudly
    instead (errors as data at the operator tier)."""
    if peak and n > (2**63 - 1) // (peak * peak):
        raise ValueError(
            f"energy accumulator would overflow int64 "
            f"(n={n}, peak={peak}); rescale the clip first"
        )


def audio_fingerprint64(samples: np.ndarray, n_windows: int = 64) -> int:
    """64-bit energy fingerprint (the audio analog of phash64):
    channel 0 is cut into n_windows equal windows (tail remainder
    dropped); bit j (j=0 MSB) is set iff window j's energy times
    n_windows exceeds the total energy of the windowed span — exact
    integer comparisons, no float thresholds. Returned as a SIGNED
    64-bit int to match the table's `long` phash convention."""
    x = samples[:, 0].astype(np.int64)
    wlen = x.size // n_windows
    if wlen == 0:
        raise ValueError(f"clip shorter than {n_windows} samples")
    _energy_guard(x.size * n_windows, int(np.abs(x).max()) if x.size else 0)
    w = x[: wlen * n_windows].reshape(n_windows, wlen)
    e = (w * w).sum(axis=1)
    total = int(e.sum())
    bits = (e * n_windows > total).astype(np.uint8)
    fp = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return fp - (1 << 64) if fp >= (1 << 63) else fp
