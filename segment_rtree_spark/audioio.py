"""WAV/RIFF audio codec: the audio leg of the multimodal ingest
surface, built from the public RIFF/WAVE container layout and the
ITU-T G.711 companding formulas.

The engine treats audio like images: an opaque `binary` column plus
typed metadata (sample_rate, n_samples, channels, fmt), decoded
per-row inside Arrow-batched kernels. Real decode for everything a
header-level codec can honestly do — PCM at 8/16/24/32-bit and
IEEE-float 32/64, G.711 mu-law and A-law (LUTs built from the ITU
formulas, javax.sound-conformance-tested) — while entropy-coded
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


_TAG_NAMES = {
    0x0002: "ADPCM", 0x0011: "IMA-ADPCM", 0x0055: "MP3",
    0x0031: "GSM", 0x2000: "AC3",
}


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
        return flat.reshape(n_samples, channels)
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
    return flat.reshape(n_samples, channels)


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
    else:
        raise ValueError(f"unknown encode codec {codec}")
    ba = ch * (bits // 8)
    fmt_body = struct.pack("<HHIIHH", tag, ch, sr, sr * ba, ba, bits)
    if tag != WAVE_PCM:
        fmt_body += struct.pack("<H", 0)  # cbSize, required for non-PCM
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
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
