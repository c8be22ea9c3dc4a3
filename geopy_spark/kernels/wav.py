"""From-scratch WAV codec (public spec: RIFF/WAVE, Microsoft/IBM 1991;
also IETF RFC 2361 WAVE format registry) — stdlib ``struct`` + numpy,
no soundfile/ffmpeg (absent in this sandbox).

Supports the canonical PCM subset that covers real-world payloads:
format tag 1 (integer PCM) at 8/16/32-bit and tag 3 (IEEE float32),
any channel count, any sample rate. Decode returns (samples, meta):
``samples`` is float64 in [-1, 1] shaped (n_frames, channels);
``meta`` carries (sample_rate, channels, bits, tag). Encode writes
16-bit PCM (the interchange default).

Chunk walking is spec-faithful: chunks are (id, size, payload) with
word alignment padding; unknown chunks (LIST, fact, cue …) are skipped,
so files from real recorders parse. Sample conversion is one vectorized
``np.frombuffer`` + scale per payload — no per-sample Python.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def _chunks(buf: bytes):
    """Yield (chunk_id, payload) for every RIFF sub-chunk."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload = buf[pos + 8:pos + 8 + size]
        if len(payload) < size:
            raise WavError(f"truncated chunk {cid!r}: {len(payload)} < {size}")
        yield cid, payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned


_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def decode_wav(buf: bytes) -> tuple[np.ndarray, dict]:
    """WAV bytes → (float64 samples in [-1,1] shaped (n, ch), meta dict)."""
    fmt = data = None
    for cid, payload in _chunks(buf):
        if cid == b"fmt ":
            fmt = payload
        elif cid == b"data":
            data = payload
    if fmt is None or data is None:
        raise WavError("missing fmt/data chunk")
    tag, ch, sr, _brate, _balign, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if ch < 1:
        raise WavError("zero channels")
    if tag == 1:  # integer PCM
        if bits not in _PCM_DTYPES:
            raise WavError(f"unsupported PCM width {bits}")
        raw = np.frombuffer(data, dtype=_PCM_DTYPES[bits])
        if bits == 8:  # 8-bit WAV is unsigned, midpoint 128
            samples = (raw.astype(np.float64) - 128.0) / 128.0
        else:
            samples = raw.astype(np.float64) / float(2 ** (bits - 1))
    elif tag == 3:  # IEEE float
        if bits != 32:
            raise WavError(f"unsupported float width {bits}")
        samples = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise WavError(f"unsupported format tag {tag}")
    n = samples.size // ch
    samples = samples[:n * ch].reshape(n, ch)
    return samples, {"sample_rate": sr, "channels": ch, "bits": bits, "tag": tag}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float samples in [-1,1] shaped (n,) or (n, ch) → 16-bit PCM WAV."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    # symmetric full-scale convention: ×2^15 on encode, ÷2^15 on decode,
    # so roundtrip error is pure rounding (≤ 0.5/32768) except at +1.0 FS
    pcm = np.clip(np.rint(s * 32768.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Vectorized per-clip features a training pipeline keys on:
    duration, RMS loudness, peak, zero-crossing rate, spectral centroid
    (one rFFT over the mono mix — no per-sample Python)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = mono.size
    if n == 0:
        return {"duration_s": 0.0, "rms": 0.0, "peak": 0.0,
                "zcr": 0.0, "centroid_hz": 0.0}
    rms = float(np.sqrt(np.mean(mono ** 2)))
    zcr = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))
                / max(n - 1, 1))
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    denom = float(spec.sum())
    centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
    return {"duration_s": n / float(sample_rate), "rms": rms,
            "peak": float(np.abs(mono).max()), "zcr": zcr,
            "centroid_hz": centroid}
