"""Multimodal columns for training-data pipelines (task brief): image /
audio / video as opaque binary columns with typed metadata, processed in
Arrow-batched mapInPandas stages.

What is REAL: the Spark-side plumbing (schemas, batch iteration,
partitioning-safe UDF signatures), image decode via the engine codecs
(raw/ppm/rle/qjpg/png/tiff/gif/jpeg — incl. from-scratch baseline JPEG,
kernels/jpeg), audio decode for WAV (RIFF PCM — kernels/wav,
from-scratch public-spec codec), and video decode for Y4M (YUV4MPEG2 —
kernels/y4m, ditto). Deterministic fake decoders remain for plumbing
tests that don't care about bytes.

What is STUBBED (no ffmpeg/soundfile in this container): compressed
audio/video (mp3/aac/h264…) — those formats raise NotImplementedError
with a clear message; the WAV/Y4M paths demonstrate the full
strict-mode pipeline on formats the outside world produces.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

from ..kernels import codecs as C
from ..kernels import wav as W
from ..kernels import y4m as Y

# typed metadata the binary payload travels with (schema-on-read contract)
MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),      # image | audio | video
    StructField("payload", BinaryType()),
    StructField("fmt", StringType()),
    StructField("w", IntegerType()), StructField("h", IntegerType()),
    StructField("sample_rate", IntegerType()), StructField("channels", IntegerType()),
    StructField("n_frames", IntegerType()),
])

_SUPPORTED_IMAGE = set(C.FORMATS)


def _fake_audio(media_id: str, sample_rate: int, n: int = 4096) -> np.ndarray:
    rng = np.random.default_rng(abs(hash_32(media_id)))
    t = np.arange(n) / sample_rate
    f0 = 110.0 + (abs(hash_32(media_id)) % 880)
    return (np.sin(2 * np.pi * f0 * t) + 0.1 * rng.standard_normal(n)).astype(np.float32)


def _fake_frames(media_id: str, w: int, h: int, n_frames: int) -> np.ndarray:
    rng = np.random.default_rng(abs(hash_32(media_id)) ^ 0xBEEF)
    return rng.integers(0, 256, (n_frames, h, w, 3), dtype=np.uint8)


def hash_32(s: str) -> int:
    h = 2166136261
    for b in s.encode():
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def decode_audio(payload: bytes, fmt: str, media_id: str, sample_rate: int,
                 mode: str = "strict") -> np.ndarray:
    """Audio decode: REAL for fmt='wav' (kernels/wav — RIFF PCM, public
    spec); mode='fake' returns a deterministic seeded waveform for
    plumbing tests; compressed codecs (mp3/aac/…) need external
    libraries absent in this container and raise."""
    if mode == "fake":
        return _fake_audio(media_id, sample_rate)
    if fmt == "wav":
        samples, _meta = W.decode_wav(payload)
        return samples
    raise NotImplementedError(
        f"audio codec '{fmt}' needs an external library not present in this "
        f"environment; supported real format: 'wav' (kernels/wav)")


def decode_video_frames(payload: bytes, fmt: str, media_id: str, w: int, h: int,
                        n_frames: int, mode: str = "strict",
                        every_k: int = 1) -> np.ndarray:
    """Video decode to (n, h, w, 3) uint8 RGB: REAL for fmt='y4m'
    (kernels/y4m — YUV4MPEG2, public spec; skipped frames cost only
    offset arithmetic when every_k > 1); mode='fake' is the seeded
    plumbing path; compressed codecs (h264/vp9/…) raise."""
    if mode == "fake":
        return _fake_frames(media_id, w, h, n_frames)[::max(every_k, 1)]
    if fmt == "y4m":
        planes, _meta = Y.decode_y4m(payload, every_k)
        return np.stack([Y.yuv420_to_rgb(*p) for p in planes])
    raise NotImplementedError(
        f"video codec '{fmt}' needs ffmpeg-like tooling not present here; "
        f"supported real format: 'y4m' (kernels/y4m)")


# --------------------------------------------------------------- operators

FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),
    StructField("feat_mean", DoubleType()),
    StructField("feat_std", DoubleType()),
    StructField("feat_dim", LongType()),
    StructField("histogram", ArrayType(DoubleType())),
])


def extract_features(df: DataFrame, mode: str = "strict") -> DataFrame:
    """Per-media feature extraction over Arrow batches: images decode with
    the REAL engine codecs; audio/video go through the (stub/fake) decoders.
    Emits mean/std/dim + an 8-bin histogram — the shape a real embedding
    stage would have."""
    def _fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind == "image":
                    arr = C.decode(r.payload, r.fmt, int(r.w), int(r.h)).astype(np.float64)
                    hist = np.histogram(arr, bins=8, range=(0, 256))[0]
                elif r.kind == "audio":
                    arr = decode_audio(r.payload, r.fmt, r.media_id,
                                       int(r.sample_rate), mode).astype(np.float64)
                    hist = np.histogram(arr, bins=8, range=(-2, 2))[0]
                else:
                    arr = decode_video_frames(r.payload, r.fmt, r.media_id, int(r.w),
                                              int(r.h), int(r.n_frames), mode
                                              ).astype(np.float64)
                    hist = np.histogram(arr, bins=8, range=(0, 256))[0]
                out.append((r.media_id, r.kind, float(arr.mean()),
                            float(arr.std()), int(arr.size),
                            (hist / max(arr.size, 1)).tolist()))
            yield pd.DataFrame(out, columns=[f.name for f in FEATURES_SCHEMA.fields])
    return df.mapInPandas(_fn, FEATURES_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of image payloads (REAL, numpy index map);
    re-encodes in the row's own format. Non-image rows pass through."""
    schema = df.schema

    def _fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, ws, hs = [], [], []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    payloads.append(r.payload); ws.append(r.w); hs.append(r.h)
                    continue
                img = C.decode(r.payload, r.fmt, int(r.w), int(r.h))
                yi = (np.arange(out_h) * img.shape[0]) // out_h
                xi = (np.arange(out_w) * img.shape[1]) // out_w
                resized = img[np.ix_(yi, xi)]
                payloads.append(C.encode(resized, r.fmt))
                ws.append(out_w); hs.append(out_h)
            pdf = pdf.assign(payload=payloads, w=np.array(ws, dtype=np.int32),
                             h=np.array(hs, dtype=np.int32))
            yield pdf
    return df.mapInPandas(_fn, schema)


def sample_video_frames(df: DataFrame, every_k: int, mode: str = "strict") -> DataFrame:
    """Frame sampling: video rows fan out to one row per kept frame
    (UDTF-style explode via mapInPandas), frames re-encoded as raw images —
    the raster side of raster↔vector at the media level."""
    out_schema = StructType([
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("payload", MEDIA_SCHEMA["payload"].dataType),
        StructField("w", IntegerType()), StructField("h", IntegerType()),
    ])

    def _fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                # every_k pushes into the decoder: y4m skips unread frames
                # by offset arithmetic, never decoding dropped frames
                frames = decode_video_frames(r.payload, r.fmt, r.media_id,
                                             int(r.w), int(r.h), int(r.n_frames),
                                             mode, every_k=every_k)
                for i, fr in enumerate(frames):
                    rows.append((r.media_id, i * every_k, C.encode(fr, "raw"),
                                 int(r.w), int(r.h)))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])
    return df.mapInPandas(_fn, out_schema)
