"""Multimodal columns for training-data pipelines (task brief): image /
audio / video as opaque binary columns with typed metadata, processed in
Arrow-batched mapInPandas stages.

What is REAL here: the Spark-side plumbing — schemas, batch iteration,
partitioning-safe UDF signatures, image decode/resize/feature-extract via
the engine's own codecs, deterministic fake decoders for audio/video so the
pipeline shape is testable end-to-end.

What is STUBBED (this container has no PIL/cv2/ffmpeg/soundfile): external-
format decoders. `decode_audio`/`decode_video` raise NotImplementedError
for real formats unless mode="fake"; the fake decoder is deterministic
(seeded by media_id) so tests and goldens are stable.
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
    """STUB for real audio codecs (no soundfile/ffmpeg in this container).
    mode="fake" returns a deterministic seeded waveform with the right
    shape so downstream plumbing is fully exercised."""
    if mode == "fake":
        return _fake_audio(media_id, sample_rate)
    raise NotImplementedError(
        f"audio codec '{fmt}' needs an external library not present in this "
        f"environment; run with mode='fake' for plumbing tests")


def decode_video_frames(payload: bytes, fmt: str, media_id: str, w: int, h: int,
                        n_frames: int, mode: str = "strict") -> np.ndarray:
    """STUB for real video demux/decode — same contract as decode_audio."""
    if mode == "fake":
        return _fake_frames(media_id, w, h, n_frames)
    raise NotImplementedError(
        f"video codec '{fmt}' needs ffmpeg-like tooling not present here; "
        f"run with mode='fake' for plumbing tests")


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
                frames = decode_video_frames(r.payload, r.fmt, r.media_id,
                                             int(r.w), int(r.h), int(r.n_frames), mode)
                for k in range(0, frames.shape[0], every_k):
                    rows.append((r.media_id, k, C.encode(frames[k], "raw"),
                                 int(r.w), int(r.h)))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])
    return df.mapInPandas(_fn, out_schema)
