"""Multimodal column plumbing: real image path, deterministic fake
audio/video path, strict-mode stub gating (task brief)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopy_spark.kernels import codecs as C
from geopy_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media_df(spark):
    rng = np.random.default_rng(41)
    rows = []
    for i in range(12):
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        rows.append((f"img{i}", "image", C.encode(img, "rle"), "rle",
                     16, 16, 0, 0, 0))
    for i in range(6):
        rows.append((f"aud{i}", "audio", b"\x00" * 64, "mp3", 0, 0, 16000, 1, 0))
    for i in range(4):
        rows.append((f"vid{i}", "video", b"\x00" * 64, "mp4", 8, 8, 0, 0, 12))
    pdf = pd.DataFrame(rows, columns=[f.name for f in M.MEDIA_SCHEMA.fields])
    return spark.createDataFrame(pdf, schema=M.MEDIA_SCHEMA)


def test_extract_features_fake_mode(media_df):
    out = M.extract_features(media_df, mode="fake").collect()
    assert len(out) == 22
    by_kind = {}
    for r in out:
        by_kind.setdefault(r.kind, []).append(r)
        assert r.feat_dim > 0
        assert len(r.histogram) == 8
        assert abs(sum(r.histogram) - 1.0) < 1e-9
    assert {k: len(v) for k, v in by_kind.items()} == {
        "image": 12, "audio": 6, "video": 4}
    # determinism: same media_id → same features on a re-run
    out2 = {r.media_id: (r.feat_mean, r.feat_std)
            for r in M.extract_features(media_df, mode="fake").collect()}
    for r in out:
        assert out2[r.media_id] == (r.feat_mean, r.feat_std)


def test_strict_mode_raises_for_stubbed_codecs(spark, media_df):
    audio_only = media_df.filter(F.col("kind") == "audio")
    with pytest.raises(Exception, match="NotImplementedError|external library"):
        M.extract_features(audio_only, mode="strict").collect()
    # images are REAL — strict mode works fine for them
    img_only = media_df.filter(F.col("kind") == "image")
    assert len(M.extract_features(img_only, mode="strict").collect()) == 12


def test_resize_images(media_df):
    out = M.resize_images(media_df, 8, 8).filter(F.col("kind") == "image").collect()
    for r in out:
        assert (r.w, r.h) == (8, 8)
        img = C.decode(bytes(r.payload), r.fmt, r.w, r.h)
        assert img.shape == (8, 8, 3)


def test_sample_video_frames(media_df):
    out = M.sample_video_frames(media_df, every_k=4, mode="fake").collect()
    # 4 videos × 12 frames / every 4 → 3 frames each
    assert len(out) == 12
    per_vid = {}
    for r in out:
        per_vid.setdefault(r.media_id, []).append(r.frame_idx)
        img = C.decode(bytes(r.payload), "raw", r.w, r.h)
        assert img.shape == (8, 8, 3)
    assert all(sorted(v) == [0, 4, 8] for v in per_vid.values())
