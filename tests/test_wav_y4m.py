"""From-scratch WAV (RIFF PCM) and Y4M (YUV4MPEG2) codecs: spec goldens
built by hand from the public formats (no encoder circularity), roundtrips,
chunk/frame walking, and the strict-mode multimodal pipeline on REAL
payloads."""

import struct

import numpy as np
import pandas as pd
import pytest

from geopy_spark.kernels import wav as W
from geopy_spark.kernels import y4m as Y
from geopy_spark.operators import multimodal as M

# ------------------------------------------------------------------- WAV


def test_wav_roundtrip_16bit():
    rng = np.random.default_rng(7)
    s = np.clip(rng.standard_normal((5000, 2)) * 0.3, -1, 1)
    buf = W.encode_wav(s, 16000)
    out, meta = W.decode_wav(buf)
    assert meta == {"sample_rate": 16000, "channels": 2, "bits": 16, "tag": 1}
    assert out.shape == (5000, 2)
    assert np.abs(out - s).max() <= 1.5 / 32768  # rounding + +FS clip


def test_wav_golden_handbuilt_8bit():
    """8-bit mono WAV assembled field-by-field from the RIFF spec:
    unsigned samples, midpoint 128."""
    samples = bytes([0, 128, 255, 64])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(samples)) + samples)
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    out, meta = W.decode_wav(buf)
    assert meta["bits"] == 8 and meta["sample_rate"] == 8000
    assert np.allclose(out[:, 0], [-1.0, 0.0, 127 / 128, -0.5])


def test_wav_float32_and_unknown_chunk_skipping():
    """float32 WAV with a LIST chunk between fmt and data (real recorders
    emit these) — the walker must skip it by size."""
    vals = np.array([0.5, -0.25, 1.0, 0.0], dtype="<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    lst = b"INFOjunkdata"
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", len(lst)) + lst
            + b"data" + struct.pack("<I", vals.nbytes) + vals.tobytes())
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    out, meta = W.decode_wav(buf)
    assert meta["tag"] == 3
    assert np.allclose(out[:, 0], [0.5, -0.25, 1.0, 0.0])


def test_wav_rejects_garbage_and_truncation():
    with pytest.raises(W.WavError):
        W.decode_wav(b"\x00" * 64)
    good = W.encode_wav(np.zeros(100), 8000)
    with pytest.raises(W.WavError):
        W.decode_wav(good[:50])


def test_audio_features_sine():
    """Pure 440 Hz sine: zcr ≈ 2·f0/sr, spectral centroid ≈ f0."""
    sr, f0, n = 16000, 440.0, 16000
    t = np.arange(n) / sr
    s = np.sin(2 * np.pi * f0 * t)
    feats = W.audio_features(s, sr)
    assert abs(feats["duration_s"] - 1.0) < 1e-9
    assert abs(feats["rms"] - 1 / np.sqrt(2)) < 1e-3
    assert abs(feats["zcr"] - 2 * f0 / sr) < 0.002
    assert abs(feats["centroid_hz"] - f0) < 15.0


# ------------------------------------------------------------------- Y4M


def _rgb_frames(n, h, w, seed=5):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_y4m_golden_handbuilt():
    """Stream assembled byte-by-byte from the YUV4MPEG2 spec: 2×2 C420,
    one frame with known plane values."""
    buf = (b"YUV4MPEG2 W2 H2 F30:1 Ip A1:1 C420\n"
           + b"FRAME\n"
           + bytes([10, 20, 30, 40])   # Y plane 2x2
           + bytes([128])              # U 1x1
           + bytes([128]))             # V 1x1
    frames, meta = Y.decode_y4m(buf)
    assert (meta["w"], meta["h"], meta["n_frames"]) == (2, 2, 1)
    assert meta["fps_num"] == 30
    y, u, v = frames[0]
    assert y.tolist() == [[10, 20], [30, 40]]
    # neutral chroma → RGB equals gray luma exactly (BT.601 full range)
    rgb = Y.yuv420_to_rgb(y, u, v)
    assert np.array_equal(rgb[..., 0], y) and np.array_equal(rgb[..., 2], y)


def test_y4m_roundtrip_gray_exact_color_close():
    gray = [np.repeat(np.arange(0, 256, 17, dtype=np.uint8)
                      .reshape(4, 4)[..., None], 3, axis=-1).copy()
            for _ in range(3)]
    buf = Y.encode_y4m(gray, fps=(25, 1))
    frames, meta = Y.decode_y4m(buf)
    assert meta["n_frames"] == 3
    for f_in, planes in zip(gray, frames):
        # gray → U=V=128 → luma survives bit-exact through 4:2:0
        assert np.array_equal(Y.yuv420_to_rgb(*planes), f_in)
    # smooth color gradients (the regime 4:2:0 is designed for — chroma
    # varies slowly within each 2x2 block; independent random pixels are
    # the adversarial worst case and NOT representative of video)
    xx, yy = np.meshgrid(np.arange(16), np.arange(16))
    grad = np.stack([xx * 8, yy * 8, np.full_like(xx, 96)], -1).astype(np.uint8)
    out, _ = Y.decode_y4m(Y.encode_y4m([grad, grad[::-1].copy()]))
    for f_in, planes in zip([grad, grad[::-1]], out):
        err = Y.yuv420_to_rgb(*planes).astype(float) - f_in.astype(float)
        assert np.abs(err).mean() < 4.0  # bounded subsampling loss


def test_y4m_frame_sampling_skips_bytes():
    frames_in = _rgb_frames(10, 8, 8)
    buf = Y.encode_y4m(frames_in)
    every3, meta = Y.decode_y4m(buf, every_k=3)
    assert meta["n_frames"] == 10 and len(every3) == 4  # frames 0,3,6,9
    full, _ = Y.decode_y4m(buf)
    for got, idx in zip(every3, (0, 3, 6, 9)):
        assert all(np.array_equal(a, b) for a, b in zip(got, full[idx]))
    assert Y.probe_y4m(buf)["n_frames"] == 10
    with pytest.raises(Y.Y4MError):
        Y.decode_y4m(buf[:len(buf) // 2])
    with pytest.raises(Y.Y4MError):
        Y.decode_y4m(b"NOT A STREAM")


# ------------------------------------- strict-mode pipeline on real bytes


@pytest.fixture(scope="module")
def real_media_df(spark):
    rng = np.random.default_rng(43)
    rows = []
    for i in range(3):
        t = np.arange(8000) / 8000.0
        s = np.sin(2 * np.pi * (220 + 110 * i) * t) * 0.8
        rows.append((f"wav{i}", "audio", W.encode_wav(s, 8000), "wav",
                     0, 0, 8000, 1, 0))
    for i in range(2):
        frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                  for _ in range(6)]
        rows.append((f"y4m{i}", "video", Y.encode_y4m(frames), "y4m",
                     8, 8, 0, 0, 6))
    pdf = pd.DataFrame(rows, columns=[f.name for f in M.MEDIA_SCHEMA.fields])
    return spark.createDataFrame(pdf, schema=M.MEDIA_SCHEMA)


def test_extract_features_strict_real_wav_y4m(real_media_df):
    out = {r.media_id: r for r in
           M.extract_features(real_media_df, mode="strict").collect()}
    assert len(out) == 5
    for i in range(3):
        r = out[f"wav{i}"]
        assert r.feat_dim == 8000
        assert abs(r.feat_std - 0.8 / np.sqrt(2)) < 0.01  # sine RMS
    for i in range(2):
        r = out[f"y4m{i}"]
        assert r.feat_dim == 6 * 8 * 8 * 3
        assert 100 < r.feat_mean < 155  # uniform-random pixels


def test_sample_video_frames_strict_y4m(real_media_df):
    out = M.sample_video_frames(real_media_df, every_k=2, mode="strict").collect()
    per_vid = {}
    for r in out:
        per_vid.setdefault(r.media_id, []).append(r.frame_idx)
    assert {k: sorted(v) for k, v in per_vid.items()} == {
        "y4m0": [0, 2, 4], "y4m1": [0, 2, 4]}
