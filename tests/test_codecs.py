"""Codec invariants (BASELINE.json:15): lossless roundtrip exact, qjpg
PSNR≥40dB, phash stability, RLE long-run handling."""

import numpy as np

from geopy_spark.kernels import codecs as C
from geopy_spark import synth


def test_roundtrip_all_formats_random_and_smooth():
    rng = np.random.default_rng(21)
    shapes = [(16, 16), (32, 48), (48, 32), (1, 1), (3, 257)]
    for h, w in shapes:
        noisy = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        smooth = np.full((h, w, 3), 77, dtype=np.uint8)
        for img in (noisy, smooth):
            for fmt in C.FORMATS:
                out = C.decode(C.encode(img, fmt), fmt, w, h)
                assert out.shape == img.shape
                if C.is_lossless(fmt):
                    assert np.array_equal(img, out), fmt
                else:
                    assert C.psnr(img, out) >= 40.0, fmt


def test_rle_long_runs():
    img = np.zeros((100, 100, 3), dtype=np.uint8)  # 30000-byte run > 255
    buf = C.encode(img, "rle")
    assert len(buf) < 400
    assert np.array_equal(C.decode(buf, "rle", 100, 100), img)


def test_qjpg_psnr_floor_worst_case():
    # worst case for uniform quantization: values maximally misaligned
    img = np.full((64, 64, 3), 3, dtype=np.uint8)  # recon = 0*4+2 = 2, err 1
    out = C.decode(C.encode(img, "qjpg"), "qjpg", 64, 64)
    assert C.psnr(img, out) >= 40.0
    # error bounded by 2 everywhere
    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = C.decode(C.encode(img, "qjpg"), "qjpg", 32, 32)
    assert np.abs(img.astype(int) - out.astype(int)).max() <= 2


def test_phash_properties():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    h1 = C.phash64(img)
    assert h1 == C.phash64(img.copy())                      # deterministic
    lossy = C.decode(C.encode(img, "qjpg"), "qjpg", 64, 48)
    assert C.hamming64(np.array([h1]), np.array([C.phash64(lossy)]))[0] <= 8
    other = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    assert C.hamming64(np.array([h1]), np.array([C.phash64(other)]))[0] >= 10


def test_synth_images_deterministic():
    a = synth.make_images_pdf(8)
    b = synth.make_images_pdf(8)
    assert (a["phash"] == b["phash"]).all()
    assert (a["caption"] == b["caption"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["bytes"], b["bytes"]))
    # stored phash equals recomputed phash from payload
    for _, row in a.iterrows():
        img = C.decode(row["bytes"], row["fmt"], row["w"], row["h"])
        assert C.phash64(img) == row["phash"]


def test_synth_fmt_override_jpeg_gif():
    """make_images_pdf(fmt=...) forces a homogeneous corpus (ingest-bench
    input): every payload decodes under the forced codec and the stored
    phash matches a recompute from bytes; gif pixels are 3-3-2 quantized
    so the palette encoder holds losslessly."""
    for fmt in ("jpeg", "gif"):
        pdf = synth.make_images_pdf(6, fmt=fmt)
        assert set(pdf["fmt"]) == {fmt}
        for _, row in pdf.iterrows():
            img = C.decode(row["bytes"], fmt, row["w"], row["h"])
            assert img.shape == (row["h"], row["w"], 3)
            assert C.phash64(img) == row["phash"]
