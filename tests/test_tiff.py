"""From-scratch baseline TIFF + TIFF-LZW codec (kernels/tiff — TIFF 6.0
spec): exact roundtrips across shapes/strip layouts, LZW stream
properties (early-change widths, table reset), and codec registration."""

import numpy as np
import pytest

from geopy_spark.kernels import codecs as C
from geopy_spark.kernels import tiff as Tf


def _img(h, w, seed=3):
    rng = np.random.default_rng(seed)
    base = (np.linspace(0, 255, w)[None, :, None] * np.ones((h, 1, 3)))
    return np.clip(base + rng.integers(-20, 20, (h, w, 3)), 0,
                   255).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (37, 41), (100, 30)])
@pytest.mark.parametrize("comp", ["none", "lzw"])
@pytest.mark.parametrize("rps", [None, 7])
def test_tiff_roundtrip_exact(h, w, comp, rps):
    img = _img(h, w)
    buf = Tf.encode_tiff(img, compression=comp, rows_per_strip=rps)
    assert buf[:4] == b"II*\x00"
    assert np.array_equal(Tf.decode_tiff(buf), img)


def test_lzw_stream_roundtrip_with_table_resets():
    rng = np.random.default_rng(9)
    incompressible = bytes(rng.integers(0, 256, 200000, dtype=np.uint8))
    assert Tf.lzw_decode(Tf.lzw_encode(incompressible)) == incompressible
    repetitive = b"abcabcabc" * 30000
    enc = Tf.lzw_encode(repetitive)
    assert Tf.lzw_decode(enc) == repetitive
    assert len(enc) < len(repetitive) // 50  # LZW actually compresses


def test_lzw_early_change_boundary():
    """Data sized to cross the 9->10 bit early-change boundary exactly:
    255 distinct pairs force ~255 new codes past the 258 base."""
    data = bytes(range(256)) * 40
    assert Tf.lzw_decode(Tf.lzw_encode(data)) == data


def test_codec_registry_tiff_lossless():
    img = _img(24, 31)
    buf = C.encode(img, "tiff")
    assert np.array_equal(C.decode(buf, "tiff", 31, 24), img)
    assert C.is_lossless("tiff")


def test_tiff_rejects_garbage():
    with pytest.raises(ValueError):
        Tf.decode_tiff(b"MM\x00*garbagegarbage")
