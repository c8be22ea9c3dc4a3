"""From-scratch PNG codec vs hand-built golden images (public spec:
RFC 2083). The goldens are constructed in-test directly from the spec's
filter formulas — raw chunk layout, CRCs, filtered scanlines written by
hand — so the decoder is checked against the specification, not against
the sibling encoder (no circularity). Roundtrip tests then pin
encoder↔decoder consistency, and the codecs registry test pins PNG's
place in the I1 lossless-invariant surface."""

import struct
import zlib

import numpy as np
import pytest

from geopy_spark.kernels import codecs as C
from geopy_spark.kernels import png as P


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _build_png(w, h, ctype, scanlines, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = P._SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
    return out + _chunk(b"IEND", b"")


def test_golden_rgb_all_filters():
    """4x5 RGB image; one scanline per filter type 0..4, filtered bytes
    computed by hand from the spec formulas on KNOWN target pixels."""
    rng = np.random.default_rng(42)
    target = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    rows = target.reshape(5, 12).astype(np.int32)
    bpp = 3
    scan = []
    # row 0: filter 0 (None) — raw bytes
    scan.append(b"\x00" + bytes((rows[0] % 256).astype(np.uint8)))
    # row 1: filter 1 (Sub): filt[i] = raw[i] - raw[i-bpp]
    f = [(rows[1][i] - (rows[1][i - bpp] if i >= bpp else 0)) % 256
         for i in range(12)]
    scan.append(b"\x01" + bytes(f))
    # row 2: filter 2 (Up): filt[i] = raw[i] - prior[i]
    f = [(rows[2][i] - rows[1][i]) % 256 for i in range(12)]
    scan.append(b"\x02" + bytes(f))
    # row 3: filter 3 (Average): filt[i] = raw[i] - floor((left+up)/2)
    f = [(rows[3][i] - ((int(rows[3][i - bpp]) if i >= bpp else 0)
                        + int(rows[2][i])) // 2) % 256 for i in range(12)]
    scan.append(b"\x03" + bytes(f))

    # row 4: filter 4 (Paeth)
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    f = [(rows[4][i] - paeth(int(rows[4][i - bpp]) if i >= bpp else 0,
                             int(rows[3][i]),
                             int(rows[3][i - bpp]) if i >= bpp else 0)) % 256
         for i in range(12)]
    scan.append(b"\x04" + bytes(f))

    got = P.decode_png(_build_png(4, 5, 2, scan))
    assert np.array_equal(got, target)


def test_golden_grayscale_and_palette():
    gray = np.array([[0, 128], [255, 7]], dtype=np.uint8)
    scan = [b"\x00" + bytes(gray[0]), b"\x00" + bytes(gray[1])]
    got = P.decode_png(_build_png(2, 2, 0, scan))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    scan = [b"\x00" + bytes(idx[0]), b"\x00" + bytes(idx[1])]
    got = P.decode_png(_build_png(2, 2, 3, scan, plte=plte))
    expect = np.array([[[255, 0, 0], [0, 255, 0]],
                       [[0, 0, 255], [255, 0, 0]]], dtype=np.uint8)
    assert np.array_equal(got, expect)


def test_golden_rgba_composites_over_black():
    # one pixel, 50%-alpha white → 127 gray (floor((255*127)/255)=127)
    scan = [b"\x00" + bytes([255, 255, 255, 127])]
    got = P.decode_png(_build_png(1, 1, 6, scan))
    assert np.array_equal(got, np.array([[[127, 127, 127]]], dtype=np.uint8))


def test_roundtrip_random_images():
    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (3, 2), (16, 16), (64, 48), (33, 7)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(P.decode_png(P.encode_png(img)), img)
    # gradient image exercises the Sub-filter branch of the encoder
    grad = np.tile(np.arange(64, dtype=np.uint8)[None, :, None] * 4, (8, 1, 3))
    assert np.array_equal(P.decode_png(P.encode_png(grad)), grad)


def test_registered_in_codecs_as_lossless():
    assert "png" in C.FORMATS and C.is_lossless("png")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    assert np.array_equal(C.decode(C.encode(img, "png"), "png", 30, 20), img)


def test_corrupt_inputs_raise():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    buf = bytearray(P.encode_png(img))
    with pytest.raises(P.PngError):
        P.decode_png(b"notapng" + bytes(buf))
    buf[20] ^= 0xFF  # flip a byte inside IHDR → CRC mismatch
    with pytest.raises(P.PngError):
        P.decode_png(bytes(buf))
