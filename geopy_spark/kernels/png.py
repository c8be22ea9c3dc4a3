"""From-scratch PNG codec (public spec: RFC 2083 / W3C PNG) — stdlib
``zlib`` + numpy, no PIL/cv2 (absent in this sandbox).

Decode supports the non-interlaced 8-bit subset that covers real-world
payloads: color types 0 (grayscale), 2 (RGB), 3 (palette), 4 (gray+alpha)
and 6 (RGBA), with all five scanline filters (None/Sub/Up/Average/Paeth).
Output is always (h, w, 3) uint8 RGB — the engine's canonical pixel
layout (alpha is composited over black, i.e. dropped premultiplied-away
for the opaque fixtures used here; gray replicates to 3 channels).

Encode writes color type 2 (RGB, 8-bit), one IDAT, per-row filter chosen
between None and Sub by a sum-of-absolute-residuals heuristic (both are
bit-exactly invertible, so the codec stays lossless either way).

Filters Up/None/Sub vectorize fully (Sub via uint8 wraparound
``np.add.accumulate`` per byte-lane); Average and Paeth carry a true
per-pixel dependency on the left neighbour, so those rows fall back to a
small per-byte loop — correctness first, and fixture images are small.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


# ------------------------------------------------------------------ chunks

def _chunks(buf: bytes):
    if buf[:8] != _SIG:
        raise PngError("bad PNG signature")
    pos = 8
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        ctype = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        crc = struct.unpack(">I", buf[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {ctype!r} chunk")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


# ---------------------------------------------------------------- unfilter

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """raw: h rows of (1 filter byte + stride data bytes) → (h, stride)."""
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(ftypes[y])
        cur = rows[y, 1:].copy()
        if ft == 0:                                   # None
            rec = cur
        elif ft == 1:                                 # Sub
            # rec[i] = cur[i] + rec[i-bpp]: per byte-lane cumulative sum
            # with uint8 wraparound
            rec = cur
            for lane in range(bpp):
                np.add.accumulate(rec[lane::bpp], dtype=np.uint8,
                                  out=rec[lane::bpp])
        elif ft == 2:                                 # Up
            rec = cur + prev
        elif ft == 3:                                 # Average
            rec = cur
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:                                 # Paeth
            rec = cur
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                rec[i] = (int(cur[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ft} on row {y}")
        out[y] = rec
        prev = out[y]
    return out


# ------------------------------------------------------------------ decode

def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB."""
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _chunks(bytes(buf)):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise PngError("missing IHDR or IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8:
        raise PngError(f"unsupported bit depth {depth} (8 only)")
    if ctype_ not in _CHANNELS:
        raise PngError(f"unsupported color type {ctype_}")
    if comp != 0 or filt != 0:
        raise PngError("unsupported compression/filter method")
    if interlace != 0:
        raise PngError("Adam7 interlace not supported")
    ch = _CHANNELS[ctype_]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise PngError("IDAT size mismatch")
    px = _unfilter(raw, h, stride, bpp=ch).reshape(h, w, ch)
    if ctype_ == 2:                                   # RGB
        return px
    if ctype_ == 0:                                   # gray
        return np.repeat(px, 3, axis=2)
    if ctype_ == 3:                                   # palette
        if plte is None:
            raise PngError("palette image without PLTE")
        return plte[px[:, :, 0]]
    if ctype_ == 4:                                   # gray + alpha
        g = np.repeat(px[:, :, :1], 3, axis=2).astype(np.uint16)
        a = px[:, :, 1:2].astype(np.uint16)
        return ((g * a) // 255).astype(np.uint8)
    # RGBA: composite over black
    rgb = px[:, :, :3].astype(np.uint16)
    a = px[:, :, 3:4].astype(np.uint16)
    return ((rgb * a) // 255).astype(np.uint8)


# ------------------------------------------------------------------ encode

def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (color type 2, non-interlaced)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise PngError("encode_png expects (h, w, 3) RGB")
    h, w = img.shape[:2]
    rows = img.reshape(h, w * 3)
    # per-row filter choice: None vs Sub by minimum sum of |residual|
    # (signed-interpretation heuristic from the spec's recommendations)
    sub = rows.copy()
    sub[:, 3:] = rows[:, 3:] - rows[:, :-3]
    cost_none = np.abs(rows.astype(np.int16) - ((rows > 127) * 256)).sum(axis=1)
    cost_sub = np.abs(sub.astype(np.int16) - ((sub > 127) * 256)).sum(axis=1)
    use_sub = cost_sub < cost_none
    filtered = np.empty((h, w * 3 + 1), dtype=np.uint8)
    filtered[:, 0] = use_sub.astype(np.uint8)          # 0=None, 1=Sub
    filtered[:, 1:] = np.where(use_sub[:, None], sub, rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(filtered.tobytes(), level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
