"""From-scratch Y4M codec (public spec: YUV4MPEG2, the uncompressed
video interchange format of mjpegtools/ffmpeg — plain-text stream
header + raw planar frames) — pure numpy, no ffmpeg (absent here).

Stream layout per spec:
    ``YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip|It|Ib] [A<n>:<d>] [C420...]\\n``
    then per frame: ``FRAME[ params]\\n`` + raw plane bytes.
Supported colorspaces: C420 family (4:2:0 — w*h luma + 2 quarter chroma
planes; the spec's default) and C444. Frame extraction is pure offset
arithmetic + ``np.frombuffer`` — decoding N frames costs one memoryview
slice each, so frame *sampling* (every k-th) never touches skipped
frames' bytes.

``yuv420_to_rgb`` applies the BT.601 full-range matrix vectorized over
whole frames (the public JPEG/JFIF YCbCr convention, matching the
engine's qjpg codec).
"""

from __future__ import annotations

import numpy as np


class Y4MError(ValueError):
    pass


_MAGIC = b"YUV4MPEG2"


def _parse_header(buf: bytes) -> tuple[dict, int]:
    end = buf.find(b"\n")
    if end < 0 or not buf.startswith(_MAGIC):
        raise Y4MError("not a YUV4MPEG2 stream")
    meta = {"w": None, "h": None, "fps_num": 25, "fps_den": 1, "cs": "420"}
    for tok in buf[len(_MAGIC):end].split():
        t, v = chr(tok[0]), tok[1:].decode()
        if t == "W":
            meta["w"] = int(v)
        elif t == "H":
            meta["h"] = int(v)
        elif t == "F":
            num, den = v.split(":")
            meta["fps_num"], meta["fps_den"] = int(num), int(den)
        elif t == "C":
            meta["cs"] = v
    if not meta["w"] or not meta["h"]:
        raise Y4MError("header missing W/H")
    return meta, end + 1


def _frame_size(meta: dict) -> int:
    w, h = meta["w"], meta["h"]
    if meta["cs"].startswith("420"):
        if w % 2 or h % 2:
            raise Y4MError("C420 needs even dimensions")
        return w * h + 2 * (w // 2) * (h // 2)
    if meta["cs"].startswith("444"):
        return 3 * w * h
    raise Y4MError(f"unsupported colorspace C{meta['cs']}")


def _frame_offsets(buf: bytes, pos: int, fsize: int) -> list[int]:
    """Offsets of each frame's plane data (skipping FRAME marker lines)."""
    offs = []
    n = len(buf)
    while pos < n:
        if buf[pos:pos + 5] != b"FRAME":
            raise Y4MError(f"expected FRAME marker at byte {pos}")
        nl = buf.find(b"\n", pos)
        if nl < 0 or nl + 1 + fsize > n:
            raise Y4MError("truncated frame")
        offs.append(nl + 1)
        pos = nl + 1 + fsize
    return offs


def probe_y4m(buf: bytes) -> dict:
    """Header metadata + frame count without touching frame bytes."""
    meta, pos = _parse_header(buf)
    fsize = _frame_size(meta)
    meta["n_frames"] = len(_frame_offsets(buf, pos, fsize))
    return meta


def decode_y4m(buf: bytes, every_k: int = 1) -> tuple[list[tuple[np.ndarray, np.ndarray, np.ndarray]], dict]:
    """Y4M bytes → (list of (Y, U, V) uint8 planes for every k-th frame,
    stream meta). Skipped frames cost only offset arithmetic."""
    meta, pos = _parse_header(buf)
    fsize = _frame_size(meta)
    offs = _frame_offsets(buf, pos, fsize)
    meta["n_frames"] = len(offs)
    w, h = meta["w"], meta["h"]
    cw, chh = (w // 2, h // 2) if meta["cs"].startswith("420") else (w, h)
    frames = []
    for off in offs[::max(every_k, 1)]:
        y = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=off
                          ).reshape(h, w)
        u = np.frombuffer(buf, dtype=np.uint8, count=cw * chh,
                          offset=off + w * h).reshape(chh, cw)
        v = np.frombuffer(buf, dtype=np.uint8, count=cw * chh,
                          offset=off + w * h + cw * chh).reshape(chh, cw)
        frames.append((y, u, v))
    return frames, meta


def encode_y4m(frames: list[np.ndarray], fps: tuple[int, int] = (25, 1)) -> bytes:
    """RGB uint8 frames (h, w, 3) → C420 Y4M bytes (BT.601 full-range,
    2×2 box-filtered chroma)."""
    if not frames:
        raise Y4MError("no frames")
    h, w = frames[0].shape[:2]
    if w % 2 or h % 2:
        raise Y4MError("C420 needs even dimensions")
    parts = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420\n" % (w, h, *fps)]
    for f in frames:
        y, u, v = rgb_to_yuv420(f)
        parts.append(b"FRAME\n")
        parts.extend((y.tobytes(), u.tobytes(), v.tobytes()))
    return b"".join(parts)


# ------------------------------------------------ BT.601 full-range matrix

def rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    sub = lambda p: p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean((1, 3))  # noqa: E731
    clip = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(sub(u)), clip(sub(v))


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    yf = y.astype(np.float64)
    uf = np.repeat(np.repeat(u, 2, 0), 2, 1).astype(np.float64) - 128.0
    vf = np.repeat(np.repeat(v, 2, 0), 2, 1).astype(np.float64) - 128.0
    uf, vf = uf[:y.shape[0], :y.shape[1]], vf[:y.shape[0], :y.shape[1]]
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
