"""Baseline JPEG (ITU-T T.81, 1992; JFIF 1.02 container) codec, from
scratch — numpy DCT math, pure-python entropy coding, no PIL/cv2.

Scope (the baseline-sequential profile that covers the overwhelming
majority of real-world still JPEGs):

* ``encode_jpeg`` — 8-bit RGB → JFIF bytes. BT.601 full-range YCbCr,
  8×8 forward DCT (orthonormal matrix form, one einsum over all
  blocks), Annex-K quantization tables scaled by the IJG quality
  formula, standard Annex-K Huffman tables, byte stuffing, optional
  4:2:0 chroma subsampling and restart intervals.
* ``decode_jpeg`` — JFIF/EXIF bytes → RGB. Marker parse (DQT 8/16-bit,
  SOF0, DHT, DRI, RSTn, APPn/COM skipped), canonical Huffman decode,
  dequantize, inverse DCT, chroma upsample for sampling factors
  h,v ∈ {1,2} (4:4:4 / 4:2:2 / 4:2:0), crop to the frame size.

Why both sides from scratch: the engine's lossy invariant is
PSNR ≥ 40 dB for decoded payloads (BASELINE.json input_hint). Pure
uint8 noise is the worst case for a DCT coder (all energy in the
coefficients the tables quantize hardest); measured roundtrip PSNR on
64×48 noise is 35.9 dB at quality 95 and 43.7 dB at quality 98, so the
default is quality=98 + 4:4:4 and tests pin the 40 dB floor on noise.
Natural/smooth content sits far higher (gradient: 54.8 dB at q95).

Progressive scans, arithmetic coding, 12-bit precision and CMYK are
out of scope and raise with a clear message.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------- constants

# zigzag position -> row-major index inside an 8x8 block (T.81 fig. 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 quantization tables (row-major)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: forward = C @ B @ C.T,
    inverse = C.T @ D @ C (C is orthogonal, so no separate scaling)."""
    k = np.arange(8)
    c = np.sqrt(0.25) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c


_C = _dct_matrix()


def _scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg jcparam.c formula, itself public)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# ------------------------------------------------------------ bit packing

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.buf = (self.buf << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.buf >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.n -= 8
        self.buf &= (1 << self.n) - 1

    def byte_align(self) -> None:
        if self.n:                  # pad with 1-bits per spec
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


class _BitReader:
    """MSB-first reader over the entropy segment; un-stuffs 0xFF00 and
    stops (returning 0-bits) at any real marker — the lenient behavior
    decoders need for streams whose final block relies on padding."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.p = pos
        self.buf = 0
        self.n = 0
        self.eos = False

    def read_bit(self) -> int:
        if self.n == 0:
            if self.eos or self.p >= len(self.d):
                return 0
            b = self.d[self.p]
            if b == 0xFF:
                nxt = self.d[self.p + 1] if self.p + 1 < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.p += 2
                else:               # RSTn/EOI/next marker: stop here
                    self.eos = True
                    return 0
            else:
                self.p += 1
            self.buf = b
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume the RSTn marker at an interval edge."""
        self.n = 0
        self.eos = False
        while self.p + 1 < len(self.d):
            if self.d[self.p] == 0xFF and 0xD0 <= self.d[self.p + 1] <= 0xD7:
                self.p += 2
                return
            self.p += 1
        raise ValueError("jpeg: expected restart marker, hit end of stream")


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code in entropy stream")


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, offset bits) per T.81 table F.1/F.2."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------- encoder

def _to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _pad_edge(a: np.ndarray, rows: int, cols: int) -> np.ndarray:
    return np.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])),
                  mode="edge")


def _blockify(a: np.ndarray) -> np.ndarray:
    """(H,W) multiple-of-8 plane -> (n_blocks, 8, 8) in raster order."""
    h, w = a.shape
    return (a.reshape(h // 8, 8, w // 8, 8)
             .transpose(0, 2, 1, 3)
             .reshape(-1, 8, 8))


def _quantized_zigzag(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """All blocks of a plane -> (n, 64) int32 zigzag-ordered quantized
    coefficients; the whole DCT+quantize is three numpy ops."""
    blocks = _blockify(plane - 128.0)
    coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    q = np.rint(coef / qtab.reshape(8, 8)).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    size, bits = _magnitude(int(zz[0]) - pred)
    code, ln = dc_codes[size]
    w.write(code, ln)
    w.write(bits, size)
    nz = np.flatnonzero(zz[1:])
    prev = 0
    for idx in nz:
        run = int(idx) - prev
        while run >= 16:
            code, ln = ac_codes[0xF0]        # ZRL
            w.write(code, ln)
            run -= 16
        size, bits = _magnitude(int(zz[1 + idx]))
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(bits, size)
        prev = int(idx) + 1
    if prev != 63:
        code, ln = ac_codes[0x00]            # EOB
        w.write(code, ln)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 98,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """RGB uint8 (H,W,3) -> baseline JFIF bytes. ``subsample`` switches
    chroma to 4:2:0 (box-average downsample); default 4:4:4 keeps the
    engine's PSNR≥40dB invariant on arbitrary content."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) RGB")
    h, w = img.shape[:2]
    y, cb, cr = _to_ycbcr(img)
    if subsample:
        hv = [(2, 2), (1, 1), (1, 1)]
        he, we = h + (h & 1), w + (w & 1)
        cbp, crp = _pad_edge(cb, he, we), _pad_edge(cr, he, we)
        cb = 0.25 * (cbp[0::2, 0::2] + cbp[1::2, 0::2]
                     + cbp[0::2, 1::2] + cbp[1::2, 1::2])
        cr = 0.25 * (crp[0::2, 0::2] + crp[1::2, 0::2]
                     + crp[0::2, 1::2] + crp[1::2, 1::2])
    else:
        hv = [(1, 1), (1, 1), (1, 1)]
    hmax = max(c[0] for c in hv)
    vmax = max(c[1] for c in hv)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    ql = _scaled_qtable(_Q_LUMA, quality)
    qc = _scaled_qtable(_Q_CHROMA, quality)
    comps = []
    for plane, (hi, vi), qtab in zip((y, cb, cr), hv, (ql, qc, qc)):
        padded = _pad_edge(plane, mcuy * vi * 8, mcux * hi * 8)
        zz = _quantized_zigzag(padded, qtab)
        comps.append((zz, hi, vi, mcux * hi))  # blocks-per-row for indexing

    dc_l = _canonical_codes(*_DC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    wtr = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                wtr.byte_align()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0, 0, 0]
            for ci, (zz, hi, vi, bpr) in enumerate(comps):
                for by in range(vi):
                    for bx in range(hi):
                        bidx = (my * vi + by) * bpr + mx * hi + bx
                        preds[ci] = _encode_block(
                            wtr, zz[bidx], preds[ci], *tabs[ci])
            n_mcu += 1
    wtr.byte_align()

    out = bytearray(b"\xFF\xD8")                              # SOI
    out += b"\xFF\xE0" + (16).to_bytes(2, "big") + b"JFIF\x00" \
        + bytes([1, 2, 0]) + (1).to_bytes(2, "big") * 2 + bytes([0, 0])
    for tid, qtab in ((0, ql), (1, qc)):
        out += b"\xFF\xDB" + (67).to_bytes(2, "big") + bytes([tid])
        out += bytes(int(v) for v in qtab.ravel()[ZIGZAG])
    out += b"\xFF\xC0" + (17).to_bytes(2, "big") + bytes([8])  # SOF0
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid, (hi, vi), qid in zip((1, 2, 3), hv, (0, 1, 1)):
        out += bytes([cid, (hi << 4) | vi, qid])
    for tc_th, (bits, vals) in (((0 << 4) | 0, _DC_LUMA),
                                ((0 << 4) | 1, _DC_CHROMA),
                                ((1 << 4) | 0, _AC_LUMA),
                                ((1 << 4) | 1, _AC_CHROMA)):
        out += b"\xFF\xC4" + (3 + 16 + len(vals)).to_bytes(2, "big")
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + (4).to_bytes(2, "big") \
            + restart_interval.to_bytes(2, "big")
    out += b"\xFF\xDA" + (12).to_bytes(2, "big") + bytes([3])  # SOS
    for cid, (dct, act) in zip((1, 2, 3), ((0, 0), (1, 1), (1, 1))):
        out += bytes([cid, (dct << 4) | act])
    out += bytes([0, 63, 0])
    out += wtr.out
    out += b"\xFF\xD9"                                         # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder

def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF/EXIF bytes -> RGB uint8 (H,W,3). Grayscale files
    are expanded to 3 channels. Malformed/truncated input raises
    ValueError (never a bare IndexError) — ingest at scale sees corrupt
    payloads and the operator layer maps per-row errors by type."""
    try:
        return _decode_jpeg(buf)
    except (IndexError, KeyError, ZeroDivisionError) as e:
        raise ValueError(f"jpeg: malformed or truncated stream ({e!r})") \
            from e


def _decode_jpeg(buf: bytes) -> np.ndarray:
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("jpeg: missing SOI marker")
    p = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    planes: dict[int, np.ndarray] = {}
    decoded: set[int] = set()
    while p < len(buf):
        if buf[p] != 0xFF:
            raise ValueError(f"jpeg: expected marker at offset {p}")
        m = buf[p + 1]
        p += 2
        if m == 0xD9:            # EOI with no scan
            break
        if 0xD0 <= m <= 0xD7 or m == 0x01:
            continue             # parameterless
        seglen = int.from_bytes(buf[p:p + 2], "big")
        seg = buf[p + 2:p + seglen]
        if m == 0xDB:            # DQT (possibly several tables)
            q = 0
            while q < len(seg):
                prec, tid = seg[q] >> 4, seg[q] & 0xF
                n = 64 * (2 if prec else 1)
                raw = np.frombuffer(seg[q + 1:q + 1 + n],
                                    dtype=">u2" if prec else np.uint8)
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = raw.astype(np.int32)
                qtabs[tid] = t
                q += 1 + n
        elif m == 0xC4:          # DHT
            q = 0
            while q < len(seg):
                tc, th = seg[q] >> 4, seg[q] & 0xF
                bits = list(seg[q + 1:q + 17])
                nv = sum(bits)
                vals = list(seg[q + 17:q + 17 + nv])
                htabs[(tc, th)] = _decode_table(bits, vals)
                q += 17 + nv
        elif m == 0xC0 or m == 0xC1:   # SOF0/1 (baseline + ext. sequential)
            fh = int.from_bytes(seg[1:3], "big")
            fw = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hvb, qid = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hvb >> 4, "v": hvb & 0xF,
                              "q": qid})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF{m - 0xC0} (progressive/arithmetic/hierarchical) "
                f"not supported; baseline SOF0 only")
        elif m == 0xDD:          # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:          # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i:3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append((comp, tt >> 4, tt & 0xF))
            p = _decode_scan(buf, p + seglen, frame, scan, qtabs,
                             htabs, restart, planes)
            decoded |= {comp["id"] for comp, _, _ in scan}
            if decoded == {c["id"] for c in frame["comps"]}:
                return _finish(frame, planes)
            continue             # multi-scan baseline: next SOS follows
        p += seglen
    if frame is not None and decoded:
        raise ValueError("jpeg: stream ended before every frame "
                         "component was scanned")
    raise ValueError("jpeg: no SOS scan found")


def _decode_block(r: "_BitReader", dtab: dict, atab: dict,
                  qtab: np.ndarray, pred: int) -> tuple[np.ndarray, int]:
    """Decode one 8x8 data unit: Huffman DC delta + AC run-lengths,
    dequantize, inverse DCT. Returns (spatial block + 128, new DC pred)."""
    zz = np.zeros(64, dtype=np.float64)
    size = _huff_decode(r, dtab)
    pred += _extend(r.read_bits(size), size)
    zz[0] = pred
    k = 1
    while k < 64:
        sym = _huff_decode(r, atab)
        if sym == 0x00:          # EOB
            break
        if sym == 0xF0:          # ZRL
            k += 16
            continue
        k += sym >> 4
        if k > 63:
            raise ValueError("jpeg: AC index overflow")
        zz[k] = _extend(r.read_bits(sym & 0xF), sym & 0xF)
        k += 1
    blk = np.zeros(64, dtype=np.float64)
    blk[ZIGZAG] = zz * qtab[ZIGZAG]
    return _C.T @ blk.reshape(8, 8) @ _C + 128.0, pred


def _decode_scan(buf: bytes, pos: int, frame: dict, scan: list,
                 qtabs: dict, htabs: dict, restart: int,
                 planes: dict) -> int:
    """Decode ONE scan's entropy segment into ``planes`` (allocating the
    scan components' planes on first sight). Returns the offset of the
    marker that terminated the segment, so multi-scan files keep parsing
    (T.81 B.2.2: a baseline frame may carry several SOS, one subset of
    components each).

    Interleaved (Ns > 1): MCUs sized by the FRAME's max sampling
    factors, h_i×v_i blocks per component per MCU. Non-interleaved
    (Ns = 1): per T.81 A.2.2 the MCU is a single data unit and the scan
    walks the component's OWN block grid ceil(comp_w/8) × ceil(comp_h/8)
    — even when that component declares h=v=2 in the frame header
    (ADVICE r3: sizing this case by the frame's factors garbled
    grayscale exported from color pipelines)."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if not all(c["h"] in (1, 2) and c["v"] in (1, 2)
               for c in frame["comps"]):
        raise NotImplementedError("jpeg: sampling factors beyond 2 "
                                  "unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for comp, _, _ in scan:
        if comp["id"] not in planes:
            # MCU-padded size covers the non-interleaved grid too
            planes[comp["id"]] = np.zeros(
                (mcuy * comp["v"] * 8, mcux * comp["h"] * 8),
                dtype=np.float64)

    r = _BitReader(buf, pos)
    preds = {comp["id"]: 0 for comp, _, _ in scan}

    if len(scan) == 1:           # non-interleaved: one block per MCU
        comp, dct, act = scan[0]
        dtab, atab = htabs[(0, dct)], htabs[(1, act)]
        qtab = qtabs[comp["q"]]
        cw = -(-(w * comp["h"]) // hmax)   # component width in samples
        ch = -(-(h * comp["v"]) // vmax)
        bw = -(-cw // 8)                   # ... in whole blocks
        bh = -(-ch // 8)
        n_blk = 0
        for by in range(bh):
            for bx in range(bw):
                if restart and n_blk and n_blk % restart == 0:
                    r.sync_restart()
                    preds = {k: 0 for k in preds}
                pix, preds[comp["id"]] = _decode_block(
                    r, dtab, atab, qtab, preds[comp["id"]])
                planes[comp["id"]][by * 8:by * 8 + 8,
                                   bx * 8:bx * 8 + 8] = pix
                n_blk += 1
        return r.p

    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                r.sync_restart()
                preds = {k: 0 for k in preds}
            for comp, dct, act in scan:
                dtab = htabs[(0, dct)]
                atab = htabs[(1, act)]
                qtab = qtabs[comp["q"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        pix, preds[comp["id"]] = _decode_block(
                            r, dtab, atab, qtab, preds[comp["id"]])
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0:y0 + 8, x0:x0 + 8] = pix
            n_mcu += 1
    return r.p


def _finish(frame: dict, planes: dict) -> np.ndarray:
    """Upsample chroma to the frame grid, crop padding, color-convert."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    full = []
    for comp in frame["comps"]:
        pl = planes[comp["id"]]
        pl = np.repeat(np.repeat(pl, vmax // comp["v"], axis=0),
                       hmax // comp["h"], axis=1)
        full.append(pl[:h, :w])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r_, g_, b_], axis=-1)),
                   0, 255).astype(np.uint8)
