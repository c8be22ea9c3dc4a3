"""Baseline RGB TIFF codec with TIFF-LZW compression, from scratch
(public spec: TIFF 6.0, Adobe 1992 — the container format of GeoTIFF).

Scope: single-strip or multi-strip baseline TIFF, 8-bit RGB, chunky
planar config, little-endian, Compression = 1 (none) or 5 (LZW).
TIFF-LZW per spec §13: MSB-first bit packing, ClearCode=256, EOI=257,
variable code width 9→12 bits with the "early change" quirk (the width
bumps one code EARLIER than generic LZW: at table sizes 510/1022/2046),
table reset at 4094. Lossless by construction — the roundtrip test is
exact array equality.

No PIL/libtiff anywhere — pure python/numpy, same posture as the PNG
(RFC 2083), WAV (RIFF) and Y4M codecs beside it.

Cost note: LZW is inherently sequential per strip, so encode/decode run
~9ms each per 64px image in pure python (measured) — registered as a
supported format in kernels/codecs but deliberately NOT in the synthetic
benchmark format mix (`codecs.FORMATS`), where 150k python-LZW images
would dominate the pipeline wall. On a real deployment this codec is the
interchange path (GeoTIFF ingest), not the hot storage format.
"""

from __future__ import annotations

import numpy as np

_II = b"II*\x00"  # little-endian magic + 42

_CLEAR = 256
_EOI = 257


# ----------------------------------------------------------------- LZW

def lzw_encode(data: bytes) -> bytes:
    """TIFF-LZW (spec §13): emits ClearCode, then codes with early-change
    width bumps, ClearCode again whenever the table hits 4094, EOI last."""
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # early change: width grows when the NEXT code would not fit,
        # i.e. one entry before the generic-LZW boundary
        if next_code == 511:
            width = 10
        elif next_code == 1023:
            width = 11
        elif next_code == 2047:
            width = 12
        w = c
        if next_code >= 4094:
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(buf: bytes, expect: int | None = None) -> bytes:
    """Inverse of lzw_encode (tolerates missing EOI at buffer end)."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    n = len(buf)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | buf[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (bitbuf >> nbits) & ((1 << width) - 1)
        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            reset()
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt TIFF-LZW stream: code {code} "
                             f"beyond table size {len(table)}")
        out += entry
        prev = entry
        # early change mirrors the encoder
        if len(table) == 511 - 1:
            width = 10
        elif len(table) == 1023 - 1:
            width = 11
        elif len(table) == 2047 - 1:
            width = 12
        if expect is not None and len(out) >= expect:
            return bytes(out)


# ---------------------------------------------------------------- container

def _tag(tag_id: int, typ: int, count: int, value: int) -> bytes:
    return (np.array([tag_id, typ], dtype="<u2").tobytes()
            + np.array([count, value], dtype="<u4").tobytes())


def encode_tiff(img: np.ndarray, compression: str = "lzw",
                rows_per_strip: int | None = None) -> bytes:
    """[h,w,3] uint8 → baseline RGB TIFF bytes (single IFD)."""
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    h, w = img.shape[:2]
    comp = 5 if compression == "lzw" else 1
    rps = h if rows_per_strip is None else max(1, int(rows_per_strip))
    strips_raw = [img[y:y + rps].tobytes() for y in range(0, h, rps)]
    strips = ([lzw_encode(s) for s in strips_raw] if comp == 5
              else strips_raw)
    n_strips = len(strips)

    # layout: header(8) | bits-per-sample array(6) | strip offset/count
    # arrays (if >1 strip) | strip data | IFD
    off = 8
    bps_off = off
    off += 6
    if n_strips > 1:
        so_off = off
        off += 4 * n_strips
        sc_off = off
        off += 4 * n_strips
    strip_offsets = []
    for s in strips:
        strip_offsets.append(off)
        off += len(s)
    ifd_off = off

    entries = [
        _tag(256, 4, 1, w),                 # ImageWidth LONG
        _tag(257, 4, 1, h),                 # ImageLength LONG
        _tag(258, 3, 3, bps_off),           # BitsPerSample SHORT[3] -> offset
        _tag(259, 3, 1, comp),              # Compression
        _tag(262, 3, 1, 2),                 # Photometric = RGB
        _tag(273, 4, n_strips,
             strip_offsets[0] if n_strips == 1 else so_off),   # StripOffsets
        _tag(277, 3, 1, 3),                 # SamplesPerPixel
        _tag(278, 4, 1, rps),               # RowsPerStrip
        _tag(279, 4, n_strips,
             len(strips[0]) if n_strips == 1 else sc_off),     # StripByteCounts
    ]
    out = bytearray()
    out += _II + np.array([ifd_off], dtype="<u4").tobytes()
    out += np.array([8, 8, 8], dtype="<u2").tobytes()
    if n_strips > 1:
        out += np.array(strip_offsets, dtype="<u4").tobytes()
        out += np.array([len(s) for s in strips], dtype="<u4").tobytes()
    for s in strips:
        out += s
    out += np.array([len(entries)], dtype="<u2").tobytes()
    for e in entries:
        out += e
    out += np.array([0], dtype="<u4").tobytes()  # next-IFD = none
    return bytes(out)


def _read_values(buf: bytes, typ: int, count: int, value_field: int) -> list[int]:
    sizes = {3: 2, 4: 4}
    dt = {3: "<u2", 4: "<u4"}[typ]
    total = sizes[typ] * count
    if total <= 4:
        raw = np.array([value_field], dtype="<u4").tobytes()[:total]
        return list(np.frombuffer(raw, dtype=dt, count=count))
    return list(np.frombuffer(buf, dtype=dt, count=count, offset=value_field))


def decode_tiff(buf: bytes) -> np.ndarray:
    """Baseline RGB TIFF bytes → [h,w,3] uint8 (compression 1 or 5)."""
    buf = bytes(buf)
    if buf[:4] != _II:
        raise ValueError("not a little-endian TIFF")
    ifd_off = int(np.frombuffer(buf, dtype="<u4", count=1, offset=4)[0])
    n = int(np.frombuffer(buf, dtype="<u2", count=1, offset=ifd_off)[0])
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag_id, typ = np.frombuffer(buf, dtype="<u2", count=2, offset=e)
        count = int(np.frombuffer(buf, dtype="<u4", count=1, offset=e + 4)[0])
        val = int(np.frombuffer(buf, dtype="<u4", count=1, offset=e + 8)[0])
        tags[int(tag_id)] = (int(typ), count, val)

    def vals(tag_id: int) -> list[int]:
        typ, count, val = tags[tag_id]
        return _read_values(buf, typ, count, val)

    w = vals(256)[0]
    h = vals(257)[0]
    comp = vals(259)[0]
    if vals(277)[0] != 3 or vals(262)[0] != 2:
        raise ValueError("only baseline RGB supported")
    rps = vals(278)[0] if 278 in tags else h
    offsets = vals(273)
    counts = vals(279)
    raw = bytearray()
    for i, (o, c) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - i * rps)
        strip = buf[o:o + c]
        if comp == 5:
            raw += lzw_decode(strip, expect=rows * w * 3)
        elif comp == 1:
            raw += strip
        else:
            raise ValueError(f"unsupported compression {comp}")
    return np.frombuffer(bytes(raw), dtype=np.uint8,
                         count=h * w * 3).reshape(h, w, 3)
