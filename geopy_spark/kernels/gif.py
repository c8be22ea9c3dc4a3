"""GIF87a/89a codec, from scratch (public spec: CompuServe GIF89a,
1990). The INGEST side is complete: ``decode_gif`` reads any baseline
still GIF — global/local color tables, interlaced or not, extension
blocks skipped, first image block of animated files — via GIF-LZW
(LSB-first bit packing, dynamic clear/EOI codes, width growth at table
size 2^width up to 12 bits, table reset on clear; unlike TIFF-LZW there
is NO early-change quirk and the stream is chopped into ≤255-byte
sub-blocks).

The ENCODE side is honest about the format: GIF is palette-indexed, so
``encode_gif`` losslessly encodes images with ≤256 distinct colors and
refuses otherwise (a quantizing encoder would be a <40dB lossy path,
below the engine's lossy-PSNR bar — out of scope). Decode-only for
true-color sources is exactly the real-world contract: pipelines ingest
GIFs, they don't master to them. Not registered in the hot
``codecs.FORMATS`` mix for the same reason as TIFF (python LZW cost).
"""

from __future__ import annotations

import numpy as np


# ----------------------------------------------------------------- GIF-LZW

def lzw_gif_encode(indices: bytes, mcs: int) -> bytes:
    """Index stream → GIF-LZW bytes (LSB-first), without sub-block
    framing. mcs = minimum code size (palette bits, >=2)."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return ({bytes([i]): i for i in range(clear)}, eoi + 1, mcs + 1)

    table, next_code, width = fresh()
    emit(clear, width)
    w = b""
    for b in indices:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # grow when the next code to ASSIGN would overflow; the decoder
        # fires the matching bump at table length 2^width - 1 (it lags
        # one entry behind), keeping every read width-synced incl. EOI
        if next_code == (1 << width) and width < 12:
            width += 1
        w = c
        if next_code >= 4096:
            emit(clear, width)
            table, next_code, width = fresh()
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def lzw_gif_decode(data: bytes, mcs: int, expect: int | None = None) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    pos = 0

    def fresh() -> tuple[list, int]:
        return ([bytes([i]) for i in range(clear)] + [b"", b""], mcs + 1)

    table, width = fresh()
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == eoi:
            return bytes(out)
        if code == clear:
            table, width = fresh()
            prev = None
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
            raise ValueError(f"corrupt GIF-LZW: code {code} > table "
                             f"{len(table)}")
        out += entry
        prev = entry
        # width grows when the NEXT code to be assigned would overflow;
        # the decoder's table lags the encoder by one entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
        if expect is not None and len(out) >= expect:
            return bytes(out)


# --------------------------------------------------------------- container

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """[h,w,3] uint8 with ≤256 distinct colors → GIF89a bytes
    (lossless); raises ValueError past 256 colors."""
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF encode needs <=256 distinct colors, got "
                         f"{len(palette)} — quantize first or use a "
                         f"true-color format")
    bits = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[:len(palette)] = palette
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate([np.arange(s, h, step)
                                for s, step in _INTERLACE_PASSES])
        idx = idx[order]

    out = bytearray(b"GIF89a")
    out += np.array([w, h], dtype="<u2").tobytes()
    out.append(0x80 | (bits - 1))       # GCT present, size 2^bits
    out += b"\x00\x00"                   # bg index, aspect
    out += pal.tobytes()
    out += b"\x2c" + np.array([0, 0, w, h], dtype="<u2").tobytes()
    out.append(0x40 if interlace else 0x00)
    mcs = bits
    out.append(mcs)
    comp = lzw_gif_encode(idx.tobytes(), mcs)
    for i in range(0, len(comp), 255):
        chunk = comp[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"                   # block terminator + trailer
    return bytes(out)


def decode_gif(buf: bytes) -> np.ndarray:
    """Baseline still GIF → [h,w,3] uint8 (first image block of animated
    files; transparency rendered as its palette color)."""
    buf = bytes(buf)
    if buf[:3] != b"GIF" or buf[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF")
    pos = 6
    sw, sh = np.frombuffer(buf, dtype="<u2", count=2, offset=pos)
    pos += 4
    packed, _bg, _aspect = buf[pos], buf[pos + 1], buf[pos + 2]
    pos += 3
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:                # trailer
            break
        if block == 0x21:                # extension: skip sub-blocks
            pos += 1                     # label
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h = np.frombuffer(buf, dtype="<u2", count=4, offset=pos)
        pos += 8
        ipacked = buf[pos]
        pos += 1
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(buf, dtype=np.uint8, count=3 * n,
                                offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image block without any color table")
        mcs = buf[pos]
        pos += 1
        comp = bytearray()
        while buf[pos] != 0:
            ln = buf[pos]
            comp += buf[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            lzw_gif_decode(bytes(comp), mcs, expect=int(w) * int(h)),
            dtype=np.uint8, count=int(w) * int(h)).reshape(int(h), int(w))
        if ipacked & 0x40:               # de-interlace
            out_rows = np.empty(int(h), dtype=np.int64)
            src = 0
            for s, step in _INTERLACE_PASSES:
                rows = range(s, int(h), step)
                for r in rows:
                    out_rows[r] = src
                    src += 1
            idx = idx[out_rows]
        return pal[idx]
    raise ValueError("GIF contained no image block")
