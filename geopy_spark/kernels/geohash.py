"""Geohash encode/decode — vectorized numpy (round 5, G22 interchange).

The public geohash scheme (Niemeyer 2008; base32 alphabet
"0123456789bcdefghjkmnpqrstuvwxyz"): interleave longitude/latitude
bisection bits (lon first), pack 5 bits per character. The engine's
native index stays the S2-style cell (kernels/cells) — geohash exists
for interchange with the many systems that key on it (ES, Redis,
DynamoDB geo libraries, tile caches).

Precision reference (public): 9 chars ≈ 4.8 m × 4.8 m cells.
"""

from __future__ import annotations

import numpy as np

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32_ARR = np.frombuffer(_B32.encode(), dtype=np.uint8)
_B32_INV = np.full(256, -1, dtype=np.int8)
for _i, _c in enumerate(_B32.encode()):
    _B32_INV[_c] = _i


def encode(lat, lon, precision: int = 9) -> np.ndarray:
    """lat/lon arrays → geohash strings of ``precision`` chars."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    if not (np.isfinite(lat).all() and np.isfinite(lon).all()):
        # NaN compares False against every midpoint and would silently
        # encode as the valid-looking '000…' South-Pole cell — fail loud
        # (the Column wrapper masks nulls to null BEFORE calling this)
        raise ValueError("geohash encode requires finite lat/lon")
    n = lat.shape[0]
    nbits = precision * 5
    # interleaved bisection: even global bit positions refine lon
    lat0 = np.full(n, -90.0)
    lat1 = np.full(n, 90.0)
    lon0 = np.full(n, -180.0)
    lon1 = np.full(n, 180.0)
    chars = np.empty((n, precision), dtype=np.uint8)
    acc = np.zeros(n, dtype=np.int64)
    for b in range(nbits):
        if b % 2 == 0:
            mid = (lon0 + lon1) / 2.0
            bit = lon >= mid
            lon0 = np.where(bit, mid, lon0)
            lon1 = np.where(bit, lon1, mid)
        else:
            mid = (lat0 + lat1) / 2.0
            bit = lat >= mid
            lat0 = np.where(bit, mid, lat0)
            lat1 = np.where(bit, lat1, mid)
        acc = (acc << 1) | bit
        if b % 5 == 4:
            chars[:, b // 5] = _B32_ARR[acc]
            acc[:] = 0
    return chars.view(f"S{precision}").ravel().astype(str)


def decode_bounds(geohashes) -> tuple[np.ndarray, ...]:
    """geohash strings → (lat_min, lat_max, lon_min, lon_max) cell
    bounds. Mixed lengths allowed (shorter = coarser cell)."""
    gh = np.asarray(geohashes, dtype=str)
    n = gh.shape[0]
    lat0 = np.full(n, -90.0)
    lat1 = np.full(n, 90.0)
    lon0 = np.full(n, -180.0)
    lon1 = np.full(n, 180.0)
    lens = np.char.str_len(gh)
    maxlen = int(lens.max()) if n else 0
    # pad to a rectangular byte grid; padded positions are masked out
    padded = np.char.ljust(gh, maxlen, "0").astype(f"S{max(maxlen, 1)}")
    grid = padded.view(np.uint8).reshape(n, -1)[:, :maxlen]
    vals = _B32_INV[grid].astype(np.int64)
    if (vals[np.arange(maxlen) < lens[:, None]] < 0).any():
        raise ValueError("invalid geohash character")
    for k in range(maxlen):
        active = k < lens
        v = vals[:, k]
        for j in range(5):
            b = k * 5 + j
            bit = ((v >> (4 - j)) & 1).astype(bool) & active
            keep = active
            if b % 2 == 0:
                mid = (lon0 + lon1) / 2.0
                lon0 = np.where(keep & bit, mid, lon0)
                lon1 = np.where(keep & ~bit, mid, lon1)
            else:
                mid = (lat0 + lat1) / 2.0
                lat0 = np.where(keep & bit, mid, lat0)
                lat1 = np.where(keep & ~bit, mid, lat1)
    return lat0, lat1, lon0, lon1


def decode(geohashes) -> tuple[np.ndarray, np.ndarray]:
    """geohash strings → (lat, lon) cell centers."""
    la0, la1, lo0, lo1 = decode_bounds(geohashes)
    return (la0 + la1) / 2.0, (lo0 + lo1) / 2.0
