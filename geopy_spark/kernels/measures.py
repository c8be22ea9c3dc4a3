"""Polygon measures — spherical area, boundary length, centroid (round 5,
G19). Vectorized numpy over the engine's ring convention ([ [lat, lon],
... ], open, degrees); holes subtract area and add boundary length.

Area uses the public spherical-excess line integral (Chamberlain &
Duquette 2007, "Some algorithms for polygons on a sphere" — the formula
behind turf.js/geojson-area and PostGIS's spherical path):

    A = |R²/2 · Σ_i (λ_{i+1} − λ_i)(2 + sin φ_i + sin φ_{i+1})|

exact for polygons whose edges follow the loxodromic small steps the
formula integrates; for the vertex densities real vector data carries
(edges ≪ 1°) it agrees with the geodesic area to ~1e-6 relative. Input
rings must be antimeridian-normalized (|Δλ| < 180 per edge) — exactly
what sources/geojson.split_antimeridian guarantees upstream.

SIMPLE rings only (the engine's stated ring convention, kernels/pip):
on a self-intersecting ring the line integral yields the winding-SIGNED
area (lobes cancel), while the PIP/join operators evaluate even-odd
parity — the two interpretations legitimately differ there, so measures
of non-simple input are undefined rather than wrong. `ring_is_simple`
detects the case for callers that want to validate.

Length is the haversine sum over closing edges (great-circle edges, same
kernel the distance operators use). Centroid is the planar shoelace
centroid in degree space (PostGIS ST_Centroid semantics for geometry),
with holes subtracted by signed-area weighting; degenerate (zero-area)
rings fall back to the vertex mean.
"""

from __future__ import annotations

import numpy as np

from .geodesy import EARTH_RADIUS_M, haversine_m


def ring_is_simple(ring: np.ndarray) -> bool:
    """True when no two non-adjacent edges properly cross — the
    precondition for the area/centroid semantics above. O(E²) via the
    edge-blocked crossing kernel; run it on the (small) vector side when
    validating foreign data, not per point."""
    from .pip import _as_edges, _segments_cross_detail
    ring = np.asarray(ring, dtype=np.float64)
    n = len(ring)
    if n < 4:
        return True
    y1, x1, y2, x2 = _as_edges(ring)
    for i in range(n):
        # skip the two adjacent edges (shared endpoints always "touch")
        js = [j for j in range(i + 2, n) if not (i == 0 and j == n - 1)]
        if not js:
            continue
        j0, j1 = js[0], js[-1] + 1
        proper, _ = _segments_cross_detail(
            y1[i:i + 1], x1[i:i + 1], y2[i:i + 1], x2[i:i + 1],
            y1[j0:j1], x1[j0:j1], y2[j0:j1], x2[j0:j1])
        if proper:
            return False
    return True


def ring_area_m2(ring: np.ndarray) -> float:
    """Unsigned spherical area of one ring (m²)."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) < 3:
        return 0.0
    phi = np.radians(ring[:, 0])
    lam = np.radians(ring[:, 1])
    phi2 = np.roll(phi, -1)
    lam2 = np.roll(lam, -1)
    s = np.sum((lam2 - lam) * (2.0 + np.sin(phi) + np.sin(phi2)))
    return float(abs(s) * EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)


def ring_length_m(ring: np.ndarray) -> float:
    """Great-circle perimeter of one closed ring (m)."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) < 2:
        return 0.0
    nxt = np.roll(ring, -1, axis=0)
    return float(np.sum(haversine_m(ring[:, 0], ring[:, 1],
                                    nxt[:, 0], nxt[:, 1])))


def polygon_area_m2(ring: np.ndarray, holes=None) -> float:
    """Area of (outer minus holes), m² — holes subtract."""
    a = ring_area_m2(ring)
    for h in holes if holes is not None else ():
        a -= ring_area_m2(np.asarray(h, dtype=np.float64))
    return max(a, 0.0)


def polygon_perimeter_m(ring: np.ndarray, holes=None,
                        include_holes: bool = True) -> float:
    """Total boundary length, m. Hole rims are part of the boundary
    (include_holes=False gives the outer ring alone)."""
    p = ring_length_m(ring)
    if include_holes:
        for h in holes if holes is not None else ():
            p += ring_length_m(np.asarray(h, dtype=np.float64))
    return p


def _ring_signed_centroid(ring: np.ndarray) -> tuple[float, float, float]:
    """(signed shoelace area in deg², area-weighted clat, clon) of one
    ring in degree space."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) < 3:
        return 0.0, 0.0, 0.0
    y, x = ring[:, 0], ring[:, 1]
    y2, x2 = np.roll(y, -1), np.roll(x, -1)
    cross = x * y2 - x2 * y
    a = float(np.sum(cross)) / 2.0
    if a == 0.0:
        return 0.0, 0.0, 0.0
    cy = float(np.sum((y + y2) * cross)) / (6.0 * a)
    cx = float(np.sum((x + x2) * cross)) / (6.0 * a)
    return a, cy * a, cx * a


def polygon_centroid(ring: np.ndarray, holes=None) -> tuple[float, float]:
    """(lat, lon) planar centroid of (outer minus holes); degenerate
    geometry falls back to the outer ring's vertex mean."""
    a0, wy, wx = _ring_signed_centroid(ring)
    asum, wys, wxs = abs(a0), wy * np.sign(a0), wx * np.sign(a0)
    for h in holes if holes is not None else ():
        ah, wyh, wxh = _ring_signed_centroid(np.asarray(h, dtype=np.float64))
        asum -= abs(ah)
        wys -= wyh * np.sign(ah)
        wxs -= wxh * np.sign(ah)
    if asum <= 0.0:
        ring = np.asarray(ring, dtype=np.float64)
        return float(ring[:, 0].mean()), float(ring[:, 1].mean())
    return wys / asum, wxs / asum
