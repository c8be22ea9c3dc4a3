"""Geodesy kernels — vectorized numpy (SURVEY.md §2.2 G12-G14).

Capabilities of the reference's Distance/great_circle/geodesic surface
(reconstructed [gp:geopy/distance.py] — see SURVEY.md §0 citation policy),
re-expressed as batch numpy. The Spark Column-algebra twins (used in the
JVM-side hot path so kNN ordering never leaves whole-stage codegen) live in
functions/geo.py and MUST use the same formula + constants so orderings
agree bit-for-bit in spirit (same math, double precision).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371008.8  # IUGG mean earth radius (public constant)

# Unit conversions (reference exposes km/mi/nm/ft — [gp:geopy/units.py])
M_PER_KM = 1000.0
M_PER_MI = 1609.344
M_PER_NM = 1852.0
M_PER_FT = 0.3048


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters, broadcasting numpy arrays."""
    la1, lo1, la2, lo2 = (np.radians(np.asarray(a, dtype=np.float64))
                          for a in (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlon / 2.0) ** 2
    a = np.clip(a, 0.0, 1.0)
    return 2.0 * EARTH_RADIUS_M * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))


def destination_point(lat, lon, bearing_deg, dist_m):
    """Spherical forward problem: start + bearing + distance → end point."""
    la1 = np.radians(np.asarray(lat, dtype=np.float64))
    lo1 = np.radians(np.asarray(lon, dtype=np.float64))
    br = np.radians(np.asarray(bearing_deg, dtype=np.float64))
    d = np.asarray(dist_m, dtype=np.float64) / EARTH_RADIUS_M
    la2 = np.arcsin(np.sin(la1) * np.cos(d) + np.cos(la1) * np.sin(d) * np.cos(br))
    lo2 = lo1 + np.arctan2(np.sin(br) * np.sin(d) * np.cos(la1),
                           np.cos(d) - np.sin(la1) * np.sin(la2))
    lat2 = np.degrees(la2)
    lon2 = np.mod(np.degrees(lo2) + 180.0, 360.0) - 180.0
    return lat2, lon2


def meters_per_deg_lat() -> float:
    return EARTH_RADIUS_M * np.pi / 180.0


def meters_per_deg_lon(lat_deg: float) -> float:
    return EARTH_RADIUS_M * np.pi / 180.0 * float(np.cos(np.radians(lat_deg)))
