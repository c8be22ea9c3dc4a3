"""True raster zonal statistics (G20, round 5): decoded GeoTIFF pixels
aggregated per polygon zone, checked tuple-for-tuple against a brute
force built from the same codec but an INDEPENDENT planar containment
test (axis-aligned rect / hole arithmetic — no PIP kernel)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geopy_spark.entry_queries import _REGIONS_SCHEMA
from geopy_spark.kernels import tiff as T
from geopy_spark.operators.raster_zonal import raster_zonal_stats, zone_totals

SCALE = 0.01  # deg per pixel


def _geotiff(lat_max, lon_min, h=16, w=16, seed=3):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = T.encode_tiff(img, georef={"lat_max": lat_max, "lon_min": lon_min,
                                     "scale_x": SCALE, "scale_y": SCALE})
    return img, buf


def _rect(pid, la0, la1, lo0, lo1, holes=()):
    ring = [[la0, lo0], [la0, lo1], [la1, lo1], [la1, lo0]]
    hv = [[[float(a), float(b)] for a, b in h] for h in holes]
    return (pid, f"z{pid}", ring, hv, la0, la1, lo0, lo1)


def _brute(img, lat_max, lon_min, zones):
    """Expected (poly_id → stats) via planar rect/hole arithmetic over
    pixel CENTERS — no engine geometry code."""
    h, w = img.shape[:2]
    vals = img.astype(np.float64).mean(axis=2)
    out = {}
    for pid, la0, la1, lo0, lo1, holes in zones:
        acc = []
        for j in range(h):
            for i in range(w):
                lat = lat_max - (j + 0.5) * SCALE
                lon = lon_min + (i + 0.5) * SCALE
                if not (la0 <= lat <= la1 and lo0 <= lon <= lo1):
                    continue
                in_hole = any(hla0 < lat < hla1 and hlo0 < lon < hlo1
                              for hla0, hla1, hlo0, hlo1 in holes)
                if not in_hole:
                    acc.append(vals[j, i])
        if acc:
            a = np.asarray(acc)
            out[pid] = (a.size, a.sum(), a.mean(), a.min(), a.max())
    return out


def test_raster_zonal_matches_planar_brute_force(spark):
    img_a, buf_a = _geotiff(52.0, 10.0, seed=3)   # covers 51.84..52 x 10..10.16
    img_b, buf_b = _geotiff(52.0, 30.0, seed=4)   # far east — zone 3 only
    _, buf_far = _geotiff(-40.0, -40.0, seed=5)   # overlaps nothing
    plain = T.encode_tiff(np.zeros((4, 4, 3), np.uint8))  # no geo tags

    images = spark.createDataFrame(
        [("imgA", bytearray(buf_a)), ("imgB", bytearray(buf_b)),
         ("imgFar", bytearray(buf_far)), ("imgPlain", bytearray(plain))],
        "image_id string, bytes binary")

    hole = (51.90, 51.95, 10.02, 10.07)
    zones = [
        # zone 1: inner window of image A, with a hole
        (1, 51.87, 51.98, 10.01, 10.12, [hole]),
        # zone 2: hangs off image A's west edge (partial overlap)
        (2, 51.90, 51.99, 9.95, 10.05, []),
        # zone 3: covers image B entirely
        (3, 51.5, 52.5, 29.5, 30.5, []),
        # zone 4: overlaps no image
        (4, 0.0, 1.0, 0.0, 1.0, []),
    ]
    regions = spark.createDataFrame(
        [_rect(pid, la0, la1, lo0, lo1,
               holes=[[[h[0], h[2]], [h[0], h[3]], [h[1], h[3]],
                       [h[1], h[2]]] for h in holes])
         for pid, la0, la1, lo0, lo1, holes in zones],
        schema=_REGIONS_SCHEMA)

    got = {(r.image_id, r.poly_id):
           (r.n_px, r.sum_val, r.mean_val, r.min_val, r.max_val)
           for r in raster_zonal_stats(images, regions, level=8).collect()}

    want = {}
    for image_id, img, lat_max, lon_min in (("imgA", img_a, 52.0, 10.0),
                                            ("imgB", img_b, 52.0, 30.0)):
        zz = [(pid, la0, la1, lo0, lo1, holes)
              for pid, la0, la1, lo0, lo1, holes in zones]
        for pid, stats in _brute(img, lat_max, lon_min, zz).items():
            want[(image_id, pid)] = stats

    assert set(got) == set(want)
    assert ("imgFar", 4) not in got and ("imgPlain", 1) not in got
    for k, (n, s, m, lo, hi) in want.items():
        gn, gs, gm, glo, ghi = got[k]
        assert gn == n, k
        assert gs == pytest.approx(s, rel=1e-12)
        assert gm == pytest.approx(m, rel=1e-12)
        assert (glo, ghi) == (lo, hi)

    # cross-raster rollup conserves counts and sums
    tot = {r.poly_id: (r.n_px, r.sum_val)
           for r in zone_totals(
               raster_zonal_stats(images, regions, level=8)).collect()}
    for pid in {k[1] for k in want}:
        n = sum(v[0] for k, v in want.items() if k[1] == pid)
        s = sum(v[1] for k, v in want.items() if k[1] == pid)
        assert tot[pid][0] == n and tot[pid][1] == pytest.approx(s)


def test_single_band_raster_aggregates_raw_values(spark):
    """A 16-bit DEM-style single-band GeoTIFF must aggregate RAW band
    values (not an RGB reduce): a zone covering the whole raster gets
    exactly the band's sum/mean/min/max."""
    band = (np.arange(256, dtype=np.uint16) * 257).reshape(16, 16)
    g = {"lat_max": 52.0, "lon_min": 10.0, "scale_x": SCALE,
         "scale_y": SCALE}
    buf = T.encode_tiff_band(band, georef=g)
    images = spark.createDataFrame([("dem", bytearray(buf))],
                                   "image_id string, bytes binary")
    regions = spark.createDataFrame(
        [_rect(7, 51.0, 53.0, 9.0, 11.0)], schema=_REGIONS_SCHEMA)
    rows = raster_zonal_stats(images, regions, level=8).collect()
    assert len(rows) == 1
    r = rows[0]
    v = band.astype(np.float64)
    assert (r.n_px, r.sum_val, r.min_val, r.max_val) == \
        (256, v.sum(), v.min(), v.max())
    assert r.mean_val == pytest.approx(v.mean())
