"""Property-based kernel tests (SURVEY.md §5.2 item 3) — hypothesis drives
the cell-hierarchy laws, PIP ray/winding agreement, geodesy symmetry, and
codec roundtrips over adversarial inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geopy_spark.kernels import cells as K
from geopy_spark.kernels import codecs as C
from geopy_spark.kernels import geodesy as G
from geopy_spark.kernels import pip as P

lat_s = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lon_s = st.floats(min_value=-180.0, max_value=179.999999, allow_nan=False)
lvl_s = st.integers(min_value=1, max_value=28)


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s, lvl=lvl_s)
def test_cell_parent_commutes_with_encode(lat, lon, lvl):
    c = K.cell_encode(np.array([lat]), np.array([lon]), lvl)
    for pl in {0, lvl // 2, lvl - 1}:
        assert K.cell_parent(c, pl)[0] == K.cell_encode(
            np.array([lat]), np.array([lon]), pl)[0]


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s, lvl=lvl_s)
def test_cell_center_reencodes_to_same_cell(lat, lon, lvl):
    c = K.cell_encode(np.array([lat]), np.array([lon]), lvl)
    clat, clon = K.cell_center(c)
    assert K.cell_encode(clat, clon, lvl)[0] == c[0]


@settings(max_examples=100, deadline=None)
@given(lat1=lat_s, lon1=lon_s, lat2=lat_s, lon2=lon_s)
def test_haversine_metric_properties(lat1, lon1, lat2, lon2):
    d_ab = G.haversine_m(lat1, lon1, lat2, lon2)
    d_ba = G.haversine_m(lat2, lon2, lat1, lon1)
    assert abs(d_ab - d_ba) < 1e-6                       # symmetry
    assert 0.0 <= d_ab <= np.pi * G.EARTH_RADIUS_M + 1   # bounded by half-circumference
    assert G.haversine_m(lat1, lon1, lat1, lon1) < 1e-6  # identity


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_pip_parity_equals_winding_for_simple_polygons(data):
    rng_seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(rng_seed)
    nv = int(rng.integers(3, 16))
    th = np.sort(rng.uniform(0, 2 * np.pi, nv))
    rr = rng.uniform(1.0, 8.0, nv)
    clat, clon = rng.uniform(-50, 50), rng.uniform(-120, 120)
    ring = np.stack([clat + rr * np.sin(th), clon + rr * np.cos(th)], axis=1)
    lat = rng.uniform(clat - 10, clat + 10, 200)
    lon = rng.uniform(clon - 10, clon + 10, 200)
    res = P.points_in_ring(lat, lon, ring)
    y1, x1, y2, x2 = P._as_edges(ring)
    wn = P._winding_number(lat, lon, y1, x1, y2, x2) != 0
    # star-shaped-by-construction rings are simple → parity == winding,
    # except within EPS of the boundary (boundary-inclusive convention)
    d = _edge_dist(lat, lon, ring)
    far = d > 1e-7
    assert np.array_equal(res[far], wn[far])


def _edge_dist(plat, plon, ring):
    y1, x1, y2, x2 = P._as_edges(ring)
    py, px = plat[:, None], plon[:, None]
    dy, dx = y2 - y1, x2 - x1
    t = np.clip(((py - y1) * dy + (px - x1) * dx) / (dy * dy + dx * dx), 0, 1)
    return np.sqrt((py - (y1 + t * dy)) ** 2 + (px - (x1 + t * dx)) ** 2).min(axis=1)


@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 80), h=st.integers(1, 80), seed=st.integers(0, 2**31 - 1),
       fmt=st.sampled_from(C.FORMATS))
def test_codec_roundtrip_property(w, h, seed, fmt):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = C.decode(C.encode(img, fmt), fmt, w, h)
    if C.is_lossless(fmt):
        assert np.array_equal(img, out)
    else:
        assert C.psnr(img, out) >= 40.0


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=30000))
def test_tiff_lzw_roundtrip_property(data):
    """TIFF-LZW (kernels/tiff) must invert on ARBITRARY byte strings —
    hypothesis drives repetitive runs, random noise, and the empty
    string through the early-change width boundaries."""
    from geopy_spark.kernels import tiff as Tf
    assert Tf.lzw_decode(Tf.lzw_encode(data)) == data


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 60), h=st.integers(1, 60),
       seed=st.integers(0, 2**31 - 1), rps=st.integers(1, 64))
def test_tiff_container_roundtrip_property(w, h, seed, rps):
    from geopy_spark.kernels import tiff as Tf
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = Tf.encode_tiff(img, compression="lzw", rows_per_strip=rps)
    assert np.array_equal(Tf.decode_tiff(buf), img)
