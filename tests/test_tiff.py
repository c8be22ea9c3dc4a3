"""From-scratch baseline TIFF + TIFF-LZW codec (kernels/tiff — TIFF 6.0
spec): exact roundtrips across shapes/strip layouts, LZW stream
properties (early-change widths, table reset), and codec registration."""

import numpy as np
import pytest

from geopy_spark.kernels import codecs as C
from geopy_spark.kernels import tiff as Tf


def _img(h, w, seed=3):
    rng = np.random.default_rng(seed)
    base = (np.linspace(0, 255, w)[None, :, None] * np.ones((h, 1, 3)))
    return np.clip(base + rng.integers(-20, 20, (h, w, 3)), 0,
                   255).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (37, 41), (100, 30)])
@pytest.mark.parametrize("comp", ["none", "lzw"])
@pytest.mark.parametrize("rps", [None, 7])
def test_tiff_roundtrip_exact(h, w, comp, rps):
    img = _img(h, w)
    buf = Tf.encode_tiff(img, compression=comp, rows_per_strip=rps)
    assert buf[:4] == b"II*\x00"
    assert np.array_equal(Tf.decode_tiff(buf), img)


def test_lzw_stream_roundtrip_with_table_resets():
    rng = np.random.default_rng(9)
    incompressible = bytes(rng.integers(0, 256, 200000, dtype=np.uint8))
    assert Tf.lzw_decode(Tf.lzw_encode(incompressible)) == incompressible
    repetitive = b"abcabcabc" * 30000
    enc = Tf.lzw_encode(repetitive)
    assert Tf.lzw_decode(enc) == repetitive
    assert len(enc) < len(repetitive) // 50  # LZW actually compresses


def test_lzw_early_change_boundary():
    """Data sized to cross the 9->10 bit early-change boundary exactly:
    255 distinct pairs force ~255 new codes past the 258 base."""
    data = bytes(range(256)) * 40
    assert Tf.lzw_decode(Tf.lzw_encode(data)) == data


def test_codec_registry_tiff_lossless():
    img = _img(24, 31)
    buf = C.encode(img, "tiff")
    assert np.array_equal(C.decode(buf, "tiff", 31, 24), img)
    assert C.is_lossless("tiff")


def test_tiff_rejects_garbage():
    with pytest.raises(ValueError):
        Tf.decode_tiff(b"MM\x00*garbagegarbage")


# ------------------------------------------------ round 5: GeoTIFF 1.1

def test_georef_roundtrip_and_variants():
    """encode_tiff(georef=...) emits ModelTiepoint/PixelScale + GeoKeys
    that parse_georef recovers exactly; plain TIFFs return None;
    PixelIsPoint is surfaced; pixel_latlon maps the grid per spec."""
    img = _img(16, 20)
    g = {"lat_max": 52.0, "lon_min": 10.0, "scale_x": 0.01, "scale_y": 0.02}
    for comp in ("none", "lzw"):
        buf = Tf.encode_tiff(img, compression=comp, georef=g)
        assert np.array_equal(Tf.decode_tiff(buf), img)  # pixels untouched
        gr = Tf.parse_georef(buf)
        assert (gr["lon_min"], gr["lat_max"]) == (10.0, 52.0)
        assert (gr["scale_x"], gr["scale_y"]) == (0.01, 0.02)
        assert gr["lon_max"] == 10.0 + 20 * 0.01
        assert gr["lat_min"] == 52.0 - 16 * 0.02
        assert (gr["model_type"], gr["raster_type"], gr["epsg"]) == (2, 1, 4326)
    assert Tf.parse_georef(Tf.encode_tiff(img)) is None
    gp = Tf.parse_georef(Tf.encode_tiff(img, georef={**g, "raster_type": 2}))
    assert gp["raster_type"] == 2
    # pixel centers: top-left pixel center is half a pixel in from the edge
    lat, lon = Tf.pixel_latlon(Tf.parse_georef(Tf.encode_tiff(img, georef=g)),
                               np.array([0]), np.array([0]))
    assert lat[0] == 52.0 - 0.01 and lon[0] == 10.0 + 0.005
    # PixelIsPoint: the (0,0) sample IS the tiepoint coordinate
    lat, lon = Tf.pixel_latlon(gp, np.array([0]), np.array([0]))
    assert lat[0] == 52.0 and lon[0] == 10.0


def test_georef_udf_header_only(spark):
    """geotiff_georef_udf extracts centers/bounds without decoding strips;
    non-geo payloads and non-TIFF bytes yield nulls."""
    from pyspark.sql import functions as F
    from geopy_spark.operators.images import geotiff_georef_udf

    img = _img(8, 8)
    rows = []
    for k, (lat_c, lon_c) in enumerate([(40.0, -100.0), (-33.5, 151.25)]):
        g = {"lat_max": lat_c + 0.4, "lon_min": lon_c - 0.4,
             "scale_x": 0.1, "scale_y": 0.1}
        rows.append((k, bytearray(Tf.encode_tiff(img, georef=g))))
    rows.append((90, bytearray(Tf.encode_tiff(img))))   # TIFF, no geo tags
    rows.append((91, bytearray(b"not a tiff at all")))  # garbage
    df = spark.createDataFrame(rows, "id long, bytes binary")
    out = {r.id: r for r in df.select(
        "id", geotiff_georef_udf(F.col("bytes")).alias("g")).collect()}
    assert abs(out[0].g.lat - 40.0) < 1e-9 and abs(out[0].g.lon + 100.0) < 1e-9
    assert abs(out[1].g.lat + 33.5) < 1e-9 and abs(out[1].g.lon - 151.25) < 1e-9
    assert out[90].g.lat is None and out[91].g.lat is None


def _merc_tile(lat, lon, z):
    """Independent web-mercator reference (public slippy-map formula)."""
    import math
    n = 2 ** z
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    la = math.radians(min(max(lat, -85.05112878), 85.05112878))
    y = int(math.floor((1.0 - math.log(math.tan(la) + 1.0 / math.cos(la))
                        / math.pi) / 2.0 * n))
    return (z, x, min(max(y, 0), n - 1))


def test_geotiff_pipeline_tile_assignment(spark, tmp_path):
    """VERDICT r4 #4 'done' gate: synthetic GeoTIFFs with known tiepoints
    land in exactly the expected (z,x,y) tiles through the STANDARD G8
    path (--georef tiff on the EP-3 pipeline). The parquet's own lat/lon
    columns are deliberately garbage (0,0) — only the embedded GeoTIFF
    tags can produce the right tiles — and one payload without geo tags
    must be dropped, not misplaced."""
    import os
    import subprocess
    import sys

    import pandas as pd
    from geopy_spark.sources.icetab import IceTable

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zmax = 5
    centers = [(40.05, -100.05), (51.45, 0.15), (-33.85, 151.25),
               (10.05, 10.05), (-60.25, -60.75), (69.95, 18.95)]
    img = _img(8, 8)
    recs = []
    for k, (lat_c, lon_c) in enumerate(centers):
        g = {"lat_max": lat_c + 0.04, "lon_min": lon_c - 0.04,
             "scale_x": 0.01, "scale_y": 0.01}
        recs.append((f"img{k:08d}", Tf.encode_tiff(img, georef=g),
                     8, 8, "tiff", f"cap {k}", 0, 0.0, 0.0))
    recs.append(("img_nogeo", Tf.encode_tiff(img), 8, 8, "tiff",
                 "cap x", 0, 0.0, 0.0))
    pdf = pd.DataFrame(recs, columns=["image_id", "bytes", "w", "h", "fmt",
                                      "caption", "phash", "lat", "lon"])
    src = str(tmp_path / "images.parquet")
    pdf.to_parquet(src)

    out_dir = str(tmp_path / "table")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "tile_pipeline.py"),
         "--input", src, "--output", out_dir, "--zmax", str(zmax),
         "--level", "6", "--cores", "4", "--georef", "tiff"],
        capture_output=True, text=True, cwd=repo, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "1/7 payloads lack geographic GeoTIFF tags" in r.stdout

    leaf = IceTable(out_dir).read_partition(spark, f"z={zmax}").collect()
    got = {(row.z, row.x, row.y): row.cnt for row in leaf}
    want = {}
    for lat_c, lon_c in centers:
        t = _merc_tile(lat_c, lon_c, zmax)
        want[t] = want.get(t, 0) + 1
    assert got == want


def test_grayscale_band_roundtrip_8_and_16_bit():
    """Single-band decode (round 5): raw DEM-style values survive the
    roundtrip exactly at 8 and 16 bits, both compressions; MinIsWhite
    inverts; RGB payloads refuse the band path."""
    rng = np.random.default_rng(11)
    for dtype, lim in ((np.uint8, 256), (np.uint16, 65536)):
        band = rng.integers(0, lim, (13, 17)).astype(dtype)
        for comp in ("none", "lzw"):
            buf = Tf.encode_tiff_band(band, compression=comp)
            got = Tf.decode_tiff_band(buf)
            assert got.dtype == np.float64
            assert np.array_equal(got, band.astype(np.float64)), (dtype, comp)
    with pytest.raises(ValueError):
        Tf.decode_tiff_band(Tf.encode_tiff(_img(4, 4)))  # RGB refuses


def test_grayscale_band_georef():
    band = (np.arange(64, dtype=np.uint16) * 100).reshape(8, 8)
    g = {"lat_max": 10.0, "lon_min": 20.0, "scale_x": 0.1, "scale_y": 0.1}
    buf = Tf.encode_tiff_band(band, georef=g)
    gr = Tf.parse_georef(buf)
    assert gr["lat_max"] == 10.0 and gr["lon_min"] == 20.0
    assert np.array_equal(Tf.decode_tiff_band(buf),
                          band.astype(np.float64))
