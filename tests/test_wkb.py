"""WKB interchange (G15 binary leg, round 5): golden bytes built with an
INDEPENDENT struct-pack writer in the test, both byte orders, holes,
MultiPolygon part explosion, roundtrips, loud failure on EWKB/Z flags,
and spatial-join row-set invariance through a WKB trip."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from geopy_spark import synth
from geopy_spark.entry_queries import _REGIONS_SCHEMA
from geopy_spark.operators.spatial_join import spatial_join
from geopy_spark.sources import wkb as W


def _pk_ring(pts, bo="<"):
    closed = pts + pts[:1]
    out = [struct.pack(bo + "I", len(closed))]
    for lon, lat in closed:                       # wire order x=lon
        out.append(struct.pack(bo + "dd", lon, lat))
    return b"".join(out)


def _pk_polygon(outer, holes=(), bo="<"):
    b = (b"\x01" if bo == "<" else b"\x00") + struct.pack(bo + "I", 3)
    b += struct.pack(bo + "I", 1 + len(holes))
    b += _pk_ring(outer, bo)
    for h in holes:
        b += _pk_ring(h, bo)
    return b


def _pk_multipolygon(polys, bo="<"):
    b = (b"\x01" if bo == "<" else b"\x00") + struct.pack(bo + "I", 6)
    b += struct.pack(bo + "I", len(polys))
    for outer, holes in polys:
        b += _pk_polygon(outer, holes, bo)
    return b


SQUARE = [(10.0, 50.0), (12.0, 50.0), (12.0, 52.0), (10.0, 52.0)]
HOLE = [(10.5, 50.5), (11.5, 50.5), (11.5, 51.5), (10.5, 51.5)]


@pytest.mark.parametrize("bo", ["<", ">"])
def test_parse_golden_polygon_both_orders(bo):
    name, parts = W.parse_wkb(_pk_polygon(SQUARE, [HOLE], bo))
    assert name == "POLYGON" and len(parts) == 1
    ring, holes = parts[0]
    assert ring == [[50.0, 10.0], [50.0, 12.0], [52.0, 12.0], [52.0, 10.0]]
    assert len(holes) == 1 and holes[0][0] == [50.5, 10.5]


def test_parse_multipolygon_and_flags():
    far = [(30.0, 50.0), (32.0, 50.0), (32.0, 52.0), (30.0, 52.0)]
    name, parts = W.parse_wkb(_pk_multipolygon([(SQUARE, []), (far, [])]))
    assert name == "MULTIPOLYGON" and len(parts) == 2
    # EWKB / ISO Z flags must raise, not mis-read doubles
    z = b"\x01" + struct.pack("<I", 3 | 0x80000000)
    with pytest.raises(ValueError):
        W.parse_wkb(z)
    with pytest.raises(ValueError):
        W.parse_wkb(b"\x07" + struct.pack("<I", 3))  # bad order marker


def test_read_wkb_explodes_parts_and_surfaces_foreign_types(spark):
    far = [(30.0, 50.0), (32.0, 50.0), (32.0, 52.0), (30.0, 52.0)]
    point = b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", 1.0, 2.0)
    df = spark.createDataFrame(
        [(1, bytearray(_pk_multipolygon([(SQUARE, [HOLE]), (far, [])]))),
         (2, bytearray(_pk_polygon(SQUARE, bo=">"))),
         (3, bytearray(point))],
        "gid long, wkb binary")
    rows = W.read_wkb(df, id_col="gid").collect()
    by = {}
    for r in rows:
        by.setdefault(r.poly_id, []).append(r)
    assert [r.part for r in sorted(by[1], key=lambda r: r.part)] == [0, 1]
    assert len(by[1][0].holes) == 1 and by[1][1].holes == []
    assert by[2][0].lat_min == 50.0 and by[2][0].lon_max == 12.0
    assert by[3][0].geom_type == "POINT" and by[3][0].ring is None


def test_roundtrip_and_join_invariance(spark):
    """read_wkb ∘ to_wkb is the identity on rings/holes, and a WKB trip
    leaves the G6 spatial-join row set unchanged (the same invariance
    the GeoJSON/WKT legs pin)."""
    pdf = synth.polygons_pdf(synth.oracle_polygons_holed(10, seed=7))
    regions = spark.createDataFrame(pdf, schema=_REGIONS_SCHEMA)
    trip = W.read_wkb(W.to_wkb(regions), id_col="poly_id")
    a = {r.poly_id: ([list(v) for v in r.ring],
                     [[list(v) for v in h] for h in r.holes])
         for r in regions.collect()}
    b = {r.poly_id: ([list(v) for v in r.ring],
                     [[list(v) for v in h] for h in r.holes])
         for r in trip.collect()}
    assert a == b

    pts = spark.createDataFrame(
        [(i, float(la), float(lo)) for i, (la, lo) in enumerate(
            (r.lat_min + 0.3 * (r.lat_max - r.lat_min),
             r.lon_min + 0.4 * (r.lon_max - r.lon_min))
            for r in pdf.itertuples(index=False))],
        "point_id long, lat double, lon double")
    orig = {(r.point_id, r.poly_id)
            for r in spatial_join(pts, regions, point_id="point_id",
                                  level=6).collect()}
    via = {(r.point_id, r.poly_id)
           for r in spatial_join(
               pts, trip.drop("part", "geom_type"),
               point_id="point_id", level=6).collect()}
    assert via == orig and len(orig) > 0

    # multi emit: one row per poly_id, parses back part-for-part
    multi = W.to_wkb_multi(W.read_wkb(W.to_wkb(regions), id_col="poly_id"))
    back = W.read_wkb(multi, id_col="poly_id")
    assert back.count() == regions.count()
    b2 = {r.poly_id: [list(v) for v in r.ring] for r in back.collect()}
    assert {k: v[0] for k, v in a.items()} == b2


def test_truncated_and_empty_buffers_surface_as_invalid(spark):
    """Review r5: truncated WKB raises struct.error and empty bytes
    raise IndexError — both must become INVALID rows, not task
    failures."""
    df = spark.createDataFrame(
        [(1, bytearray(b"\x01\x03\x00")),      # truncated header
         (2, bytearray(b"")),                   # empty
         (3, bytearray(_pk_polygon(SQUARE)))],  # valid control
        "gid long, wkb binary")
    rows = {r.poly_id: r for r in W.read_wkb(df, id_col="gid").collect()}
    assert rows[1].geom_type == "INVALID" and rows[1].ring is None
    assert rows[2].geom_type == "INVALID"
    assert rows[3].geom_type == "POLYGON" and rows[3].ring is not None
