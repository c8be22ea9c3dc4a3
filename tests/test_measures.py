"""Polygon measures (G19, round 5): analytic oracles for the spherical
area/length kernels (planar limit, spherical cap, scaling laws), an
INDEPENDENT grid-sample area estimate through the PIP kernel, and a
DuckDB haversine twin for the operator's perimeter over the holed
fixture."""

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from geopy_spark import synth
from geopy_spark.entry_queries import _REGIONS_SCHEMA
from geopy_spark.kernels import measures as M
from geopy_spark.kernels import pip as P
from geopy_spark.kernels.geodesy import EARTH_RADIUS_M, destination_point
from geopy_spark.operators.measures import region_measures

SQ = np.array([[0.0, 0.0], [0.0, 0.1], [0.1, 0.1], [0.1, 0.0]])
HOLE = np.array([[0.02, 0.02], [0.02, 0.04], [0.04, 0.04], [0.04, 0.02]])


def test_area_planar_limit_and_scaling():
    a = M.polygon_area_m2(SQ)
    m_lat = math.pi * EARTH_RADIUS_M / 180.0
    planar = (0.1 * m_lat) * (0.1 * m_lat * math.cos(math.radians(0.05)))
    assert abs(a - planar) / planar < 1e-5
    big = SQ * 2.0
    assert abs(M.polygon_area_m2(big) / a - 4.0) < 1e-3


def test_holes_subtract_exactly_and_clamp():
    a = M.polygon_area_m2(SQ)
    ah = M.polygon_area_m2(HOLE)
    assert abs(M.polygon_area_m2(SQ, [HOLE]) - (a - ah)) < 1e-6
    # hole bigger than outer clamps at 0 (invalid geometry, sane output)
    assert M.polygon_area_m2(HOLE, [SQ]) == 0.0


def test_geodesic_circle_against_spherical_cap():
    """360-vertex geodesic circle: perimeter vs 2πR·sin(r/R), area vs the
    spherical cap 2πR²(1−cos(r/R)) — closed-form oracles independent of
    the line-integral formula."""
    r = 100_000.0
    bear = np.arange(0.0, 360.0, 1.0)
    lat, lon = destination_point(np.full(360, 30.0), np.full(360, 20.0),
                                 bear, np.full(360, r))
    ring = np.column_stack([lat, lon])
    exp_p = 2 * math.pi * EARTH_RADIUS_M * math.sin(r / EARTH_RADIUS_M)
    assert abs(M.polygon_perimeter_m(ring) - exp_p) / exp_p < 1e-4
    cap = 2 * math.pi * EARTH_RADIUS_M ** 2 * (1 - math.cos(r / EARTH_RADIUS_M))
    assert abs(M.polygon_area_m2(ring) - cap) / cap < 1e-4


def test_centroid_symmetry_and_hole_shift():
    assert M.polygon_centroid(SQ) == (pytest.approx(0.05), pytest.approx(0.05))
    cy, cx = M.polygon_centroid(SQ, [HOLE])  # hole below-left → shift up-right
    assert cy > 0.05 and cx > 0.05
    # degenerate sliver falls back to the vertex mean
    sliver = np.array([[0.0, 0.0], [0.0, 1.0], [0.0, 2.0]])
    assert M.polygon_centroid(sliver) == (0.0, 1.0)


def _grid_area_estimate(ring, holes, n=400):
    """Independent area estimate: fine lat/lon grid over the bbox, PIP
    hits × cos-weighted cell area — shares NO code path with the
    line-integral formula (PIP kernel + quadrature instead)."""
    la0, la1, lo0, lo1 = P.ring_bbox(ring)
    lats = np.linspace(la0, la1, n + 1)[:-1] + (la1 - la0) / (2 * n)
    lons = np.linspace(lo0, lo1, n + 1)[:-1] + (lo1 - lo0) / (2 * n)
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    inside = P.points_in_polygon(glat.ravel(), glon.ravel(), ring,
                                 holes=holes)
    m_lat = math.pi * EARTH_RADIUS_M / 180.0
    d_lat = (la1 - la0) / n
    d_lon = (lo1 - lo0) / n
    w = (np.cos(np.radians(glat.ravel())) * (d_lat * m_lat)
         * (d_lon * m_lat))
    return float(w[inside].sum())


def test_operator_fixture_area_vs_grid_sample_and_sql_perimeter(spark):
    pdf = synth.polygons_pdf(synth.oracle_polygons_holed(10, seed=7))
    regions = spark.createDataFrame(pdf, schema=_REGIONS_SCHEMA)
    got = {r.poly_id: r for r in region_measures(regions).collect()}
    assert set(got) == set(pdf.poly_id)

    # area: within 1.5% of the independent PIP-quadrature estimate —
    # on SIMPLE rings (the measures contract; this fixture seed happens
    # to contain one bowtie quad, where even-odd parity and the signed
    # line integral legitimately diverge — kernels/measures docstring)
    n_checked = 0
    for row in pdf.itertuples(index=False):
        ring = np.asarray(row.ring, dtype=np.float64)
        if not M.ring_is_simple(ring):
            continue
        holes = [np.asarray(h, dtype=np.float64) for h in row.holes]
        est = _grid_area_estimate(ring, holes)
        assert abs(got[row.poly_id].area_m2 - est) / est < 0.015, row.poly_id
        cy, cx = got[row.poly_id].centroid_lat, got[row.poly_id].centroid_lon
        assert row.lat_min <= cy <= row.lat_max
        assert row.lon_min <= cx <= row.lon_max
        n_checked += 1
    assert n_checked >= 8  # the fixture is overwhelmingly simple rings
    # the bowtie IS detected (the helper works, the skip isn't vacuous)
    simples = [M.ring_is_simple(np.asarray(r.ring, dtype=np.float64))
               for r in pdf.itertuples(index=False)]
    assert simples.count(False) == 1

    # perimeter: DuckDB haversine over the flat edge list (outer + hole
    # rims under one poly_id — exactly the boundary-length convention)
    edges = synth.polygons_edges_sql_values(
        synth.oracle_polygons_holed(10, seed=7))
    con = duckdb.connect()
    want = dict(con.execute(f"""
        SELECT poly_id, sum(2 * {EARTH_RADIUS_M!r} * asin(sqrt(
            sin(radians(y2 - y1) / 2) * sin(radians(y2 - y1) / 2)
            + cos(radians(y1)) * cos(radians(y2))
              * sin(radians(x2 - x1) / 2) * sin(radians(x2 - x1) / 2))))
        FROM (VALUES {edges}) t(poly_id, y1, x1, y2, x2)
        GROUP BY poly_id""").fetchall())
    for pid, p in want.items():
        assert got[pid].perimeter_m == pytest.approx(p, rel=1e-9), pid


def test_cell_rectangles_have_exact_zone_area():
    """The spherical-excess line integral is EXACT on axis-aligned
    rectangles (meridian edges contribute 0; parallel edges telescope to
    R²·Δλ·(sinφ1−sinφ0) — the closed-form spherical zone area). Cells
    are rectangles, so measures ∘ cell-bounds equals the analytic cell
    area to float precision — a cross-kernel identity."""
    from geopy_spark.kernels import cells as K

    lats = np.array([-72.3, -10.0, 0.0, 33.3, 81.0])
    lons = np.array([-170.0, -5.0, 0.1, 44.4, 179.0])
    for level in (2, 5, 9):
        cells = K.cell_encode(lats, lons, level)
        clat, clon = K.cell_center(cells)
        half = K.cell_size_deg(level) / 2.0
        for cy, cx in zip(clat, clon):
            la0, la1 = cy - half, cy + half
            lo0, lo1 = cx - 2 * half, cx + 2 * half
            ring = np.array([[la0, lo0], [la0, lo1], [la1, lo1],
                             [la1, lo0]])
            exact = (EARTH_RADIUS_M ** 2 * math.radians(lo1 - lo0)
                     * (math.sin(math.radians(la1))
                        - math.sin(math.radians(la0))))
            assert M.polygon_area_m2(ring) == pytest.approx(exact,
                                                            rel=1e-12)


def test_buffer_join_sandwiches_within_distance(spark):
    """Cross-operator consistency: buffered-polygon containment (G19
    buffer → G6 join) must sandwich the exact fixed-radius join (G18):
    every buffer pair is within R (inscribed polygon ⊂ circle), and
    every pair within R·cos(π/n) is found by the buffer path."""
    import math as _m

    from geopy_spark.functions import geo
    from geopy_spark.operators.knn import within_distance_join
    from geopy_spark.operators.measures import buffer_points
    from geopy_spark.operators.spatial_join import spatial_join

    R, NV = 300_000.0, 64
    sites = spark.range(0, 12).select(
        F.col("id").alias("point_id"),
        geo.derived_lat(F.col("id") + 77).alias("lat"),
        geo.derived_lon(F.col("id") + 77).alias("lon"))
    pts = spark.range(0, 800).select(
        F.col("id").alias("point_id"),
        geo.derived_lat(F.col("id")).alias("lat"),
        geo.derived_lon(F.col("id")).alias("lon"))

    buf = buffer_points(sites, R, n_vertices=NV)
    via_poly = {(r.point_id, r.poly_id)
                for r in spatial_join(pts, buf, point_id="point_id",
                                      level=6,
                                      broadcast_regions=True).collect()}
    qs = sites.withColumnRenamed("point_id", "query_id")
    exact = {(r.id, r.query_id): r.dist_m
             for r in within_distance_join(
                 qs, pts.withColumnRenamed("point_id", "id"), R,
                 level=4, point_id="id").collect()}

    # buffer pairs ⊆ exact pairs (inscribed polygon is inside the circle)
    assert via_poly <= set(exact)
    # pairs safely inside the inscribed polygon's inradius are all found
    inradius = R * _m.cos(_m.pi / NV)
    must_have = {k for k, d in exact.items() if d <= inradius * 0.999}
    assert must_have <= via_poly
    assert len(via_poly) > 0
