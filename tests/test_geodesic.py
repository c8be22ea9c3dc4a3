"""WGS-84 Vincenty inverse (kernels/geodesy.vincenty_m, G12 ellipsoidal
half): published ground-truth distances, antipodal fallback contract,
sphere-consistency bound, and the Spark UDF surface."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from geopy_spark.functions.geo import geodesic_m_udf, haversine_m
from geopy_spark.kernels.geodesy import haversine_m as hav_np
from geopy_spark.kernels.geodesy import vincenty_m


def test_vincenty_published_values():
    """Public ground truths: WGS-84 equator quarter = a·π/2, meridian
    quarter ≈ 10001965.729 m, and Vincenty's classic Flinders Peak →
    Buninyong line (54972.271 m, Geoscience Australia test data)."""
    d, c = vincenty_m([0.0, 0.0], [0.0, 0.0], [0.0, 90.0], [90.0, 0.0])
    assert c.all()
    assert abs(d[0] - 10018754.1714) < 0.01   # equator quarter
    assert abs(d[1] - 10001965.7293) < 0.01   # meridian quarter
    fl = -(37 + 57 / 60 + 3.72030 / 3600), 144 + 25 / 60 + 29.52440 / 3600
    bu = -(37 + 39 / 60 + 10.15610 / 3600), 143 + 55 / 60 + 35.38390 / 3600
    d, c = vincenty_m(fl[0], fl[1], bu[0], bu[1])
    assert c and abs(d - 54972.271) < 0.001


def test_vincenty_antipodal_fallback_flagged():
    d, c = vincenty_m(0.0, 0.0, 0.5, 179.7)
    assert not c                       # iteration did not converge
    assert d == hav_np(0.0, 0.0, 0.5, 179.7)  # documented spherical fallback
    d0, c0 = vincenty_m(12.5, -33.0, 12.5, -33.0)
    assert c0 and d0 == 0.0            # coincident points


def test_vincenty_sphere_consistency():
    """Ellipsoid vs sphere differ by at most ~0.56% (flattening bound)."""
    rng = np.random.default_rng(3)
    la1, la2 = rng.uniform(-80, 80, 200), rng.uniform(-80, 80, 200)
    lo1, lo2 = rng.uniform(-179, 179, 200), rng.uniform(-179, 179, 200)
    dv, cv = vincenty_m(la1, lo1, la2, lo2)
    dh = hav_np(la1, lo1, la2, lo2)
    rel = np.abs(dv - dh) / np.maximum(dh, 1.0)
    assert rel[cv].max() < 0.006


def test_geodesic_udf_matches_kernel(spark):
    pdf = pd.DataFrame({
        "lat1": [0.0, 48.8566, -33.8688], "lon1": [0.0, 2.3522, 151.2093],
        "lat2": [0.0, 40.7128, 51.5074], "lon2": [90.0, -74.0060, -0.1278]})
    df = spark.createDataFrame(pdf)
    out = (df.withColumn("ell_m", geodesic_m_udf(
               F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")))
           .withColumn("sph_m", haversine_m(
               F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")))
           ).toPandas()
    ref, _ = vincenty_m(pdf.lat1.to_numpy(), pdf.lon1.to_numpy(),
                        pdf.lat2.to_numpy(), pdf.lon2.to_numpy())
    assert np.allclose(out.ell_m.to_numpy(), ref, rtol=0, atol=1e-6)
    rel = np.abs(out.ell_m - out.sph_m) / out.sph_m
    assert (rel < 0.006).all()


def test_bearing_destination_identity_and_interpolation(spark):
    """Round 5 navigation functions: (a) goldens — due north is bearing
    0, due east from the equator is 90; (b) the forward/inverse identity
    destination(a, bearing(a,b), haversine(a,b)) == b on random
    non-degenerate pairs; (c) great_circle_point: endpoints exact,
    intermediate distances proportional to f."""
    from pyspark.sql import functions as F
    from geopy_spark.functions import geo

    rows = [(i,
             float(-60 + (i * 37) % 120),          # lat1 away from poles
             float(-170 + (i * 73) % 340),
             float(-60 + (i * 53 + 11) % 120),
             float(-170 + (i * 97 + 29) % 340))
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "id long, lat1 double, lon1 double, lat2 double, lon2 double")
    # drop near-identical and near-antipodal pairs (bearing undefined)
    d = geo.haversine_m(F.col("lat1"), F.col("lon1"),
                        F.col("lat2"), F.col("lon2"))
    df = df.filter((d > 1000.0) & (d < 19_000_000.0))

    br = geo.initial_bearing_deg(F.col("lat1"), F.col("lon1"),
                                 F.col("lat2"), F.col("lon2"))
    dla, dlo = geo.destination(F.col("lat1"), F.col("lon1"), br, d)
    chk = df.select(
        (F.abs(dla - F.col("lat2")) < 1e-6).alias("lat_ok"),
        (F.abs(geo.normalize_lon(dlo - F.col("lon2"))) < 1e-6).alias("lon_ok"))
    bad = chk.filter(~F.col("lat_ok") | ~F.col("lon_ok")).count()
    assert bad == 0 and df.count() > 150

    g = spark.sql("SELECT 1").select(
        geo.initial_bearing_deg(F.lit(0.0), F.lit(0.0),
                                F.lit(10.0), F.lit(0.0)).alias("north"),
        geo.initial_bearing_deg(F.lit(0.0), F.lit(0.0),
                                F.lit(0.0), F.lit(10.0)).alias("east"),
        geo.initial_bearing_deg(F.lit(0.0), F.lit(0.0),
                                F.lit(-10.0), F.lit(0.0)).alias("south"),
    ).first()
    assert abs(g.north - 0.0) < 1e-9 and abs(g.east - 90.0) < 1e-9
    assert abs(g.south - 180.0) < 1e-9

    for f, rel in ((0.0, 0.0), (0.25, 0.25), (0.5, 0.5), (1.0, 1.0)):
        pla, plo = geo.great_circle_point(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"), f)
        got = df.select(
            (geo.haversine_m(F.col("lat1"), F.col("lon1"), pla, plo)
             / d).alias("frac"),
            (F.abs(pla - F.col("lat2")) + F.abs(geo.normalize_lon(
                plo - F.col("lon2")))).alias("enddiff"))
        assert got.filter(F.abs(F.col("frac") - rel) > 1e-9).count() == 0
        if f == 1.0:
            assert got.filter(F.col("enddiff") > 1e-5).count() == 0
