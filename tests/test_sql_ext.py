"""SQL surface (sql_ext): generated RETURN bodies must agree exactly with
the Column implementations they were generated from, and registration
must be idempotent."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopy_spark.functions import geo
from geopy_spark.functions import text as T
from geopy_spark.sql_ext import install_sql_functions


@pytest.fixture(scope="module")
def installed(spark):
    names = install_sql_functions(spark)
    install_sql_functions(spark)  # idempotent (OR REPLACE)
    return set(names)


@pytest.fixture(scope="module")
def probe(spark):
    pdf = pd.DataFrame({
        "k": [1, 7, 42, 999, 4242],
        "lat": [0.0, 45.5, -89.9, 37.7749, -0.0001],
        "lon": [0.0, -122.4, 179.95, -181.5, 540.0],  # incl. out-of-range
        "t": ["the quick brown fox, mostly harmless text here",
              "el rapido zorro marron y la cierta calidad de texto",
              "!!!???;;;", "", "one-token"],
    })
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("sqlext_probe")
    return df


def test_sql_functions_match_column_impls(spark, installed, probe):
    got = spark.sql("""
        SELECT k,
               haversine_m(lat, lon, 0.0, 0.0) AS hav,
               normalize_lon(lon) AS nlon, normalize_lat(lat) AS nlat,
               tile_x(lon, 7) AS tx, tile_y(lat, 7) AS ty,
               derived_lat(k) AS dlat, derived_lon(k) AS dlon,
               token_count(t) AS ntok, bpe_token_count(t) AS nbpe,
               punct_ratio(t) AS pr, lang_id(t) AS lang,
               quality_score(t) AS q, doc_fingerprint(t) AS fp
        FROM sqlext_probe ORDER BY k
    """).collect()
    exp = probe.select(
        "k",
        geo.haversine_m(F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(0.0)).alias("hav"),
        geo.normalize_lon(F.col("lon")).alias("nlon"),
        geo.normalize_lat(F.col("lat")).alias("nlat"),
        geo.tile_x(F.col("lon"), 7).alias("tx"),
        geo.tile_y(F.col("lat"), 7).alias("ty"),
        geo.derived_lat(F.col("k")).alias("dlat"),
        geo.derived_lon(F.col("k")).alias("dlon"),
        T.token_count(F.col("t")).alias("ntok"),
        T.bpe_token_count(F.col("t")).alias("nbpe"),
        T.punct_ratio(F.col("t")).alias("pr"),
        T.lang_id(F.col("t")).alias("lang"),
        T.quality_score(F.col("t")).alias("q"),
        T.fingerprint(F.col("t")).alias("fp"),
    ).orderBy("k").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_sql_pandas_udfs_cell_encode_geodesic(spark, installed, probe):
    from geopy_spark.kernels import cells as K
    from geopy_spark.kernels.geodesy import vincenty_m
    import numpy as np

    rows = spark.sql("""
        SELECT k, cell_encode(normalize_lat(lat), normalize_lon(lon), 7) AS c,
               geodesic_m(normalize_lat(lat), normalize_lon(lon), 0.0, 0.0) AS g
        FROM sqlext_probe ORDER BY k
    """).collect()
    pdf = probe.orderBy("k").toPandas()
    nlat = pdf["lat"].clip(-90, 90).to_numpy()
    nlon = ((pdf["lon"] + 180.0) % 360.0) - 180.0
    exp_c = K.cell_encode(nlat, nlon.to_numpy(), 7)
    exp_g, _ = vincenty_m(nlat, nlon.to_numpy(),
                          np.zeros(len(pdf)), np.zeros(len(pdf)))
    assert [r.c for r in rows] == [int(x) for x in exp_c]
    assert np.allclose([r.g for r in rows], exp_g, rtol=1e-12, atol=1e-6)


def test_sql_cell_encode_per_row_level(spark, installed, probe):
    """cell_encode must honour a NON-constant level column (the round-2
    registration read level from only the first row of each Arrow batch,
    silently mis-encoding mixed-level batches — ADVICE r2)."""
    from geopy_spark.kernels import cells as K

    rows = spark.sql("""
        SELECT k, CAST(3 + k % 5 AS INT) AS lv,
               cell_encode(normalize_lat(lat), normalize_lon(lon),
                           CAST(3 + k % 5 AS INT)) AS c
        FROM sqlext_probe ORDER BY k
    """).collect()
    pdf = probe.orderBy("k").toPandas()
    nlat = pdf["lat"].clip(-90, 90).to_numpy()
    nlon = (((pdf["lon"] + 180.0) % 360.0) - 180.0).to_numpy()
    for r, la, lo in zip(rows, nlat, nlon):
        import numpy as np
        exp = K.cell_encode(np.array([la]), np.array([lo]), int(r.lv))[0]
        assert r.c == int(exp), (r.k, r.lv)


def test_sql_udf_inlines_into_codegen_plan(spark, installed, probe):
    """A SQL scalar UDF is an inlined expression, not a python call: the
    plan for a haversine over the probe view must contain no
    ArrowEvalPython/BatchEvalPython node and keep the filter pushable."""
    df = spark.sql("SELECT k FROM sqlext_probe "
                   "WHERE haversine_m(lat, lon, 0.0, 0.0) > 1000.0")
    from geopy_spark.plans.explain import plan_text
    plan = plan_text(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_golden_bodies_match_live(spark):
    """Drift guard for the Spark Connect fallback (round 4): the pinned
    golden SQL bodies must equal a live render from the Column defs.
    When this fails, re-run tools/gen_sql_golden.py."""
    from geopy_spark.sql_ext import _expr_sql, _scalar_defs
    from geopy_spark.sql_golden import GOLDEN_BODIES

    live = {name: _expr_sql(spark, args, body)
            for name, args, _r, body in _scalar_defs()}
    assert live == GOLDEN_BODIES


def test_connect_fallback_registers_and_executes(spark, monkeypatch):
    """With plan access denied (Connect simulation), install must still
    register every function from the goldens, and the functions must
    compute the same values as the live-rendered ones."""
    import geopy_spark.sql_ext as SE

    monkeypatch.setattr(SE, "_is_classic", lambda s: False)
    # _expr_sql must not be consulted at all on the fallback path
    monkeypatch.setattr(SE, "_expr_sql",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("live render on Connect path")))
    names = SE.install_sql_functions(spark)
    assert "haversine_m" in names and "cell_encode" in names
    row = spark.sql(
        "SELECT haversine_m(0.0D, 0.0D, 0.0D, 1.0D) AS d, "
        "       tile_x(179.9D, 4) AS tx, "
        "       token_count('a b  c') AS tc, "
        "       cell_encode(10.5D, -20.25D, 8) AS cell").first()
    assert abs(row.d - 111194.9) < 100
    assert row.tx == 15 and row.tc == 3
    from geopy_spark.kernels import cells as K
    import numpy as np
    assert row.cell == int(K.cell_encode(np.array([10.5]),
                                         np.array([-20.25]), 8)[0])


def test_geohash_sql_surface(spark, installed):
    assert {"geohash_encode", "geohash_lat", "geohash_lon"} <= installed
    rows = spark.sql("""
        SELECT geohash_encode(57.64911D, 10.40744D, 11) AS gh,
               geohash_lat(geohash_encode(42.6D, -5.6D, 9)) AS la,
               geohash_lon(geohash_encode(42.6D, -5.6D, 9)) AS lo
    """).first()
    assert rows.gh == "u4pruydqqvj"
    assert abs(rows.la - 42.6) < 1e-3 and abs(rows.lo + 5.6) < 1e-3
