"""Zonal statistics (operators/zonal): per-polygon value aggregation
pinned against an independent pandas twin built from the brute-force
PIP kernel — covers the keep_point_cols pass-through and the
no-duplicate-pairs property the aggregate relies on."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopy_spark import synth
from geopy_spark.entry_queries import _REGIONS_SCHEMA
from geopy_spark.kernels import pip as P
from geopy_spark.operators.zonal import zonal_stats


@pytest.fixture(scope="module")
def fixture(spark):
    pdf = synth.polygons_pdf(synth.oracle_polygons_holed(14, seed=7))
    regions = spark.createDataFrame(pdf, schema=_REGIONS_SCHEMA)
    rng = np.random.default_rng(3)
    pts = pd.DataFrame({
        "point_id": np.arange(3000),
        "lat": rng.uniform(-60, 60, 3000).round(3),
        "lon": rng.uniform(-179, 179, 3000).round(3),
        "value": rng.uniform(0, 100, 3000).round(4),
    })
    return pdf, regions, pts


def _twin(pdf, pts):
    rows = []
    for r in pdf.itertuples(index=False):
        ring = np.array(r.ring, dtype=float)
        holes = [np.array(h, dtype=float) for h in r.holes]
        inside = P.points_in_polygon(pts["lat"].to_numpy(),
                                     pts["lon"].to_numpy(), ring,
                                     holes=holes)
        v = pts.loc[inside, "value"]
        if len(v):
            rows.append((r.poly_id, len(v), v.sum(), v.mean(),
                         v.min(), v.max()))
    return {r[0]: r[1:] for r in rows}


def test_zonal_stats_matches_kernel_twin(spark, fixture):
    pdf, regions, pts = fixture
    got = {r.poly_id: (r.n, r["sum"], r["mean"], r["min"], r["max"])
           for r in zonal_stats(spark.createDataFrame(pts), regions,
                                value_col="value", level=6).collect()}
    want = _twin(pdf, pts)
    assert set(got) == set(want) and len(want) > 3
    for pid, (n, s, m, lo, hi) in want.items():
        gn, gs, gm, glo, ghi = got[pid]
        assert gn == n
        assert abs(gs - s) < 1e-6 and abs(gm - m) < 1e-9
        assert glo == lo and ghi == hi


def test_keep_point_cols_rides_both_join_paths(spark, fixture):
    """keep_point_cols must survive the salted-SMJ path too (values ride
    the shuffle there) with identical results."""
    from geopy_spark.operators.spatial_join import spatial_join
    pdf, regions, pts = fixture
    sdf = spark.createDataFrame(pts)
    a = {(r.point_id, r.poly_id, r.value)
         for r in spatial_join(sdf, regions, level=6,
                               broadcast_regions=True,
                               keep_point_cols=["value"]).collect()}
    b = {(r.point_id, r.poly_id, r.value)
         for r in spatial_join(sdf, regions, level=6,
                               broadcast_regions=False,
                               keep_point_cols=["value"]).collect()}
    assert a == b and len(a) > 0
