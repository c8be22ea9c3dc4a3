"""Region measures operator (G19, round 5): per-polygon spherical area,
boundary length, planar centroid — the ST_Area / ST_Length / ST_Centroid
surface over the engine's regions schema.

Plan shape: one narrow Arrow-batched map over the (small) vector side —
no shuffle, no geometry leaves the stage; at 100 TB the vector layer is
the dimension table, so this runs once and the results broadcast-join
onto facts by poly_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..kernels import measures as M
from .spatial_join import _holes_transport, _np_holes, _np_ring

_MEASURES_SCHEMA = StructType([
    StructField("area_m2", DoubleType()),
    StructField("perimeter_m", DoubleType()),
    StructField("centroid_lat", DoubleType()),
    StructField("centroid_lon", DoubleType()),
])


def measures_udf(ring: Column, holes: Column | None = None) -> Column:
    """struct(area_m2, perimeter_m, centroid_lat, centroid_lon) per row."""
    @F.pandas_udf(_MEASURES_SCHEMA)
    def _m(rg: pd.Series, hf: pd.Series, hs: pd.Series) -> pd.DataFrame:
        n = len(rg)
        out = np.empty((n, 4), dtype=np.float64)
        for i in range(n):
            ring_np = _np_ring(rg.iloc[i])
            holes_np = _np_holes(hf.iloc[i], hs.iloc[i])
            out[i, 0] = M.polygon_area_m2(ring_np, holes_np)
            out[i, 1] = M.polygon_perimeter_m(ring_np, holes_np)
            out[i, 2], out[i, 3] = M.polygon_centroid(ring_np, holes_np)
        return pd.DataFrame(out, columns=["area_m2", "perimeter_m",
                                          "centroid_lat", "centroid_lon"])
    return _m(ring, *_holes_transport(holes))


def region_measures(regions: DataFrame) -> DataFrame:
    """(poly_id, area_m2, perimeter_m, centroid_lat, centroid_lon) for a
    regions-schema frame (holes honored when the column is present)."""
    holes = F.col("holes") if "holes" in regions.columns else None
    m = measures_udf(F.col("ring"), holes)
    return regions.select(
        "poly_id",
        m["area_m2"].alias("area_m2"),
        m["perimeter_m"].alias("perimeter_m"),
        m["centroid_lat"].alias("centroid_lat"),
        m["centroid_lon"].alias("centroid_lon"))
