"""Geohash Column surface (G22, round 5): Arrow-batched wrappers over
kernels/geohash for interchange with geohash-keyed systems. The engine's
joins stay on the S2-style cell index; these are boundary functions
(ingest foreign geohash keys / emit them)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ..kernels import geohash as GH


def geohash_encode_udf(lat: Column, lon: Column, precision: int = 9) -> Column:
    @F.pandas_udf(StringType())
    def _e(la: pd.Series, lo: pd.Series) -> pd.Series:
        return pd.Series(GH.encode(la.to_numpy(np.float64),
                                   lo.to_numpy(np.float64), precision))
    return _e(lat, lon)


_DECODE_SCHEMA = StructType([
    StructField("lat", DoubleType()), StructField("lon", DoubleType()),
    StructField("lat_min", DoubleType()), StructField("lat_max", DoubleType()),
    StructField("lon_min", DoubleType()), StructField("lon_max", DoubleType()),
])


def geohash_decode_udf(gh: Column) -> Column:
    """geohash → struct(center lat/lon + cell bounds); invalid strings
    raise (foreign keys should fail loudly, not mis-place)."""
    @F.pandas_udf(_DECODE_SCHEMA)
    def _d(s: pd.Series) -> pd.DataFrame:
        la0, la1, lo0, lo1 = GH.decode_bounds(s.to_numpy(dtype=str))
        return pd.DataFrame({
            "lat": (la0 + la1) / 2.0, "lon": (lo0 + lo1) / 2.0,
            "lat_min": la0, "lat_max": la1,
            "lon_min": lo0, "lon_max": lo1})
    return _d(gh)
