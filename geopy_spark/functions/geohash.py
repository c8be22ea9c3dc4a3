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
    """Null/NaN coordinates yield null geohashes (standard SQL null
    semantics); the kernel itself refuses non-finite input, so a bad row
    can never silently encode as the South-Pole '000…' cell."""
    @F.pandas_udf(StringType())
    def _e(la: pd.Series, lo: pd.Series) -> pd.Series:
        la_np = la.to_numpy(np.float64, na_value=np.nan)
        lo_np = lo.to_numpy(np.float64, na_value=np.nan)
        ok = np.isfinite(la_np) & np.isfinite(lo_np)
        out = np.full(len(la_np), None, dtype=object)
        if ok.any():
            out[ok] = GH.encode(la_np[ok], lo_np[ok], precision)
        return pd.Series(out)
    return _e(lat, lon)


_DECODE_SCHEMA = StructType([
    StructField("lat", DoubleType()), StructField("lon", DoubleType()),
    StructField("lat_min", DoubleType()), StructField("lat_max", DoubleType()),
    StructField("lon_min", DoubleType()), StructField("lon_max", DoubleType()),
])


def geohash_decode_udf(gh: Column) -> Column:
    """geohash → struct(center lat/lon + cell bounds). Null keys yield a
    null struct (routine column data, standard SQL semantics); INVALID
    non-null strings raise — a foreign key that exists but doesn't parse
    should fail loudly, not mis-place."""
    @F.pandas_udf(_DECODE_SCHEMA)
    def _d(s: pd.Series) -> pd.DataFrame:
        mask = s.notna().to_numpy()
        cols = ["lat", "lon", "lat_min", "lat_max", "lon_min", "lon_max"]
        out = pd.DataFrame(np.nan, index=range(len(s)), columns=cols)
        if mask.any():
            la0, la1, lo0, lo1 = GH.decode_bounds(
                s[mask].to_numpy(dtype=str))
            out.loc[mask, "lat"] = (la0 + la1) / 2.0
            out.loc[mask, "lon"] = (lo0 + lo1) / 2.0
            out.loc[mask, "lat_min"] = la0
            out.loc[mask, "lat_max"] = la1
            out.loc[mask, "lon_min"] = lo0
            out.loc[mask, "lon_max"] = lo1
        return out
    return _d(gh)
