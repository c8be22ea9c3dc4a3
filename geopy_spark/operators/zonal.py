"""Zonal statistics (G8/G6 composition): aggregate a value column of a
point table (or decoded raster samples — any frame with lat/lon) per
polygon zone. The classic GIS "zonal stats" primitive, expressed as the
exact spatial join followed by one hash aggregation.

Plan shape: spatial_join emits no duplicate pairs (a point meets a
polygon in exactly one cell), so the aggregate needs no dedup, and the
value column rides the candidate join itself (keep_point_cols) — no
second points-side shuffle to re-attach values by id. On the broadcast
path the ONLY shuffle in the whole plan is the final groupBy on
poly_id, bounded by zone count with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spatial_join import DEFAULT_LEVEL, spatial_join


def zonal_stats(points: DataFrame, regions: DataFrame, *,
                value_col: str, point_id: str = "point_id",
                level: int = DEFAULT_LEVEL,
                broadcast_regions: bool | None = None) -> DataFrame:
    """Per-polygon (n, sum, mean, min, max) of ``value_col`` over the
    points each polygon contains (outer-minus-holes, boundary-inclusive
    — exactly the G6 containment semantics).

    points:  (point_id, lat, lon, <value_col>, ...).
    regions: the regions schema (poly_id, ring[, holes], bbox columns).
    Returns one row per polygon that contains ≥1 point.
    """
    pairs = spatial_join(points, regions, point_id=point_id, level=level,
                         broadcast_regions=broadcast_regions,
                         keep_point_cols=[value_col])
    return (pairs
            .groupBy("poly_id")
            .agg(F.count("*").alias("n"),
                 F.sum(value_col).alias("sum"),
                 F.avg(value_col).alias("mean"),
                 F.min(value_col).alias("min"),
                 F.max(value_col).alias("max")))
