"""Raster↔vector tile assignment + tile-pyramid materialization
(SURVEY.md §2.2 G8-G9; north_star BASELINE.json:6).

Tile math is pure Column algebra (functions/geo.py) so point→tile
assignment never leaves whole-stage codegen. The pyramid aggregates leaf
tiles upward with integer halving of (x, y) — a weighted mean is exact and
associative, so parent stats equal the stats over all leaf rows in the
subtree regardless of partitioning (determinism property tested in pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import tile_x, tile_y


def assign_tiles(df: DataFrame, z: int, lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Attach (z, x, y) web-mercator tile coordinates at zoom ``z``."""
    return (df.withColumn("z", F.lit(z))
            .withColumn("x", tile_x(F.col(lon), z))
            .withColumn("y", tile_y(F.col(lat), z)))


def tile_stats(df: DataFrame, z: int, value_col: str | None = None,
               lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Leaf-level per-tile stats: row count (+ mean of value_col if given)."""
    t = assign_tiles(df, z, lat, lon)
    aggs = [F.count("*").alias("cnt")]
    if value_col is not None:
        aggs.append(F.avg(F.col(value_col)).alias("mean_val"))
    return t.groupBy("z", "x", "y").agg(*aggs)


def tile_pyramid(leaf: DataFrame, z_max: int, z_min: int = 0,
                 has_mean: bool = False) -> DataFrame:
    """Roll leaf tiles up to z_min; one row per (z, x, y) at every level.

    Parent count = sum(children); parent mean = count-weighted mean — exact
    (equals recomputing from raw rows). Each level is one narrow shuffle on
    the shrinking tile key space; at scale each level is also one snapshot
    commit (sources/icetab.py).
    """
    levels = [leaf]
    cur = leaf
    for z in range(z_max - 1, z_min - 1, -1):
        parent = cur.select(
            F.lit(z).alias("z"),
            F.floor(F.col("x") / 2).alias("x"),
            F.floor(F.col("y") / 2).alias("y"),
            F.col("cnt"),
            *([(F.col("mean_val") * F.col("cnt")).alias("wsum")] if has_mean else []),
        )
        aggs = [F.sum("cnt").alias("cnt")]
        if has_mean:
            aggs.append((F.sum("wsum") / F.sum("cnt")).alias("mean_val"))
        cur = parent.groupBy("z", "x", "y").agg(*aggs)
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
