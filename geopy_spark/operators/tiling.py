"""Raster↔vector tile assignment + tile-pyramid materialization
(SURVEY.md §2.2 G8-G9; north_star BASELINE.json:6).

Tile math is pure Column algebra (functions/geo.py) so point→tile
assignment never leaves whole-stage codegen. The pyramid aggregates leaf
tiles upward with integer halving of (x, y) — a weighted mean is exact and
associative, so parent stats equal the stats over all leaf rows in the
subtree regardless of partitioning (determinism property tested in pytest).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import tile_x, tile_y
from ..kernels import codecs as C


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


_TILE_IMG_SCHEMA = "z int, x long, y long, cnt long, img binary"


def tile_image_leaf(images: DataFrame, z: int, tile_px: int = 16) -> DataFrame:
    """Leaf tile CONTENT (I3): per (z,x,y), the mean image of the member
    payloads, each decoded and resampled to tile_px² — one applyInPandas
    per tile group; payload bytes stay inside the narrow stage."""
    t = assign_tiles(images.select("bytes", "fmt", "w", "h", "lat", "lon"), z)

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros((tile_px, tile_px, 3), dtype=np.float64)
        for r in pdf.itertuples(index=False):
            img = C.decode(r.bytes, r.fmt, int(r.w), int(r.h))
            yi = (np.arange(tile_px) * img.shape[0]) // tile_px
            xi = (np.arange(tile_px) * img.shape[1]) // tile_px
            acc += img[np.ix_(yi, xi)]
        mean_img = np.clip(acc / len(pdf), 0, 255).astype(np.uint8)
        return pd.DataFrame([(int(pdf["z"].iloc[0]), int(pdf["x"].iloc[0]),
                              int(pdf["y"].iloc[0]), len(pdf),
                              C.encode(mean_img, "raw"))],
                            columns=["z", "x", "y", "cnt", "img"])

    return t.groupBy("z", "x", "y").applyInPandas(per_tile, _TILE_IMG_SCHEMA)


def tile_image_pyramid(leaf_imgs: DataFrame, z_max: int, z_min: int = 0,
                       tile_px: int = 16) -> DataFrame:
    """Content pyramid (I3): parent tile image = 2×2 box-filter of the
    children mosaic (each child occupies its quadrant; absent children are
    zero — documented convention, deterministic). Counts sum upward.
    Returns the union of all levels z_max..z_min."""
    def per_parent(pdf: pd.DataFrame) -> pd.DataFrame:
        canvas = np.zeros((2 * tile_px, 2 * tile_px, 3), dtype=np.float64)
        for r in pdf.itertuples(index=False):
            child = C.decode(r.img, "raw", tile_px, tile_px).astype(np.float64)
            qy = (int(r.y) % 2) * tile_px
            qx = (int(r.x) % 2) * tile_px
            canvas[qy:qy + tile_px, qx:qx + tile_px] = child
        # 2x2 box filter -> tile_px
        down = canvas.reshape(tile_px, 2, tile_px, 2, 3).mean(axis=(1, 3))
        z = int(pdf["z"].iloc[0]) - 1
        return pd.DataFrame([(z, int(pdf["x"].iloc[0]) // 2,
                              int(pdf["y"].iloc[0]) // 2,
                              int(pdf["cnt"].sum()),
                              C.encode(np.clip(down, 0, 255).astype(np.uint8), "raw"))],
                            columns=["z", "x", "y", "cnt", "img"])

    levels = [leaf_imgs]
    cur = leaf_imgs
    for _z in range(z_max - 1, z_min - 1, -1):
        cur = (cur.groupBy(F.floor(F.col("x") / 2), F.floor(F.col("y") / 2), "z")
               .applyInPandas(per_parent, _TILE_IMG_SCHEMA))
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


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
