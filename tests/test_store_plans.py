"""Sorted-cell store pruning + physical-plan discipline assertions
(SURVEY.md §4.1/§4.3)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geopy_spark import synth
from geopy_spark.entry_queries import _REGIONS_SCHEMA, regions_df
from geopy_spark.functions.cells import cell_encode_udf
from geopy_spark.kernels import cells as K
from geopy_spark.plans import explain as X
from geopy_spark.sources.store import read_cells, write_points_sorted


@pytest.fixture(scope="module")
def store_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("store") / "pts")
    img = synth.make_images_pdf(3000, with_pixels=False)
    pts = spark.createDataFrame(
        img[["image_id", "lat", "lon"]].rename(columns={"image_id": "id"}))
    write_points_sorted(pts, p, level=10, coarse_level=4)
    return p


def test_read_cells_correct_and_pruned(spark, store_path):
    img = synth.make_images_pdf(3000, with_pixels=False)
    cells = K.cell_encode(img["lat"].to_numpy(), img["lon"].to_numpy(), 10)
    target = [int(cells[0]), int(cells[1]), int(cells[100])]
    got = read_cells(spark, store_path, target, coarse_level=4)
    exp_ids = set(img["image_id"].to_numpy()[np.isin(cells, target)])
    assert {r.id for r in got.collect()} == exp_ids
    # partition pruning engaged on the coarse cell, fine filter pushed
    X.assert_partition_filter(got, "pcell")
    X.assert_pushed_filter(got, "cell")


def test_spatial_join_plan_is_broadcast_and_pruned(spark):
    from geopy_spark.operators.spatial_join import spatial_join
    img = synth.make_images_pdf(500, with_pixels=False)
    pts = spark.createDataFrame(
        img[["image_id", "lat", "lon"]].rename(columns={"image_id": "point_id"}))
    out = spatial_join(pts, regions_df(spark), point_id="point_id", level=6)
    X.assert_broadcast_join(out)


def test_tile_query_prunes_bytes_column(spark):
    """The tile-stats path must never read the image `bytes` column when
    it doesn't decode (ReadSchema pruning — 100 TB discipline)."""
    from geopy_spark.operators.tiling import tile_stats
    import pandas as pd
    pdf = synth.make_images_pdf(50)
    df = spark.createDataFrame(pdf)
    df.write.mode("overwrite").parquet("/tmp/_prune_probe.parquet")
    onDisk = spark.read.parquet("/tmp/_prune_probe.parquet")
    leaf = tile_stats(onDisk, z=5)
    X.assert_column_pruned(leaf, "bytes")
    X.assert_column_pruned(leaf, "caption")


def test_grouped_agg_partial_before_shuffle(spark):
    """Hash aggregation must be partial+final (map-side combine)."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = X.plan_text(agg)
    assert plan.count("HashAggregate") >= 2  # partial + final
