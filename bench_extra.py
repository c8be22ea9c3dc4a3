"""Optimization-round auxiliary benchmark (guide §1.4): per-operator
medians with noop-style isolation, more repetitions than bench.py, and
env-switchable engine knobs for A/B runs. NOT the driver-timed artifact
— bench.py stays frozen; numbers from here are cited in
OPTIMIZATION_r06.md.

Usage: python bench_extra.py [op ...]   (default: all)
Env: SPARK_GRAFT_BENCH_REPS (default 5 warm reps)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from geopy_spark import synth  # noqa: E402
from geopy_spark.entry_queries import _REGIONS_SCHEMA, q_pricing_summary  # noqa: E402
from geopy_spark.functions import geo  # noqa: E402
from geopy_spark.session import get_spark, load_table  # noqa: E402


def main() -> None:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    spark = get_spark("bench_extra", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("bigint")
    pts = li.select(key.alias("point_id"),
                    geo.derived_lat(key).alias("lat"),
                    geo.derived_lon(key).alias("lon"))
    pts_id = pts.withColumnRenamed("point_id", "id")
    pts_v = pts.withColumn("value", (F.col("point_id") % 97).cast("double"))
    s = load_table(spark, sf_dir, "supplier")
    qs = s.select(F.col("s_suppkey").alias("query_id"),
                  geo.derived_lat(F.col("s_suppkey") + 500000).alias("lat"),
                  geo.derived_lon(F.col("s_suppkey") + 500000).alias("lon"))
    regions = spark.createDataFrame(
        synth.polygons_pdf(synth.oracle_polygons(48, seed=7)),
        schema=_REGIONS_SCHEMA)
    regions_holed = spark.createDataFrame(
        synth.polygons_pdf(synth.oracle_polygons_holed(48, seed=7)),
        schema=_REGIONS_SCHEMA)

    def b_spatial_join():
        from geopy_spark.operators.spatial_join import spatial_join
        return spatial_join(pts, regions, point_id="point_id", level=7,
                            broadcast_regions=True).count()

    def b_knn():
        from geopy_spark.operators.knn import knn_join
        return knn_join(qs, pts_id, k=10, level=8, point_id="id").count()

    def b_tile_pyramid():
        from geopy_spark.operators.tiling import tile_pyramid, tile_stats
        return tile_pyramid(tile_stats(pts, z=8), z_max=8, z_min=0).count()

    def b_pricing():
        return q_pricing_summary(spark, sf_dir).count()

    def b_minhash():
        from geopy_spark.operators.dedup import minhash_lsh_pairs
        d = load_table(spark, sf_dir, "documents")
        return minhash_lsh_pairs(d, threshold=0.3).count()

    def b_embedding_topk():
        from geopy_spark.operators.similarity import brute_force_topk
        e = load_table(spark, sf_dir, "embeddings")
        qv = [r[0] for r in e.filter(F.col("vec_id") == 0)
              .select(F.explode("embedding")).collect()]
        return brute_force_topk(e, qv, k=10, exclude_id=0).count()

    def b_zonal():
        from geopy_spark.operators.zonal import zonal_stats
        return zonal_stats(pts_v, regions_holed, value_col="value",
                           point_id="point_id", level=7,
                           broadcast_regions=True).count()

    def b_withind():
        from geopy_spark.operators.knn import within_distance_join
        return within_distance_join(qs, pts_id, 100_000.0, level=6,
                                    point_id="id").count()

    def b_polyjoin():
        from geopy_spark.operators.spatial_join import polygon_join
        right = spark.createDataFrame(
            synth.polygons_pdf(synth.oracle_polygons(48, seed=99)),
            schema=_REGIONS_SCHEMA)
        return polygon_join(regions_holed, right, level=6).count()

    def b_dbscan():
        from geopy_spark.operators.clustering import dbscan
        return dbscan(pts_id.filter(F.col("id") % 7 == 0), 50_000.0, 4,
                      level=8, point_id="id").count()

    def b_trajectory():
        from geopy_spark.operators.trajectory import trajectory_stats
        e = load_table(spark, sf_dir, "events")
        pings = e.select(F.col("user_id").alias("entity_id"), "ts",
                         "event_id",
                         geo.derived_lat(F.col("event_id")).alias("lat"),
                         geo.derived_lon(F.col("event_id")).alias("lon"))
        return trajectory_stats(pings, tiebreak_col="event_id").count()

    def b_image_neardup():
        import __spark_entry__ as entry
        return entry.queries()["image_neardup"](spark, sf_dir).count()

    ops = {
        "spatial_join": b_spatial_join,
        "knn": b_knn,
        "tile_pyramid": b_tile_pyramid,
        "pricing_summary": b_pricing,
        "minhash_neardup": b_minhash,
        "embedding_topk": b_embedding_topk,
        "zonal_stats": b_zonal,
        "within_distance": b_withind,
        "polygon_join": b_polyjoin,
        "dbscan": b_dbscan,
        "trajectory_stats": b_trajectory,
        "image_neardup": b_image_neardup,
    }

    out = {}
    for name, fn in ops.items():
        if only and name not in only:
            continue
        rows = fn()  # cold pass warms code paths
        runs = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            runs.append(round(time.monotonic() - t0, 3))
        out[name] = {"median": round(statistics.median(runs), 3),
                     "min": min(runs), "runs": runs, "rows": int(rows)}
        print(f"{name:18s} median={out[name]['median']:7.3f}s "
              f"min={out[name]['min']:7.3f}s rows={rows}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
