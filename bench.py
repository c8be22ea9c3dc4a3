"""Headline benchmark (driver-run per round; BENCH_r{N}.json).

Runs scale-stressing queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The spatial headline runs over ~600k lineitem-derived points (not the 15k
customer table) so the cell join / kNN / pyramid paths see real volume.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from geopy_spark import synth  # noqa: E402
from geopy_spark.entry_queries import (_REGIONS_SCHEMA, q_pricing_summary)  # noqa: E402
from geopy_spark.functions import geo  # noqa: E402
from geopy_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402
from geopy_spark.operators.knn import knn_join  # noqa: E402
from geopy_spark.operators.similarity import brute_force_topk  # noqa: E402
from geopy_spark.operators.spatial_join import spatial_join  # noqa: E402
from geopy_spark.operators.tiling import tile_pyramid, tile_stats  # noqa: E402
from geopy_spark.session import get_spark, load_table  # noqa: E402


def lineitem_points(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("bigint")
    return li.select(key.alias("point_id"),
                     geo.derived_lat(key).alias("lat"),
                     geo.derived_lon(key).alias("lon"))


def b_spatial_join(spark, sf_dir):
    pts = lineitem_points(spark, sf_dir)
    regions = spark.createDataFrame(
        synth.polygons_pdf(synth.oracle_polygons(48, seed=7)), schema=_REGIONS_SCHEMA)
    # the 48-polygon fixture is known-small: skip the size-guard's
    # estimation job (VERDICT r3 measured it as the spatial_join bench's
    # 1.54→1.96s like-for-like drift) and broadcast directly
    return spatial_join(pts, regions, point_id="point_id", level=7,
                        broadcast_regions=True).count()


def b_knn(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    qs = s.select(F.col("s_suppkey").alias("query_id"),
                  geo.derived_lat(F.col("s_suppkey") + 500000).alias("lat"),
                  geo.derived_lon(F.col("s_suppkey") + 500000).alias("lon"))
    pts = lineitem_points(spark, sf_dir).withColumnRenamed("point_id", "id")
    return knn_join(qs, pts, k=10, level=8, point_id="id").count()


def b_tile_pyramid(spark, sf_dir):
    pts = lineitem_points(spark, sf_dir)
    leaf = tile_stats(pts, z=8)
    return tile_pyramid(leaf, z_max=8, z_min=0).count()


def b_pricing(spark, sf_dir):
    return q_pricing_summary(spark, sf_dir).count()


def b_minhash(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, threshold=0.3).count()


def b_embedding_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    qv = [r[0] for r in e.filter(F.col("vec_id") == 0)
          .select(F.explode("embedding")).collect()]
    return brute_force_topk(e, qv, k=10, exclude_id=0).count()


BENCH = {
    "spatial_join": b_spatial_join,
    "knn": b_knn,
    "tile_pyramid": b_tile_pyramid,
    "pricing_summary": b_pricing,
    "minhash_neardup": b_minhash,
    "embedding_topk": b_embedding_topk,
}


def skew_experiment(spark, sf_dir) -> dict:
    """G10 measured evidence (VERDICT r2 #7): the explicitly-salted
    cell join vs the plain shuffle join, on a city-hotspot distribution
    (30% of all points collapsed onto 3 cells, each hotspot placed at a
    polygon-bbox center so the hot pairs do real PIP work) AND on the
    uniform distribution (where salting must tie). Reported separately
    from the headline queries to keep round-over-round comparability.
    `plain` disables the hot-cell pre-pass via an unreachable
    hot_min_count (same code path, zero salted keys); AQE stays on in
    both (it is the engine's documented second layer)."""
    import statistics
    ppdf = synth.polygons_pdf(synth.oracle_polygons(48, seed=7))
    regions = spark.createDataFrame(ppdf, schema=_REGIONS_SCHEMA)
    centers = [(float((r.lat_min + r.lat_max) / 2),
                float((r.lon_min + r.lon_max) / 2))
               for r in ppdf.head(3).itertuples(index=False)]

    uniform = lineitem_points(spark, sf_dir)
    hot = F.pmod(F.col("point_id"), F.lit(10))
    lat = F.col("lat")
    lon = F.col("lon")
    for i, (cla, clo) in enumerate(centers):
        lat = F.when(hot == i, F.lit(cla)).otherwise(lat)
        lon = F.when(hot == i, F.lit(clo)).otherwise(lon)
    skewed = uniform.select("point_id", lat.alias("lat"), lon.alias("lon"))

    out: dict[str, dict] = {}
    for dist, pts in (("skew", skewed), ("uniform", uniform)):
        for mode in ("plain", "salted"):
            kw = dict(point_id="point_id", level=7, broadcast_regions=False)
            if mode == "plain":
                kw["hot_min_count"] = 1 << 60  # pre-pass finds nothing
            run = lambda: spatial_join(pts, regions, **kw).count()  # noqa: E731
            n = run()  # warm pass
            runs = []
            for _ in range(3):
                t0 = time.monotonic()
                run()
                runs.append(round(time.monotonic() - t0, 3))
            out[f"{dist}_{mode}"] = {
                "median_sec": round(statistics.median(runs), 3),
                "runs": runs, "rows": n}
    return out


def _latest_json(name: str) -> dict | None:
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH", name)
    try:
        with open(p) as f:
            return json.load(f)
    except Exception:
        return None


def _latest_scaling() -> dict | None:
    """The most recent two-cluster-size protocol result (written by
    tools/bench_scaling.py runs; see BENCH/BASELINE.md for the full
    audited section) — embedded here so the per-round bench artifact
    carries the binding north-rule number alongside the sf0.1 walls."""
    return _latest_json("scaling_latest.json")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM, broadcast machinery and the Arrow python-worker pool so
    # per-query times measure the plan, not session spin-up
    from geopy_spark.functions.cells import cell_encode_udf
    warm = spark.range(0, 100000, 1, 32).select(
        (F.col("id") % 89).cast("double").alias("lat"),
        (F.col("id") % 179).cast("double").alias("lon"),
        F.col("id"))
    warm = warm.withColumn("c", cell_encode_udf(F.col("lat"), F.col("lon"), 7))
    warm.join(F.broadcast(spark.range(10)), "id", "left_semi").count()
    load_table(spark, sf_dir, "lineitem").count()

    # Each query runs four times: the first (cold) pass warms that query's
    # python-worker code paths (kernel imports, scratch-buffer page faults —
    # first-touch allocation on this host measures ~25 MB/s — shuffle-file
    # creation, JIT); the reported time is the MEDIAN of the three warm
    # passes (ADVICE r2: min-of-warm was a lucky-run-biased estimator on a
    # shared VM with documented 3x wall-clock variance between identical
    # runs — the median matches the BENCH/BASELINE.md shared-host
    # protocol). All passes stay visible in the JSON.
    import statistics
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    warm_all: dict[str, list[float]] = {}
    counts: dict[str, int] = {}
    for name, fn in BENCH.items():
        t0 = time.monotonic()
        counts[name] = fn(spark, sf_dir)
        cold[name] = round(time.monotonic() - t0, 3)
        warm_all[name] = []
        for _ in range(3):
            t0 = time.monotonic()
            counts[name] = fn(spark, sf_dir)
            warm_all[name].append(round(time.monotonic() - t0, 3))
        times[name] = round(statistics.median(warm_all[name]), 3)

    skew = skew_experiment(spark, sf_dir)

    # round-3 image-axis extra (NOT in the headline total, which stays
    # the round-1 query set for comparability): banded phash-Hamming LSH
    # image near-dup at sf0.1, median of 3 warm runs
    import __spark_entry__ as _entry
    imq = _entry.queries()["image_neardup"]
    imq(spark, sf_dir).count()  # cold pass
    im_runs = []
    for _ in range(3):
        t0 = time.monotonic()
        im_rows = imq(spark, sf_dir).count()
        im_runs.append(round(time.monotonic() - t0, 3))
    # round-5: measured walls for the spatial operators added in rounds
    # 4-5 (NOT in the headline total, which stays the round-1 query set
    # for comparability): G17 zonal, G18 within-distance, G16 polygon
    # join, G20 raster-free measures — each median of 3 warm runs over
    # the same lineitem-derived points / holed fixture
    from geopy_spark.operators.knn import within_distance_join
    from geopy_spark.operators.measures import region_measures
    from geopy_spark.operators.spatial_join import polygon_join
    from geopy_spark.operators.zonal import zonal_stats

    regions_holed = spark.createDataFrame(
        synth.polygons_pdf(synth.oracle_polygons_holed(48, seed=7)),
        schema=_REGIONS_SCHEMA)
    pts_v = lineitem_points(spark, sf_dir).withColumn(
        "value", (F.col("point_id") % 97).cast("double"))
    qs = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("query_id"),
        geo.derived_lat(F.col("s_suppkey") + 500000).alias("lat"),
        geo.derived_lon(F.col("s_suppkey") + 500000).alias("lon"))
    pts_id = lineitem_points(spark, sf_dir).withColumnRenamed(
        "point_id", "id")

    def _zonal():
        return zonal_stats(pts_v, regions_holed, value_col="value",
                           point_id="point_id", level=7,
                           broadcast_regions=True).count()

    def _withind():
        return within_distance_join(qs, pts_id, 100_000.0, level=6,
                                    point_id="id").count()

    def _polyjoin():
        right = spark.createDataFrame(
            synth.polygons_pdf(synth.oracle_polygons(48, seed=99)),
            schema=_REGIONS_SCHEMA)
        return polygon_join(regions_holed, right, level=6).count()

    def _measures():
        return region_measures(regions_holed).count()

    # round-5 additions: G23 DBSCAN (eps graph + core CC over an ~86k
    # global point sample — the density regime where most points are
    # noise, i.e. the shuffle-bound path) and G24 trajectory stats
    # (events as ping stream, one entity-window shuffle)
    from geopy_spark.operators.clustering import dbscan
    from geopy_spark.operators.trajectory import trajectory_stats

    pts_db = pts_id.filter(F.col("id") % 7 == 0)

    def _dbscan():
        # level 8 (78 km cells): the eps=50 km disk stays a 3x3 cell
        # block while candidate area shrinks ~16x vs level 6
        return dbscan(pts_db, 50_000.0, 4, level=8, point_id="id").count()

    def _trajectory():
        e = load_table(spark, sf_dir, "events")
        pings = e.select(F.col("user_id").alias("entity_id"), "ts",
                         "event_id",
                         geo.derived_lat(F.col("event_id")).alias("lat"),
                         geo.derived_lon(F.col("event_id")).alias("lon"))
        return trajectory_stats(pings, tiebreak_col="event_id").count()

    spatial_ops = {}
    for nm, fn in (("zonal_stats", _zonal), ("within_distance", _withind),
                   ("polygon_join", _polyjoin), ("measures", _measures),
                   ("dbscan", _dbscan), ("trajectory_stats", _trajectory)):
        n_rows = fn()  # warm
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            fn()
            runs.append(round(time.monotonic() - t0, 3))
        spatial_ops[nm] = {"median_sec": round(statistics.median(runs), 3),
                           "runs": runs, "rows": int(n_rows)}

    extras = {"image_neardup_sec": round(statistics.median(im_runs), 3),
              "image_neardup_rows": int(im_rows),
              "spatial_ops": spatial_ops,
              # round-4: measured ceiling for the from-scratch jpeg/gif
              # entropy decoders as an ingest stage (images/s at local[8];
              # tools/bench_image_ingest.py) — the number behind the
              # "python codecs stay off the 100 TB hot path" caveat
              "image_ingest": _latest_json("image_ingest_latest.json"),
              # round-4: EP-4 corpus-pipeline two-level scaling
              # (tools/bench_corpus_scaling.py), supplementary to the
              # binding EP-3 number in two_level_scaling
              "corpus_scaling": _latest_json("corpus_scaling_latest.json")}

    total = round(sum(times.values()), 3)
    n_pts = load_table(spark, sf_dir, "lineitem").count()
    scaling = _latest_scaling()

    # Truncation-proofing (VERDICT r4 #7: the round-4 artifact lost its
    # per-query medians to a mid-JSON tail truncation): stdout carries ONE
    # COMPACT headline line — per-query medians, counts, skew medians and
    # the binding scaling efficiency, but no inlined run-by-run sub-reports
    # — while the full detail (cold passes, all warm runs, embedded
    # image-ingest / corpus-scaling reports) goes to
    # BENCH/bench_full_latest.json, referenced by name from the headline.
    detail = {
        "cold_first_run": cold,
        "warm_runs": warm_all,
        "skew_experiment": skew,
        "extras": extras,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "bench_full_latest.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
        detail_ref = os.path.relpath(
            detail_path, os.path.dirname(os.path.abspath(__file__)))
    except OSError:
        detail_ref = None

    print(json.dumps({
        "metric": "spatial_join+tiling headline wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "warm_stat": "median_of_3",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "counts": counts,
        "skew_medians": {k: v["median_sec"] for k, v in skew.items()},
        "image_neardup_sec": extras["image_neardup_sec"],
        "spatial_ops_sec": {k: v["median_sec"]
                            for k, v in spatial_ops.items()},
        "two_level_scaling": ({
            k: scaling.get(k)
            for k in ("scaling_efficiency", "target",
                      "median_wall_N_local2_sec", "median_wall_4N_local8_sec",
                      "protocol", "date_utc")}
            if isinstance(scaling, dict) else None),
        "spatial_rows_per_sec": round(n_pts / max(times["spatial_join"], 1e-9), 1),
        "cores": cores,
        "detail_file": detail_ref,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
