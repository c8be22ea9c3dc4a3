"""Per-job phase profile for the expensive bench operators (guide §1).

Runs one warm pass then one profiled pass of a bench shape with the
Spark UI enabled, and attributes wall-clock to Spark jobs via the UI
REST API (job callsites name the driver action that launched them).

Usage: SPARK_GRAFT_UI=true python tools/profile_ops.py dbscan|knn|...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "true")

from pyspark.sql import functions as F  # noqa: E402

from geopy_spark import synth  # noqa: E402
from geopy_spark.entry_queries import _REGIONS_SCHEMA  # noqa: E402
from geopy_spark.functions import geo  # noqa: E402
from geopy_spark.session import get_spark, load_table  # noqa: E402


def _api(path: str):
    base = "http://localhost:4040/api/v1"
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def _ts(s: str) -> float:
    from datetime import datetime
    return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%Z").timestamp()


def report(app_id: str, first_job: int) -> None:
    jobs = [j for j in _api(f"/applications/{app_id}/jobs")
            if j["jobId"] >= first_job]
    jobs.sort(key=lambda j: j["jobId"])
    total = 0.0
    by_site: dict[str, tuple[float, int]] = {}
    for j in jobs:
        dur = _ts(j["completionTime"]) - _ts(j["submissionTime"])
        total += dur
        name = j["name"].split("\n")[0]
        t, c = by_site.get(name, (0.0, 0))
        by_site[name] = (t + dur, c + 1)
    print(f"-- {len(jobs)} jobs, sum(job wall) = {total:.2f}s")
    for name, (t, c) in sorted(by_site.items(), key=lambda kv: -kv[1][0]):
        print(f"  {t:7.2f}s  x{c:<4d} {name}")
    if os.environ.get("SPARK_GRAFT_PROFILE_DETAIL"):
        prev_end = None
        for j in jobs:
            sub = _ts(j["submissionTime"])
            end = _ts(j["completionTime"])
            gap = (sub - prev_end) if prev_end is not None else 0.0
            prev_end = end
            stages = ",".join(str(s) for s in j["stageIds"][:6])
            print(f"    job {j['jobId']:>4} dur={end-sub:6.2f}s gap_before="
                  f"{gap:6.2f}s stages=[{stages}] "
                  f"{(j.get('description') or j['name']).splitlines()[0][:90]}")


def main() -> None:
    which = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    app_id = sc.applicationId

    li = load_table(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("bigint")
    pts = li.select(key.alias("point_id"),
                    geo.derived_lat(key).alias("lat"),
                    geo.derived_lon(key).alias("lon"))
    pts_id = pts.withColumnRenamed("point_id", "id")

    if which == "dbscan":
        from geopy_spark.operators.clustering import dbscan
        pts_db = pts_id.filter(F.col("id") % 7 == 0)

        def run():
            return dbscan(pts_db, 50_000.0, 4, level=8, point_id="id").count()
    elif which == "knn":
        from geopy_spark.operators.knn import knn_join
        s = load_table(spark, sf_dir, "supplier")
        qs = s.select(F.col("s_suppkey").alias("query_id"),
                      geo.derived_lat(F.col("s_suppkey") + 500000).alias("lat"),
                      geo.derived_lon(F.col("s_suppkey") + 500000).alias("lon"))

        def run():
            return knn_join(qs, pts_id, k=10, level=8, point_id="id").count()
    elif which == "minhash":
        from geopy_spark.operators.dedup import minhash_lsh_pairs
        d = load_table(spark, sf_dir, "documents")

        def run():
            return minhash_lsh_pairs(d, threshold=0.3).count()
    elif which == "spatial_join":
        from geopy_spark.operators.spatial_join import spatial_join
        regions = spark.createDataFrame(
            synth.polygons_pdf(synth.oracle_polygons(48, seed=7)),
            schema=_REGIONS_SCHEMA)

        def run():
            return spatial_join(pts, regions, point_id="point_id", level=7,
                                broadcast_regions=True).count()
    elif which == "within_distance":
        from geopy_spark.operators.knn import within_distance_join
        s = load_table(spark, sf_dir, "supplier")
        qs = s.select(F.col("s_suppkey").alias("query_id"),
                      geo.derived_lat(F.col("s_suppkey") + 500000).alias("lat"),
                      geo.derived_lon(F.col("s_suppkey") + 500000).alias("lon"))

        def run():
            return within_distance_join(qs, pts_id, 100_000.0, level=6,
                                        point_id="id").count()
    else:
        raise SystemExit(f"unknown op {which!r}")

    run()  # warm (cold pass: JIT, python workers, page faults)
    first_job = max((j["jobId"] for j in _api(f"/applications/{app_id}/jobs")),
                    default=-1) + 1
    t0 = time.monotonic()
    n = run()
    wall = time.monotonic() - t0
    print(f"== {which}: rows={n} wall={wall:.2f}s")
    report(app_id, first_job)
    spark.stop()


if __name__ == "__main__":
    main()
