"""EP-5: table maintenance job for icetab tables (the operational
counterpart of Iceberg's maintenance procedures):

    spark-submit --py-files geopy_spark.zip jobs/maintain_table.py \
        --table <icetab dir> [--compact z=0 z=1 ... | --compact-all] \
        [--expire] [--remove-orphans] [--stats-cols x,y] \
        [--target-file-mb 128]

Why a job and not an afterthought: at 10^12-row scale a pipeline that
appends per-partition snapshots every run accumulates small files until
per-file open/footer cost dominates scans. This job bin-packs chosen (or
all) partitions, optionally expires the replaced files once no kept
snapshot references them, and sweeps killed-writer debris — each action
reported in one JSON line so schedulers can alert on drift.

Safe by construction: compaction commits a REPLACING snapshot through
the same atomic rename-as-commit path as the pipelines (a kill leaves
the previous snapshot intact); expiry deletes only files unreachable
from every kept snapshot; orphan removal touches only files no manifest
ever referenced.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geopy_spark.session import get_spark  # noqa: E402
from geopy_spark.sources.tableio import open_table  # noqa: E402


def build_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="icetab table dir")
    ap.add_argument("--compact", nargs="*", default=None,
                    help="partitions to bin-pack (e.g. z=0 z=1)")
    ap.add_argument("--compact-all", action="store_true",
                    help="bin-pack every committed partition")
    ap.add_argument("--stats-cols", default=None,
                    help="comma-separated columns to re-sort by and record "
                         "min/max pruning stats for in rewritten files")
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument("--expire", action="store_true",
                    help="after compaction, reclaim files only reachable "
                         "from snapshots older than the current one")
    ap.add_argument("--remove-orphans", action="store_true")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    return ap.parse_args(argv)


def run(args, spark=None, stop_session: bool = True) -> dict:
    t0 = time.monotonic()
    own_session = spark is None
    if own_session:
        spark = get_spark(app="geopy-maintain", cores=args.cores)
    table = open_table(args.table, spark)
    run_id = f"maintain-{uuid.uuid4().hex[:8]}"
    stats_cols = args.stats_cols.split(",") if args.stats_cols else None

    report: dict = {"table": args.table, "run_id": run_id,
                    "compacted": {}, "expired": 0, "orphans_removed": 0}
    targets = sorted(table.committed_partitions()) if args.compact_all \
        else (args.compact or [])
    for part in targets:
        files_before = sum(1 for r in table.manifest_rows()
                           if r["partition"] == part)
        table.compact(spark, part, run_id, stats_cols=stats_cols,
                      target_file_bytes=args.target_file_mb << 20)
        files_after = sum(1 for r in table.manifest_rows()
                          if r["partition"] == part)
        report["compacted"][part] = {"files_before": files_before,
                                     "files_after": files_after}
    if args.expire:
        report["expired"] = len(table.expire_before(table.current_version()))
    if args.remove_orphans:
        report["orphans_removed"] = len(table.remove_orphans())

    report["version"] = table.current_version()
    report["wall_sec"] = round(time.monotonic() - t0, 3)
    if own_session and stop_session:
        spark.stop()
    return report


if __name__ == "__main__":
    print(json.dumps(run(build_args())))
