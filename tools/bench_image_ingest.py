"""Compressed-image INGEST throughput: the measured ceiling for putting
the from-scratch jpeg/gif decoders on a 100 TB hot path.

The engine's headline bench deliberately keeps pure-python entropy
coding out of the hot mix (bench.py uses the vectorized raw/rle/qjpg/png
codecs); this tool answers the question that caveat leaves open — WHAT
IS the sustained images/sec if an ingest stage must decode real jpeg or
gif payloads? Three stages, each over a homogeneous corpus:

  jpeg_phash      — decode jpeg + phash64 (the I4 fingerprint an ingest
                    dedup needs), forced via a sum aggregate.
  jpeg_transcode  — decode jpeg → encode rle (mastering transcode),
                    forced via a noop-format write (full materialize,
                    zero sink cost).
  gif_transcode   — decode gif → encode rle.

Protocol mirrors tools/bench_scaling.py: corpus generated in a separate
JVM first, then each measurement runs in a fresh spark-submit JVM at
local[8], median of --runs. Stage wall excludes session startup (timer
starts after the session is up), includes the parquet scan.

Run:  python tools/bench_image_ingest.py [--n-images 8000] [--runs 3]
Writes BENCH/image_ingest_latest.json (picked up by bench.py extras).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_STAGE_CODE = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from geopy_spark.session import get_spark
from geopy_spark.operators import images as I
spark = get_spark("image_ingest_bench", cores={cores})
df = spark.read.parquet({path!r})
t0 = time.monotonic()
if {stage!r} == "phash":
    out = df.select(I.phash_udf(F.col("bytes"), F.col("fmt"), F.col("w"),
                                F.col("h")).alias("ph"))
    # forcing aggregate: pmod keeps the ANSI-mode sum far from long
    # overflow (raw phashes span the full int64 range)
    out.agg(F.sum(F.pmod(F.col("ph"), F.lit(1_000_000_007)))).collect()
else:
    I.transcode(df, "rle").write.format("noop").mode("overwrite").save()
print("WALL=%.3f" % (time.monotonic() - t0), flush=True)
spark.stop()
"""


def _gen(path: str, n: int, fmt: str) -> float:
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from geopy_spark.session import get_spark\n"
        "from geopy_spark.synth import write_images_parquet_spark\n"
        "spark = get_spark('gen_images', cores=32)\n"
        "write_images_parquet_spark(spark, %r, %d, partitions=64, fmt=%r)\n"
        "spark.stop()\n" % (REPO, path, n, fmt))
    t0 = time.monotonic()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(r.stdout[-1000:] + r.stderr[-1000:])
    return time.monotonic() - t0


def _measure(path: str, stage: str, cores: int) -> float:
    code = _STAGE_CODE.format(repo=REPO, cores=cores, path=path, stage=stage)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(r.stdout[-1500:] + r.stderr[-1500:])
    for line in r.stdout.splitlines():
        if line.startswith("WALL="):
            return float(line.split("=", 1)[1])
    raise RuntimeError("no WALL marker in output:\n" + r.stdout[-500:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=8000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="imgingest_")
    corpora = {}
    for fmt in ("jpeg", "gif"):
        p = os.path.join(work, f"{fmt}.parquet")
        gs = _gen(p, args.n_images, fmt)
        corpora[fmt] = p
        print(f"generated {args.n_images} {fmt} images in {gs:.1f}s",
              flush=True)

    stages = [("jpeg_phash", corpora["jpeg"], "phash"),
              ("jpeg_transcode", corpora["jpeg"], "transcode"),
              ("gif_transcode", corpora["gif"], "transcode")]
    out: dict = {"n_images": args.n_images, "cores": args.cores,
                 "runs": args.runs, "walls": {}, "images_per_sec": {}}
    for name, path, stage in stages:
        walls = [_measure(path, stage, args.cores) for _ in range(args.runs)]
        med = statistics.median(walls)
        out["walls"][name] = [round(x, 3) for x in walls]
        out["images_per_sec"][name] = round(args.n_images / med, 1)
        print(f"  {name}: median {med:.1f}s → "
              f"{out['images_per_sec'][name]} images/s "
              f"(walls {out['walls'][name]})", flush=True)

    with open(os.path.join(REPO, "BENCH", "image_ingest_latest.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
