"""Two-cluster-size scaling protocol (BASELINE.md; north_rule
BASELINE.json:14): the identical EP-3 pipeline on identical input at
N=local[4] and 4N=local[16], >=3 runs each, median wall-clock;
efficiency = (T_N / T_4N) / 4, target >= 0.8. Results are appended to
BENCH/BASELINE.md.

Why 4/16 and not 8/32: nproc reports 32, but an equal-work 32-process
burn runs only ~1.8x faster than 16 (SMT pair sharing), so 8-vs-32 would
measure hyper-threading, not the engine's scaling. 4 and 16 both fit in
physical cores.

Run:  python tools/bench_scaling.py [--n-images 300000] [--runs 3]
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


def generate_input(path: str, n: int) -> float:
    from geopy_spark.session import get_spark
    from geopy_spark.synth import write_images_parquet_spark
    spark = get_spark("gen_images", cores=32)
    t0 = time.monotonic()
    write_images_parquet_spark(spark, path, n, partitions=64)
    spark.stop()
    return time.monotonic() - t0


def _cpu_ticks() -> list[int]:
    return [int(x) for x in open("/proc/stat").readline().split()[1:]]


def run_pipeline(inp: str, out: str, cores: int, shuffle: int) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "jobs", "tile_pipeline.py"),
           "--input", inp, "--output", out, "--zmax", "8", "--level", "7",
           "--decode", "--verify", "--cores", str(cores), "--shuffle-partitions", str(shuffle)]
    c0 = _cpu_ticks()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=1800)
    c1 = _cpu_ticks()
    if r.returncode != 0:
        raise RuntimeError(r.stdout[-1500:] + r.stderr[-1500:])
    res = json.loads(r.stdout.strip().splitlines()[-1])
    d = [b - a for a, b in zip(c0, c1)]
    tot = max(sum(d[:8]), 1)
    # host-noise transparency: this is a shared-host VM; steal/system share
    # explains run-to-run wall variance (observed up to 3x)
    res["cpu_user_pct"] = round(100 * d[0] / tot, 1)
    res["cpu_system_pct"] = round(100 * d[2] / tot, 1)
    res["cpu_steal_pct"] = round(100 * d[7] / tot, 1)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=300_000)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="scaling_")
    inp = os.path.join(work, "images.parquet")
    gen_s = generate_input(inp, args.n_images)
    print(f"input: {args.n_images} images in {gen_s:.1f}s at {inp}", flush=True)

    # N=4 vs 4N=16: this box has 16 physical cores + SMT (measured: 32
    # equal-work processes run only 1.8x faster than 16), so comparing
    # local[8] vs local[32] would measure SMT, not scaling. Both levels
    # below stay within physical cores -> true 4x parallelism available.
    levels = [("N=local[4]", 4, 16), ("4N=local[16]", 16, 64)]
    results: dict[str, list[float]] = {}
    for label, cores, shuffle in levels:
        # discard one JVM warm-up run
        run_pipeline(inp, os.path.join(work, f"warm{cores}"), cores, shuffle)
        walls = []
        for k in range(args.runs):
            out = os.path.join(work, f"t{cores}_{k}")
            res = run_pipeline(inp, out, cores, shuffle)
            walls.append(res["wall_sec"])
            print(f"  {label} run{k}: {res['wall_sec']}s "
                  f"({res['rows_per_sec']} rows/s, user {res['cpu_user_pct']}% "
                  f"sys {res['cpu_system_pct']}% steal {res['cpu_steal_pct']}%)",
                  flush=True)
        results[label] = walls

    t_n = statistics.median(results["N=local[4]"])
    t_4n = statistics.median(results["4N=local[16]"])
    eff = (t_n / t_4n) / 4
    summary = {
        "n_images": args.n_images,
        "runs": args.runs,
        "median_wall_N_local4_sec": t_n,
        "median_wall_4N_local16_sec": t_4n,
        "rows_per_sec_N": round(args.n_images / t_n, 1),
        "rows_per_sec_4N": round(args.n_images / t_4n, 1),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "all_walls": results,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(f"""
## Scaling run — {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}

Identical EP-3 pipeline (`jobs/tile_pipeline.py --zmax 8 --level 7 --decode --verify`)
on identical pre-generated input ({args.n_images} synthetic images,
FIXTURES.md §B), {args.runs} measured runs per level after one discarded
warm-up, shuffle partitions scaled with cores (16 / 64).

| level | cores | median wall (s) | rows/sec |
|---|---|---|---|
| N  (`local[4]`)  | 4  | {t_n} | {round(args.n_images / t_n, 1)} |
| 4N (`local[16]`) | 16 | {t_4n} | {round(args.n_images / t_4n, 1)} |

**efficiency = (T_N / T_4N) / 4 = {eff:.3f}** (target ≥ 0.8)

All walls: `{json.dumps(results)}`

Command lines:
```
spark-submit --py-files geopy_spark.zip jobs/tile_pipeline.py \\
  --input <images.parquet> --output <tbl> --zmax 8 --level 7 --decode --verify \\
  --cores {{4|16}} --shuffle-partitions {{16|64}}
```
""")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
