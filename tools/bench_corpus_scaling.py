"""EP-4 (corpus pipeline) two-cluster-size scaling — the SUPPLEMENTARY
counterpart of tools/bench_scaling.py (EP-3 remains the binding
north-rule measurement). Same protocol: identical input at N=local[2]
vs 4N=local[8], independent JVM per run, alternating levels so host
drift hits both equally, medians + per-run host CPU splits.

Run:  python tools/bench_corpus_scaling.py [--n-docs 1000000] [--runs 3]
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
    """Generate the corpus in a SUBPROCESS (same rationale as
    bench_scaling: the generator JVM must be gone before measuring)."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from geopy_spark.session import get_spark\n"
        "from geopy_spark.synth import write_documents_parquet_spark\n"
        "spark = get_spark('gen_docs', cores=32)\n"
        "write_documents_parquet_spark(spark, %r, %d, partitions=64)\n"
        "spark.stop()\n" % (REPO, path, n))
    t0 = time.monotonic()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO, timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(r.stdout[-1000:] + r.stderr[-1000:])
    return time.monotonic() - t0


def _cpu_ticks() -> list[int]:
    return [int(x) for x in open("/proc/stat").readline().split()[1:]]


def run_pipeline(inp: str, out: str, cores: int, shuffle: int) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "jobs", "corpus_pipeline.py"),
           "--input", inp, "--output", out,
           "--cores", str(cores), "--shuffle-partitions", str(shuffle)]
    c0 = _cpu_ticks()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       timeout=1800)
    c1 = _cpu_ticks()
    if r.returncode != 0:
        raise RuntimeError(r.stdout[-1500:] + r.stderr[-1500:])
    res = json.loads(r.stdout.strip().splitlines()[-1])
    d = [b - a for a, b in zip(c0, c1)]
    tot = max(sum(d[:8]), 1)
    res["cpu_user_pct"] = round(100 * d[0] / tot, 1)
    res["cpu_system_pct"] = round(100 * d[2] / tot, 1)
    res["cpu_steal_pct"] = round(100 * d[7] / tot, 1)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=1_000_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--input", default=None)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="cscaling_")
    inp = args.input
    if not inp:
        inp = os.path.join(work, "docs.parquet")
        gen_s = generate_input(inp, args.n_docs)
        print(f"input: {args.n_docs} docs in {gen_s:.1f}s at {inp}",
              flush=True)

    levels = [("N=local[2]", 2, 8), ("4N=local[8]", 8, 32)]
    walls: dict[str, list[float]] = {lbl: [] for lbl, _, _ in levels}
    stages: dict[str, list[dict]] = {lbl: [] for lbl, _, _ in levels}
    survivors = set()
    # ALTERNATE levels within each round so a host-noise window hits both
    for k in range(args.runs):
        for label, cores, shuffle in levels:
            out = os.path.join(work, f"c{cores}_{k}")
            res = run_pipeline(inp, out, cores, shuffle)
            walls[label].append(res["wall_sec"])
            stages[label].append(res["stage_sec"])
            survivors.add(res["survivors"])
            print(f"  {label} run{k}: {res['wall_sec']}s "
                  f"({res['rows_per_sec']} docs/s, "
                  f"stages {res['stage_sec']}, user {res['cpu_user_pct']}% "
                  f"sys {res['cpu_system_pct']}% "
                  f"steal {res['cpu_steal_pct']}%)", flush=True)
            shutil.rmtree(out, ignore_errors=True)

    t_n = statistics.median(walls["N=local[2]"])
    t_4n = statistics.median(walls["4N=local[8]"])
    summary = {
        "n_docs": args.n_docs,
        "runs": args.runs,
        "median_wall_N_local2_sec": t_n,
        "median_wall_4N_local8_sec": t_4n,
        "docs_per_sec_N": round(args.n_docs / t_n, 1),
        "docs_per_sec_4N": round(args.n_docs / t_4n, 1),
        "scaling_efficiency": round((t_n / t_4n) / 4, 3),
        "survivors_identical": sorted(survivors),
        "all_walls": walls,
        "stage_sec": stages,
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "corpus_scaling_latest.json"),
              "w") as f:
        json.dump(summary, f, indent=1)
    if not args.input:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
