"""Host memory-bandwidth probe — evidence tool for the shared-host
scaling analysis in BENCH/BASELINE.md.

The two-level protocol's recurring confounder is co-tenant memory
traffic: local[2] barely touches the memory system while local[8]
saturates it, so neighbor noise shows up as a 4N-only slowdown that
mimics poor scaling. This probe measures achievable STREAM-style triad
bandwidth at 1 worker and at N workers (separate PROCESSES, numpy
arrays far larger than LLC) in a few seconds, giving a same-minute
bandwidth baseline to cite next to any scaling window.

Run:  python tools/membw_probe.py [--workers 8] [--mb 256] [--reps 3]
Prints one JSON line; optionally appended to bench logs by the caller.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def _triad_once(mb: int, reps: int) -> float:
    """Best-of-reps STREAM triad (a = b + s*c) GB/s for one worker."""
    n = mb * 1024 * 1024 // 8
    b = np.random.default_rng(1).random(n)
    c = np.random.default_rng(2).random(n)
    a = np.empty_like(b)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)
        dt = time.perf_counter() - t0
        # 3 arrays × 8 bytes moved per element per pass (2 reads + 1 write
        # per op, but the two ops stream a/c then a/b — count 4 streams)
        best = max(best, 4 * n * 8 / dt / 1e9)
    return best


def _worker(mb: int, reps: int, q: "mp.Queue") -> None:
    q.put(_triad_once(mb, reps))


def probe(workers: int = 8, mb: int = 256, reps: int = 3) -> dict:
    single = _triad_once(mb, reps)
    q: "mp.Queue" = mp.Queue()
    procs = [mp.Process(target=_worker, args=(mb, reps, q))
             for _ in range(workers)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    agg = float(sum(vals))
    return {
        "single_worker_gbps": round(single, 2),
        "workers": workers,
        "aggregate_gbps": round(agg, 2),
        "per_worker_gbps": round(agg / workers, 2),
        "bandwidth_scaling": round(agg / (single * workers), 3),
        "parallel_wall_s": round(wall, 2),
        "array_mb": mb,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    print(json.dumps(probe(args.workers, args.mb, args.reps)))
