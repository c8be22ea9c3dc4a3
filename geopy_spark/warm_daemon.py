"""Python-worker daemon with preloaded heavy imports.

Spark forks a fresh python worker per task slot per stage (reuse is
best-effort); every fresh fork that lands in a pandas UDF re-imports
pandas/numpy/pyarrow (~1.5s CPU each). Measured on this engine's pipeline:
~15 re-forks per stage x ~10 stages x 1.5s = minutes of pure import burn,
showing up as kernel/system time.

Pointing ``spark.python.daemon.module`` here makes the daemon import the
heavy modules ONCE before forking, so every worker inherits warm modules
via copy-on-write — fork cost drops to ~nothing. Public Spark conf, same
daemon loop."""

import importlib

for _m in ("numpy", "pandas", "pyarrow", "pyarrow.parquet"):
    try:
        importlib.import_module(_m)
    except Exception:  # noqa: BLE001 — preload is best-effort
        pass

# engine kernels are cheap but ubiquitous in our UDFs — warm them too
for _m in ("geopy_spark.kernels.cells", "geopy_spark.kernels.pip",
           "geopy_spark.kernels.geodesy", "geopy_spark.kernels.codecs"):
    try:
        importlib.import_module(_m)
    except Exception:  # noqa: BLE001
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
