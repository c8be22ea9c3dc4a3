"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``geopy_spark`` package (SURVEY.md §2 operator
inventory); this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geopy_spark.entry_queries import ORACLES, QUERIES, q_spatial_join_pip  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the engine's exact point-in-polygon spatial join
    (cell cover → equi-join → bbox prune → vectorized PIP residual) over
    sf0.001 customer-derived points × the deterministic polygon fixture."""
    return q_spatial_join_pip(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins — one for EVERY entry in
    ``queries()`` (no rows-only ops; the near-dup/ANN family included
    since round 2)."""
    return dict(ORACLES)
