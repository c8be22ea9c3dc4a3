"""File-level column stats + scan pruning on icetab (Iceberg data-file
stats parity, round 3): bounds are recorded from parquet footers at write
time and used to skip whole files at read planning — the sort-cluster +
min/max-skip story that makes a cell-range query touch O(files-in-range)
instead of every data file at the 10^12-row design point."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopy_spark.sources.icetab import IceTable


@pytest.fixture()
def cell_table(spark, tmp_path):
    """120 rows sort-clustered on `cell`, written as 6 files of 20 rows
    (repartitionByRange keeps disjoint cell ranges per file)."""
    t = IceTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        pd.DataFrame({"cell": range(120), "val": [i * 10 for i in range(120)]}))
    clustered = df.repartitionByRange(6, "cell").sortWithinPartitions("cell")
    t.commit([t.write_partition(clustered, "z=0", stats_cols=["cell"])], "run1")
    return t


def test_stats_recorded(cell_table):
    rows = cell_table.manifest_rows()
    assert len(rows) == 6
    assert all(r["stats"] is not None for r in rows)
    import json
    bounds = sorted(tuple(json.loads(r["stats"])["cell"]) for r in rows)
    # disjoint, covering [0, 119]
    assert bounds[0][0] == 0 and bounds[-1][1] == 119
    for (a0, a1), (b0, b1) in zip(bounds, bounds[1:]):
        assert a1 < b0


def test_prune_skips_files_and_preserves_results(spark, cell_table):
    kept, skipped = cell_table.plan_files({"cell": (30, 49)})
    assert skipped >= 4 and len(kept) <= 2  # 20-row ranges: at most 2 overlap

    pruned = (cell_table.read(spark, where={"cell": (30, 49)})
              .filter(F.col("cell").between(30, 49)))
    full = cell_table.read(spark).filter(F.col("cell").between(30, 49))
    assert sorted(r.val for r in pruned.collect()) == \
           sorted(r.val for r in full.collect())
    # the pruned scan's input is genuinely smaller (files, not just rows)
    assert pruned.count() == 20


def test_half_open_ranges(spark, cell_table):
    kept_lo, _ = cell_table.plan_files({"cell": (100, None)})
    kept_hi, _ = cell_table.plan_files({"cell": (None, 19)})
    assert len(kept_lo) == 1 and len(kept_hi) == 1
    assert cell_table.read(spark, where={"cell": (100, None)}).count() == 20


def test_all_files_pruned_returns_empty_with_schema(spark, cell_table):
    out = cell_table.read(spark, where={"cell": (5000, 6000)})
    assert out.count() == 0
    assert set(out.columns) == {"cell", "val"}


def test_no_stats_is_conservative(spark, tmp_path):
    """Files written without stats_cols (or by pre-round-3 manifests) are
    always kept — pruning never loses rows on stats-free tables."""
    t = IceTable(str(tmp_path / "plain"))
    df = spark.createDataFrame(pd.DataFrame({"cell": range(40), "val": range(40)}))
    t.commit([t.write_partition(df.repartition(2), "z=0")], "run1")
    kept, skipped = t.plan_files({"cell": (1000, 2000)})
    assert skipped == 0 and len(kept) == 2
    assert t.read(spark, where={"cell": (0, 5)}).count() == 40  # caller filters


def test_write_partitioned_stats(spark, tmp_path):
    t = IceTable(str(tmp_path / "multi"))
    df = spark.createDataFrame(pd.DataFrame(
        {"z": [0] * 50 + [1] * 50, "cell": list(range(50)) * 2}))
    pend = t.write_partitioned(df.repartitionByRange(4, "z", "cell")
                               .sortWithinPartitions("z", "cell"),
                               "z", stats_cols=["cell"])
    t.commit(pend, "run1")
    kept, skipped = t.plan_files({"cell": (0, 10)})
    assert skipped >= 1  # high-cell files skipped within each partition
    got = t.read(spark, where={"cell": (0, 10)}) \
           .filter(F.col("cell") <= 10).count()
    assert got == 22  # 11 cells × 2 z-levels
