"""icetab maintenance ops (Iceberg parity, round 3): time-travel reads,
partition compaction with replace semantics (rewrite_data_files), snapshot
expiry reclaiming replaced files (expire_snapshots), and orphan cleanup
(remove_orphan_files). The 100 TB story: incremental appends accumulate
small files; compaction restores large sequential scans per partition
without rewriting the table, and expiry bounds storage."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopy_spark.sources.icetab import IceTable


def _pdf(lo, hi):
    return pd.DataFrame({"cell": range(lo, hi), "val": range(lo, hi)})


@pytest.fixture()
def table(spark, tmp_path):
    """z=0 written in two append snapshots of 3 files each (6 small
    files), z=1 in one snapshot."""
    t = IceTable(str(tmp_path / "tbl"))
    t.commit([t.write_partition(
        spark.createDataFrame(_pdf(0, 30)).repartition(3), "z=0")], "r1")
    t.commit([t.write_partition(
        spark.createDataFrame(_pdf(30, 60)).repartition(3), "z=0")], "r2")
    t.commit([t.write_partition(
        spark.createDataFrame(_pdf(60, 80)).repartition(2), "z=1")], "r3")
    return t


def test_partition_rows_metadata_only(spark, table):
    """partition_rows = exact committed count from manifest metadata
    (zero Spark jobs) — must agree with a real count at every version
    and respect compaction shadowing."""
    assert table.partition_rows("z=0") == 60
    assert table.partition_rows("z=1") == 20
    assert table.partition_rows("z=0", version=1) == 30
    assert table.partition_rows("missing") == 0
    table.compact(spark, "z=0", "rc-count")
    assert table.partition_rows("z=0") == 60  # replace, not append
    assert table.read_partition(spark, "z=0").count() == 60


def test_time_travel(spark, table):
    assert table.read(spark, version=1).count() == 30
    assert table.read(spark, version=2).count() == 60
    assert table.read(spark).count() == 80
    v1 = sorted(r.cell for r in table.read(spark, version=1).collect())
    assert v1 == list(range(30))


def test_compact_replaces_partition_exactly(spark, table):
    before = sorted(r.cell for r in table.read(spark).collect())
    n_before = sum(1 for r in table.manifest_rows() if r["partition"] == "z=0")
    assert n_before == 6
    v_pre = table.current_version()

    table.compact(spark, "z=0", "rc", stats_cols=["cell"])
    rows = [r for r in table.manifest_rows() if r["partition"] == "z=0"]
    assert len(rows) < n_before  # bin-packed (tiny files -> 1 output)
    assert all(r["stats"] is not None for r in rows)  # bounds re-recorded
    after = sorted(r.cell for r in table.read(spark).collect())
    assert after == before  # byte-identical row set
    # partition still counts as committed (resume logic unaffected)
    assert "z=0" in table.committed_partitions()
    # time travel to the pre-compact snapshot still sees the old files
    assert table.read(spark, version=v_pre).count() == 80
    # stats pruning works over the compacted manifest
    kept, _ = table.plan_files({"cell": (0, 5)})
    assert all(os.path.exists(p) for p in kept)


def test_compact_noop_on_single_file(spark, tmp_path):
    t = IceTable(str(tmp_path / "one"))
    t.commit([t.write_partition(
        spark.createDataFrame(_pdf(0, 10)).coalesce(1), "z=0")], "r1")
    v = t.current_version()
    assert t.compact(spark, "z=0", "rc") == v  # no new snapshot


def test_expire_reclaims_replaced_files_only(spark, table):
    v_pre = table.current_version()
    table.compact(spark, "z=0", "rc")
    pre_files, _ = table.plan_files(version=v_pre)
    cur_files, _ = table.plan_files()

    dead = table.expire_before(table.current_version())
    # exactly the 6 replaced z=0 files die; every current file survives
    assert len(dead) == 6
    assert all(os.path.exists(p) for p in cur_files)
    gone = set(pre_files) - set(cur_files)
    assert gone and all(not os.path.exists(p) for p in gone)
    # current read unaffected; expiry is idempotent
    assert table.read(spark).count() == 80
    assert table.expire_before(table.current_version()) == []


def test_expire_keeps_files_referenced_by_kept_versions(spark, table):
    """Expiring before v2 must keep v1's files: v2 and v3 (append-only)
    still reference them through the parent chain."""
    assert table.expire_before(2) == []
    assert table.read(spark, version=2).count() == 60


def test_remove_orphans(spark, table):
    part_dir = os.path.join(table.data_dir, "z=0")
    stray = os.path.join(part_dir, "stray.parquet")
    with open(stray, "wb") as f:
        f.write(b"not really parquet")
    os.makedirs(os.path.join(table.path, "_staging-dead"), exist_ok=True)

    removed = table.remove_orphans(older_than_s=0)
    assert any("stray.parquet" in r for r in removed)
    assert any(r.startswith("_staging-") for r in removed)
    assert not os.path.exists(stray)
    # every committed file survives and the table still reads
    for r in table.manifest_rows():
        assert os.path.exists(os.path.join(table.path, r["file"]))
    assert table.read(spark).count() == 80


def test_compacted_table_filters_correctly(spark, table):
    """End-to-end: compact + stats + where-pruning compose — a range
    query over the compacted partition returns the same rows as a full
    scan filter."""
    table.compact(spark, "z=0", "rc", stats_cols=["cell"])
    pruned = (table.read(spark, where={"cell": (10, 20)})
              .filter(F.col("cell").between(10, 20)))
    full = table.read(spark).filter(F.col("cell").between(10, 20))
    assert sorted(r.val for r in pruned.collect()) == \
           sorted(r.val for r in full.collect())


def test_maintain_table_job(spark, table, tmp_path):
    """EP-5 CLI end-to-end on an in-session SparkSession: compact-all +
    expire + orphan sweep, one JSON-able report, table reads unchanged."""
    import jobs.maintain_table as M

    before = sorted(r.cell for r in table.read(spark).collect())
    args = M.build_args(["--table", table.path, "--compact-all",
                         "--stats-cols", "cell", "--expire",
                         "--remove-orphans"])
    rep = M.run(args, spark=spark, stop_session=False)
    assert rep["compacted"]["z=0"]["files_before"] == 6
    assert rep["compacted"]["z=0"]["files_after"] == 1
    assert rep["expired"] >= 6  # the replaced z=0 (+z=1) files reclaimed
    after = sorted(r.cell for r in table.read(spark).collect())
    assert after == before
    import json as _json
    _json.dumps(rep)  # schedulable: report is one JSON line


def test_optimistic_commit_never_clobbers(spark, tmp_path):
    """Iceberg-style commit protocol: an exclusive claim on vN.json plus
    an advisory hint. A regressed hint (simulated racer) must neither
    clobber an existing snapshot nor fork the chain — the next commit
    walks forward and lands on a fresh version with the true parent."""
    import os as _os
    from geopy_spark.sources.icetab import _claim_exclusive

    t = IceTable(str(tmp_path / "occ"))
    t.commit([t.write_partition(spark.createDataFrame(_pdf(0, 10)), "z=0")], "r1")
    t.commit([t.write_partition(spark.createDataFrame(_pdf(10, 20)), "z=1")], "r2")
    assert t.current_version() == 2

    # regress the hint as a racing writer's stale flip would
    with open(_os.path.join(t.meta_dir, "version-hint.txt"), "w") as f:
        f.write("1")
    assert t.current_version() == 2  # forward walk heals the hint
    v = t.commit([t.write_partition(
        spark.createDataFrame(_pdf(20, 30)), "z=2")], "r3")
    assert v == 3 and t.snapshot(3)["parent"] == 2
    assert t.read(spark).count() == 30  # nothing lost, chain intact

    # the claim primitive itself: second writer loses, content preserved
    p = str(tmp_path / "claim.json")
    assert _claim_exclusive(p, "winner") is True
    assert _claim_exclusive(p, "loser") is False
    assert open(p).read() == "winner"


def test_orphan_manifest_sweep(spark, tmp_path):
    """A commit attempt killed between manifest write and version claim
    leaves an unreferenced manifest; remove_orphans deletes exactly it."""
    import os as _os

    t = IceTable(str(tmp_path / "om"))
    t.commit([t.write_partition(spark.createDataFrame(_pdf(0, 10)), "z=0")], "r1")
    stray = _os.path.join(t.manifest_dir, "snap-deadbeef.parquet")
    real = [t.snapshot(1)["manifest"]]
    import pyarrow as _pa
    import pyarrow.parquet as _pq
    _pq.write_table(_pa.table({"partition": ["z=9"], "file": ["x"],
                               "rows": [0], "stats": [None]}), stray)
    removed = t.remove_orphans(older_than_s=0)
    assert ["manifests/snap-deadbeef.parquet"] == removed
    assert all(_os.path.exists(_os.path.join(t.path, m)) for m in real)
    assert t.read(spark).count() == 10


def test_concurrent_commits_stress():
    """20 committers × 2 threads racing on one table: every commit must
    land on its own version (exclusive claim), the chain must stay
    linear and complete, and no manifest may be lost — the scenario the
    round-2 single-writer discipline could not survive. Pure metadata
    path: pendings are synthetic, no Spark needed."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    with tempfile.TemporaryDirectory() as d:
        t = IceTable(d)

        def committer(tag):
            got = []
            for i in range(20):
                pending = {"deltas": [{"partition": f"p={tag}-{i}",
                                       "file": f"data/p={tag}-{i}/f.parquet",
                                       "rows": 1, "stats": None}],
                           "lineage": {"partition": f"p={tag}-{i}",
                                       "rows_out": 1, "wall_ms": 0,
                                       "n_files": 1}}
                got.append(t.commit([pending], f"run-{tag}"))
            return got

        with ThreadPoolExecutor(2) as ex:
            a, b = ex.map(committer, ["a", "b"])

        # every commit owns a distinct version, nothing clobbered
        assert sorted(list(a) + list(b)) == list(range(1, 41))
        assert t.current_version() == 40
        # the parent chain is linear and every delta is reachable
        manifests = set()
        for v in range(1, 41):
            snap = t.snapshot(v)
            assert snap["parent"] == v - 1
            manifests.add(snap["manifest"])
        assert len(manifests) == 40
        parts = {r["partition"] for r in t.manifest_rows()}
        assert len(parts) == 40
        assert t.committed_partitions() == parts


def test_schema_evolution_read(spark):
    """Iceberg add-column parity: later snapshots may add columns;
    merge_schema=True reads union the schemas (old files null-fill),
    plain reads and time travel keep the original shape."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        t = IceTable(d)
        t.commit([t.write_partition(
            spark.createDataFrame(_pdf(0, 10)), "z=0")], "r1")
        with_extra = spark.createDataFrame(
            pd.DataFrame({"cell": range(10, 20), "val": range(10, 20),
                          "lang": ["en"] * 10}))
        t.commit([t.write_partition(with_extra, "z=1")], "r2")

        merged = t.read(spark, merge_schema=True)
        assert set(merged.columns) == {"cell", "val", "lang"}
        assert merged.count() == 20
        assert merged.filter(F.col("lang").isNull()).count() == 10  # old files
        assert merged.filter(F.col("lang") == "en").count() == 10
        # time travel predates the column entirely
        assert set(t.read(spark, version=1, merge_schema=True).columns) \
            == {"cell", "val"}


def test_replace_commit_conflict_detected(spark, table):
    """ADVICE r3 (high): an append to partition P landing between a
    compaction's plan-read and its commit must NOT be silently shadowed.
    commit(replaced_partitions=[P], base_version=...) raises
    CommitConflict, and the concurrently-appended rows stay visible."""
    from geopy_spark.sources.icetab import CommitConflict

    base = table.current_version()
    pending = table.write_partition(
        spark.read.parquet(*[os.path.join(table.path, r["file"])
                             for r in table.manifest_rows()
                             if r["partition"] == "z=0"]).coalesce(1), "z=0")
    # racer appends to z=0 AFTER the rewrite planned its file set
    table.commit([table.write_partition(
        spark.createDataFrame(_pdf(100, 110)), "z=0")], "racer")

    with pytest.raises(CommitConflict):
        table.commit([pending], "rc", replaced_partitions=["z=0"],
                     base_version=base)
    # racer's rows survive; aborted rewrite published nothing
    cells = sorted(r.cell for r in table.read(spark).collect())
    assert cells == sorted(list(range(80)) + list(range(100, 110)))


def test_compact_replans_on_conflict(spark, table, monkeypatch):
    """compact() retries the whole rewrite from the new head when a racer
    appends mid-rewrite: final state = one compacted file set INCLUDING
    the racer's rows, nothing lost or later expirable."""
    orig_write = table.write_partition
    raced = {"done": False}

    def racing_write(df, partition, stats_cols=None):
        pending = orig_write(df, partition, stats_cols)
        if not raced["done"]:
            raced["done"] = True  # inject exactly one concurrent append
            table.commit([orig_write(
                df.sparkSession.createDataFrame(_pdf(100, 110)), "z=0")],
                "racer")
        return pending

    monkeypatch.setattr(table, "write_partition", racing_write)
    table.compact(spark, "z=0", "rc")
    cells = sorted(r.cell for r in table.read(spark).collect())
    assert cells == sorted(list(range(80)) + list(range(100, 110)))
    # racer's delta was folded into the re-planned rewrite
    table.expire_before(table.current_version())
    cells2 = sorted(r.cell for r in table.read(spark).collect())
    assert cells2 == cells


def test_replace_commit_requires_base_version(spark, table):
    pending = table.write_partition(
        spark.createDataFrame(_pdf(0, 5)), "z=0")
    with pytest.raises(ValueError, match="base_version"):
        table.commit([pending], "rc", replaced_partitions=["z=0"])


def test_remove_orphans_age_horizon_protects_inflight(spark, table):
    """ADVICE r3 (medium): files a live writer staged into data/ before
    its commit look orphaned; the default age horizon must skip them so
    the writer's later commit stays valid."""
    pending = table.write_partition(
        spark.createDataFrame(_pdf(200, 210)), "z=0")
    # maintenance runs with the default 3-day horizon while the writer
    # is mid-flight: the fresh uncommitted files must survive
    removed = table.remove_orphans()
    assert removed == []
    for d in pending["deltas"]:
        assert os.path.exists(os.path.join(table.path, d["file"]))
    table.commit([pending], "writer")
    assert table.read(spark).count() == 90
