"""icetab snapshot isolation + atomic commit + kill-resume equivalence
(SURVEY.md §5.2 item 4; north_rule resumable-checkpoint requirement)."""

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from geopy_spark import synth
from geopy_spark.sources.icetab import IceTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def images_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "images.parquet"
    synth.write_images_parquet(str(p), 400)
    return str(p)


def test_snapshot_isolation_and_commit(spark, tmp_path):
    t = IceTable(str(tmp_path / "t1"))
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    pend = t.write_partition(df, "p=0")
    # not committed yet → invisible
    with pytest.raises(FileNotFoundError):
        t.read(spark)
    v = t.commit([pend], run_id="r1")
    assert v == 1
    assert t.read(spark).count() == 100
    assert t.committed_partitions() == {"p=0"}
    # second snapshot appends a partition; first stays intact
    t.append(spark.range(50).withColumn("v", F.col("id")), "p=1", "r1")
    assert t.current_version() == 2
    assert t.read(spark).count() == 150
    assert t.read_partition(spark, "p=0").count() == 100
    # lineage has one row per partition-commit with the right counts
    lin = {(r.partition, r.rows_out, r.snapshot_id) for r in t.lineage(spark).collect()}
    assert lin == {("p=0", 100, 1), ("p=1", 50, 2)}


def _run_pipeline(images_path, out_dir, extra):
    cmd = [sys.executable, os.path.join(REPO, "jobs", "tile_pipeline.py"),
           "--input", images_path, "--output", out_dir,
           "--zmax", "5", "--level", "6", "--cores", "4"] + extra
    return subprocess.run(cmd, capture_output=True, text=True,
                          cwd=REPO, timeout=600)


def _table_state(spark, out_dir):
    t = IceTable(out_dir)
    state = {}
    for part in sorted(t.committed_partitions()):
        rows = t.read_partition(spark, part).collect()
        state[part] = sorted(tuple(r) for r in rows)
    return state


def test_pipeline_end_to_end_and_kill_resume(spark, images_path, tmp_path):
    golden_dir = str(tmp_path / "golden")
    r = _run_pipeline(images_path, golden_dir, [])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    golden = _table_state(spark, golden_dir)
    assert set(golden) == {"join_pairs"} | {f"z={z}" for z in range(6)}
    # count conservation up the pyramid
    n = 400
    for z in range(6):
        assert sum(row[3] for row in golden[f"z={z}"]) == n

    # killed run: fault-inject an os._exit(42) right after the leaf commit
    resumed_dir = str(tmp_path / "resumed")
    r1 = _run_pipeline(images_path, resumed_dir, ["--fail-after", "z=5"])
    assert r1.returncode == 42
    t = IceTable(resumed_dir)
    committed_mid = t.committed_partitions()
    assert "z=5" in committed_mid and "z=4" not in committed_mid

    # resume: completes only the remaining partitions
    r2 = _run_pipeline(images_path, resumed_dir, ["--resume"])
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert _table_state(spark, resumed_dir) == golden  # byte-identical rows
    # the resumed run did NOT rewrite already-committed partitions
    lin = IceTable(resumed_dir).lineage(spark).groupBy("partition").count().collect()
    assert all(row["count"] == 1 for row in lin)


def test_refuses_accidental_overwrite(images_path, tmp_path):
    out = str(tmp_path / "t2")
    assert _run_pipeline(images_path, out, []).returncode == 0
    r = _run_pipeline(images_path, out, [])
    assert r.returncode != 0  # must demand --resume


def test_verify_sampling_keeps_data_checks_full(tmp_path):
    """--verify-sample k samples only the encode-decode ROUNDTRIP (code
    property) checks; the per-row DATA checks stay full-coverage — a
    corrupted caption must be caught even at k=8, and the sampled
    roundtrip count is reported, never silent."""
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq

    img_path = str(tmp_path / "images.parquet")
    pdf = synth.make_images_pdf(120)
    pq.write_table(pa.Table.from_pandas(pdf), img_path)

    ok_dir = str(tmp_path / "ok")
    r = _run_pipeline(img_path, ok_dir, ["--verify", "--verify-sample", "8"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "roundtrip checks sampled" in r.stdout  # visible, not silent

    bad_dir = str(tmp_path / "bad")
    r1 = _run_pipeline(img_path, bad_dir,
                       ["--verify", "--verify-sample", "8",
                        "--fail-after", "digests"])
    assert r1.returncode == 42
    pdf2 = pdf.copy()
    pdf2.loc[11, "caption"] = "swapped caption, still a valid string"
    pq.write_table(pa.Table.from_pandas(pdf2), img_path)
    r2 = _run_pipeline(img_path, bad_dir,
                       ["--verify", "--verify-sample", "8", "--resume"])
    assert r2.returncode != 0
    assert "invariant violated" in (r2.stdout + r2.stderr)


def test_verify_gate_catches_corrupted_caption(tmp_path):
    """I6 as a real invariant: snapshot caption digests at ingest, then
    corrupt ONE caption (still a valid string) before the verify stage —
    the --verify gate must fail (the round-1 isinstance check passed this)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    img_path = str(tmp_path / "images.parquet")
    pdf = synth.make_images_pdf(60)
    pq.write_table(pa.Table.from_pandas(pdf), img_path)

    # happy path: clean input passes the full verify gate
    ok_dir = str(tmp_path / "ok")
    r = _run_pipeline(img_path, ok_dir, ["--verify"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    # corruption path: commit digests, kill, swap in a corrupted caption at
    # the same input path, resume — verify must now refuse
    bad_dir = str(tmp_path / "bad")
    r1 = _run_pipeline(img_path, bad_dir, ["--verify", "--fail-after", "digests"])
    assert r1.returncode == 42
    pdf2 = pdf.copy()
    pdf2.loc[7, "caption"] = pdf2.loc[7, "caption"] + " corrupted"
    pq.write_table(pa.Table.from_pandas(pdf2), img_path)
    r2 = _run_pipeline(img_path, bad_dir, ["--verify", "--resume"])
    assert r2.returncode != 0
    assert "invariant violated" in (r2.stdout + r2.stderr)
