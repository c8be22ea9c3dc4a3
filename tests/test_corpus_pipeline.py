"""EP-4 corpus pipeline: end-to-end over planted fixtures, an independent
DuckDB twin for the stats stage (via the functions/text *_sql twins), and
kill-resume byte-equality — same discipline as test_icetab_pipeline."""

import os
import subprocess
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geopy_spark.functions import text as T
from geopy_spark.sources.icetab import IceTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# planted rows: known outcomes under --min-quality 0.5 --threshold 0.5
EXACT_DUP_OF = 3      # same fingerprint (case+whitespace changed) → dropped
NEAR_DUP_OF = 5       # text + short tail → Jaccard≈1 → dropped (b of pair)
GARBAGE_ID = 100009   # pure punctuation → quality 0.3333 < 0.5 → dropped


@pytest.fixture(scope="module")
def docs_path(tmp_path_factory):
    base = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pandas()
    t3 = base.loc[base.doc_id == EXACT_DUP_OF, "text"].iloc[0]
    t5 = base.loc[base.doc_id == NEAR_DUP_OF, "text"].iloc[0]
    planted = pd.DataFrame({
        "doc_id": [100003, 100005, GARBAGE_ID],
        "text": [" " + t3.upper() + "  ",          # fp-identical to doc 3
                 t5 + " extra tail words here",    # near-dup of doc 5
                 "!!!???;;;###$$$%%%&&&***((()))"],
        "lang": ["xx", "xx", "xx"],
        "source": ["planted"] * 3,
    })
    planted["n_chars"] = planted["text"].str.len()
    pdf = pd.concat([base, planted], ignore_index=True)
    p = tmp_path_factory.mktemp("data") / "documents.parquet"
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), str(p))
    return str(p)


def _run_pipeline(docs_path, out_dir, extra):
    cmd = [sys.executable, os.path.join(REPO, "jobs", "corpus_pipeline.py"),
           "--input", docs_path, "--output", out_dir,
           "--min-quality", "0.5", "--cores", "4"] + extra
    return subprocess.run(cmd, capture_output=True, text=True,
                          cwd=REPO, timeout=600)


def _table_state(spark, out_dir):
    t = IceTable(out_dir)
    return {part: sorted(tuple(r) for r in
                         t.read_partition(spark, part).collect())
            for part in sorted(t.committed_partitions())}


@pytest.fixture(scope="module")
def golden(spark, docs_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gold") / "corpus")
    r = _run_pipeline(docs_path, out, [])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    return out, _table_state(spark, out)


def test_planted_outcomes(spark, golden):
    out, state = golden
    surv = {row[0] for row in state["survivors"]}
    assert EXACT_DUP_OF in surv and 100003 not in surv     # min-id kept
    assert NEAR_DUP_OF in surv and 100005 not in surv      # pair's b dropped
    assert GARBAGE_ID not in surv                          # quality filter
    # exact_dups recorded the planted fp group with the canonical min id
    groups = {(row[1], row[2]) for row in state["exact_dups"]}
    assert (EXACT_DUP_OF, 2) in groups
    # near_pairs found the planted pair with high exact Jaccard
    pairs = {(row[0], row[1]) for row in state["near_pairs"]}
    assert (NEAR_DUP_OF, 100005) in pairs


def test_stats_match_duckdb_twin(spark, golden, docs_path):
    """Stage-5 integrity: recompute per-language survivor stats in DuckDB
    from raw text using the cross-engine *_sql twins — catches row loss or
    column drift anywhere in the snapshot chain."""
    out, state = golden
    surv_ids = sorted(row[0] for row in state["survivors"])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs AS SELECT * FROM '{docs_path}'")
    twin = con.execute(f"""
        SELECT {T.lang_id_sql('text')} AS lang,
               count(*) AS n_docs,
               sum({T.token_count_sql('text')}) AS sum_tokens,
               sum({T.bpe_token_count_sql('text')}) AS sum_bpe_tokens,
               round(avg({T.quality_score_sql('text')}), 6) AS avg_quality
        FROM docs WHERE doc_id IN ({','.join(map(str, surv_ids))})
        GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert sorted(state["stats"]) == sorted(tuple(r) for r in twin)


def test_kill_resume_byte_identical(spark, golden, docs_path, tmp_path):
    out_dir = str(tmp_path / "resumed")
    r1 = _run_pipeline(docs_path, out_dir, ["--fail-after", "near_pairs"])
    assert r1.returncode == 42
    mid = IceTable(out_dir).committed_partitions()
    assert "near_pairs" in mid and "survivors" not in mid
    r2 = _run_pipeline(docs_path, out_dir, ["--resume"])
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert _table_state(spark, out_dir) == golden[1]
    lin = (IceTable(out_dir).lineage(spark)
           .groupBy("partition").count().collect())
    assert all(row["count"] == 1 for row in lin)  # no partition rewritten


def test_refuses_accidental_overwrite(golden, docs_path):
    out, _ = golden
    assert _run_pipeline(docs_path, out, []).returncode != 0


def test_exact_components_flag_agrees_on_pair_fixture(spark, golden,
                                                      docs_path, tmp_path):
    """--exact-components equals the min-id rule whenever duplicate
    clusters are plain pairs (this fixture); chain-shaped divergence is
    covered by tests/test_graph.py. Also pins the param-drift guard:
    resuming a min-id table with the flag flipped must refuse."""
    out = str(tmp_path / "exact")
    r = _run_pipeline(docs_path, out, ["--exact-components"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    exact_surv = {row[0] for row in _table_state(spark, out)["survivors"]}
    assert exact_surv == {row[0] for row in golden[1]["survivors"]}
    r2 = _run_pipeline(docs_path, golden[0], ["--exact-components", "--resume"])
    assert r2.returncode != 0 and "mismatch" in (r2.stdout + r2.stderr)
