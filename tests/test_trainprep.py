"""Training-prep operators (operators/trainprep): concat-and-chunk
sequence packing (exact-fill invariant, shard independence, partitioning
determinism, DuckDB twin) and hash-deterministic mixture sampling."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopy_spark.operators.trainprep import (mixture_sample, pack_report,
                                             pack_sequences)

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 512


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return d.select("doc_id", "lang",
                    F.size(F.split("text", r"\s+")).alias("n_tokens")).persist()


def test_exact_fill_and_conservation(spark, docs):
    packed = pack_sequences(docs, BUDGET, shard_col="lang")
    rep = pack_report(packed, BUDGET, shard_col="lang").toPandas()
    last = rep.sort_values("seq_id").groupby("lang").tail(1)
    full = rep.merge(last, how="left", indicator=True)
    # every non-last sequence per shard holds exactly BUDGET tokens
    assert (full.loc[full["_merge"] == "left_only", "total_tokens"]
            == BUDGET).all()
    assert (rep["total_tokens"] <= BUDGET).all()
    # token conservation: the packed slices sum to the corpus total
    assert (packed.agg(F.sum("tokens_in_seq")).first()[0]
            == docs.agg(F.sum("n_tokens")).first()[0])
    # per-document conservation too (spanning docs split, never dropped)
    per_doc = packed.groupBy("doc_id").agg(
        F.sum("tokens_in_seq").alias("t")).join(docs, "doc_id")
    assert per_doc.filter(F.col("t") != F.col("n_tokens")).count() == 0


def test_deterministic_under_repartition(spark, docs):
    a = pack_sequences(docs, BUDGET, shard_col="lang").collect()
    b = pack_sequences(docs.repartition(13), BUDGET,
                       shard_col="lang").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_packing_matches_duckdb_twin(spark, docs):
    """Independent engine, same schedule: DuckDB computes the identical
    (seq_id, doc_offset, tokens_in_seq) layout from the same window
    prefix-sum + span expansion."""
    got = pack_sequences(docs, BUDGET, shard_col="lang") \
        .select("lang", "seq_id", "doc_id", "doc_offset", "tokens_in_seq") \
        .toPandas()
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.execute(f"""
        WITH pre AS (
          SELECT lang, doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS pre
          FROM docs),
        spans AS (
          SELECT lang, doc_id, n_tokens, pre,
                 UNNEST(generate_series(CAST(pre // {BUDGET} AS BIGINT),
                        CAST((pre + n_tokens - 1) // {BUDGET} AS BIGINT)))
                 AS seq_id
          FROM pre)
        SELECT lang, seq_id, doc_id,
               GREATEST(pre, seq_id * {BUDGET}) - pre AS doc_offset,
               LEAST(pre + n_tokens, (seq_id + 1) * {BUDGET})
                 - GREATEST(pre, seq_id * {BUDGET}) AS tokens_in_seq
        FROM spans
    """).df()
    key = ["lang", "seq_id", "doc_id"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert len(g) == len(e)
    for c in key + ["doc_offset", "tokens_in_seq"]:
        assert (g[c].astype("int64").values
                == e[c].astype("int64").values).all() \
            if c != "lang" else (g[c].values == e[c].values).all(), c


def test_oversized_doc_spans_sequences(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2], "n_tokens": [5, 1300]})
    packed = pack_sequences(spark.createDataFrame(pdf), BUDGET).toPandas()
    big = packed[packed.doc_id == 2].sort_values("seq_id")
    assert len(big) == 3  # 1300 tokens from offset 5 spans 3 sequences
    assert big["tokens_in_seq"].sum() == 1300
    assert list(big["doc_offset"]) == [0, 507, 1019]


def test_mixture_sample_deterministic_and_tagged(spark, docs):
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    mix = mixture_sample({"a": a, "b": b}, {"a": 0.3, "b": 0.9}, seed=7)
    one = mix.groupBy("source").count().toPandas().set_index("source")["count"]
    two = (mixture_sample({"a": a, "b": b}, {"a": 0.3, "b": 0.9}, seed=7)
           .groupBy("source").count().toPandas().set_index("source")["count"])
    assert one.to_dict() == two.to_dict()  # pure function of (id, src, seed)
    na, nb = a.count(), b.count()
    assert abs(one["a"] / na - 0.3) < 0.08  # 500-row sources: loose bounds
    assert abs(one["b"] / nb - 0.9) < 0.08
    # a different seed re-draws (epoch re-mix): overlap is partial
    other = mixture_sample({"a": a, "b": b}, {"a": 0.3, "b": 0.9}, seed=8)
    ids7 = {r.doc_id for r in mix.filter("source='a'").collect()}
    ids8 = {r.doc_id for r in other.filter("source='a'").collect()}
    assert ids7 != ids8 and ids7 & ids8

    with pytest.raises(ValueError, match="weight"):
        mixture_sample({"a": a}, {"a": 1.5})


def test_corpus_pipeline_packing_stage(spark, tmp_path):
    """EP-4 --pack-budget: the opt-in stage 6 commits a 'sequences'
    partition whose layout obeys the exact-fill invariant over the
    pipeline's actual survivor set."""
    import jobs.corpus_pipeline as CP

    out = str(tmp_path / "corpus")
    args = CP.build_args(["--input", f"{SF_DIR}/documents.parquet",
                          "--output", out, "--pack-budget", str(BUDGET),
                          "--cores", "8"])
    res = CP.run(args, spark=spark, stop_session=False)
    assert "sequences" in res["stage_sec"]

    from geopy_spark.sources.icetab import IceTable
    packed = IceTable(out).read_partition(spark, "sequences")
    rep = pack_report(packed, BUDGET, shard_col="lang").toPandas()
    last = rep.sort_values("seq_id").groupby("lang").tail(1)
    non_last = rep.merge(last, how="left", indicator=True)
    assert (non_last.loc[non_last["_merge"] == "left_only", "total_tokens"]
            == BUDGET).all()
    # sequences cover exactly the survivor set
    surv = IceTable(out).read_partition(spark, "survivors")
    assert packed.select("doc_id").distinct().count() == surv.count()


def test_zero_token_docs_emit_no_rows(spark):
    """ADVICE r3: a 0-token doc whose prefix lands exactly on a budget
    boundary must not emit spurious descending-sequence rows. Packing
    with and without the empty docs must be identical."""
    base = pd.DataFrame({"doc_id": [f"d{i:03d}" for i in range(8)],
                         "n_tokens": [4, 4, 0, 4, 4, 0, 0, 3]})
    # budget 8: d002's prefix is exactly 8 (= 1*budget) → the old code's
    # end_bin (floor((8-1)/8)=0) < start_bin (1) triggered the bug
    df = spark.createDataFrame(base)
    packed = pack_sequences(df, 8).toPandas()
    assert set(packed["doc_id"]) == {"d000", "d001", "d003", "d004", "d007"}
    assert (packed["tokens_in_seq"] > 0).all()
    nonzero = spark.createDataFrame(base[base.n_tokens > 0])
    twin = pack_sequences(nonzero, 8).toPandas()
    key = ["seq_id", "doc_id", "doc_offset", "tokens_in_seq", "seq_pos"]
    assert (packed[key].sort_values(key).reset_index(drop=True)
            .equals(twin[key].sort_values(key).reset_index(drop=True)))
    rep = pack_report(pack_sequences(df, 8), 8).toPandas()
    assert int(rep["n_docs"].sum()) == len(packed)
    assert (rep.sort_values("seq_id")["fill_ratio"].iloc[:-1] == 1.0).all()
