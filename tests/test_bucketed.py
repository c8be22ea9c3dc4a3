"""Bucketed-table co-located joins (R6): correctness vs a plain join and
the shuffle-free plan guarantee."""

import pytest
from pyspark.sql import functions as F

from geopy_spark.plans.explain import count_shuffle_exchanges, plan_text
from geopy_spark.sources.bucketed import (bucketed_join, ensure_database,
                                          write_bucketed)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("wh"))
    ensure_database(spark, "bdemo", loc)
    a = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 997).alias("va"))
    b = spark.range(0, 20000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 991).alias("vb"))
    write_bucketed(a, "bdemo.ta", "k", n_buckets=8)
    write_bucketed(b, "bdemo.tb", "k", n_buckets=8)
    yield "bdemo.ta", "bdemo.tb"
    spark.sql("DROP DATABASE bdemo CASCADE")


def test_bucketed_join_correct(spark, bucketed_tables):
    ta, tb = bucketed_tables
    got = bucketed_join(spark, ta, tb, "k").orderBy("k").collect()
    assert len(got) == 10000  # every even k matches
    assert all(r.k % 2 == 0 for r in got[:100])
    r0 = got[0]
    assert (r0.va, r0.vb) == (0, 0)


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    """The whole point: with matching bucket counts on the join key, the
    SortMergeJoin reads co-located buckets — ZERO Exchange nodes. A
    non-bucketed copy of the same join must show the shuffles, proving
    the assertion isn't vacuous."""
    ta, tb = bucketed_tables
    # force SMJ (no broadcast) so bucketing is what's being tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bj = bucketed_join(spark, ta, tb, "k")
        plan = plan_text(bj)
        assert "SortMergeJoin" in plan
        assert count_shuffle_exchanges(bj) == 0, plan[:2000]

        plain_a = spark.table(ta).repartition(5)  # break the bucketing
        pj = plain_a.join(spark.table(tb), "k")
        assert count_shuffle_exchanges(pj) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
