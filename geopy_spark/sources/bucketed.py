"""Bucketed tables (SURVEY.md §2.1 R6 second half): `bucketBy` on write
pre-partitions BOTH sides of a recurring big⋈big equi-join by the join
key, so the join needs NO shuffle at read time — the canonical 100 TB
answer for fact⋈fact joins that repeat on the same key (e.g. image_id
across snapshot generations, cell id across epochs). The shuffle is paid
ONCE at write; every subsequent join, aggregation, or sort-merge on the
bucket key reads co-located, pre-sorted buckets.

Bucketed output requires the session catalog (`saveAsTable`); use
`ensure_database(spark, name, location)` to keep table files out of the
repo tree. Plan discipline is asserted in
tests/test_bucketed.py::test_bucketed_join_is_shuffle_free — the
SortMergeJoin shows ZERO Exchange nodes and no per-side Sort (buckets are
written pre-sorted)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, name: str, location: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")


def write_bucketed(df: DataFrame, table_fqn: str, key: str, *,
                   n_buckets: int = 16, sorted_by_key: bool = True) -> None:
    """One-time shuffle: hash-bucket (and pre-sort) by the join key.
    n_buckets must match on both sides of a future join for the
    shuffle-free plan; pick it for the TARGET scale (buckets are files
    per bucket id — at 100 TB use O(10^3-10^4) buckets so each bucket
    stays executor-memory-sized)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sorted_by_key:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table_fqn)


def bucketed_join(spark: SparkSession, left_fqn: str, right_fqn: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key: Catalyst sees
    matching output partitionings and elides both Exchanges (and both
    Sorts when written sorted_by_key)."""
    return spark.table(left_fqn).join(spark.table(right_fqn), key, how)
