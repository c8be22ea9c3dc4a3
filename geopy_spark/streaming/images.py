"""Streaming image ingest (S-series × I-series composition): the
image+caption table of the task brief arriving as a file stream, with
in-flight payload fingerprinting and exact-duplicate collapse.

At ingest scale the cheapest place to kill exact duplicates is BEFORE
they land in the table: the stream recomputes the payload fingerprint
(never trusting a producer-supplied hash) and drops repeats inside the
watermark horizon with Spark's stateful streaming dedup — state is one
small key per distinct image bounded by the watermark, not the payload.
Near-duplicate collapse (Hamming-ball phash LSH) stays a batch operator
(operators/dedup.image_neardup_pairs): it needs cross-row joins that
streaming state can't express cheaply, which is exactly the
lambda-architecture split the engine documents.

The payload column never enters a shuffle: phash is a narrow Arrow-batch
projection, and the dedup state key is the 8-byte hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

from ..operators.images import phash_udf

# input_hint schema (BASELINE.json) + ingest event time
IMAGE_STREAM_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("ts", TimestampType()),
    StructField("bytes", BinaryType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("fmt", StringType()),
    StructField("caption", StringType()),
    StructField("phash", LongType()),
])


def image_stream_source(spark: SparkSession, src_dir: str,
                        max_files_per_trigger: int | None = None) -> DataFrame:
    """S1 over image rows: file stream of image+caption parquet."""
    r = spark.readStream.schema(IMAGE_STREAM_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(src_dir)


def fingerprint_stream(stream: DataFrame) -> DataFrame:
    """Replace the producer-supplied phash with one recomputed from the
    payload (trust boundary: corrupt/forged hashes never reach dedup
    state or the table), keeping the original for drift reporting."""
    return (stream
            .withColumnRenamed("phash", "phash_claimed")
            .withColumn("phash", phash_udf(F.col("bytes"), F.col("fmt"),
                                           F.col("w"), F.col("h"))))


def dedup_images_stream(stream: DataFrame, watermark: str = "1 hour",
                        key: str = "sha") -> DataFrame:
    """S5 on a recomputed payload fingerprint, one survivor per key
    within the watermark horizon, across micro-batches and restarts.

    ``key="sha"`` (default): sha2-256 of the payload bytes — byte-exact
    duplicate collapse, zero false merges. ``key="phash"``: perceptual
    collapse — re-encodes and visually-identical variants of the same
    image fold too, at the cost of (rare) 64-bit perceptual collisions
    merging distinct images; choose it only when that trade is wanted."""
    fp = fingerprint_stream(stream)
    if key == "sha":
        fp = fp.withColumn("_k", F.sha2(F.col("bytes"), 256))
    elif key == "phash":
        fp = fp.withColumn("_k", F.col("phash"))
    else:
        raise ValueError(f"dedup key must be 'sha' or 'phash', got {key!r}")
    return (fp.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["_k"])
            .drop("_k"))
