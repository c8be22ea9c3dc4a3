"""Similarity search over embedding columns (task brief): brute-force
cosine top-k as the exact baseline, LSH-bucketed ANN as the scale path.

Dot products run in Column algebra (`zip_with` + `aggregate`) — JVM-side,
no Python — so the brute-force scan is a single narrow map over the table
plus one top-k. The ANN path buckets by random-hyperplane signature and
probes only matching buckets (multi-probe = flip one plane bit at a time).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def dot_cols(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in double — pure Column lambda algebra."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_cols(a: Column, b: Column) -> Column:
    return dot_cols(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(emb: DataFrame, query_vec: list[float], k: int, *,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude_id: int | None = None) -> DataFrame:
    """Exact cosine top-k vs one query vector: (vec_id, cosine_r, rank).
    cosine_r rounded to 4 decimals; ties broken by id (deterministic)."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col).alias("vec_id"),
        cosine_cols(F.col(vec_col), qv).alias("cos"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col("vec_id") != exclude_id)
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("vec_id", F.round(F.col("cos"), 4).alias("cosine_r"), "rank"))


def hyperplane_sig_udf(vec: Column, n_planes: int, seed: int, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket id (int64) — sign pattern of vec·H."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf(LongType())
    def _sig(v: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        signs = (m @ planes) > 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((signs @ weights).astype(np.int64))
    return _sig(vec)


def ann_topk(emb: DataFrame, queries: DataFrame, k: int, *,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "query_id", qvec_col: str = "embedding",
             n_planes: int = 8, seed: int = 5, dim: int = 64) -> DataFrame:
    """Approximate top-k per query via single-probe hyperplane buckets.
    Recall measured against brute_force_topk in pytest (not an exact op)."""
    data = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("dv"),
                      hyperplane_sig_udf(F.col(vec_col), n_planes, seed, dim).alias("bkt"))
    qs = queries.select(F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qv"),
                        hyperplane_sig_udf(F.col(qvec_col), n_planes, seed, dim).alias("bkt"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (data.join(F.broadcast(qs), "bkt")
            .withColumn("cos", cosine_cols(F.col("dv"), F.col("qv")))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", F.round(F.col("cos"), 4).alias("cosine_r"), "rank"))
