"""Trajectory analytics (G24): per-entity movement statistics and trip
segmentation over ping streams — the GPS/AIS/fleet-telemetry workload
(path length, speeds, dwell gaps, trip splits).

Everything here is pure Column algebra — window lag + the JVM-side
haversine (functions/geo.haversine_m) — so the whole operator runs in
whole-stage codegen with exactly ONE shuffle (the window partition by
entity), which is also the natural 100 TB layout: pings land partitioned
by entity/day, the window reuses that partitioning, and no geometry or
payload ever rides wider than (entity, ts, lat, lon).

Ordering is (ts, *tiebreak*) — callers pass a unique ping id as the
tiebreak so same-timestamp pings order deterministically on any cluster
(a bare ts orderBy is nondeterministic under ties and would make leg
distances run-dependent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geo import haversine_m


def _legs(pings: DataFrame, entity_col: str, ts_col: str,
          tiebreak_col: str | None, lat_col: str, lon_col: str):
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    # NTZ parquet timestamps refuse a direct →long cast; the timestamp
    # hop interprets them in the (UTC) session zone, whole seconds
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    return (pings
            .withColumn("_plat", F.lag(lat_col).over(w))
            .withColumn("_plon", F.lag(lon_col).over(w))
            .withColumn("_gap_s", epoch - F.lag(epoch).over(w))
            .withColumn("_leg_m", haversine_m(
                F.col("_plat"), F.col("_plon"),
                F.col(lat_col), F.col(lon_col))))


def trajectory_stats(pings: DataFrame, *, entity_col: str = "entity_id",
                     ts_col: str = "ts", tiebreak_col: str | None = None,
                     lat_col: str = "lat",
                     lon_col: str = "lon") -> DataFrame:
    """pings → one row per entity: (entity, n_pings, path_m, duration_s,
    avg_speed_ms, max_gap_s). path_m sums haversine leg distances in ts
    order; duration_s = last ts − first ts; avg_speed_ms = path/duration
    (null when duration is 0 — single ping or all pings simultaneous);
    max_gap_s is the longest dwell between consecutive pings (null for
    single-ping entities)."""
    legs = _legs(pings, entity_col, ts_col, tiebreak_col, lat_col, lon_col)
    path = F.coalesce(F.sum("_leg_m"), F.lit(0.0))
    dur = F.coalesce(F.sum("_gap_s"), F.lit(0)).cast("long")
    return (legs.groupBy(entity_col)
            .agg(F.count("*").alias("n_pings"),
                 path.alias("path_m"),
                 dur.alias("duration_s"),
                 F.when(dur > 0, path / dur.cast("double"))
                 .alias("avg_speed_ms"),
                 F.max("_gap_s").alias("max_gap_s")))


def split_trips(pings: DataFrame, max_gap_s: int, *,
                entity_col: str = "entity_id", ts_col: str = "ts",
                tiebreak_col: str | None = None, lat_col: str = "lat",
                lon_col: str = "lon") -> DataFrame:
    """Segment each entity's ping stream into trips: a gap of more than
    ``max_gap_s`` seconds between consecutive pings starts a new trip.
    Returns the input rows plus ``trip_id`` (0-based ordinal within the
    entity) — the standard pre-step before per-trip stats, map matching,
    or stay-point mining. Same single entity-window shuffle as
    trajectory_stats; the trip ordinal is a running sum of gap breaks
    over the already-built window (no second shuffle).

    Per-trip stats compose without new code:
    ``trajectory_stats(split_trips(p, g).withColumn("e", struct("entity_id",
    "trip_id")), entity_col="e")``.
    """
    legs = _legs(pings, entity_col, ts_col, tiebreak_col, lat_col, lon_col)
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    brk = F.when(F.col("_gap_s") > max_gap_s, 1).otherwise(0)
    return (legs.withColumn("trip_id", F.sum(brk).over(w).cast("long"))
            .drop("_plat", "_plon", "_gap_s", "_leg_m"))
