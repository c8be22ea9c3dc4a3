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


def stay_points(pings: DataFrame, *, max_speed_ms: float,
                min_duration_s: int, entity_col: str = "entity_id",
                ts_col: str = "ts", tiebreak_col: str | None = None,
                lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Dwell detection: maximal runs of consecutive SLOW legs (leg speed
    < ``max_speed_ms``; zero-duration legs count as slow) lasting at
    least ``min_duration_s`` seconds. Returns one row per stay:
    (entity, stay_id, start_ts, end_ts, duration_s, n_pings, lat, lon)
    with lat/lon the arithmetic centroid of the dwell's pings.

    This is the speed-run variant of stay-point mining (order-free and
    exactly SQL-expressible), not Li et al.'s anchor-based scan — the
    anchor walk is inherently sequential and scan-order-dependent, which
    a distributed run cannot reproduce deterministically. Same shape as
    the other G24 ops: gap-and-islands over one entity window (running
    sum of fast-leg breaks numbers the islands), then one groupBy on the
    (entity, island) key — two shuffles total, the second key-compatible
    with the first."""
    legs = _legs(pings, entity_col, ts_col, tiebreak_col, lat_col, lon_col)
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    slow = (F.col("_leg_m")
            < F.lit(float(max_speed_ms)) * F.col("_gap_s").cast("double")) \
        | (F.col("_gap_s") == 0)
    # a FAST leg (or the entity's first ping, _gap_s null) starts a new
    # island; islands of slow legs are the dwell candidates
    brk = F.when(slow, 0).otherwise(1)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    runs = (legs
            .withColumn("_isle", F.sum(brk).over(w))
            .withColumn("_slow", slow))
    # a dwell covers the ANCHOR ping (the one the island's first slow leg
    # departs from — carried on that leg's row as the lagged ts/coords)
    # plus the destination ping of every slow leg; the struct-min pulls
    # the island's earliest leg and with it the anchor's epoch/coords
    anchor = F.min(F.struct(
        (epoch - F.col("_gap_s")).alias("e"),
        F.col("_plat").alias("la"), F.col("_plon").alias("lo")))
    grp = runs.filter(F.col("_slow")).groupBy(entity_col, "_isle").agg(
        anchor.alias("_a"),
        F.max(epoch).alias("end_e"),
        F.count("*").alias("_n_legs"),
        F.sum(lat_col).alias("_lat_sum"),
        F.sum(lon_col).alias("_lon_sum"))
    n = F.col("_n_legs") + 1
    out = (grp
           .filter(F.col("end_e") - F.col("_a.e")
                   >= F.lit(int(min_duration_s)))
           .select(F.col(entity_col),
                   F.col("_isle").cast("long").alias("stay_id"),
                   F.col("_a.e").alias("start_epoch_s"),
                   F.col("end_e").alias("end_epoch_s"),
                   (F.col("end_e") - F.col("_a.e")).alias("duration_s"),
                   n.cast("long").alias("n_pings"),
                   ((F.col("_lat_sum") + F.col("_a.la")) / n).alias("lat"),
                   ((F.col("_lon_sum") + F.col("_a.lo")) / n).alias("lon")))
    return out
