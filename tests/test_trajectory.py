"""Trajectory analytics (G24) vs an independent pandas/numpy twin."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from geopy_spark.kernels.geodesy import haversine_m
from geopy_spark.operators.trajectory import split_trips, trajectory_stats

UTC = dt.timezone.utc


def _ts(s):
    return dt.datetime.fromtimestamp(1_700_000_000 + s, tz=UTC)


def _fixture():
    """Three entities: a mover with irregular gaps (incl. a same-second
    tie broken by ping id), a single-ping entity, and a stationary
    two-ping entity (path 0, duration > 0)."""
    rows = [
        # entity 1: 5 pings, gaps 10/50/0(tie)/240 s
        (1, 1, _ts(0), 52.00, 13.00),
        (1, 2, _ts(10), 52.01, 13.00),
        (1, 3, _ts(60), 52.01, 13.05),
        (1, 4, _ts(60), 52.02, 13.05),   # same second as ping 3
        (1, 5, _ts(300), 52.10, 13.20),
        # entity 2: single ping
        (2, 6, _ts(40), -10.0, 100.0),
        # entity 3: stationary
        (3, 7, _ts(0), 0.0, 0.0),
        (3, 8, _ts(500), 0.0, 0.0),
    ]
    return rows


def _brute_stats(rows):
    out = {}
    by_e = {}
    for e, pid, ts, la, lo in rows:
        by_e.setdefault(e, []).append((int(ts.timestamp()), pid, la, lo))
    for e, pings in by_e.items():
        pings.sort()
        legs = [float(haversine_m(np.array([a[2]]), np.array([a[3]]),
                                  np.array([b[2]]), np.array([b[3]]))[0])
                for a, b in zip(pings, pings[1:])]
        gaps = [b[0] - a[0] for a, b in zip(pings, pings[1:])]
        path = sum(legs)
        dur = sum(gaps)
        out[e] = (len(pings), round(path, 6), dur,
                  round(path / dur, 6) if dur > 0 else None,
                  max(gaps) if gaps else None)
    return out


def test_trajectory_stats_matches_twin(spark):
    rows = _fixture()
    df = spark.createDataFrame(
        rows, "entity_id long, ping_id long, ts timestamp, "
              "lat double, lon double")
    got = {r.entity_id: (r.n_pings, round(r.path_m, 6), r.duration_s,
                         round(r.avg_speed_ms, 6)
                         if r.avg_speed_ms is not None else None,
                         r.max_gap_s)
           for r in trajectory_stats(df, tiebreak_col="ping_id").collect()}
    assert got == _brute_stats(rows)


def test_trajectory_stats_tiebreak_deterministic(spark):
    """The same-second pings of entity 1 must order by ping id: swapping
    the tie's coordinates changes path_m (i.e. the tie IS exercised),
    while repeated runs agree exactly."""
    rows = _fixture()
    df = spark.createDataFrame(
        rows, "entity_id long, ping_id long, ts timestamp, "
              "lat double, lon double")
    a = trajectory_stats(df, tiebreak_col="ping_id") \
        .filter("entity_id = 1").first().path_m
    b = trajectory_stats(df, tiebreak_col="ping_id") \
        .filter("entity_id = 1").first().path_m
    assert a == b
    swapped = [(e, 7 - p if p in (3, 4) else p, ts, la, lo)
               for e, p, ts, la, lo in rows]
    df2 = spark.createDataFrame(
        swapped, "entity_id long, ping_id long, ts timestamp, "
                 "lat double, lon double")
    c = trajectory_stats(df2, tiebreak_col="ping_id") \
        .filter("entity_id = 1").first().path_m
    assert abs(a - c) > 1.0  # meters — the tie order genuinely matters


def test_split_trips_and_per_trip_stats(spark):
    rows = _fixture()
    df = spark.createDataFrame(
        rows, "entity_id long, ping_id long, ts timestamp, "
              "lat double, lon double")
    trips = split_trips(df, 120, tiebreak_col="ping_id")
    got = {r.ping_id: r.trip_id for r in trips.collect()}
    # entity 1: the 240 s gap before ping 5 starts trip 1
    assert got == {1: 0, 2: 0, 3: 0, 4: 0, 5: 1, 6: 0, 7: 0, 8: 1}
    # per-trip stats compose through a struct entity key
    per_trip = trajectory_stats(
        trips.withColumn("e", F.struct("entity_id", "trip_id")),
        entity_col="e", tiebreak_col="ping_id")
    n = {(r.e.entity_id, r.e.trip_id): r.n_pings for r in per_trip.collect()}
    assert n == {(1, 0): 4, (1, 1): 1, (2, 0): 1, (3, 0): 1, (3, 1): 1}


def test_trajectory_stats_plan_single_shuffle(spark):
    """The whole operator is one entity-partition window + its groupBy on
    the SAME key — Catalyst must plan exactly one Exchange."""
    df = spark.createDataFrame(
        _fixture(), "entity_id long, ping_id long, ts timestamp, "
                    "lat double, lon double")
    plan = trajectory_stats(df, tiebreak_col="ping_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_stay_points(spark):
    """Speed-run dwell detection: a walker dwells twice (only the long
    dwell survives min_duration), moves fast between; the dwell covers
    the anchor ping, centroid averages anchor + destinations."""
    from geopy_spark.operators.trajectory import stay_points

    # entity 1: dwell A (4 pings over 900 s at ~0 m), fast hop, dwell B
    # (2 pings over 60 s — under min_duration), fast tail
    rows = [
        (1, 1, _ts(0), 10.0000, 20.0000),
        (1, 2, _ts(300), 10.0001, 20.0000),    # ~11 m in 300 s — slow
        (1, 3, _ts(600), 10.0000, 20.0001),    # slow
        (1, 4, _ts(900), 10.0001, 20.0001),    # slow
        (1, 5, _ts(1000), 10.5000, 20.5000),   # ~78 km in 100 s — fast
        (1, 6, _ts(1060), 10.5001, 20.5000),   # slow but only 60 s
        (1, 7, _ts(1100), 11.0000, 21.0000),   # fast
    ]
    df = spark.createDataFrame(
        rows, "entity_id long, ping_id long, ts timestamp, "
              "lat double, lon double")
    got = stay_points(df, max_speed_ms=1.0, min_duration_s=300,
                      tiebreak_col="ping_id").collect()
    assert len(got) == 1
    s = got[0]
    assert s.entity_id == 1
    assert s.start_epoch_s == 1_700_000_000
    assert s.end_epoch_s == 1_700_000_900
    assert s.duration_s == 900 and s.n_pings == 4
    assert abs(s.lat - (10.0000 + 10.0001 + 10.0000 + 10.0001) / 4) < 1e-9
    assert abs(s.lon - (20.0000 + 20.0000 + 20.0001 + 20.0001) / 4) < 1e-9


def test_stay_points_zero_gap_and_per_entity(spark):
    """Zero-duration legs count as slow (they cannot exceed any speed);
    islands are per-entity."""
    from geopy_spark.operators.trajectory import stay_points

    rows = [
        (1, 1, _ts(0), 0.0, 0.0),
        (1, 2, _ts(0), 0.0, 0.00001),   # same second — slow by rule
        (1, 3, _ts(400), 0.0, 0.00002),  # slow
        (2, 4, _ts(0), 5.0, 5.0),
        (2, 5, _ts(500), 9.0, 9.0),     # fast — no dwell for entity 2
    ]
    df = spark.createDataFrame(
        rows, "entity_id long, ping_id long, ts timestamp, "
              "lat double, lon double")
    got = {r.entity_id: r for r in stay_points(
        df, max_speed_ms=1.0, min_duration_s=300,
        tiebreak_col="ping_id").collect()}
    assert list(got) == [1]
    assert got[1].n_pings == 3 and got[1].duration_s == 400
