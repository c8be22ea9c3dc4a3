"""Douglas-Peucker simplification (G21, round 5): the tolerance bound
(every original vertex within tol of the simplified boundary), exactness
below tolerance, monotone reduction on noisy coastlines, and the
operator's schema/bbox contract through Spark."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geopy_spark import synth
from geopy_spark.entry_queries import _REGIONS_SCHEMA
from geopy_spark.kernels.simplify import (max_deviation, simplify_open,
                                          simplify_ring)


def _coastline(n, r0=5.0, seed=1, noise=0.02):
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = r0 * (1 + 0.15 * np.sin(7 * th) + 0.08 * np.sin(29 * th)) \
        + rng.normal(0, noise, n)
    return np.column_stack([r * np.sin(th), r * np.cos(th)])


def test_straight_line_collapses_and_square_survives():
    line = np.column_stack([np.zeros(50), np.linspace(0, 10, 50)])
    assert len(simplify_open(line, 1e-9)) == 2
    sq = np.array([[0, 0], [0, 10], [10, 10], [10, 0]], dtype=float)
    assert np.array_equal(simplify_ring(sq, 0.5), sq)


def test_tolerance_bound_holds_randomized():
    """The DP guarantee: every ORIGINAL vertex is within tol of the
    simplified boundary, across tolerances and random coastlines."""
    for seed in range(5):
        ring = _coastline(800, seed=seed)
        prev = len(ring)
        for tol in (0.005, 0.02, 0.1, 0.5):
            s = simplify_ring(ring, tol)
            assert max_deviation(ring, s) <= tol + 1e-12, (seed, tol)
            assert len(s) <= prev          # monotone in tolerance
            prev = len(s)
        assert len(simplify_ring(ring, 0.1)) < 0.25 * len(ring)


def test_below_noise_tolerance_keeps_everything():
    ring = _coastline(200, seed=9, noise=0.05)
    s = simplify_ring(ring, 1e-9)
    assert len(s) == len(ring)


def test_operator_schema_bbox_and_holes(spark):
    pdf = synth.polygons_pdf(synth.oracle_polygons_holed(8, seed=7))
    regions = spark.createDataFrame(pdf, schema=_REGIONS_SCHEMA)
    from geopy_spark.operators.simplify import simplify_regions

    out = simplify_regions(regions, 1e-9)   # below noise: identity
    a = {r.poly_id: [list(v) for v in r.ring] for r in regions.collect()}
    b = {r.poly_id: [list(v) for v in r.ring] for r in out.collect()}
    assert a == b

    coarse = simplify_regions(regions, 0.5).collect()
    for r in coarse:
        ring = np.asarray(r.ring, dtype=np.float64)
        assert len(ring) >= 3
        assert r.lat_min == ring[:, 0].min()
        assert r.lat_max == ring[:, 0].max()
        assert r.lon_min == ring[:, 1].min()
        assert r.lon_max == ring[:, 1].max()
        orig = np.asarray(a[r.poly_id], dtype=np.float64)
        assert max_deviation(orig, ring) <= 0.5 + 1e-12


def test_min_vertices_gate_honored():
    """Review r5: a ring that would collapse below min_vertices is
    returned UNCHANGED (the docstring's promise) — a square with one
    redundant vertex collapses to 4 at min_vertices=4 but refuses to
    drop to 3 when asked to keep 5."""
    ring = np.array([[0, 0], [0, 5], [0, 10], [10, 10], [10, 0]],
                    dtype=float)
    s4 = np.asarray([[0, 0], [0, 10], [10, 10], [10, 0]], dtype=float)
    out4 = simplify_ring(ring, 0.5, min_vertices=4)
    assert len(out4) == 4 and {tuple(v) for v in out4} == \
        {tuple(v) for v in s4}
    out5 = simplify_ring(ring, 0.5, min_vertices=5)
    assert np.array_equal(out5, ring)
