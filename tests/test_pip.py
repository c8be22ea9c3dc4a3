"""PIP kernel truth tables incl. degeneracies, winding agreement, and the
cover-superset guarantee (SURVEY.md §5.2; BASELINE.json:6 ray-casting with
winding-number fallback)."""

import numpy as np

from geopy_spark.kernels import cells as K
from geopy_spark.kernels import pip as P

SQUARE = np.array([[0, 0], [0, 10], [10, 10], [10, 0]], dtype=float)


def _star(nv=10, r_out=10.0, r_in=4.0, clat=0.0, clon=0.0):
    th = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    rr = np.where(np.arange(nv) % 2 == 0, r_out, r_in)
    return np.stack([clat + rr * np.sin(th), clon + rr * np.cos(th)], axis=1)


def test_square_truth_table():
    cases = [
        ((5.0, 5.0), True),      # interior
        ((5.0, 15.0), False),    # outside east
        ((-1e-9, 5.0), True),    # on edge (within EPS) → inside by convention
        ((0.0, 0.0), True),      # vertex → inside
        ((10.0, 10.0), True),    # far vertex
        ((5.0, 10.0), True),     # on east edge
        ((10.000001, 5.0), False),
        ((5.0, -0.000001), False),
    ]
    lat = np.array([c[0][0] for c in cases])
    lon = np.array([c[0][1] for c in cases])
    exp = [c[1] for c in cases]
    assert list(P.points_in_ring(lat, lon, SQUARE)) == exp


def test_vertex_on_ray_degeneracy():
    # ray through a vertex: triangle with vertex at lat=5 exactly; point west
    # of it at the same latitude → ray passes through the vertex
    tri = np.array([[0, 0], [5, 10], [10, 0]], dtype=float)
    inside = P.points_in_ring(np.array([5.0]), np.array([2.6]), tri)
    assert inside[0]
    outside = P.points_in_ring(np.array([5.0]), np.array([-0.1]), tri)
    assert not outside[0]


def test_star_nonconvex():
    star = _star()
    # center inside; points between spikes outside at r between r_in and r_out
    assert P.points_in_ring(np.array([0.0]), np.array([0.0]), star)[0]
    # midway angle between spike 0 (th=0) and spike 2 (th=2pi/10*2):
    th = 2 * np.pi / 10
    r = 8.0  # > r_in contour at that angle
    p = (r * np.sin(th), r * np.cos(th))
    assert not P.points_in_ring(np.array([p[0]]), np.array([p[1]]), star)[0]
    p2 = (2.0 * np.sin(th), 2.0 * np.cos(th))
    assert P.points_in_ring(np.array([p2[0]]), np.array([p2[1]]), star)[0]


def test_raycast_equals_winding_on_simple_polys():
    rng = np.random.default_rng(11)
    star = _star(14, 9.0, 3.0, 5.0, 7.0)
    lat = rng.uniform(-6, 16, 4000)
    lon = rng.uniform(-4, 18, 4000)
    res = P.points_in_ring(lat, lon, star)
    y1, x1, y2, x2 = P._as_edges(star)
    wn = P._winding_number(lat, lon, y1, x1, y2, x2)
    # away from edges, ray parity == nonzero winding for simple polygons
    d_edge = _min_edge_dist(lat, lon, star)
    far = d_edge > 1e-6
    assert np.array_equal(res[far], (wn != 0)[far])


def _min_edge_dist(plat, plon, ring):
    y1, x1, y2, x2 = P._as_edges(ring)
    py, px = plat[:, None], plon[:, None]
    dy, dx = y2 - y1, x2 - x1
    t = ((py - y1) * dy + (px - x1) * dx) / (dy * dy + dx * dx)
    t = np.clip(t, 0, 1)
    return np.sqrt((py - (y1 + t * dy)) ** 2 + (px - (x1 + t * dx)) ** 2).min(axis=1)


def test_cover_no_false_negatives():
    rng = np.random.default_rng(12)
    for trial in range(5):
        star = _star(int(rng.integers(6, 20)), rng.uniform(3, 12),
                     rng.uniform(0.5, 2.5), rng.uniform(-50, 50), rng.uniform(-150, 150))
        for lvl in (5, 7, 9):
            cov = P.polygon_cover(star, lvl)
            lat = rng.uniform(star[:, 0].min(), star[:, 0].max(), 3000)
            lon = rng.uniform(star[:, 1].min(), star[:, 1].max(), 3000)
            inside = P.points_in_ring(lat, lon, star)
            cells_of_inside = K.cell_encode(lat[inside], lon[inside], lvl)
            assert np.isin(cells_of_inside, cov).all(), (trial, lvl)


def test_cover_is_reasonably_tight():
    cov = P.polygon_cover(SQUARE, 8)
    # bbox 10x10deg at level8: cell 0.703x1.406deg → bbox grid ~ 15x8=120
    assert 20 <= len(cov) <= 160


def test_oracle_fixture_points_clear_of_boundaries():
    """The spatial-join oracle (entry_queries._sql_spatial_join) is
    parity-only ray-cast with no boundary handling, while the engine
    counts within-EPS-of-edge as inside. Agreement is BY CONSTRUCTION:
    assert no derived customer point comes near any polygon edge or shares
    a vertex latitude, at every fixture scale (ADVICE r1)."""
    import duckdb

    from geopy_spark import synth

    polys = synth.oracle_polygons_holed()   # outer rings AND hole rings
    margin = 1e-6  # >> engine EPS (1e-9)
    for sf in ("sf0.001", "sf0.01"):
        keys = duckdb.sql(
            f"SELECT c_custkey FROM '/root/testdata/{sf}/customer.parquet'"
        ).df()["c_custkey"].to_numpy()
        plat = synth.derived_lat_np(keys)
        plon = synth.derived_lon_np(keys)
        for poly in polys:
          for ring in synth._all_rings(poly):
            r = np.asarray(ring, dtype=np.float64)
            y1, x1 = r[:, 0], r[:, 1]
            y2, x2 = np.roll(y1, -1), np.roll(x1, -1)
            # point-to-segment distance in degree space, all points × edges
            dx, dy = x2 - x1, y2 - y1
            seg2 = dx * dx + dy * dy
            px = plon[:, None] - x1[None, :]
            py = plat[:, None] - y1[None, :]
            t = np.clip((px * dx[None, :] + py * dy[None, :])
                        / np.maximum(seg2[None, :], 1e-30), 0.0, 1.0)
            ddx = px - t * dx[None, :]
            ddy = py - t * dy[None, :]
            d2 = ddx * ddx + ddy * ddy
            assert d2.min() > margin * margin
            # no point latitude within margin of a vertex latitude (the
            # parity test's strict-inequality flip zone)
            assert np.abs(plat[:, None] - y1[None, :]).min() > margin


# ------------------------------- interior rings (holes, round 4) ------

DONUT_OUTER = np.array([[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]])
DONUT_HOLE = np.array([[3.0, 3.0], [3.0, 7.0], [7.0, 7.0], [7.0, 3.0]])


def test_donut_containment():
    lat = np.array([5.0, 1.0, 5.0, 3.0, 11.0, 0.0])
    lon = np.array([5.0, 1.0, 3.0, 3.0, 5.0, 5.0])
    got = P.points_in_polygon(lat, lon, DONUT_OUTER, holes=[DONUT_HOLE])
    # center (in hole) OUT; ring band IN; hole rim IN (boundary belongs
    # to the polygon); outer edge IN; outside OUT
    assert list(got) == [False, True, True, True, False, True]
    # no holes → solid semantics unchanged
    assert list(P.points_in_polygon(lat, lon, DONUT_OUTER)) == [
        True, True, True, True, False, True]


def test_hole_strict_interior_vs_inclusive():
    lat = np.array([5.0, 3.0])
    lon = np.array([5.0, 3.0])
    assert list(P.points_in_ring(lat, lon, DONUT_HOLE)) == [True, True]
    assert list(P.points_in_ring_interior(lat, lon, DONUT_HOLE)) == [True, False]


def test_polygon_cover_subtracts_swallowed_cells_only():
    """Cover with the hole must stay a superset of the polygon's true
    cells (no false negatives), prune at least the hole's deep-interior
    cells at a fine level, and keep every rim-straddling cell."""
    from geopy_spark.kernels.cells import cell_encode

    for lvl in (6, 8, 10):
        solid = set(P.polygon_cover(DONUT_OUTER, lvl).tolist())
        holed = set(P.polygon_cover(DONUT_OUTER, lvl, holes=[DONUT_HOLE]).tolist())
        assert holed <= solid
        rng = np.random.default_rng(11)
        la = rng.uniform(-1, 11, 6000)
        lo = rng.uniform(-1, 11, 6000)
        ins = P.points_in_polygon(la, lo, DONUT_OUTER, holes=[DONUT_HOLE])
        assert set(cell_encode(la[ins], lo[ins], lvl).tolist()) <= holed
    # at level 10 (0.176° cells) the 4°-wide hole interior must prune
    assert len(holed) < len(solid)


def test_fixture_holes_witnessed():
    """Every fixture polygon carries a hole, each hole's vertices are
    strictly inside its outer ring, and the hole excludes its own
    centroid — the driver's spatial_join_pip row genuinely tests holes."""
    from geopy_spark import synth
    polys = synth.oracle_polygons_holed()
    assert all(len(h) == 1 for _, _, h in polys)
    for _, ring, holes in polys:
        r = np.asarray(ring)
        h = np.asarray(holes[0])
        assert P.points_in_ring(h[:, 0], h[:, 1], r).all()
        cy, cx = h[:, 0].mean(), h[:, 1].mean()
        assert not P.points_in_polygon(
            np.array([cy]), np.array([cx]), r, holes=[h])[0]


def test_even_odd_flat_edges_equals_outer_minus_holes():
    """The DuckDB oracle computes even-odd parity over the FLAT edge
    list of all rings; the kernel computes outer-minus-strict-holes.
    They must agree everywhere off the boundary — the exact invariant
    the driver compare rests on."""
    rng = np.random.default_rng(3)
    la = rng.uniform(-1, 11, 20000)
    lo = rng.uniform(-1, 11, 20000)
    kernel = P.points_in_polygon(la, lo, DONUT_OUTER, holes=[DONUT_HOLE])
    # flat parity: crossings over outer edges + hole edges
    def crossings(ring):
        y1, x1 = ring[:, 0], ring[:, 1]
        y2, x2 = np.roll(y1, -1), np.roll(x1, -1)
        py, px = la[:, None], lo[:, None]
        cond = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (py - y1) * (x2 - x1) / np.where(
                (y2 - y1) == 0, 1.0, y2 - y1)
        return (cond & (px < xint)).sum(axis=1)
    parity = (crossings(DONUT_OUTER) + crossings(DONUT_HOLE)) % 2 == 1
    assert (kernel == parity).all()


# ---------------------------------------------- round 5: bounded scratch

def _coastline(clat, clon, r0, n, seed):
    """Deterministic high-vertex 'coastline': star-shaped ring (radial
    function of angle → guaranteed simple) with multi-frequency jitter."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    a, b, c = rng.uniform(0.05, 0.18, 3)
    r = r0 * (1 + a * np.sin(7 * th) + b * np.sin(13 * th + 1.0)
              + c * np.sin(29 * th + 2.0))
    return np.column_stack([clat + r * np.sin(th), clon + r * np.cos(th)])


def test_chunked_kernels_match_unchunked(monkeypatch):
    """Edge-axis blocking (EDGE_BLOCK_ELEMS) must not change ANY kernel
    decision: run the pair predicates and PIP over random fixtures at a
    pathologically tiny block size and at an effectively-unchunked one,
    and require identical results."""
    rng = np.random.default_rng(123)

    def rand_poly(cy, cx, rmax, nv):
        th = np.sort(rng.uniform(0, 2 * np.pi, nv))
        r = rng.uniform(0.2 * rmax, rmax, nv)
        return np.column_stack([cy + r * np.sin(th), cx + r * np.cos(th)])

    polys = [rand_poly(rng.uniform(-5, 5), rng.uniform(-5, 5),
                       rng.uniform(1, 6), int(rng.integers(5, 40)))
             for _ in range(12)]
    pts_lat = rng.uniform(-12, 12, 200)
    pts_lon = rng.uniform(-12, 12, 200)

    def decisions():
        inter = [P.polygons_intersect(a, b)
                 for i, a in enumerate(polys) for b in polys[i + 1:]]
        cont = [P.polygon_contains(a, b)
                for i, a in enumerate(polys) for b in polys[i + 1:]]
        pip = [tuple(P.points_in_polygon(pts_lat, pts_lon, a)) for a in polys]
        return inter, cont, pip

    monkeypatch.setattr(P, "EDGE_BLOCK_ELEMS", 97)
    tiny = decisions()
    monkeypatch.setattr(P, "EDGE_BLOCK_ELEMS", 1 << 60)
    huge = decisions()
    assert tiny == huge


def test_big_coastline_pair_bounded_memory():
    """VERDICT r4 #2: two ~16k-vertex coastline rings through the pair
    kernels complete with BOUNDED scratch. Unchunked, one [Ea, Eb]
    float64 intermediate is 16k×16k×8 B ≈ 2 GB and the kernels hold ~8
    of them; edge-blocked the peak stays under a few hundred MB
    (EDGE_BLOCK_ELEMS ≈ 4.2M elements ≈ 34 MB per intermediate)."""
    import tracemalloc

    N = 16_000
    A = _coastline(0.0, 0.0, 5.0, N, 1)
    B = _coastline(2.0, 2.0, 5.0, N, 2)          # overlaps A
    big = _coastline(0.0, 0.0, 60.0, N, 3)       # encloses A (min r 35.4)
    far = _coastline(40.0, 40.0, 1.0, N, 4)      # bbox-disjoint from A
    tracemalloc.start()
    assert P.polygons_intersect(A, B)
    assert not P.polygons_intersect(A, far)
    assert P.polygon_contains(big, A)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 500 * 1024 * 1024, f"peak scratch {peak/2**20:.0f} MiB"
