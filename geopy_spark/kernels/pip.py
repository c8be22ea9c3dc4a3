"""Point-in-polygon kernels — vectorized numpy (SURVEY.md §2.2 G4-G5).

Semantics per the north_star (BASELINE.json:6): "point-in-polygon tests
(ray-casting with winding-number fallback)". Convention: points exactly ON
the boundary (edge or vertex, within EPS) count as INSIDE — documented so
the golden fixtures and the DuckDB oracle agree.

Polygons are simple closed rings [[lat, lon], ...] (first vertex not
repeated; we close implicitly). lat plays y, lon plays x. Antimeridian-
crossing rings are split into parts at ±180 before they reach these
kernels (sources/geojson.split_antimeridian).

Interior rings (holes, round 4): a polygon is (outer ring, holes[]) —
containment = inside the outer AND NOT strictly inside any hole; points
ON a hole's boundary count as inside the polygon (the boundary belongs
to the polygon, consistent with the outer-boundary convention). This is
exactly the even-odd rule evaluated over all rings at once, which is
what the DuckDB oracle computes from the flat edge list.
"""

from __future__ import annotations

import numpy as np

from .cells import cell_encode, cell_center, cell_size_deg, latlon_to_ij, ij_to_cell

# boundary tolerance in degrees: points within EPS of an edge/vertex count
# as inside (single knob — both the line-distance and bbox tests use it)
EPS = 1e-9

# Bounded scratch for the all-pairs vectorized kernels (round 5): every
# [rows, edges] / [edges_a, edges_b] intermediate is computed in blocks of
# at most this many float64 elements (~32 MB each, ≲10 live at once ⇒
# ~0.3 GB peak regardless of ring size). Without it a single 50k-vertex
# coastline PAIR test allocates O(E_a × E_b) ≈ 20 GB per intermediate —
# the VERDICT r4 scale-killer. Same math, same results: blocks reduce by
# any()/sum() along the edge axis, which is associative.
EDGE_BLOCK_ELEMS = 1 << 22


def _as_edges(ring: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """ring [E,2] (lat,lon) → edge endpoint arrays y1,x1,y2,x2 each [E]."""
    ring = np.asarray(ring, dtype=np.float64)
    y1, x1 = ring[:, 0], ring[:, 1]
    y2, x2 = np.roll(y1, -1), np.roll(x1, -1)
    return y1, x1, y2, x2


def _ring_inside_on_edge(plat: np.ndarray, plon: np.ndarray,
                         ring: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized [N points] x [one ring] → (strictly_inside, on_edge),
    each bool[N].

    Ray-casting (even-odd, half-open vertex rule) as the primary test;
    winding-number recomputation for rows whose ray passes within EPS of a
    vertex latitude (the degenerate cases the half-open rule can still get
    wrong under floating-point); explicit on-edge/vertex proximity test.

    Scratch is bounded: the [N, E] work runs in edge blocks of
    ≤ EDGE_BLOCK_ELEMS elements (crossing counts and on-edge flags reduce
    associatively across blocks), so a 500k-vertex coastline ring costs
    ~32 MB of scratch, not N×E×8 bytes.
    """
    py_f = np.asarray(plat, dtype=np.float64)           # [N]
    px_f = np.asarray(plon, dtype=np.float64)
    py, px = py_f[:, None], px_f[:, None]               # [N,1]
    ey1, ex1, ey2, ex2 = _as_edges(ring)                # [E]
    n_pts, n_edges = len(py_f), len(ey1)
    blk = max(1, EDGE_BLOCK_ELEMS // max(n_pts, 1))

    on_edge = np.zeros(n_pts, dtype=bool)
    crossings = np.zeros(n_pts, dtype=np.int64)
    vertex_graze = np.zeros(n_pts, dtype=bool)
    for s in range(0, n_edges, blk):
        y1, x1 = ey1[s:s + blk], ex1[s:s + blk]
        y2, x2 = ey2[s:s + blk], ex2[s:s + blk]

        # --- on-edge / on-vertex: |cross| ~ 0 and within segment bbox ---
        dx, dy = x2 - x1, y2 - y1
        cross = dx * (py - y1) - dy * (px - x1)
        seg_len2 = dx * dx + dy * dy
        on_line = cross * cross <= (EPS * EPS) * np.maximum(seg_len2, EPS * EPS)
        in_bbox = ((px >= np.minimum(x1, x2) - EPS) & (px <= np.maximum(x1, x2) + EPS) &
                   (py >= np.minimum(y1, y2) - EPS) & (py <= np.maximum(y1, y2) + EPS))
        on_edge |= (on_line & in_bbox).any(axis=1)

        # --- ray cast: horizontal ray to +x (east); half-open rule ---
        cond = (y1 > py) != (y2 > py)                   # [N,blk]
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + dy_safe_div(dx, dy, py - y1)
        crossings += (cond & (px < xint)).sum(axis=1)
        vertex_graze |= (np.abs(py - y1) < 1e-9).any(axis=1)

    inside = (crossings % 2) == 1

    # --- winding-number fallback for vertex-grazing rays ---
    if vertex_graze.any():
        idx = np.nonzero(vertex_graze)[0]
        wn = _winding_number(py_f[idx], px_f[idx], ey1, ex1, ey2, ex2)
        inside[idx] = wn != 0

    return inside, on_edge


def points_in_ring(plat: np.ndarray, plon: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Boundary-INCLUSIVE containment in one ring (G5): inside or within
    EPS of an edge/vertex — the engine's outer-ring convention."""
    inside, on_edge = _ring_inside_on_edge(plat, plon, ring)
    return inside | on_edge


def points_in_ring_interior(plat: np.ndarray, plon: np.ndarray,
                            ring: np.ndarray) -> np.ndarray:
    """STRICT interior of one ring (boundary excluded) — the test a hole
    needs: a point on the hole's rim still belongs to the polygon."""
    inside, on_edge = _ring_inside_on_edge(plat, plon, ring)
    return inside & ~on_edge


def points_in_polygon(plat: np.ndarray, plon: np.ndarray, ring: np.ndarray,
                      holes=None) -> np.ndarray:
    """Containment in a polygon with optional interior rings: inside the
    outer ring AND NOT strictly inside any hole. Equivalent to even-odd
    parity over the flat edge list of all rings (the oracle's form) for
    valid geometry (holes inside the outer, pairwise disjoint)."""
    res = points_in_ring(plat, plon, ring)
    for h in holes if holes is not None else ():
        if res.any():
            res &= ~points_in_ring_interior(plat, plon, np.asarray(h, dtype=np.float64))
    return res


def dy_safe_div(dx: np.ndarray, dy: np.ndarray, num: np.ndarray) -> np.ndarray:
    """num * dx / dy with dy==0 rows yielding +inf (edge parallel to the
    ray never crosses it — cond is already False there)."""
    out = np.where(dy != 0.0, dx / np.where(dy == 0.0, 1.0, dy), np.inf)
    return num * out


def _winding_number(py, px, ey1, ex1, ey2, ex2) -> np.ndarray:
    """Nonzero-rule winding number; py/px [M], edges [E] → int[M].
    Edge-blocked like _ring_inside_on_edge (up/down counts sum across
    blocks)."""
    py, px = py[:, None], px[:, None]
    m = py.shape[0]
    blk = max(1, EDGE_BLOCK_ELEMS // max(m, 1))
    wn = np.zeros(m, dtype=np.int64)
    for s in range(0, len(ey1), blk):
        y1, x1 = ey1[s:s + blk], ex1[s:s + blk]
        y2, x2 = ey2[s:s + blk], ex2[s:s + blk]
        is_left = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
        up = (y1 <= py) & (y2 > py) & (is_left > 0)
        dn = (y1 > py) & (y2 <= py) & (is_left < 0)
        wn += up.sum(axis=1) - dn.sum(axis=1)
    return wn


# ------------------------------------------------ antimeridian splitting

def unwrap_ring_lons(ring: np.ndarray) -> np.ndarray:
    """Longitudes made CONTINUOUS along the ring: each vertex shifted by
    the multiple of 360 that keeps consecutive deltas under 180 (the
    standard convention for encoding a wrap-crossing ring: lon jumps
    from ~+179 to ~-179 mean the ring continues east). The result is
    then re-centered by whole turns so its span sits across at most one
    seam (±180)."""
    ring = np.asarray(ring, dtype=np.float64)
    lon = ring[:, 1]
    adj = np.concatenate([[0.0],
                          np.cumsum(-360.0 * np.round(np.diff(lon) / 360.0))])
    u = lon + adj
    u -= 360.0 * np.round((u.max() + u.min()) / 720.0)
    return u


def _clip_lon_halfplane(ring: np.ndarray, seam: float,
                        keep_leq: bool) -> np.ndarray:
    """Sutherland–Hodgman clip of a [lat,lon] ring against lon<=seam
    (keep_leq) or lon>=seam. For a non-convex ring crossing the seam
    several times the output carries collinear seam bridge-edges, which
    even-odd PIP treats correctly (opposite traversals cancel in the
    crossing parity) — so downstream containment stays exact."""
    out: list[list[float]] = []
    n = len(ring)
    for i in range(n):
        ay, ax = ring[i]
        by, bx = ring[(i + 1) % n]
        a_in = ax <= seam if keep_leq else ax >= seam
        b_in = bx <= seam if keep_leq else bx >= seam
        if a_in:
            out.append([ay, ax])
        if a_in != b_in:
            t = (seam - ax) / (bx - ax)
            out.append([ay + t * (by - ay), seam])
    return np.asarray(out, dtype=np.float64).reshape(-1, 2)


def split_polygon_antimeridian(ring: np.ndarray, holes=None
                               ) -> list[tuple[np.ndarray, list]]:
    """Split a wrap-crossing polygon at ±180 into parts with in-range
    longitudes: [(part_ring, part_holes), ...]. A non-crossing polygon
    returns itself (single part, holes untouched). Holes are unwrapped
    into the outer's continuous frame and clipped by the same seam, so
    each part keeps exactly the hole area on its side. Rings spanning
    more than a full turn are returned unchanged (invalid geometry —
    caller's filter via geom_type/validation)."""
    ring = np.asarray(ring, dtype=np.float64)
    holes = [np.asarray(h, dtype=np.float64) for h in (holes or [])]
    u = unwrap_ring_lons(ring)
    if u.max() - u.min() >= 360.0:
        return [(ring, holes)]
    if u.max() <= 180.0 and u.min() >= -180.0:
        return [(ring, holes)]
    seam = 180.0 if u.max() > 180.0 else -180.0
    uring = np.column_stack([ring[:, 0], u])
    # holes re-centered into the outer's frame (shift by whole turns to
    # land inside the outer's unwrapped span)
    uholes = []
    for h in holes:
        hu = unwrap_ring_lons(h)
        hu += 360.0 * np.round(((u.max() + u.min()) - (hu.max() + hu.min()))
                               / 720.0)
        uholes.append(np.column_stack([h[:, 0], hu]))

    parts = []
    # in-range side keeps shift 0; the side beyond the seam comes back a
    # whole turn (seam=180 → east side −360; seam=−180 → west side +360)
    plan = (((True, 0.0), (False, -360.0)) if seam == 180.0
            else ((False, 0.0), (True, 360.0)))
    for keep_leq, shift in plan:
        pr = _clip_lon_halfplane(uring, seam, keep_leq)
        if len(pr) < 3:
            continue
        ph = [q for q in (_clip_lon_halfplane(h, seam, keep_leq)
                          for h in uholes) if len(q) >= 3]
        pr = pr.copy()
        pr[:, 1] += shift
        for q in ph:
            q[:, 1] += shift
        parts.append((pr, ph))
    return parts if parts else [(ring, holes)]


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    ring = np.asarray(ring, dtype=np.float64)
    return (float(ring[:, 0].min()), float(ring[:, 0].max()),
            float(ring[:, 1].min()), float(ring[:, 1].max()))


def polygon_cover(ring: np.ndarray, level: int, holes=None) -> np.ndarray:
    """Conservative covering cell set of a polygon at ``level`` (G4).

    Every cell whose rectangle intersects the ring's bbox is kept when it
    either (a) has its center inside the ring, or (b) intersects the bbox
    boundary band — a superset that guarantees NO false negatives for the
    cell-equi join; the exact PIP residual (points_in_polygon) removes
    false positives afterwards. cf. Raster-Intervals-style approximation
    (PAPERS.md [P:9]).

    With ``holes``, cells provably swallowed by a hole are dropped —
    center strictly inside the hole AND the cell rectangle nowhere
    touching the hole's rim — which keeps the no-false-negative
    guarantee (a cell straddling the rim still carries polygon area and
    is kept). For a large hole (donut regions) this prunes the cover the
    same way the outer test prunes the bbox grid.
    """
    lat_min, lat_max, lon_min, lon_max = ring_bbox(ring)
    # a ring ending EXACTLY at the +180 seam (antimeridian part rings)
    # must not wrap its bbox corner to -180 — that would empty the grid
    # range and silently drop the whole cover (round-4 seam-edge fix).
    # 1e-9° stays inside the seam cell at every level (finest cell is
    # ~3e-7°) yet survives normalize's +180 float rounding, which a bare
    # nextafter(180) does not.
    lon_max = min(lon_max, 180.0 - 1e-9)
    lon_min = min(lon_min, lon_max)
    i0, j0 = latlon_to_ij(np.array([lat_min]), np.array([lon_min]), level)
    i1, j1 = latlon_to_ij(np.array([lat_max]), np.array([lon_max]), level)
    ii = np.arange(int(i0[0]), int(i1[0]) + 1, dtype=np.uint64)
    jj = np.arange(int(j0[0]), int(j1[0]) + 1, dtype=np.uint64)
    gi, gj = np.meshgrid(ii, jj, indexing="ij")
    cells = ij_to_cell(gi.ravel(), gj.ravel(), level)

    if cells.size <= 4:        # tiny cover: keep all, residual filter handles it
        return cells
    # keep: center-inside OR cell rectangle touches the ring's edges
    clat, clon = cell_center(cells)
    half = cell_size_deg(level) / 2.0
    center_in = points_in_ring(clat, clon, ring)
    near_edge = _cell_touches_ring(clat, clon, half, ring)
    keep = center_in | near_edge
    cells = cells[keep]
    for h in holes if holes is not None else ():
        if cells.size == 0:
            break
        h = np.asarray(h, dtype=np.float64)
        clat, clon = cell_center(cells)
        swallowed = (points_in_ring_interior(clat, clon, h)
                     & ~_cell_touches_ring(clat, clon, half, h))
        cells = cells[~swallowed]
    return cells


def _cell_touches_ring(clat, clon, half, ring) -> np.ndarray:
    """Does the cell rect [clat±half, clon±2·half] touch any ring edge?
    Conservative segment-vs-rect overlap via per-axis interval tests plus a
    line-side test (exact separating-axis for segment vs axis-aligned box).
    Edge-blocked to EDGE_BLOCK_ELEMS scratch like the PIP kernel (the
    per-block any() ORs across blocks)."""
    ey1, ex1, ey2, ex2 = _as_edges(ring)
    cy, cx = np.asarray(clat)[:, None], np.asarray(clon)[:, None]
    hy, hx = half, 2.0 * half
    n_cells = cy.shape[0]
    blk = max(1, EDGE_BLOCK_ELEMS // max(n_cells, 1))
    out = np.zeros(n_cells, dtype=bool)
    for s in range(0, len(ey1), blk):
        y1, x1 = ey1[s:s + blk], ex1[s:s + blk]
        y2, x2 = ey2[s:s + blk], ex2[s:s + blk]
        # bbox overlap of edge and cell rect
        ey_min, ey_max = np.minimum(y1, y2), np.maximum(y1, y2)
        ex_min, ex_max = np.minimum(x1, x2), np.maximum(x1, x2)
        bb = ((ey_min <= cy + hy) & (ey_max >= cy - hy) &
              (ex_min <= cx + hx) & (ex_max >= cx - hx))
        # separating-axis: line through edge vs rect corners
        dy, dx = y2 - y1, x2 - x1
        d = np.abs(dx * (cy - y1) - dy * (cx - x1))
        r = np.abs(dx) * hy + np.abs(dy) * hx
        out |= (bb & (d <= r)).any(axis=1)
    return out


# ------------------------------------------------------- polygon ⋈ polygon

def _all_edges(ring: np.ndarray, holes=None) -> tuple[np.ndarray, ...]:
    """Full boundary edge set of (outer, holes[]): hole rims are part of
    the polygon's boundary, so intersection tests must see them too —
    a ring lying inside another polygon's hole but crossing its rim
    intersects the polygon even though the outer rings never touch."""
    ys1, xs1, ys2, xs2 = [], [], [], []
    for r in [ring] + list(holes if holes is not None else ()):
        y1, x1, y2, x2 = _as_edges(np.asarray(r, dtype=np.float64))
        ys1.append(y1); xs1.append(x1); ys2.append(y2); xs2.append(x2)
    return (np.concatenate(ys1), np.concatenate(xs1),
            np.concatenate(ys2), np.concatenate(xs2))


def _segments_cross(ay1, ax1, ay2, ax2, by1, bx1, by2, bx2) -> bool:
    p, t = _segments_cross_detail(ay1, ax1, ay2, ax2, by1, bx1, by2, bx2)
    return p or t


def _segments_cross_detail(eay1, eax1, eay2, eax2,
                           eby1, ebx1, eby2, ebx2) -> tuple[bool, bool]:
    """Segment-set intersection detail: (any PROPER crossing — interiors
    of both segments cross transversally — , any TOUCH — endpoint within
    EPS of the other segment, incl. collinear overlap). The predicate
    split matters: `intersects` accepts either (boundary-inclusive),
    `contains` forbids proper crossings but allows touching. All-pairs
    vectorized: [m,1] against [1,n] orientation signs with an EPS
    tolerance scaled by edge length so 'touching' matches the PIP
    kernel's distance-EPS semantics.

    Scratch is bounded (round 5): the [m, n] pair space runs in
    [≤4096, ≤EDGE_BLOCK_ELEMS/4096] tiles (any() reduces associatively;
    both flags short-circuit once True), so two 100k-edge coastlines
    never allocate the O(E_a × E_b) matrices — peak scratch stays
    ~EDGE_BLOCK_ELEMS×8 bytes per intermediate."""
    m, n = len(eay1), len(eby1)
    if m == 0 or n == 0:
        return False, False
    mb = min(m, 4096)
    nb = max(1, EDGE_BLOCK_ELEMS // mb)
    proper_any = touch_any = False
    for i in range(0, m, mb):
        ay1, ax1, ay2, ax2 = (v[i:i + mb, None]
                              for v in (eay1, eax1, eay2, eax2))
        len_a = np.hypot(ay2 - ay1, ax2 - ax1)
        tol_a = EPS * np.maximum(len_a, EPS)
        for j in range(0, n, nb):
            by1, bx1, by2, bx2 = (v[None, j:j + nb]
                                  for v in (eby1, ebx1, eby2, ebx2))

            # orientation of point (py,px) relative to directed segment (1->2)
            def _cross(sy1, sx1, sy2, sx2, py, px):
                return (sx2 - sx1) * (py - sy1) - (sy2 - sy1) * (px - sx1)

            len_b = np.hypot(by2 - by1, bx2 - bx1)
            tol_b = EPS * np.maximum(len_b, EPS)
            d1 = _cross(by1, bx1, by2, bx2, ay1, ax1)
            d2 = _cross(by1, bx1, by2, bx2, ay2, ax2)
            d3 = _cross(ay1, ax1, ay2, ax2, by1, bx1)
            d4 = _cross(ay1, ax1, ay2, ax2, by2, bx2)
            proper = (((d1 > tol_b) & (d2 < -tol_b))
                      | ((d1 < -tol_b) & (d2 > tol_b))) \
                & (((d3 > tol_a) & (d4 < -tol_a))
                   | ((d3 < -tol_a) & (d4 > tol_a)))

            # touch / collinear-overlap: an endpoint within tolerance of
            # the other segment's line AND inside its EPS-expanded bbox
            def _on(sy1, sx1, sy2, sx2, d, py, px, tol):
                inbox = ((py >= np.minimum(sy1, sy2) - EPS)
                         & (py <= np.maximum(sy1, sy2) + EPS)
                         & (px >= np.minimum(sx1, sx2) - EPS)
                         & (px <= np.maximum(sx1, sx2) + EPS))
                return (np.abs(d) <= tol) & inbox

            touch = (_on(by1, bx1, by2, bx2, d1, ay1, ax1, tol_b)
                     | _on(by1, bx1, by2, bx2, d2, ay2, ax2, tol_b)
                     | _on(ay1, ax1, ay2, ax2, d3, by1, bx1, tol_a)
                     | _on(ay1, ax1, ay2, ax2, d4, by2, bx2, tol_a))
            proper_any = proper_any or bool(proper.any())
            touch_any = touch_any or bool(touch.any())
            if proper_any and touch_any:
                return True, True
    return proper_any, touch_any


def _region_interior_point(ring: np.ndarray, holes=None):
    """A point STRICTLY interior to (ring minus holes), or None when the
    scanline probes fail (degenerate slivers thinner than EPS). Even-odd
    over the combined edge list: a horizontal line that grazes no vertex
    crosses the region boundary an even number of times, and midpoints of
    consecutive crossing pairs alternate strictly inside/outside starting
    inside — each candidate is verified against the kernels before being
    returned, so a degenerate scanline can't yield a wrong point."""
    ring = np.asarray(ring, dtype=np.float64)
    holes = [np.asarray(h, dtype=np.float64) for h in (holes or [])]
    lat_min, lat_max = ring[:, 0].min(), ring[:, 0].max()
    span = lat_max - lat_min
    if span <= 4 * EPS:
        return None
    all_lats = np.concatenate([ring[:, 0]] + [h[:, 0] for h in holes])
    for frac in (0.5, 0.379, 0.621, 0.233, 0.767, 0.443, 0.557,
                 0.101, 0.899, 0.317, 0.683):
        y = lat_min + frac * span
        if np.abs(all_lats - y).min() <= 1e-7 * span:
            continue  # scanline grazes a vertex: parity unreliable
        xs = []
        for r in [ring] + holes:
            y1, x1, y2, x2 = _as_edges(r)
            cond = (y1 > y) != (y2 > y)
            if cond.any():
                t = (y - y1[cond]) / (y2[cond] - y1[cond])
                xs.append(x1[cond] + t * (x2[cond] - x1[cond]))
        if not xs:
            continue
        xs = np.sort(np.concatenate(xs))
        for k in range(0, len(xs) - 1, 2):
            if xs[k + 1] - xs[k] <= 8 * EPS:
                continue
            py = np.array([y])
            px = np.array([0.5 * (xs[k] + xs[k + 1])])
            if not points_in_ring_interior(py, px, ring)[0]:
                continue
            if any(points_in_ring(py, px, h)[0] for h in holes):
                continue
            return float(py[0]), float(px[0])
    return None


def polygons_intersect(ring_a: np.ndarray, ring_b: np.ndarray,
                       holes_a=None, holes_b=None) -> bool:
    """Boundary-inclusive region intersection of two polygons-with-holes
    (G16). Decision procedure for valid simple rings:

    1. bbox reject (cheap).
    2. Any boundary-edge pair (outer + hole rims, both sides) crossing
       or touching → intersect (boundary belongs to the polygon).
    3. No boundary contact → regions are nested or disjoint: A's outer
       vertices inside B-with-holes → A's whole region lies in B's face
       → intersect; symmetrically for B in A. A polygon sitting wholly
       inside the other's HOLE fails both vertex tests → disjoint,
       which is the correct outer-minus-hole answer.
    """
    a_lat0, a_lat1, a_lon0, a_lon1 = ring_bbox(ring_a)
    b_lat0, b_lat1, b_lon0, b_lon1 = ring_bbox(ring_b)
    if (a_lat0 > b_lat1 + EPS or b_lat0 > a_lat1 + EPS
            or a_lon0 > b_lon1 + EPS or b_lon0 > a_lon1 + EPS):
        return False
    ea = _all_edges(ring_a, holes_a)
    eb = _all_edges(ring_b, holes_b)
    if _segments_cross(*ea, *eb):
        return True
    ra = np.asarray(ring_a, dtype=np.float64)
    rb = np.asarray(ring_b, dtype=np.float64)
    if points_in_polygon(ra[:, 0], ra[:, 1], rb, holes=holes_b).any():
        return True
    return bool(points_in_polygon(rb[:, 0], rb[:, 1], ra, holes=holes_a).any())


def polygon_contains(ring_a: np.ndarray, ring_b: np.ndarray,
                     holes_a=None, holes_b=None) -> bool:
    """A ⊇ B: region containment (boundary-inclusive — B touching A's
    boundary from inside still counts). Decision procedure:

    1. B's bbox within A's bbox (±EPS), else False.
    2. Any PROPER boundary crossing (∂A transversally crossing ∂B,
       hole rims included) → B leaves A → False. Touching/collinear
       contact is allowed.
    3. Every B outer vertex inside A (outer-minus-holes, inclusive) —
       with no proper crossing, B's connected region then lies in A's
       closure UNLESS one of A's holes carves its interior out:
    4. Any vertex of an A-hole STRICTLY interior to B's region → the
       hole's interior meets B's interior → False. (A hole swallowing B
       whole is already caught by 3: B's vertices sit in hole interior,
       which points_in_polygon excludes.)
    """
    a_lat0, a_lat1, a_lon0, a_lon1 = ring_bbox(ring_a)
    b_lat0, b_lat1, b_lon0, b_lon1 = ring_bbox(ring_b)
    if (b_lat0 < a_lat0 - EPS or b_lat1 > a_lat1 + EPS
            or b_lon0 < a_lon0 - EPS or b_lon1 > a_lon1 + EPS):
        return False
    proper, _ = _segments_cross_detail(*_all_edges(ring_a, holes_a),
                                       *_all_edges(ring_b, holes_b))
    if proper:
        return False
    rb = np.asarray(ring_b, dtype=np.float64)
    ra = np.asarray(ring_a, dtype=np.float64)
    if not points_in_polygon(rb[:, 0], rb[:, 1], ra, holes=holes_a).all():
        return False
    holes_b = list(holes_b) if holes_b is not None else []
    # 3b (round 5, ADVICE r4): full boundary coincidence of B with an
    # A-hole rim passes every vertex test — B's vertices sit ON the rim
    # (boundary counts as inside A) and the rim's vertices are on B's
    # boundary (not strictly interior) — yet B's interior IS the hole,
    # i.e. outside A. One representative point of B's open interior
    # settles it: with no proper boundary crossing, that interior lies
    # entirely in a single face of A's boundary arrangement, so one
    # strict-interior probe decides the whole region.
    if holes_a:
        p = _region_interior_point(rb, holes_b)
        if p is not None and not points_in_polygon(
                np.array([p[0]]), np.array([p[1]]), ra, holes=holes_a)[0]:
            return False
    for h in holes_a if holes_a is not None else ():
        h = np.asarray(h, dtype=np.float64)
        strict = points_in_ring_interior(h[:, 0], h[:, 1], rb)
        for hb in holes_b:
            if not strict.any():
                break
            hb = np.asarray(hb, dtype=np.float64)
            # a hole vertex sitting in (the closure of) one of B's own
            # holes is not interior to B's region
            strict &= ~points_in_ring(h[:, 0], h[:, 1], hb)
        if strict.any():
            return False
    return True
