"""Point-in-polygon kernels — vectorized numpy (SURVEY.md §2.2 G4-G5).

Semantics per the north_star (BASELINE.json:6): "point-in-polygon tests
(ray-casting with winding-number fallback)". Convention: points exactly ON
the boundary (edge or vertex, within EPS) count as INSIDE — documented so
the golden fixtures and the DuckDB oracle agree.

Polygons are simple closed rings [[lat, lon], ...] (first vertex not
repeated; we close implicitly). lat plays y, lon plays x. Antimeridian-
crossing rings are a documented non-goal (FIXTURES.md).
"""

from __future__ import annotations

import numpy as np

from .cells import cell_encode, cell_center, cell_size_deg, latlon_to_ij, ij_to_cell

# boundary tolerance in degrees: points within EPS of an edge/vertex count
# as inside (single knob — both the line-distance and bbox tests use it)
EPS = 1e-9


def _as_edges(ring: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """ring [E,2] (lat,lon) → edge endpoint arrays y1,x1,y2,x2 each [E]."""
    ring = np.asarray(ring, dtype=np.float64)
    y1, x1 = ring[:, 0], ring[:, 1]
    y2, x2 = np.roll(y1, -1), np.roll(x1, -1)
    return y1, x1, y2, x2


def points_in_ring(plat: np.ndarray, plon: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized [N points] x [one ring] → bool[N].

    Ray-casting (even-odd, half-open vertex rule) as the primary test;
    winding-number recomputation for rows whose ray passes within EPS of a
    vertex latitude (the degenerate cases the half-open rule can still get
    wrong under floating-point); explicit on-edge test → inside.
    """
    py = np.asarray(plat, dtype=np.float64)[:, None]   # [N,1]
    px = np.asarray(plon, dtype=np.float64)[:, None]
    y1, x1, y2, x2 = _as_edges(ring)                    # [E]

    # --- on-edge / on-vertex: |cross| ~ 0 and within segment bbox ---
    dx, dy = x2 - x1, y2 - y1
    cross = dx * (py - y1) - dy * (px - x1)
    seg_len2 = dx * dx + dy * dy
    on_line = cross * cross <= (EPS * EPS) * np.maximum(seg_len2, EPS * EPS)
    in_bbox = ((px >= np.minimum(x1, x2) - EPS) & (px <= np.maximum(x1, x2) + EPS) &
               (py >= np.minimum(y1, y2) - EPS) & (py <= np.maximum(y1, y2) + EPS))
    on_edge = (on_line & in_bbox).any(axis=1)

    # --- ray cast: horizontal ray to +x (east); half-open rule ---
    cond = (y1 > py) != (y2 > py)                       # [N,E]
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + dy_safe_div(dx, dy, py - y1)
    crossings = (cond & (px < xint)).sum(axis=1)
    inside = (crossings % 2) == 1

    # --- winding-number fallback for vertex-grazing rays ---
    vertex_graze = (np.abs(py - y1) < 1e-9).any(axis=1)
    if vertex_graze.any():
        idx = np.nonzero(vertex_graze)[0]
        wn = _winding_number(py[idx, 0], px[idx, 0], y1, x1, y2, x2)
        inside[idx] = wn != 0

    return inside | on_edge


def dy_safe_div(dx: np.ndarray, dy: np.ndarray, num: np.ndarray) -> np.ndarray:
    """num * dx / dy with dy==0 rows yielding +inf (edge parallel to the
    ray never crosses it — cond is already False there)."""
    out = np.where(dy != 0.0, dx / np.where(dy == 0.0, 1.0, dy), np.inf)
    return num * out


def _winding_number(py, px, y1, x1, y2, x2) -> np.ndarray:
    """Nonzero-rule winding number; py/px [M], edges [E] → int[M]."""
    py, px = py[:, None], px[:, None]
    is_left = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
    up = (y1 <= py) & (y2 > py) & (is_left > 0)
    dn = (y1 > py) & (y2 <= py) & (is_left < 0)
    return up.sum(axis=1) - dn.sum(axis=1)


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    ring = np.asarray(ring, dtype=np.float64)
    return (float(ring[:, 0].min()), float(ring[:, 0].max()),
            float(ring[:, 1].min()), float(ring[:, 1].max()))


def polygon_cover(ring: np.ndarray, level: int) -> np.ndarray:
    """Conservative covering cell set of a ring at ``level`` (G4).

    Every cell whose rectangle intersects the ring's bbox is kept when it
    either (a) has its center inside the ring, or (b) intersects the bbox
    boundary band — a superset that guarantees NO false negatives for the
    cell-equi join; the exact PIP residual (points_in_ring) removes false
    positives afterwards. cf. Raster-Intervals-style approximation
    (PAPERS.md [P:9]).
    """
    lat_min, lat_max, lon_min, lon_max = ring_bbox(ring)
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
    return cells[keep]


def _cell_touches_ring(clat, clon, half, ring) -> np.ndarray:
    """Does the cell rect [clat±half, clon±2·half] touch any ring edge?
    Conservative segment-vs-rect overlap via per-axis interval tests plus a
    line-side test (exact separating-axis for segment vs axis-aligned box)."""
    y1, x1, y2, x2 = _as_edges(ring)
    cy, cx = np.asarray(clat)[:, None], np.asarray(clon)[:, None]
    hy, hx = half, 2.0 * half
    # bbox overlap of edge and cell rect
    ey_min, ey_max = np.minimum(y1, y2), np.maximum(y1, y2)
    ex_min, ex_max = np.minimum(x1, x2), np.maximum(x1, x2)
    bb = ((ey_min <= cy + hy) & (ey_max >= cy - hy) &
          (ex_min <= cx + hx) & (ex_max >= cx - hx))
    # separating-axis: line through edge vs rect corners
    dy, dx = y2 - y1, x2 - x1
    d = np.abs(dx * (cy - y1) - dy * (cx - x1))
    r = np.abs(dx) * hy + np.abs(dy) * hx
    return (bb & (d <= r)).any(axis=1)
