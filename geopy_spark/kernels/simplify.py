"""Ring simplification — Douglas-Peucker (round 5, G21). The classic
public algorithm (Douglas & Peucker 1973): recursively keep the vertex
farthest from the chord while its perpendicular deviation exceeds the
tolerance. For CLOSED rings the seed split is the pair (vertex 0,
farthest-from-0) so the result is again a valid ring.

Why it exists here: real-world vector layers carry 10⁴–10⁶-vertex
coastlines/admin boundaries. The pair kernels are now memory-bounded
(pip.EDGE_BLOCK_ELEMS) but still O(E_a·E_b) in TIME; a tolerance-driven
simplification pass upstream cuts E by 10–100× for display, tiling and
approximate analytics. It is LOSSY — simplified rings are neither
supersets nor subsets of the original — so the exact-join operators
never call it implicitly; it is an explicit preprocessing choice
(guaranteed bound: every ORIGINAL vertex stays within `tol_deg` of the
simplified boundary — the property test's invariant).

Deviation metric: planar perpendicular distance in degree space (lat as
y, lon as x) — the standard choice for map simplification at the
tolerances in play; callers with polar data should scale lon by
cos(lat) first.
"""

from __future__ import annotations

import numpy as np


def _seg_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Perpendicular (segment) distance of pts [N,2] to segment a-b."""
    d = b - a
    l2 = float(d @ d)
    if l2 == 0.0:
        return np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
    t = np.clip(((pts - a) @ d) / l2, 0.0, 1.0)
    proj = a + t[:, None] * d
    return np.hypot(pts[:, 0] - proj[:, 0], pts[:, 1] - proj[:, 1])


def simplify_open(path: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker on an open polyline [N,2]; endpoints always kept.
    Iterative stack (no recursion-depth limit on 10⁶-vertex inputs)."""
    path = np.asarray(path, dtype=np.float64)
    n = len(path)
    if n <= 2:
        return path.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        seg = path[i + 1:j]
        dist = _seg_dist(seg, path[i], path[j])
        k = int(np.argmax(dist))
        if dist[k] > tol:
            k += i + 1
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return path[keep]


def simplify_ring(ring: np.ndarray, tol: float,
                  min_vertices: int = 4) -> np.ndarray:
    """Douglas-Peucker on a CLOSED ring (open representation, engine
    convention). Seed chord: vertex 0 ↔ the vertex farthest from it, so
    both halves simplify as open paths and rejoin into a ring. Rings
    that would collapse below ``min_vertices`` are returned unchanged
    (a 3-vertex output can be valid, but degenerate slivers are not
    worth the breakage downstream)."""
    ring = np.asarray(ring, dtype=np.float64)
    n = len(ring)
    if n <= min_vertices:
        return ring.copy()
    far = int(np.argmax(np.hypot(ring[:, 0] - ring[0, 0],
                                 ring[:, 1] - ring[0, 1])))
    if far == 0:
        return ring.copy()          # all vertices coincide
    h1 = simplify_open(ring[:far + 1], tol)
    h2 = simplify_open(np.vstack([ring[far:], ring[:1]]), tol)
    out = np.vstack([h1[:-1], h2[:-1]])
    return out if len(out) >= min_vertices else ring.copy()


def max_deviation(orig: np.ndarray, simp: np.ndarray) -> float:
    """Max distance of any ORIGINAL vertex to the simplified ring's
    boundary — the bound simplify_ring guarantees ≤ tol."""
    orig = np.asarray(orig, dtype=np.float64)
    simp = np.asarray(simp, dtype=np.float64)
    m = len(simp)
    best = np.full(len(orig), np.inf)
    for k in range(m):
        a, b = simp[k], simp[(k + 1) % m]
        best = np.minimum(best, _seg_dist(orig, a, b))
    return float(best.max())
