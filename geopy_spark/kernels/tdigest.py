"""t-digest quantile sketch, from scratch (public algorithm: Dunning &
Ertl, "Computing extremely accurate quantiles using t-digests").

Merging-digest variant with the k1 scale function
k(q) = (δ/2π)·asin(2q−1): centroid sizes are bounded tight near the
tails and loose in the middle, giving relative-accuracy quantiles with
at most ~2δ centroids. Everything is deterministic for a given input
ORDER (sort first, greedy left-to-right clustering — no randomness), and
`merge` is the associative combine that makes the sketch distributed:
per-partition partial digests shuffle as tiny (mean, weight) arrays and
merge exactly like any algebraic aggregate. Rank error after arbitrary
partitioning/merging stays O(1/δ) near the median and O(1/δ²) at the
tails — callers gate on that bound, not on bit equality, because the
centroid layout legitimately depends on partition boundaries.
"""

from __future__ import annotations

import numpy as np

DEFAULT_DELTA = 100


def _k(q: np.ndarray | float, delta: int) -> np.ndarray | float:
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * np.asarray(q) - 1.0)


def build(values: np.ndarray, delta: int = DEFAULT_DELTA) -> np.ndarray:
    """values → digest array [k, 2] of (mean, weight), means ascending."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        return np.empty((0, 2), dtype=np.float64)
    v.sort(kind="stable")
    w = np.ones_like(v)
    return _cluster(v, w, delta)


def _cluster(means: np.ndarray, weights: np.ndarray, delta: int) -> np.ndarray:
    """Greedy left-to-right merge of (ascending-mean, weight) pairs under
    the k1 size limit — the core of both build and merge."""
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = means[0], weights[0]
    w_before = 0.0  # total weight strictly left of the current cluster
    for m, w in zip(means[1:], weights[1:]):
        q_left = w_before / total
        q_right = (w_before + cur_w + w) / total
        if _k(q_right, delta) - _k(q_left, delta) <= 1.0:
            # weighted-mean absorb keeps the running mean exact
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.column_stack([np.asarray(out_m), np.asarray(out_w)])


def merge(digests: list[np.ndarray], delta: int = DEFAULT_DELTA) -> np.ndarray:
    """Associative combine: concatenate centroids, sort by mean (stable),
    re-cluster under the same scale bound."""
    parts = [np.asarray(d, dtype=np.float64).reshape(-1, 2)
             for d in digests if len(d)]
    if not parts:
        return np.empty((0, 2), dtype=np.float64)
    allc = np.concatenate(parts)
    order = np.argsort(allc[:, 0], kind="stable")
    allc = allc[order]
    return _cluster(allc[:, 0], allc[:, 1], delta)


def quantile(digest: np.ndarray, q: float) -> float:
    """Estimate the q-quantile by linear interpolation between centroid
    midpoints (standard t-digest readout; exact at the extreme ends)."""
    d = np.asarray(digest, dtype=np.float64).reshape(-1, 2)
    if d.shape[0] == 0:
        return float("nan")
    if d.shape[0] == 1:
        return float(d[0, 0])
    means, weights = d[:, 0], d[:, 1]
    total = weights.sum()
    target = q * total
    # cumulative weight at each centroid midpoint
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target) - 1)
    f = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + f * (means[i + 1] - means[i]))


def rank_error_bound(delta: int = DEFAULT_DELTA) -> float:
    """Conservative max rank error for gating: merging digests keep
    cluster q-width under ~2/δ at the median; after multi-level merging
    the practical bound is a small multiple of 1/δ. Callers gate with
    this times a safety factor."""
    return 6.0 / delta
