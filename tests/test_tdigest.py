"""t-digest sketch (kernels/tdigest + operators/sketch): rank-error
bounds vs exact quantiles, merge associativity under arbitrary splits,
determinism, and the distributed operator against numpy."""

import numpy as np
import pytest

from geopy_spark.kernels import tdigest as T


def _rank_of(values_sorted, x):
    return np.searchsorted(values_sorted, x, side="left") / len(values_sorted)


@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal", "bimodal"])
def test_quantile_rank_error_within_bound(dist):
    rng = np.random.default_rng(11)
    n = 50_000
    v = {"uniform": rng.uniform(0, 1000, n),
         "normal": rng.normal(500, 100, n),
         "lognormal": rng.lognormal(3, 1, n),
         "bimodal": np.concatenate([rng.normal(10, 1, n // 2),
                                    rng.normal(1000, 10, n // 2)])}[dist]
    d = T.build(v, delta=100)
    assert len(d) <= 2 * 100
    vs = np.sort(v)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = T.quantile(d, q)
        assert abs(_rank_of(vs, est) - q) <= T.rank_error_bound(100), (dist, q)


def test_merge_of_splits_matches_whole_within_bound():
    rng = np.random.default_rng(5)
    v = rng.lognormal(3, 1, 40_000)
    vs = np.sort(v)
    for n_parts in (2, 7, 64):
        parts = np.array_split(rng.permutation(v), n_parts)
        merged = T.merge([T.build(p, 100) for p in parts], 100)
        assert len(merged) <= 2 * 100
        for q in (0.1, 0.5, 0.9):
            est = T.quantile(merged, q)
            assert abs(_rank_of(vs, est) - q) <= T.rank_error_bound(100)


def test_build_deterministic_and_exact_edges():
    v = np.array([5.0, 1.0, 9.0, 1.0, 5.0])
    d1, d2 = T.build(v.copy()), T.build(v.copy())
    assert np.array_equal(d1, d2)
    assert T.quantile(d1, 0.0) == 1.0
    assert T.quantile(d1, 1.0) == 9.0
    assert T.build(np.array([])).shape == (0, 2)
    assert T.quantile(T.build(np.array([42.0])), 0.5) == 42.0
    # total weight is conserved through build+merge
    big = np.random.default_rng(1).normal(0, 1, 10_000)
    d = T.merge([T.build(p) for p in np.array_split(big, 9)])
    assert abs(d[:, 1].sum() - 10_000) < 1e-6


def test_tdigest_quantiles_operator(spark):
    import pandas as pd
    from geopy_spark.operators.sketch import tdigest_quantiles
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "k": np.repeat(["a", "b", "c"], 30_000),
        "v": np.concatenate([rng.uniform(0, 100, 30_000),
                             rng.normal(50, 5, 30_000),
                             rng.lognormal(2, 0.5, 30_000)]),
    })
    df = spark.createDataFrame(pdf).repartition(16)
    out = {r.k: (r.td_q50, r.td_q90)
           for r in tdigest_quantiles(df, ["k"], "v", [0.5, 0.9]).collect()}
    assert set(out) == {"a", "b", "c"}
    for k, g in pdf.groupby("k"):
        vs = np.sort(g["v"].to_numpy())
        for got, q in zip(out[k], (0.5, 0.9)):
            assert abs(_rank_of(vs, got) - q) <= T.rank_error_bound(100), (k, q)
