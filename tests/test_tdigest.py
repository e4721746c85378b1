"""t-digest quantile sketch: rank-error bound vs exact, merge associativity,
wire round-trip, grouped variant (rows-only driver contract, cf. CMS/HLL)."""

import numpy as np
import pandas as pd
import ray.data

from ethereum_etl_ray.stages.tdigest import (
    TDigest,
    approx_quantiles,
    grouped_quantiles,
)

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_err(values: np.ndarray, est: float, q: float) -> float:
    v = np.sort(values)
    rank = np.searchsorted(v, est, side="right")
    return abs(rank / v.size - q)


def _mixed_values(n=40_000, seed=5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.concatenate([
        rng.lognormal(0.0, 2.0, n // 2),          # heavy right tail
        rng.uniform(-100.0, 100.0, n // 2),
    ])


def test_local_digest_rank_error_bound():
    v = _mixed_values()
    d = TDigest.from_values(v, delta=200)
    # the k0-style size bound yields ~4·delta centroids (13 KB at delta=200)
    assert d.means.size <= 6 * 200
    for q in QS:
        assert _rank_err(v, d.quantile(q), q) <= 0.02, q


def test_exact_extremes_and_tiny_inputs():
    v = np.array([7.0])
    d = TDigest.from_values(v)
    assert d.quantile(0.0) == 7.0 and d.quantile(1.0) == 7.0
    assert np.isnan(TDigest.from_values(np.array([])).quantile(0.5))
    big = TDigest.from_values(_mixed_values())
    assert big.quantile(0.0) == big.vmin
    assert big.quantile(1.0) == big.vmax


def test_merge_matches_single_build_error_bound():
    v = _mixed_values()
    parts = np.array_split(v, 13)
    acc = TDigest.from_values(parts[0])
    for p in parts[1:]:
        acc = acc.merge(TDigest.from_values(p))
    for q in QS:
        assert _rank_err(v, acc.quantile(q), q) <= 0.02, q


def test_serialize_round_trip():
    d = TDigest.from_values(_mixed_values(4000))
    r = TDigest.deserialize(d.serialize())
    assert np.array_equal(r.means, d.means)
    assert np.array_equal(r.weights, d.weights)
    assert (r.vmin, r.vmax, r.delta) == (d.vmin, d.vmax, d.delta)
    for q in QS:
        assert r.quantile(q) == d.quantile(q)


def test_distributed_quantiles_match_exact_within_bound():
    v = _mixed_values()
    ds = ray.data.from_pandas(pd.DataFrame({"value": v})).repartition(16)
    out = approx_quantiles(ds, "value", QS, delta=200)
    assert list(out.q) == QS
    for q, est in zip(out.q, out.value):
        assert _rank_err(v, est, q) <= 0.02, q


def test_grouped_quantiles_per_key_bound():
    rng = np.random.default_rng(9)
    frames = []
    for key, loc in [("a", 0.0), ("b", 50.0), ("c", -20.0)]:
        frames.append(pd.DataFrame({
            "k": key, "value": rng.normal(loc, 5.0, 8000)}))
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=1)
    ds = ray.data.from_pandas(df).repartition(8)
    out = grouped_quantiles(ds, "k", "value", QS, delta=200)
    assert sorted(out.k.unique()) == ["a", "b", "c"]
    for key, g in out.groupby("k"):
        truth = df[df.k == key].value.to_numpy()
        for q, est in zip(g.q, g.value):
            assert _rank_err(truth, est, q) <= 0.02, (key, q)


def test_empty_dataset():
    ds = ray.data.from_pandas(pd.DataFrame({"value": pd.Series(dtype=float)}))
    out = approx_quantiles(ds, "value", [0.5])
    assert np.isnan(out.value.iloc[0])
