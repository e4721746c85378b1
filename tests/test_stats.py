"""Exact distributed statistics (integer moment sums)."""

import numpy as np
import pandas as pd
import ray.data

from ethereum_etl_ray.stages.stats import exact_corr


def test_exact_corr_matches_numpy_and_is_partition_invariant(ray_session):
    rng = np.random.default_rng(3)
    x = rng.integers(0, 100, 5000)
    y = (0.7 * x + rng.integers(0, 40, 5000)).astype(np.int64)
    df = pd.DataFrame({"x": x, "y": y})
    r2 = exact_corr(ray.data.from_pandas(df).repartition(2), "x", "y")
    r9 = exact_corr(ray.data.from_pandas(df).repartition(9), "x", "y")
    assert r2 == r9  # bit-identical across partitionings (exact int sums)
    assert abs(r2 - np.corrcoef(x, y)[0, 1]) < 1e-12


def test_exact_corr_perfect_and_anti(ray_session):
    df = pd.DataFrame({"x": [1, 2, 3, 4], "y": [2, 4, 6, 8],
                       "z": [8, 6, 4, 2]})
    ds = ray.data.from_pandas(df)
    # sqrt(a)*sqrt(b) rounds twice, so ±1 ulp of exactly 1.0 — the value is
    # still bit-identical to any engine mirroring the expression
    assert abs(exact_corr(ds, "x", "y") - 1.0) < 1e-15
    assert abs(exact_corr(ds, "x", "z") + 1.0) < 1e-15


def test_exact_corr_constant_column_nan(ray_session):
    df = pd.DataFrame({"x": [1, 1, 1], "y": [1, 2, 3]})
    assert np.isnan(exact_corr(ray.data.from_pandas(df), "x", "y"))
