"""Distributed k-th-element selection tests (stages.selection)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from ethereum_etl_ray.stages.selection import kth_smallest


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(23)
    n = 20_000
    df = pd.DataFrame({
        "a": rng.integers(0, 50, size=n),       # heavy ties on the lead col
        "b": rng.permutation(n),                # unique tie-break
    })
    return df


def _truth(df, k):
    s = df.sort_values(["a", "b"], kind="stable").reset_index(drop=True)
    row = s.iloc[k - 1]
    return (row.a, row.b)


@pytest.mark.parametrize("k", [1, 2, 137, 10_000, 19_999, 20_000])
def test_kth_matches_full_sort(data, k):
    ds = ray.data.from_pandas(data).map_batches(lambda t: t, batch_size=1024,
                                                batch_format="pyarrow")
    got = kth_smallest(ds, ["a", "b"], k, sample_per_batch=64)
    assert tuple(int(x) for x in got) == tuple(int(x) for x in _truth(data, k))


def test_kth_tiny_sample_rate_still_exact(data):
    # stress the bracketing: 8 samples per 1024-row batch
    ds = ray.data.from_pandas(data).map_batches(lambda t: t, batch_size=1024,
                                                batch_format="pyarrow")
    k = 4_242
    got = kth_smallest(ds, ["a", "b"], k, sample_per_batch=8)
    assert tuple(int(x) for x in got) == tuple(int(x) for x in _truth(data, k))


def test_kth_out_of_range(data):
    ds = ray.data.from_pandas(data)
    with pytest.raises(ValueError):
        kth_smallest(ds, ["a", "b"], 0)
    with pytest.raises(ValueError):
        kth_smallest(ds, ["a", "b"], len(data) + 1)


def test_kth_rejects_null_sort_columns():
    """Nulls rank last in sort_by but vanish from lex_lt counts — the two
    passes would disagree, so null sort columns must be rejected early."""
    df = pd.DataFrame({"a": [1.0, None, 3.0, 4.0], "b": [0, 1, 2, 3]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="contains nulls"):
        kth_smallest(ds, ["a", "b"], 1)
