"""Key-frequency sketch tests (skew detection path)."""

import numpy as np
import pandas as pd
import ray.data

from ethereum_etl_ray.stages.sketch import (
    CountMinSketch,
    heavy_hitters,
    sketch_heavy_hitters,
)


def _skewed_ds(n=5000, hot="hot-key", seed=3):
    rng = np.random.default_rng(seed)
    keys = np.where(rng.random(n) < 0.3, hot,
                    np.char.add("k", rng.integers(0, 500, n).astype(str)))
    return ray.data.from_pandas(pd.DataFrame({"url": keys})), keys


def test_exact_heavy_hitters_match_pandas():
    ds, keys = _skewed_ds()
    df = heavy_hitters(ds, "url", top_k=5)
    truth = pd.Series(keys).value_counts()
    assert df.iloc[0].url == "hot-key"
    assert df.iloc[0].n == truth["hot-key"]
    for _, row in df.iterrows():
        assert truth[row.url] == row.n


def test_cms_point_queries_overestimate_only():
    cms = CountMinSketch(depth=4, width=512)
    rng = np.random.default_rng(0)
    keys = np.char.add("k", rng.integers(0, 200, 3000).astype(str))
    cms.add_many(keys)
    truth = pd.Series(keys).value_counts()
    uniq = truth.index.to_numpy()
    est = cms.query(uniq)
    assert (est >= truth.to_numpy()).all()          # one-sided error
    assert (est - truth.to_numpy()).mean() < 30     # bounded overestimate


def test_cms_merge_equals_single_pass():
    rng = np.random.default_rng(1)
    keys = np.char.add("k", rng.integers(0, 50, 2000).astype(str))
    whole = CountMinSketch()
    whole.add_many(keys)
    a, b = CountMinSketch(), CountMinSketch()
    a.add_many(keys[:1000])
    b.add_many(keys[1000:])
    merged = a.merge(b)
    assert np.array_equal(whole.table, merged.table)
    rt = CountMinSketch.deserialize(whole.serialize())
    assert np.array_equal(rt.table, whole.table)


def test_sketch_heavy_hitters_ranks_hot_key_first():
    ds, keys = _skewed_ds()
    df = sketch_heavy_hitters(ds, "url", sample_fraction=1.0)
    assert df.iloc[0].url == "hot-key"
    truth = pd.Series(keys).value_counts()["hot-key"]
    assert df.iloc[0].est_n >= truth  # CMS never underestimates


def test_heavy_hitters_exclude_null_keys():
    """pc.value_counts counts nulls; the combiner must drop them (SQL
    COUNT-by-key semantics — a null key must never become a heavy hitter)."""
    import ray.data

    from ethereum_etl_ray.stages.sketch import heavy_hitters

    ds = ray.data.from_items([{"k": "a"}, {"k": "a"}, {"k": None},
                              {"k": None}, {"k": None}, {"k": "b"}])
    df = heavy_hitters(ds, "k", top_k=3)
    assert df["k"].tolist() == ["a", "b"]
    assert df["n"].tolist() == [2, 1]
