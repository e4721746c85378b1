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


def test_tree_merge_collapses_to_one_driver_row():
    """The distributed tree merge must hand the driver exactly ONE sketch
    row regardless of batch count, and its estimates must equal a flat
    driver-side merge of the same per-batch sketches (associativity)."""
    import numpy as np

    from ethereum_etl_ray.stages.sketch import (
        CountMinSketch,
        _batch_sketch_stage,
        tree_merge_sketches,
    )

    depth, width, cap = 4, 512, 64
    rng = np.random.default_rng(3)
    keys = [f"k{int(v)}" for v in rng.zipf(1.5, size=20_000)]
    ds = ray.data.from_items([{"url": k} for k in keys]).map_batches(
        lambda t: t, batch_size=500, batch_format="pyarrow")
    sk = ds.map_batches(_batch_sketch_stage("url", depth, width, cap),
                        batch_format="pyarrow")
    flat_rows = sk.take_all()
    assert len(flat_rows) > 10  # genuinely many per-batch sketches
    flat = CountMinSketch(depth, width)
    for r in flat_rows:
        flat = flat.merge(CountMinSketch.deserialize(bytes(r["sketch"]), depth, width))

    root = tree_merge_sketches(sk, depth=depth, width=width,
                               candidate_cap=cap).take_all()
    assert len(root) == 1  # O(1) driver-side collection
    merged = CountMinSketch.deserialize(bytes(root[0]["sketch"]), depth, width)
    assert np.array_equal(merged.table, flat.table)
    # the hot keys survive candidate capping through the tree
    cands = set(root[0]["cands"])
    truth = pd.Series(keys).value_counts()
    assert set(truth.head(10).index) <= cands
    assert len(cands) <= cap


def test_sketch_heavy_hitters_end_to_end_still_ranks_hot_key():
    ds = ray.data.from_items(
        [{"url": "hot"} for _ in range(500)]
        + [{"url": f"cold{i}"} for i in range(200)]).map_batches(
        lambda t: t, batch_size=64, batch_format="pyarrow")
    df = sketch_heavy_hitters(ds, "url", sample_fraction=1.0, width=1024,
                              candidate_cap=32)
    assert df.iloc[0].url == "hot"
    assert df.iloc[0].est_n >= 500  # CMS overestimates only


def test_hll_error_bound_and_merge():
    from ethereum_etl_ray.stages.sketch import HyperLogLog

    keys = [f"user-{i}" for i in range(20_000)]
    h = HyperLogLog(p=12)
    h.add_many(np.array(keys, dtype=object))
    est = h.estimate()
    assert abs(est - 20_000) / 20_000 < 0.05  # ±3σ at p=12 is ~4.9 %

    # merge of halves == whole (elementwise max is associative+idempotent)
    h1, h2 = HyperLogLog(p=12), HyperLogLog(p=12)
    h1.add_many(np.array(keys[:10_000], dtype=object))
    h2.add_many(np.array(keys[5_000:], dtype=object))  # overlapping!
    assert h1.merge(h2).estimate() == est
    assert (h1.merge(h2).regs == h.regs).all()


def test_hll_small_range_linear_counting():
    from ethereum_etl_ray.stages.sketch import HyperLogLog

    h = HyperLogLog(p=12)
    h.add_many(np.array([f"k{i}" for i in range(50)], dtype=object))
    assert abs(h.estimate() - 50) < 3


def test_approx_distinct_distributed(ray_session):
    from ethereum_etl_ray.stages.sketch import approx_distinct

    n_distinct = 5000
    rng = np.random.default_rng(9)
    keys = np.char.add("u", rng.integers(0, n_distinct, 40_000).astype(str))
    true = len(np.unique(keys))
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - true) / true < 0.05
    # driver sees ONE sketch row regardless of partitioning (scale contract)
    est2 = approx_distinct(ds.repartition(2), "k", p=12)
    assert est2 == est  # partition-shape independent (max is associative)


def test_approx_distinct_by_group_error_bound():
    import pyarrow as pa
    import ray.data

    import numpy as np

    from ethereum_etl_ray.stages.sketch import approx_distinct_by

    rng = np.random.default_rng(3)
    # three groups with known distinct cardinalities
    card = {"a": 500, "b": 2000, "c": 37}
    gs, ks = [], []
    for g, n in card.items():
        ids = rng.choice(n, n * 3) + (hash(g) % 97) * 1_000_000
        gs += [g] * len(ids)
        ks += list(ids)
    t = pa.table({"g": pa.array(gs, pa.string()),
                  "k": pa.array(ks, pa.int64())})
    out = approx_distinct_by(ray.data.from_arrow(t), "g", "k", p=12)
    got = {r["g"]: r["estimate"] for r in out.take_all()}
    for g, n in card.items():
        true = len(set(k for gg, k in zip(gs, ks) if gg == g))
        assert abs(got[g] - true) / true < 0.08, (g, got[g], true)
