"""Throttler + cached-lookup actor tests (S5/S7 parity)."""

import time

import pandas as pd
import pyarrow as pa
import ray.data

from ethereum_etl_ray.stages.throttle import CachedLookup, Throttler, cached_enrich


def test_throttler_enforces_rate():
    t = Throttler(rate_limit=5, period=0.5)
    t0 = time.monotonic()
    for _ in range(11):
        t.acquire()
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.9  # 11 acquisitions at 5 per 0.5 s needs ≥2 windows


def test_throttler_spacing():
    t = Throttler(rate_limit=100, period=1.0, spacing=0.05)
    t0 = time.monotonic()
    for _ in range(4):
        t.acquire()
    assert time.monotonic() - t0 >= 0.15 - 0.01


def test_cached_lookup_caches_per_key():
    calls = []

    def fetch(k):
        calls.append(k)
        return k * 10

    cl = CachedLookup(fetch, "k", "v", rate_limit=1000)
    out1 = cl(pd.DataFrame({"k": [1, 2, 1, 2, 1]}))
    out2 = cl(pd.DataFrame({"k": [2, 3]}))
    assert out1.v.tolist() == [10, 20, 10, 20, 10]
    assert out2.v.tolist() == [20, 30]
    assert sorted(calls) == [1, 2, 3]  # each key fetched exactly once
    assert cl.hits >= 1 and cl.misses == 3


def test_cached_lookup_lru_bound():
    cl = CachedLookup(lambda k: k, "k", "v", rate_limit=10_000, max_cache=2)
    cl(pd.DataFrame({"k": [1, 2, 3]}))
    assert len(cl.cache) == 2 and 1 not in cl.cache


def test_cached_enrich_stage_end_to_end():
    ds = ray.data.from_arrow(pa.table({"k": pa.array([1, 2, 1, 4], pa.int64())}))
    out = cached_enrich(ds, lambda k: f"v{k}", key_col="k", out_col="val",
                        rate_limit=1000, concurrency=1).to_pandas()
    assert sorted(out.val) == ["v1", "v1", "v2", "v4"]
