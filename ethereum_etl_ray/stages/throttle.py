"""Rate limiting + in-actor caching for external-API-facing stages.

Parity with the reference's client machinery, kept for any stage that fronts
a real external service (the synthetic lake itself needs neither):

  * ``Throttler`` — sliding-window rate limiter with optional minimum
    request spacing (reference: ``src/clients/throttler.py:9-61``), sync
    (actors process batches synchronously here, not asyncio).
  * ``CachedLookup`` — map_batches actor whose ``fetch`` results are cached
    per actor with LRU bounds (reference: the Binance client's param-keyed
    response cache, ``src/clients/binance_client.py:35-58``, and the token
    metadata cache pattern of ``src/tasks/extract/token.py:23-78``).

Retries/backoff are NOT re-implemented: Ray task retries cover transport
failures (reference ``rpc_client.py:101-130``); only app-level logical
retries belong in the fetch callable itself.
"""

from __future__ import annotations

import collections
import time
from typing import Callable

import pandas as pd
import ray.data

from ethereum_etl_ray.util import pool_size


class Throttler:
    """Sliding-window limiter: at most ``rate_limit`` acquisitions per
    ``period`` seconds, with ``spacing`` seconds between consecutive ones."""

    def __init__(self, rate_limit: int, period: float = 1.0, spacing: float = 0.0):
        self.rate_limit = rate_limit
        self.period = period
        self.spacing = spacing
        self._stamps: collections.deque[float] = collections.deque()

    def acquire(self) -> float:
        """Blocks until a slot is free; returns the wait time."""
        waited = 0.0
        while True:
            now = time.monotonic()
            while self._stamps and now - self._stamps[0] > self.period:
                self._stamps.popleft()
            wait = 0.0
            if len(self._stamps) >= self.rate_limit:
                wait = self.period - (now - self._stamps[0])
            if self.spacing and self._stamps:
                wait = max(wait, self.spacing - (now - self._stamps[-1]))
            if wait <= 0:
                self._stamps.append(now)
                return waited
            time.sleep(wait)
            waited += wait


class CachedLookup:
    """Actor-pool stage: enrich rows by ``fetch(key)`` with an in-actor LRU
    cache and a throttler — built once per actor in ``__init__``."""

    def __init__(self, fetch: Callable, key_col: str, out_col: str,
                 rate_limit: int = 50, period: float = 1.0, max_cache: int = 100_000):
        self.fetch = fetch
        self.key_col = key_col
        self.out_col = out_col
        self.throttler = Throttler(rate_limit, period)
        self.cache: collections.OrderedDict = collections.OrderedDict()
        self.max_cache = max_cache
        self.hits = 0
        self.misses = 0

    def _get(self, key):
        if key in self.cache:
            self.cache.move_to_end(key)
            self.hits += 1
            return self.cache[key]
        self.throttler.acquire()
        val = self.fetch(key)
        self.misses += 1
        self.cache[key] = val
        if len(self.cache) > self.max_cache:
            self.cache.popitem(last=False)
        return val

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # resolve each DISTINCT key once per batch, then broadcast-map
        uniq = {k: self._get(k) for k in pd.unique(batch[self.key_col])}
        batch = batch.copy()
        batch[self.out_col] = batch[self.key_col].map(uniq)
        return batch


def cached_enrich(ds: ray.data.Dataset, fetch: Callable, *, key_col: str,
                  out_col: str, rate_limit: int = 50, concurrency: int | None = None,
                  batch_size: int = 1024) -> ray.data.Dataset:
    return ds.map_batches(
        CachedLookup,
        fn_constructor_args=(fetch, key_col, out_col, rate_limit),
        batch_format="pandas", batch_size=batch_size,
        concurrency=pool_size(concurrency),
    )
