"""Join / lookup / enrichment stages.

The reference's "joins" are keyed lookups against external services batched
per row-group (J1-J5, SURVEY §2.4). Re-expressed Ray-Data-native:

  * ``broadcast_lookup`` — small build side shipped ONCE via ``ray.put`` and
    resolved inside each map task (never re-shipped per batch); the analogue
    of J1-J4 enrichment and the token-decimals side-input dict
    (``src/tasks/extract/pool.py:278-282``). No shuffle.
  * ``semi_anti_filter`` — broadcast key-set membership filter (the A1
    "to-address excluded if it was a contract" anti-join heuristic,
    ``src/tasks/extract/account.py:20-21``).
  * ``broadcast_asof`` — as-of (backward) join against a broadcast,
    pre-sorted right side via per-batch ``pd.merge_asof`` (guide pattern);
    right side must fit in memory — at 100 TB use the bucketed variant.
  * large-large equi-joins use ``Dataset.join`` (hash shuffle on the key),
    available in this Ray version — see pipelines.queries.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def broadcast_lookup(
    ds: ray.data.Dataset,
    small_df: pd.DataFrame,
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Equi-join where the right side is broadcast (dimension-table join)."""
    ref = ray.put(small_df)

    class Lookup:
        def __init__(self):
            self.right = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.right, how=how, left_on=left_on, right_on=right_on)

    from ethereum_etl_ray.util import pool_size

    return ds.map_batches(Lookup, batch_format="pandas",
                          concurrency=pool_size(concurrency))


def semi_anti_filter(
    ds: ray.data.Dataset,
    keys,
    *,
    on: str,
    anti: bool = False,
) -> ray.data.Dataset:
    """Semi (keep members) / anti (keep non-members) join via a broadcast key
    set, or a broadcast Bloom filter when the build side is too big to ship
    exactly (pass a ``state.bloom.BloomFilter`` as ``keys``). Bloom semantics:
    no false negatives, so semi keeps a small FP surplus and anti may drop an
    FP sliver — choose ``fp_rate`` accordingly.

    Stateless tasks on purpose: the key set lives in the object store
    (one ``ray.put``, zero-copy ``ray.get`` per task) and reserving actors for
    a pure filter starves other stages of a small cluster (two pools of 2
    deadlocked a 4-CPU pipeline in testing)."""
    from ethereum_etl_ray.state.bloom import BloomFilter

    is_bloom = isinstance(keys, BloomFilter)
    ref = ray.put(keys if is_bloom else np.asarray(list(keys)))

    def member(batch: pa.Table) -> pa.Table:
        keyset = ray.get(ref)
        vals = batch.column(on).to_numpy(zero_copy_only=False)
        if is_bloom:
            mask = keyset.contains_many(vals)
            if anti:
                mask = ~mask
        else:
            mask = np.isin(vals, keyset, invert=anti)
        return batch.filter(pa.array(mask))

    return ds.map_batches(member, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_asof(
    ds: ray.data.Dataset,
    right_df: pd.DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    left_by: str,
    right_by: str,
    inner: bool = True,
) -> ray.data.Dataset:
    """Backward as-of join: each left row matches the latest right row with
    ``right_ts <= left_ts`` for the same key. Right side broadcast + sorted
    once per actor; each batch is one vectorized ``pd.merge_asof``."""
    right_sorted = right_df.sort_values(right_ts).reset_index(drop=True)
    ref = ray.put(right_sorted)

    class Asof:
        def __init__(self):
            self.right = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.merge_asof(
                batch.sort_values(left_ts),
                self.right,
                left_on=left_ts,
                right_on=right_ts,
                left_by=left_by,
                right_by=right_by,
                direction="backward",
            )
            if inner:
                out = out.dropna(subset=[right_ts])
            return out

    return ds.map_batches(Asof, batch_format="pandas", concurrency=2)


def enrich_with(
    ds: ray.data.Dataset,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    concurrency: int = 4,
    batch_size: int = 2048,
) -> ray.data.Dataset:
    """Generic stateful enrichment actor pool (J1-J4 shape): ``fn`` is applied
    per batch inside actors; in the reference these were async RPC fan-outs
    (``src/tasks/extract/account.py:33-52``) — here any expensive per-batch
    lookup/model call, with state amortized in ``__init__``."""

    class Enricher:
        def __init__(self):
            self.fn = fn

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return self.fn(batch)

    from ethereum_etl_ray.util import pool_size

    return ds.map_batches(Enricher, batch_format="pandas",
                          batch_size=batch_size, concurrency=pool_size(concurrency))
