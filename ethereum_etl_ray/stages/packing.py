"""Sequence packing: assign ordered documents to fixed-token-budget training
sequences via a distributed prefix sum.

A training pipeline concatenates the curated corpus (in a deterministic key
order) into one token stream and cuts it into fixed-length sequences; each
document's sequence id is ``floor(tokens_before_it / budget)``. The whole
problem is a prefix sum over the key order — which a naive implementation
does with a global sort + driver cumsum. Here it is two narrow passes:

  pass 1  map_batches: per-batch ``(bucket, n_tokens sum)`` partials, where
          ``bucket = key // bucket_width`` (keys are dense ints, so buckets
          are contiguous key ranges); a tiny groupby reduces them to one row
          per bucket — the driver receives O(#buckets) rows, never data.
  driver  exclusive prefix over the per-bucket sums → per-bucket token
          offsets (broadcast via closure capture, O(#buckets) ints).
  pass 2  groupby(bucket).map_groups: sort the bucket's rows by key (cheap,
          in-memory, one bucket), local cumsum + the bucket's offset, emit
          ``seq_id``. One hash shuffle of the narrow (key, n_tokens) table.

Scale: at 10^10 docs with 4096 buckets each group holds ~2.4M narrow rows;
the driver state is 4096 ints. The reference has no packing analogue — this
generalizes its sequential block→batch accounting
(``src/clis/historical.py:24-33`` range chunking) to token-budget chunking.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def pack_sequences(ds: ray.data.Dataset, key: str, weight: str, budget: int,
                   n_buckets: int = 256, key_upper_bound: int | None = None
                   ) -> ray.data.Dataset:
    """Adds ``seq_id = floor(prefix_sum_before(weight, ordered by key) / budget)``.

    ``key`` must be a unique non-negative integer column (dense ids are
    ideal — contiguous buckets then stay balanced). ``weight`` is the
    per-row token count. Returns (key, weight, seq_id) rows.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    narrow = ds.select_columns([key, weight])
    if key_upper_bound is None:
        key_upper_bound = int(narrow.max(key)) + 1
    width = max(1, -(-key_upper_bound // n_buckets))

    def partials(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy()
        w = t.column(weight).to_numpy()
        b = k // width
        ub = np.unique(b)
        sums = np.zeros(len(ub), dtype=np.int64)
        np.add.at(sums, np.searchsorted(ub, b), w)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "wsum": pa.array(sums, pa.int64())})

    per_bucket = (narrow.map_batches(partials, batch_format="pyarrow",
                                     zero_copy_batch=True)
                  .groupby("bucket").sum("wsum").to_pandas())
    # exclusive prefix over bucket sums — O(#buckets) on the driver
    per_bucket = per_bucket.sort_values("bucket")
    offsets = dict(zip(
        per_bucket.bucket.to_numpy(),
        np.concatenate(([0], np.cumsum(per_bucket["sum(wsum)"].to_numpy())[:-1])),
    ))

    def bucket_col(t: pa.Table) -> pa.Table:
        b = t.column(key).to_numpy() // width
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def assign(t: pa.Table) -> pa.Table:
        idx = np.argsort(t.column(key).to_numpy(), kind="stable")
        k = t.column(key).to_numpy()[idx]
        w = t.column(weight).to_numpy()[idx]
        before = offsets[int(k[0] // width)] + np.concatenate(
            ([0], np.cumsum(w)[:-1]))
        return pa.table({key: pa.array(k, t.column(key).type),
                         weight: pa.array(w, t.column(weight).type),
                         "seq_id": pa.array(before // budget, pa.int64())})

    return (narrow.map_batches(bucket_col, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("bucket").map_groups(assign, batch_format="pyarrow"))
