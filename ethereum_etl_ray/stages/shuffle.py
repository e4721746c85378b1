"""Deterministic global corpus shuffle with explicit rank.

Training pipelines need a reproducible random permutation of the corpus
(epoch ordering, shard assignment) that is stable across runs, engines and
partitionings — `Dataset.random_shuffle` gives neither determinism across
plans nor an explicit position. Here the permutation key is `md5(key)`:
uniformly distributed, reproducible everywhere (DuckDB's `md5()` is the
oracle twin), and collision-free per distinct key.

No global sort. The digest space is range-partitioned by its first
`prefix_bytes` bytes into 256 / 65536 ordered buckets:

  pass 1   narrow projection → per-batch bincount combiner → one tiny
           groupby: per-bucket row counts (≤ #buckets rows to the driver,
           prefix-summed there into bucket offsets — O(buckets) ints).
  pass 2   one hash shuffle by bucket; each bucket sorts locally by
           (digest, key) and ranks rows as offset + arange. Bucket order
           IS digest order (hex prefix = byte prefix), so local rank +
           bucket offset is the exact global rank.

Scale: bucket size ≈ N / buckets rows held by one map_groups call — use
``prefix_bytes=2`` (65536 buckets) above ~10^8 rows. Reference analogue:
none (SURVEY §2.8 — no sorts/sampling in the reference); this is the
ordering primitive the engine adds for training-data work.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


def _digests(ids: np.ndarray) -> list[str]:
    # hashlib loop is C-dominated; the column is narrow (key only)
    return [hashlib.md5(str(i).encode()).hexdigest() for i in ids]


def deterministic_shuffle(ds: ray.data.Dataset, key_col: str = "doc_id",
                          out_col: str = "pos", *,
                          prefix_bytes: int = 1) -> ray.data.Dataset:
    """Appends ``out_col``: the row's 1-based position in the md5(key)
    permutation (ties broken by key; md5 makes them unreachable for
    distinct keys). Keys must be non-null and unique for a total order."""
    if prefix_bytes not in (1, 2):
        raise ValueError("prefix_bytes must be 1 (256 buckets) or 2 (65536)")
    n_buckets = 256 ** prefix_bytes
    width = 2 * prefix_bytes

    def bucket_counts(t: pa.Table) -> pa.Table:
        ids = t.column(key_col).to_numpy()
        b = np.array([int(h[:width], 16) for h in _digests(ids)], np.int64)
        counts = np.bincount(b, minlength=n_buckets)
        nz = np.nonzero(counts)[0]
        return pa.table({"__bucket": pa.array(nz, pa.int64()),
                         "n": pa.array(counts[nz], pa.int64())})

    per_bucket = (ds.select_columns([key_col])
                  .map_batches(bucket_counts, batch_format="pyarrow",
                               zero_copy_batch=True)
                  .groupby("__bucket").sum("n").to_pandas())
    counts = np.zeros(n_buckets, dtype=np.int64)
    if "__bucket" in per_bucket.columns:  # empty input loses its schema
        counts[per_bucket["__bucket"].to_numpy()] =             per_bucket["sum(n)"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(key_col).to_numpy()
        hexes = _digests(ids)
        t = t.append_column("__digest", pa.array(hexes, pa.string()))
        return t.append_column("__bucket", pa.array(
            [int(h[:width], 16) for h in hexes], pa.int64()))

    def rank_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.drop_columns(["__digest", "__bucket"]).append_column(
                out_col, pa.array([], pa.int64()))
        bucket = group.column("__bucket")[0].as_py()
        dig = np.asarray(group.column("__digest").to_pylist(), dtype=object)
        ids = group.column(key_col).to_numpy()
        order = np.lexsort((ids, dig))
        pos = np.empty(group.num_rows, dtype=np.int64)
        pos[order] = offsets[bucket] + 1 + np.arange(group.num_rows)
        return group.drop_columns(["__digest", "__bucket"]).append_column(
            out_col, pa.array(pos, pa.int64()))

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(rank_bucket, batch_format="pyarrow"))
