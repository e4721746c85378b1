"""Key-frequency sketches for skew detection (SURVEY §7 / north_rule).

The reference has no skew handling (SURVEY §2.8) — a hot key just runs long.
This engine detects heavy hitters BEFORE the wide merge shuffle and
pre-reduces ("salts") them:

  * exact path (bounded key cardinality): per-batch partial counts inside
    ``map_batches`` — one row per distinct key per batch — then a tiny
    ``groupby(key).sum`` over the partials (the combiner pattern);
  * sketch path (unbounded cardinality at 10^10 events): a mergeable
    count-min sketch per batch, merged associatively in a second stage; used
    with a small sample fraction, so the detection pass is ~free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ethereum_etl_ray.functions.hashing import hash64


def partial_counts(batch: pa.Table, key: str) -> pa.Table:
    """map_batches combiner: exact per-batch key counts (≤ distinct keys rows).
    Arrow-native (``pc.value_counts``) — no pandas round-trip in the hot path.
    Null keys are excluded — matching the original pandas ``value_counts``
    behavior this replaced (a null key is never a valid skew-salting or
    heavy-hitter candidate; the CDC path quarantines null keys upstream).
    Note this differs from SQL ``GROUP BY``, which keeps a NULL group —
    callers needing that must filter/handle nulls themselves."""
    import pyarrow.compute as pc

    vc = pc.value_counts(pc.drop_null(batch.column(key).combine_chunks()))
    return pa.table({key: vc.field("values"),
                     "partial_n": pc.cast(vc.field("counts"), pa.int64())})


def heavy_hitters(ds: ray.data.Dataset, key: str, *, min_count: int | None = None,
                  top_k: int | None = None) -> pd.DataFrame:
    """Exact heavy hitters via partial-count pre-aggregation (tiny shuffle)."""
    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(lambda b: partial_counts(b, key), batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(key)
        .aggregate(Sum("partial_n", alias_name="n"))
    )
    df = agg.to_pandas()
    df = df.sort_values(["n", key], ascending=[False, True])
    if min_count is not None:
        df = df[df.n >= min_count]
    if top_k is not None:
        df = df.head(top_k)
    return df.reset_index(drop=True)


class CountMinSketch:
    """Mergeable count-min sketch (depth × width counters, conservative point
    query = min over rows). Deterministic row seeds → mergeable across tasks."""

    __slots__ = ("depth", "width", "table")

    def __init__(self, depth: int = 4, width: int = 2048, table: np.ndarray | None = None):
        self.depth = depth
        self.width = width
        self.table = table if table is not None else np.zeros((depth, width), dtype=np.int64)

    def _cols(self, keys) -> np.ndarray:
        h = hash64(keys)
        # derive per-row hashes by mixing with distinct odd constants
        mults = (np.arange(1, self.depth + 1, dtype=np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        return ((h[None, :] * mults[:, None]) >> np.uint64(17)) % np.uint64(self.width)

    def add_many(self, keys) -> None:
        cols = self._cols(keys)
        for r in range(self.depth):
            np.add.at(self.table[r], cols[r].astype(np.int64), 1)

    def query(self, keys) -> np.ndarray:
        cols = self._cols(keys)
        est = np.stack([self.table[r][cols[r].astype(np.int64)] for r in range(self.depth)])
        return est.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.depth, self.width) == (other.depth, other.width)
        return CountMinSketch(self.depth, self.width, self.table + other.table)

    def serialize(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def deserialize(cls, raw: bytes, depth: int = 4, width: int = 2048) -> "CountMinSketch":
        t = np.frombuffer(raw, dtype=np.int64).reshape(depth, width).copy()
        return cls(depth, width, t)


def sketch_heavy_hitters(ds: ray.data.Dataset, key: str, *, sample_fraction: float = 0.05,
                         depth: int = 4, width: int = 4096, seed: int = 7,
                         candidate_cap: int = 4096) -> pd.DataFrame:
    """Approximate heavy hitters: sample → per-batch (sketch, candidate keys)
    → associative merge. Returns candidates with estimated counts, descending.

    Scale path: the per-batch output is O(width) regardless of key
    cardinality, so this works at 10^10 events where exact counting cannot.
    """
    sampled = ds.random_sample(sample_fraction, seed=seed) if sample_fraction < 1.0 else ds

    def batch_sketch(batch: pa.Table) -> pa.Table:
        keys = batch.column(key)
        cms = CountMinSketch(depth, width)
        arr = keys.to_pandas().to_numpy()
        cms.add_many(arr)
        vc = pd.Series(arr).value_counts().head(candidate_cap)
        return pa.table({
            "sketch": pa.array([cms.serialize()], pa.binary()),
            "cands": pa.array([list(map(str, vc.index))], pa.list_(pa.string())),
        })

    parts = sampled.map_batches(batch_sketch, batch_format="pyarrow").take_all()
    if not parts:
        return pd.DataFrame({key: [], "est_n": []})
    merged = CountMinSketch(depth, width)
    cands: set[str] = set()
    for row in parts:
        merged = merged.merge(CountMinSketch.deserialize(bytes(row["sketch"]), depth, width))
        cands.update(row["cands"])
    cand_list = sorted(cands)
    est = merged.query(cand_list)
    df = pd.DataFrame({key: cand_list, "est_n": est})
    return df.sort_values(["est_n", key], ascending=[False, True]).reset_index(drop=True)
