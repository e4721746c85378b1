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


def _batch_sketch_stage(key: str, depth: int, width: int, candidate_cap: int):
    """map_batches stage: one (sketch, candidates) row per batch.
    Arrow-native candidate counting (``pc.value_counts``)."""
    import pyarrow.compute as pc

    def batch_sketch(batch: pa.Table) -> pa.Table:
        cms = CountMinSketch(depth, width)
        arr = batch.column(key).to_pandas().to_numpy()
        cms.add_many(arr)
        vc = pc.value_counts(pc.drop_null(batch.column(key).combine_chunks()))
        counts = vc.field("counts").to_numpy()
        vals = vc.field("values").to_numpy(zero_copy_only=False)
        if len(vals) > candidate_cap:
            top = np.argpartition(counts, -candidate_cap)[-candidate_cap:]
            vals = vals[top]
        return pa.table({
            "sketch": pa.array([cms.serialize()], pa.binary()),
            "cands": pa.array([[str(v) for v in vals]], pa.list_(pa.string())),
        })

    return batch_sketch


def _make_sketch_merger(depth: int, width: int, candidate_cap: int):
    """Collapse a batch of (sketch, candidates) rows into ONE row: in-place
    counter sum (associative — the final table is identical for any tree
    shape) plus a candidate union capped at ``candidate_cap`` by the merged
    subtree's own estimates (a global heavy hitter dominates every subtree
    it appears in, so capping per level cannot evict it)."""

    def merge_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        acc = np.zeros((depth, width), dtype=np.int64)
        cands: set[str] = set()
        sk_col, cd_col = t.column("sketch"), t.column("cands")
        for i in range(t.num_rows):
            acc += np.frombuffer(sk_col[i].as_py(), dtype=np.int64).reshape(depth, width)
            cands.update(cd_col[i].as_py())
        merged = CountMinSketch(depth, width, acc)
        cand_list = sorted(cands)
        if len(cand_list) > candidate_cap:
            est = merged.query(cand_list)
            top = np.argpartition(est, -candidate_cap)[-candidate_cap:]
            cand_list = [cand_list[i] for i in sorted(top)]
        return pa.table({
            "sketch": pa.array([merged.serialize()], pa.binary()),
            "cands": pa.array([cand_list], pa.list_(pa.string())),
        })

    return merge_rows


def tree_merge_sketches(sk: ray.data.Dataset, *, depth: int, width: int,
                        candidate_cap: int, fan_in: int = 32) -> ray.data.Dataset:
    """Associative tree reduction of per-batch sketch rows INSIDE the
    cluster: block-local merge → ``fan_in``-way merge → final merge. The
    driver's eventual ``take_all`` sees exactly ONE ~``depth×width×8``-byte
    row, independent of how many batches were sketched (the old
    implementation shipped every per-batch sketch to the driver — gigabytes
    at 10^10 events — and merged them in a serial loop)."""
    merge = _make_sketch_merger(depth, width, candidate_cap)
    # level 1: one row per block (batch_size=None = whole block per call)
    sk = sk.map_batches(merge, batch_size=None, batch_format="pyarrow")
    # level 2: bounded fan-in, then the root
    sk = sk.repartition(fan_in).map_batches(merge, batch_size=None,
                                            batch_format="pyarrow")
    return sk.repartition(1).map_batches(merge, batch_size=None,
                                         batch_format="pyarrow")


def sketch_heavy_hitters(ds: ray.data.Dataset, key: str, *, sample_fraction: float = 0.05,
                         depth: int = 4, width: int = 4096, seed: int = 7,
                         candidate_cap: int = 4096) -> pd.DataFrame:
    """Approximate heavy hitters: sample → per-batch (sketch, candidate keys)
    → distributed associative tree merge. Returns candidates with estimated
    counts, descending.

    Scale path: the per-batch output is O(width) regardless of key
    cardinality, and the tree merge hands the driver ONE sketch row — this
    works at 10^10 events where exact counting cannot.
    """
    sampled = ds.random_sample(sample_fraction, seed=seed) if sample_fraction < 1.0 else ds
    sk = sampled.map_batches(_batch_sketch_stage(key, depth, width, candidate_cap),
                             batch_format="pyarrow")
    parts = tree_merge_sketches(sk, depth=depth, width=width,
                                candidate_cap=candidate_cap).take_all()
    if not parts:
        return pd.DataFrame({key: [], "est_n": []})
    assert len(parts) == 1, f"tree merge must yield one root row, got {len(parts)}"
    merged = CountMinSketch.deserialize(bytes(parts[0]["sketch"]), depth, width)
    cand_list = sorted(parts[0]["cands"])
    est = merged.query(cand_list)
    df = pd.DataFrame({key: cand_list, "est_n": est})
    return df.sort_values(["est_n", key], ascending=[False, True]).reset_index(drop=True)
