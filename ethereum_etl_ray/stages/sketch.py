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


class HyperLogLog:
    """Mergeable HyperLogLog distinct-count sketch (2**p byte registers).

    Standard Flajolet–Fusy–Gandouet–Meunier estimator with the linear-
    counting small-range correction. Registers merge by elementwise max
    (associative + idempotent → any tree shape, and re-adding the same keys
    is a no-op, matching the engine's replay-idempotence discipline).
    """

    __slots__ = ("p", "m", "regs")

    def __init__(self, p: int = 12, regs: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.regs = regs if regs is not None else np.zeros(self.m, np.uint8)

    def add_many(self, keys) -> None:
        h = hash64(keys)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros + 1 = 65 - bit_length, via exact integer
        # binary-search bit length (log2-as-float rounds wrong near 2**64)
        bl = np.zeros(len(h), np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            m = v >> np.uint64(shift)
            has = m != 0
            bl[has] += shift
            v[has] = m[has]
        bl += 1  # rest is never 0 (sentinel low bits), so bit_length ≥ 1
        np.maximum.at(self.regs, idx, np.uint8(65) - bl)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.regs, other.regs))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.sum(np.exp2(-self.regs.astype(np.float64)))
        zeros = int(np.count_nonzero(self.regs == 0))
        if e <= 2.5 * m and zeros > 0:  # linear counting
            e = m * np.log(m / zeros)
        return float(e)

    def serialize(self) -> bytes:
        return self.regs.tobytes()

    @classmethod
    def deserialize(cls, raw: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(raw, dtype=np.uint8).copy())


def approx_distinct(ds: ray.data.Dataset, key: str, *, p: int = 12,
                    fan_in: int = 32) -> float:
    """Approximate COUNT(DISTINCT key) via a distributed HyperLogLog.

    Per-batch register arrays (O(2**p) bytes each, independent of
    cardinality) tree-merge inside the cluster by elementwise max; the
    driver receives ONE 2**p-byte row. Standard error ≈ 1.04/sqrt(2**p)
    (~1.6 % at p=12). The exact path (`Dataset.unique`) shuffles every key;
    this sketch replaces it wherever a ±2 % answer is acceptable —
    cardinality estimation for partition sizing, skew detection, dedup
    ratio monitoring.
    """

    def batch_regs(t: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        arr = t.column(key).to_pandas().to_numpy()
        hll.add_many(arr)
        return pa.table({"regs": pa.array([hll.serialize()], pa.binary())})

    def merge_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        acc = np.zeros(1 << p, np.uint8)
        for i in range(t.num_rows):
            acc = np.maximum(acc, np.frombuffer(
                t.column("regs")[i].as_py(), dtype=np.uint8))
        return pa.table({"regs": pa.array([acc.tobytes()], pa.binary())})

    sk = ds.map_batches(batch_regs, batch_format="pyarrow",
                        zero_copy_batch=True)
    sk = sk.map_batches(merge_rows, batch_size=None, batch_format="pyarrow")
    sk = sk.repartition(fan_in).map_batches(merge_rows, batch_size=None,
                                            batch_format="pyarrow")
    rows = (sk.repartition(1).map_batches(merge_rows, batch_size=None,
                                          batch_format="pyarrow").take_all())
    if not rows:
        return 0.0
    assert len(rows) == 1, f"tree merge must yield one root row, got {len(rows)}"
    return HyperLogLog.deserialize(bytes(rows[0]["regs"]), p).estimate()


def approx_distinct_by(ds: ray.data.Dataset, group_col: str, key: str, *,
                       p: int = 12) -> ray.data.Dataset:
    """Per-group approximate COUNT(DISTINCT ``key``) — the grouped
    HyperLogLog (the exact grouped path pays a shuffle of every distinct
    (group, key) pair; this moves one 2**p-byte register row per
    (batch, group) regardless of key cardinality).

    Per-batch: one HLL per group present in the batch (bounded by the
    batch's distinct groups — for VERY high-cardinality grouping prefer the
    exact pair-dedup path, where the pairs are the smaller object). Merge:
    one co-partitioned bytewise-max fold per group. Output
    (group, estimate) rows; standard error ≈ 1.04/sqrt(2**p).
    """
    from ethereum_etl_ray.stages.grouped import map_copartitions

    def batch_regs(t: pa.Table) -> pa.Table:
        df = t.select([group_col, key]).to_pandas()
        groups, regs = [], []
        for g, sub in df.groupby(group_col, sort=False):
            h = HyperLogLog(p)
            h.add_many(sub[key].to_numpy())
            groups.append(g)
            regs.append(h.serialize())
        gtype = t.schema.field(group_col).type
        return pa.table({group_col: pa.array(groups, gtype),
                         "regs": pa.array(regs, pa.binary())})

    partials = ds.map_batches(batch_regs, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        groups, ests = [], []
        for g, sub in df.groupby(group_col, sort=False):
            acc = np.zeros(1 << p, np.uint8)
            for raw in sub["regs"]:
                acc = np.maximum(acc, np.frombuffer(raw, dtype=np.uint8))
            groups.append(g)
            ests.append(HyperLogLog(p, acc).estimate())
        gtype = t.schema.field(group_col).type
        return pa.table({group_col: pa.array(groups, gtype),
                         "estimate": pa.array(ests, pa.float64())})

    return map_copartitions(partials, group_col, merge_part)
