"""Mergeable t-digest quantile sketch (Dunning & Ertl's merging digest).

Completes the engine's sketch family (count-min for frequency, HLL for
cardinality, t-digest for rank statistics): approximate quantiles over
10^10-row value columns where the exact distributed-selection path
(``stages/selection.py:kth_smallest``) would need one shuffle round per
requested quantile. The reference has no rank statistics at all
(SURVEY §2.8 — "no sorts, no top-k"); this is the scale substitute.

Shape mirrors ``stages/sketch.py``: per-batch partial digests inside
``map_batches`` (one O(delta)-sized row per batch regardless of row count),
an associative bounded-fan-in tree merge, and the driver receives ONE root
row. The grouped variant emits one digest row per key per batch (the
combiner pattern) and merges per group.

Accuracy: with the k0-style size bound ``4·W·q·(1-q)/delta`` the rank error
is ~``1/delta`` at the median and shrinks toward the tails; the pytest
oracle asserts rank error ≤ 2/100 at delta=200 against exact quantiles.
Estimates depend on batch boundaries (merge order), so queries built on
this are rows-only at the driver — the same contract as CMS/HLL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


class TDigest:
    """Centroid-list digest with merge-by-compression.

    ``means``/``weights`` are parallel float64 arrays sorted by mean;
    ``vmin``/``vmax`` track exact extremes for tail clamping.
    """

    __slots__ = ("delta", "means", "weights", "vmin", "vmax")

    def __init__(self, delta: int = 200, means: np.ndarray | None = None,
                 weights: np.ndarray | None = None,
                 vmin: float = np.inf, vmax: float = -np.inf):
        self.delta = int(delta)
        self.means = np.asarray([] if means is None else means, np.float64)
        self.weights = np.asarray([] if weights is None else weights, np.float64)
        self.vmin = float(vmin)
        self.vmax = float(vmax)

    # -- construction -----------------------------------------------------
    @classmethod
    def from_values(cls, values: np.ndarray, delta: int = 200) -> "TDigest":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return cls(delta)
        d = cls(delta, v, np.ones_like(v), float(v.min()), float(v.max()))
        d._compress()
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        # always return a FRESH digest carrying self's delta — returning an
        # aliased operand would share mutable arrays with the caller and
        # silently adopt the other operand's compression parameter
        if other.weights.size == 0:
            return TDigest(self.delta, self.means.copy(), self.weights.copy(),
                           self.vmin, self.vmax)
        if self.weights.size == 0:
            return TDigest(self.delta, other.means.copy(), other.weights.copy(),
                           other.vmin, other.vmax)
        out = TDigest(self.delta,
                      np.concatenate([self.means, other.means]),
                      np.concatenate([self.weights, other.weights]),
                      min(self.vmin, other.vmin), max(self.vmax, other.vmax))
        out._compress()
        return out

    def _compress(self) -> None:
        # fully vectorized merging pass (no Python loop over points, which
        # would dominate the per-batch hot path): sort by mean, map each
        # point's mid-rank q to the k1 scale k(q) = δ/2π·asin(2q−1), and
        # fuse runs sharing floor(k) via add.reduceat — each cluster spans
        # ≤1 k-unit, which IS the t-digest size bound (tail clusters get
        # finer resolution, ≤ ~δ/2+1 centroids total)
        if self.means.size <= 1:
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        q = (np.cumsum(w) - w / 2.0) / total
        k = self.delta / (2.0 * np.pi) * np.arcsin(2.0 * q - 1.0)
        bucket = np.floor(k).astype(np.int64)
        starts = np.concatenate(
            [[0], np.flatnonzero(bucket[1:] != bucket[:-1]) + 1])
        wsum = np.add.reduceat(w, starts)
        self.means = np.add.reduceat(m * w, starts) / wsum
        self.weights = wsum

    # -- queries ----------------------------------------------------------
    def quantile(self, q: float) -> float:
        if self.weights.size == 0:
            return float("nan")
        total = self.weights.sum()
        target = q * total
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(self.weights)
        mids = cum - self.weights / 2.0
        if target <= mids[0]:
            # interpolate min → first centroid
            if mids[0] <= 0:
                return float(self.means[0])
            f = max(0.0, target) / mids[0]
            return float(self.vmin + f * (self.means[0] - self.vmin))
        if target >= mids[-1]:
            span = total - mids[-1]
            if span <= 0:
                return float(self.means[-1])
            f = min(1.0, (target - mids[-1]) / span)
            return float(self.means[-1] + f * (self.vmax - self.means[-1]))
        j = int(np.searchsorted(mids, target, side="right"))
        f = (target - mids[j - 1]) / (mids[j] - mids[j - 1])
        return float(self.means[j - 1] + f * (self.means[j] - self.means[j - 1]))

    # -- wire format ------------------------------------------------------
    def serialize(self) -> bytes:
        head = np.asarray([self.delta, self.means.size, self.vmin, self.vmax],
                          np.float64)
        return np.concatenate([head, self.means, self.weights]).tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "TDigest":
        a = np.frombuffer(blob, np.float64)
        delta, n = int(a[0]), int(a[1])
        return cls(delta, a[4:4 + n].copy(), a[4 + n:4 + 2 * n].copy(),
                   a[2], a[3])


# ---------------------------------------------------------------------------
# Distributed composition
# ---------------------------------------------------------------------------


def _batch_digest(col: str, delta: int):
    def fn(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        d = TDigest.from_values(v, delta)
        if d.weights.size == 0:
            return pa.table({"td": pa.array([], pa.binary())})
        return pa.table({"td": pa.array([d.serialize()], pa.binary())})
    return fn


def _merge_rows(batch: pa.Table) -> pa.Table:
    blobs = batch.column("td").to_pylist()
    if not blobs:
        return pa.table({"td": pa.array([], pa.binary())})
    acc = TDigest.deserialize(bytes(blobs[0]))
    for b in blobs[1:]:
        acc = acc.merge(TDigest.deserialize(bytes(b)))
    return pa.table({"td": pa.array([acc.serialize()], pa.binary())})


def tree_merge_digests(sk: ray.data.Dataset, *, fan_in: int = 32) -> ray.data.Dataset:
    """Associative tree reduction (cf. ``sketch.py:tree_merge_sketches``):
    block-local merge → bounded fan-in → root. The driver's eventual
    ``take_all`` sees ONE O(delta)-byte row regardless of batch count."""
    sk = sk.map_batches(_merge_rows, batch_size=None, batch_format="pyarrow")
    sk = sk.repartition(fan_in).map_batches(_merge_rows, batch_size=None,
                                            batch_format="pyarrow")
    return sk.repartition(1).map_batches(_merge_rows, batch_size=None,
                                         batch_format="pyarrow")


def approx_quantiles(ds: ray.data.Dataset, col: str, qs: list[float], *,
                     delta: int = 200) -> pd.DataFrame:
    """Global approximate quantiles: one streaming pass + tree merge."""
    sk = ds.map_batches(_batch_digest(col, delta), batch_format="pyarrow",
                        zero_copy_batch=True)
    rows = tree_merge_digests(sk).take_all()
    if not rows:
        return pd.DataFrame({"q": qs, "value": [np.nan] * len(qs)})
    assert len(rows) == 1, f"tree merge must yield one root row, got {len(rows)}"
    d = TDigest.deserialize(bytes(rows[0]["td"]))
    return pd.DataFrame({"q": qs, "value": [d.quantile(q) for q in qs]})


def grouped_quantiles(ds: ray.data.Dataset, key: str, col: str,
                      qs: list[float], *, delta: int = 200) -> pd.DataFrame:
    """Per-key approximate quantiles. Per-batch combiner emits one digest
    row per key present (O(distinct-keys-per-batch), independent of rows);
    one hash shuffle of digest rows — never of the value column — then a
    per-group associative merge."""

    def partial(batch: pa.Table) -> pa.Table:
        key_type = batch.schema.field(key).type  # pin: pa.array([]) infers
        # null and a zero-row batch would emit a schema-mismatched block
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        vals = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        if keys.size == 0:
            return pa.table({key: pa.array([], key_type),
                             "td": pa.array([], pa.binary())})
        ks, blobs = [], []
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        bounds = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
        for s, e in zip(bounds, np.concatenate((bounds[1:], [keys.size]))):
            d = TDigest.from_values(vals[s:e], delta)
            if d.weights.size:
                ks.append(keys[s])
                blobs.append(d.serialize())
        return pa.table({key: pa.array(ks, key_type),
                         "td": pa.array(blobs, pa.binary())})

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = TDigest.deserialize(bytes(g.td.iloc[0]))
        for b in g.td.iloc[1:]:
            acc = acc.merge(TDigest.deserialize(bytes(b)))
        return pd.DataFrame({key: [g[key].iloc[0]] * len(qs), "q": qs,
                             "value": [acc.quantile(q) for q in qs]})

    sk = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = sk.groupby(key).map_groups(per_group, batch_format="pandas").to_pandas()
    return out.sort_values([key, "q"]).reset_index(drop=True)


def approx_quantiles_multi(ds: ray.data.Dataset, cols: list[str],
                           qs: list[float], *, delta: int = 200
                           ) -> dict[str, np.ndarray]:
    """Quantiles for SEVERAL columns in ONE streaming pass: each batch
    emits one digest row per column, merged per column downstream
    (used by the z-order writer, which needs boundaries for every
    clustered column and should not scan the input once per column)."""

    def partial(batch: pa.Table) -> pa.Table:
        names, blobs = [], []
        for c in cols:
            v = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            d = TDigest.from_values(v, delta)
            if d.weights.size:
                names.append(c)
                blobs.append(d.serialize())
        return pa.table({"col": pa.array(names, pa.string()),
                         "td": pa.array(blobs, pa.binary())})

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = TDigest.deserialize(bytes(g.td.iloc[0]))
        for b in g.td.iloc[1:]:
            acc = acc.merge(TDigest.deserialize(bytes(b)))
        return pd.DataFrame({"col": [g.col.iloc[0]] * len(qs), "q": qs,
                             "value": [acc.quantile(q) for q in qs]})

    sk = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = sk.groupby("col").map_groups(per_group, batch_format="pandas").to_pandas()
    return {c: g.sort_values("q").value.to_numpy(dtype=np.float64)
            for c, g in out.groupby("col")}
