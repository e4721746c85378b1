"""Z-order clustered Parquet layout: multi-column data skipping.

A lake laid out in arrival order answers a selective predicate on any
non-partition column by scanning everything. Z-ordering interleaves the
bits of per-column RANK buckets (equi-depth, so skew cannot collapse the
curve) into one locality-preserving key and range-partitions files by it:
a box predicate on ANY of the clustered columns then overlaps only a small
fraction of files, and the reader prunes with Parquet footer statistics —
metadata-only, no data read. Rounds out the engine's layout family
(hash-partitioned lake, hive-bucketed postings, IVF bucket directories).

Write path: per-column equi-depth boundaries from the mergeable t-digest
(one streaming pass over a sample, O(2^bits) driver floats per column) →
vectorized searchsorted rank-bucketing + bit interleave per batch → range
partition on z → one Parquet file per z-range. Read path: `pq.read_metadata`
per file (footers only) → keep files whose per-column [min, max] overlaps
the box → Ray scan of the kept files → exact residual filter.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _interleave_bits(ranks: list[np.ndarray], bits: int) -> np.ndarray:
    """Interleave ``bits`` bits of each rank array into one z value."""
    z = np.zeros(len(ranks[0]), np.uint64)
    for b in range(bits):
        for j, r in enumerate(ranks):
            z |= (((r.astype(np.uint64) >> np.uint64(b)) & np.uint64(1))
                  << np.uint64(b * len(ranks) + j))
    return z


def zorder_write(ds: ray.data.Dataset, out_dir: str, cols: list[str], *,
                 bits: int = 8, num_files: int = 64) -> int:
    """Write ``ds`` z-ordered on ``cols``; returns the file count."""
    from ethereum_etl_ray.stages.tdigest import approx_quantiles_multi

    # uint64 z key: shifting by >= 64 is undefined for numpy ints and would
    # silently corrupt z values (pruning quality, not correctness — the
    # residual filter is exact — but the clustering would degrade
    # unpredictably). A non-power-of-two num_files under-uses file ids via
    # the int(log2) floor. Both are caller bugs; fail loudly. (ADVICE r4)
    if bits * len(cols) > 64:
        raise ValueError(
            f"zorder_write: bits*len(cols) = {bits}*{len(cols)} exceeds the "
            f"64-bit z key; lower bits (e.g. bits={64 // len(cols)})")
    if num_files < 1 or (num_files & (num_files - 1)) != 0:
        raise ValueError(
            f"zorder_write: num_files must be a power of two, got {num_files}")

    qs = [i / (1 << bits) for i in range(1, 1 << bits)]
    bounds = approx_quantiles_multi(ds, cols, qs)  # ONE pass for all cols
    bref = ray.put(bounds)
    total_bits = bits * len(cols)

    def add_z(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        ranks = [np.searchsorted(
            b[c], t.column(c).to_numpy(zero_copy_only=False).astype(np.float64),
            side="right") for c in cols]
        z = _interleave_bits(ranks, bits)
        zfile = (z >> np.uint64(max(0, total_bits - int(np.log2(num_files))))
                 ).astype(np.int64)
        return t.append_column("zfile", pa.array(
            np.minimum(zfile, num_files - 1), pa.int64()))

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(add_z, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=["zfile"])
    return len(glob.glob(os.path.join(out_dir, "zfile=*", "*.parquet")))


def _file_stats(path: str, cols: list[str]) -> dict[str, tuple]:
    """Per-column (min, max) from the Parquet footer — no data read."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    out = {}
    schema = md.schema.to_arrow_schema()
    idx = {schema.field(i).name: i for i in range(len(schema.names))}
    for c in cols:
        lo, hi = np.inf, -np.inf
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                return {}  # stats missing → never prune this file
            lo, hi = min(lo, st.min), max(hi, st.max)
        out[c] = (lo, hi)
    return out


def zorder_read(out_dir: str, predicates: dict[str, tuple[float, float]],
                columns: list[str] | None = None) -> tuple[ray.data.Dataset, int, int]:
    """Footer-pruned scan. ``predicates``: col → inclusive (lo, hi) box.
    Returns (dataset with the exact residual filter applied, files kept,
    files total)."""
    files = sorted(glob.glob(os.path.join(out_dir, "zfile=*", "*.parquet")))
    pcols = list(predicates)
    kept = []
    for f in files:
        st = _file_stats(f, pcols)
        if st and any(st[c][1] < lo or st[c][0] > hi
                      for c, (lo, hi) in predicates.items()):
            continue  # provably disjoint from the box
        kept.append(f)
    if not kept:
        return (ray.data.from_items([]), 0, len(files))
    ds = ray.data.read_parquet(kept, columns=columns)

    def residual(t: pa.Table) -> pa.Table:
        mask = np.ones(t.num_rows, bool)
        for c, (lo, hi) in predicates.items():
            v = t.column(c).to_numpy(zero_copy_only=False)
            mask &= (v >= lo) & (v <= hi)
        return t.filter(pa.array(mask))

    return (ds.map_batches(residual, batch_format="pyarrow",
                           zero_copy_batch=True), len(kept), len(files))
