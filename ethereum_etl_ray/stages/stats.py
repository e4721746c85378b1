"""Exact distributed statistics from integer moment sums.

Float summation order differs between engines and between cluster shapes —
so a naive distributed mean/variance/correlation is not reproducible. These
operators instead accumulate EXACT int64 moment sums (n, Σx, Σy, Σx², Σy²,
Σxy) in a map-side combiner and apply the closed-form float expression once
at the end — the result is bit-identical for any partitioning, cluster size,
or SQL engine that mirrors the final expression.

Caller contract: inputs must be integer-valued (fixed-point scale floats
first, e.g. cents) and bounded so ``n·Σx²`` stays below 2^53 (exact in
float64) — e.g. |x| ≤ 2^15 at 10^10 rows. The reference has no statistics
surface at all (SURVEY §2.8).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data


def exact_corr(ds: ray.data.Dataset, x_col: str, y_col: str) -> float:
    """Pearson correlation of two integer-valued columns.

    One streaming pass: each batch emits a single row of six int64 moment
    sums (a combiner — O(1) rows per batch to the driver regardless of batch
    count; tree-merge the partials like ``stages/sketch.py`` if #batches
    ever dwarfs driver memory). Final expression, mirrored literal-for-
    literal by the SQL oracle:

        (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − Σx·Σx) · sqrt(n·Σy² − Σy·Σy))
    """

    def moments(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
        })

    p = (ds.select_columns([x_col, y_col])
         .map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
         .to_pandas())
    # python ints: exact regardless of magnitude; float conversion happens
    # once per term, exactly as in the SQL twin
    n = int(p.n.sum())
    sx, sy = int(p.sx.sum()), int(p.sy.sum())
    sxx, syy, sxy = int(p.sxx.sum()), int(p.syy.sum()), int(p.sxy.sum())
    if n == 0:
        return float("nan")
    num = float(n * sxy - sx * sy)
    den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
    return num / den if den != 0.0 else float("nan")
