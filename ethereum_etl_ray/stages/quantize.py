"""Int8 scalar quantization of embedding columns + quantized similarity search.

At 10^10-vector scale the float32 embedding column dominates the index
footprint; scalar int8 quantization cuts it 4× (and the dot-product working
set with it) at a small recall cost — the standard first compression rung
below product quantization. Shapes:

  quantize   map_batches: unit-normalize each vector, then
             q = round(x * 127 / max_abs(x)) as fixed-size int8 lists with a
             per-vector float32 ``q_scale = max_abs/127`` (so
             ``x ≈ q * q_scale``). Stateless, zero shuffle; the quantized
             index persists as Parquet 4× smaller than the float column.
  search     the same broadcast partial-top-k shape as stages/ann.py
             brute_force_topk, but scoring int8·int8 with int32
             accumulation, rescaled per pair by the two scales — the float
             matrix never exists on the scoring path.

Recall contract: tests/test_quantize.py checks recall@k ≥ 0.8 against the
exact float top-k on the synthetic embeddings and exact agreement on a
well-separated fixture. Like IVF (stages/ann.py), this is approximate by
design — it carries a pytest oracle, not a DuckDB one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ethereum_etl_ray.util import pool_size


def _matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return np.stack(arr.to_numpy(zero_copy_only=False)).astype(np.float64)


def quantize_matrix(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unit-normalize rows, then symmetric int8: returns (q, scale) with
    dequantization ``x_unit ≈ q * scale[:, None]``."""
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    u = m / norms
    max_abs = np.abs(u).max(axis=1)
    max_abs[max_abs == 0] = 1.0
    scale = (max_abs / 127.0).astype(np.float32)
    q = np.round(u / scale[:, None]).astype(np.int8)
    return q, scale


def quantize_embeddings(ds: ray.data.Dataset, *, emb_col: str = "embedding",
                        out_col: str = "q_vec") -> ray.data.Dataset:
    """Adds ``q_vec`` (fixed-size int8 list) + ``q_scale`` (float32)."""

    def qbatch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        q, scale = quantize_matrix(_matrix(batch, emb_col))
        dim = q.shape[1]
        qcol = pa.FixedSizeListArray.from_arrays(
            pa.array(q.ravel(), pa.int8()), dim)
        batch = batch.append_column(out_col, qcol)
        return batch.append_column("q_scale", pa.array(scale, pa.float32()))

    return ds.map_batches(qbatch, batch_format="pyarrow", zero_copy_batch=True)


class _QuantizedPartialTopK:
    """Actor-pool stage: quantized query matrix fetched once per actor."""

    def __init__(self, queries_ref, k: int, id_col: str, q_col: str):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.qq = q["q"].astype(np.int32)      # (nq, dim) int32 view of int8
        self.qscale = q["scale"].astype(np.float64)
        self.k = k
        self.id_col = id_col
        self.q_col = q_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch.column(self.id_col).to_numpy()
        col = batch.column(self.q_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = col.type.list_size
        dq = col.values.to_numpy(zero_copy_only=False).reshape(-1, dim)
        dscale = batch.column("q_scale").to_numpy().astype(np.float64)
        # int32-accumulated integer dot products, rescaled per pair
        sims = (self.qq @ dq.astype(np.int32).T).astype(np.float64)
        sims *= self.qscale[:, None] * dscale[None, :]
        k = min(self.k + 1, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_v = ids[idx.ravel()]
        rows_s = np.take_along_axis(sims, idx, axis=1).ravel()
        keep = rows_q != rows_v
        return pa.table({"query_id": pa.array(rows_q[keep], pa.int64()),
                         "vec_id": pa.array(rows_v[keep], pa.int64()),
                         "score": pa.array(rows_s[keep], pa.float64())})


def quantized_topk(ds: ray.data.Dataset, query_ids: np.ndarray,
                   query_mat: np.ndarray, k: int = 5, *,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   concurrency: int | None = None) -> pd.DataFrame:
    """Approximate cosine top-k over the int8-quantized corpus.

    ``ds`` may carry float embeddings (quantized on the fly, one extra
    column per batch) or an already-quantized index (``q_vec``/``q_scale``
    present — e.g. read back from the persisted Parquet index).
    """
    from ethereum_etl_ray.stages.ann import _final_topk

    qq, qscale = quantize_matrix(np.asarray(query_mat, dtype=np.float64))
    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64),
                   "q": qq, "scale": qscale})
    if "q_vec" not in ds.schema().names:
        ds = quantize_embeddings(ds, emb_col=emb_col)
    partials = ds.map_batches(
        _QuantizedPartialTopK, fn_constructor_args=(ref, k, id_col, "q_vec"),
        batch_format="pyarrow", batch_size=4096,
        concurrency=pool_size(concurrency),
    ).to_pandas()
    return _final_topk(partials, k)
