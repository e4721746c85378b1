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


# ---------------------------------------------------------------------------
# Product quantization: the compression rung below int8. Unit vectors are
# split into m subspaces; each subspace is k-means-coded to one byte
# (m bytes/vector vs 4·dim — 32x at dim=64, m=8). Search is ADC: per query,
# one (m × k) lookup table of query-subvector · centroid dots; a document's
# score is m table lookups summed — no float vector on the scoring path.
# Training is the same distributed-Lloyd shape as stages/ann.py
# kmeans_centroids, but all m subspaces learn in ONE pass per iteration
# (each batch emits m·k partial-sum rows, O(m·k·dsub) regardless of rows).
# ---------------------------------------------------------------------------


def _unit_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def pq_train(ds: ray.data.Dataset, m: int = 8, k: int = 16, *,
             emb_col: str = "embedding", iters: int = 4,
             seed: int = 7) -> np.ndarray:
    """Learn per-subspace codebooks: returns ``(m, k, dim/m)`` float64.

    Distributed Lloyd: per iteration one streaming pass; each batch emits
    per-(subspace, code) partial sums + counts; the driver reduces
    ``m·k`` rows per batch. Deterministic seeded init from a sample."""
    n = ds.count()
    sample = ds.random_sample(min(1.0, (k * 20) / max(1, n)), seed=seed)
    sm = _unit_rows(np.stack(sample.to_pandas()[emb_col].to_numpy())
                    .astype(np.float64))
    dim = sm.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(sm), size=min(k, len(sm)), replace=False)
    # (m, k, dsub): subspace j inits from the sample rows' j-th slice
    books = np.stack([sm[pick, j * dsub:(j + 1) * dsub] for j in range(m)])
    if books.shape[1] < k:  # tiny corpus: pad by repeating rows
        reps = -(-k // books.shape[1])
        books = np.tile(books, (1, reps, 1))[:, :k]

    for _ in range(iters):
        bref = ray.put(books)

        def partial(batch: pa.Table) -> pa.Table:
            b = ray.get(bref)  # (m, k, dsub)
            x = _unit_rows(_matrix(batch, emb_col)).reshape(-1, m, dsub)
            sums = np.zeros_like(b)
            counts = np.zeros((m, k), dtype=np.int64)
            for j in range(m):
                # L2 assignment via the dot-product expansion (unit-free)
                d = (np.square(x[:, j, :, None] - b[j].T[None]).sum(axis=1))
                a = np.argmin(d, axis=1)
                np.add.at(sums[j], a, x[:, j])
                counts[j] += np.bincount(a, minlength=k)
            mj, kj = np.divmod(np.arange(m * k), k)
            return pa.table({
                "sub": pa.array(mj, pa.int32()),
                "code": pa.array(kj, pa.int32()),
                "vsum": pa.array(list(sums.reshape(m * k, dsub)),
                                 pa.list_(pa.float64())),
                "n": pa.array(counts.ravel(), pa.int64()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(books)
        counts = np.zeros((m, k), dtype=np.int64)
        for s, c, v, cnt in zip(parts["sub"], parts["code"],
                                parts["vsum"], parts["n"]):
            sums[s, c] += np.asarray(v)
            counts[s, c] += cnt
        nz = counts > 0
        books = books.copy()
        books[nz] = sums[nz] / counts[nz][:, None]
    return books


def pq_encode(ds: ray.data.Dataset, codebooks: np.ndarray, *,
              emb_col: str = "embedding",
              out_col: str = "pq_code") -> ray.data.Dataset:
    """Adds ``pq_code`` (fixed-size uint8 list, one byte per subspace)."""
    m, k, dsub = codebooks.shape
    bref = ray.put(codebooks)

    def enc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array(
                [], pa.list_(pa.uint8(), m)))
        b = ray.get(bref)
        x = _unit_rows(_matrix(batch, emb_col)).reshape(-1, m, dsub)
        codes = np.empty((batch.num_rows, m), dtype=np.uint8)
        for j in range(m):
            d = np.square(x[:, j, :, None] - b[j].T[None]).sum(axis=1)
            codes[:, j] = np.argmin(d, axis=1)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), pa.uint8()), m)
        return batch.append_column(out_col, col)

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


class _PQPartialTopK:
    """Actor-pool stage: per-query ADC lookup tables built once per actor."""

    def __init__(self, queries_ref, codebooks_ref, kk: int, id_col: str,
                 code_col: str):
        q = ray.get(queries_ref)
        books = ray.get(codebooks_ref)           # (m, k, dsub)
        self.qids = q["ids"]
        m, k, dsub = books.shape
        qm = _unit_rows(q["mat"]).reshape(len(q["ids"]), m, dsub)
        # LUT[q, j, c] = q_sub[j] · codebook[j, c]
        self.lut = np.einsum("qjd,jcd->qjc", qm, books)
        self.m = m
        self.k = kk
        self.id_col = id_col
        self.code_col = code_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch.column(self.id_col).to_numpy()
        col = batch.column(self.code_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        codes = col.values.to_numpy(zero_copy_only=False).reshape(-1, self.m)
        sims = np.zeros((self.lut.shape[0], len(ids)), dtype=np.float64)
        for j in range(self.m):
            sims += self.lut[:, j, codes[:, j]]
        k = min(self.k + 1, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_v = ids[idx.ravel()]
        rows_s = np.take_along_axis(sims, idx, axis=1).ravel()
        keep = rows_q != rows_v
        return pa.table({"query_id": pa.array(rows_q[keep], pa.int64()),
                         "vec_id": pa.array(rows_v[keep], pa.int64()),
                         "score": pa.array(rows_s[keep], pa.float64())})


def pq_topk(ds: ray.data.Dataset, query_ids: np.ndarray,
            query_mat: np.ndarray, codebooks: np.ndarray, k: int = 5, *,
            id_col: str = "vec_id", emb_col: str = "embedding",
            concurrency: int | None = None) -> pd.DataFrame:
    """Approximate cosine top-k via PQ asymmetric-distance scoring.

    ``ds`` may carry float embeddings (encoded on the fly) or an
    already-encoded index (``pq_code`` present, e.g. read back from the
    persisted Parquet index — the float column is not needed then)."""
    from ethereum_etl_ray.stages.ann import _final_topk

    qref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64),
                    "mat": np.asarray(query_mat, dtype=np.float64)})
    bref = ray.put(np.asarray(codebooks, dtype=np.float64))
    if "pq_code" not in ds.schema().names:
        ds = pq_encode(ds, codebooks, emb_col=emb_col)
    partials = ds.map_batches(
        _PQPartialTopK, fn_constructor_args=(qref, bref, k, id_col, "pq_code"),
        batch_format="pyarrow", batch_size=4096,
        concurrency=pool_size(concurrency),
    ).to_pandas()
    return _final_topk(partials, k)


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
