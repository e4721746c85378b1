"""Similarity search over an embedding column (``list<float>``).

Two paths per the project brief:
  * ``brute_force_topk`` — baseline: the small query matrix is broadcast once
    with ``ray.put`` and every batch does one float64 matmul against it
    (numpy), emitting per-batch partial top-k; a tiny final reduction picks
    the global top-k. No shuffle of the corpus.
  * ``ivf_topk`` — scale path: corpus bucketed by nearest of C seeded
    centroids (an IVF coarse quantizer); queries probe only ``nprobe``
    nearest buckets. With ``nprobe == C`` it is exact and must equal the
    brute-force result (that equivalence is the test/oracle).

Scores are computed in float64 end-to-end for DuckDB-oracle parity
(``list_cosine_similarity``); ordering tie-break is (score desc, vec_id asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    emb = batch.column(col)
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    if hasattr(emb, "values"):  # plain list<float> array
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // len(batch) if len(batch) else 0
        return flat.reshape(len(batch), dim)
    # Ray tensor-extension array (from_pandas of ndarray column)
    return np.asarray(emb.to_numpy(zero_copy_only=False)).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.sqrt((m * m).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return m / norms


class _PartialTopK:
    """Stateful map_batches stage: query matrix fetched once per actor."""

    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.qmat = _normalize(q["mat"])
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch.column(self.id_col).to_numpy()
        m = _normalize(_batch_matrix(batch, self.emb_col))
        sims = self.qmat @ m.T  # (q, batch)
        k = min(self.k + 1, sims.shape[1])  # +1 to survive self-match removal
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_v = ids[idx.ravel()]
        rows_s = np.take_along_axis(sims, idx, axis=1).ravel()
        keep = rows_q != rows_v  # exclude self-match
        return pa.table({"query_id": pa.array(rows_q[keep], pa.int64()),
                         "vec_id": pa.array(rows_v[keep], pa.int64()),
                         "score": pa.array(rows_s[keep], pa.float64())})


def _final_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    df = partials.sort_values(["query_id", "score", "vec_id"],
                              ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["score"] = np.floor(df["score"] * 1e4 + 0.5) / 1e4  # 4-dec, floor(x+.5) parity
    return df.reset_index(drop=True)[["query_id", "vec_id", "rank", "score"]]


from ethereum_etl_ray.util import pool_size as _pool_size


def brute_force_topk(ds: ray.data.Dataset, query_ids: np.ndarray, query_mat: np.ndarray,
                     k: int = 5, id_col: str = "vec_id", emb_col: str = "embedding",
                     concurrency: int | None = None) -> pd.DataFrame:
    """Exact cosine top-k of every query against the full corpus Dataset."""
    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64),
                   "mat": np.asarray(query_mat, dtype=np.float64)})
    partials = ds.map_batches(
        _PartialTopK, fn_constructor_args=(ref, k, id_col, emb_col),
        batch_format="pyarrow", batch_size=4096, concurrency=_pool_size(concurrency),
    ).to_pandas()  # partial top-k rows only: O(#batches × q × k), small
    return _final_topk(partials, k)


def assign_ivf_buckets(ds: ray.data.Dataset, centroids: np.ndarray,
                       emb_col: str = "embedding") -> ray.data.Dataset:
    """Adds an ``ivf_bucket`` column = argmax cosine(centroid, vec)."""
    cref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)  # object-store read, zero-copy after first touch
        m = _normalize(_batch_matrix(batch, emb_col))
        b = np.argmax(c @ m.T, axis=0).astype(np.int32)
        return batch.append_column("ivf_bucket", pa.array(b, pa.int32()))

    # stateless tasks (no actor reservation): centroids come from the object
    # store by reference, so nothing is re-shipped per batch
    return ds.map_batches(assign, batch_format="pyarrow")


def seeded_centroids(ds: ray.data.Dataset, n_centroids: int, emb_col: str = "embedding",
                     seed: int = 11) -> np.ndarray:
    """Deterministic coarse quantizer: sample rows as centroids (k-means init
    without iterations — adequate as an IVF demo; swap in k-means at scale)."""
    sample = ds.random_sample(min(1.0, (n_centroids * 20) / max(1, ds.count())), seed=seed)
    df = sample.to_pandas()
    mat = np.stack(df[emb_col].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)
    return mat[pick]


def kmeans_centroids(ds: ray.data.Dataset, n_centroids: int,
                     emb_col: str = "embedding", iters: int = 4,
                     seed: int = 11) -> np.ndarray:
    """Distributed Lloyd iterations on spherical k-means (cosine assignment).

    Per iteration: one streaming pass — each batch emits per-centroid partial
    vector sums + counts (O(C·dim) per batch regardless of rows); the driver
    reduces the partials and recomputes centroids. Deterministic seeded init.
    Empty clusters keep their previous centroid.
    """
    cents = seeded_centroids(ds, n_centroids, emb_col, seed=seed)
    dim = cents.shape[1]
    for _ in range(iters):
        cref = ray.put(_normalize(cents))

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _batch_matrix(batch, emb_col)
            b = np.argmax(c @ _normalize(m).T, axis=0)
            sums = np.zeros((len(c), m.shape[1]), dtype=np.float64)
            np.add.at(sums, b, m)
            counts = np.bincount(b, minlength=len(c)).astype(np.int64)
            return pa.table({
                "bucket": pa.array(np.arange(len(c), dtype=np.int32), pa.int32()),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "count": pa.array(counts, pa.int64()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros((n_centroids, dim), dtype=np.float64)
        counts = np.zeros(n_centroids, dtype=np.int64)
        for b, v, n in zip(parts.bucket, parts.vsum, parts["count"]):
            sums[b] += np.asarray(v)
            counts[b] += n
        nz = counts > 0
        cents = cents.copy()
        cents[nz] = sums[nz] / counts[nz, None]
    return cents


def ivf_topk(ds: ray.data.Dataset, query_ids: np.ndarray, query_mat: np.ndarray,
             k: int = 5, n_centroids: int = 8, nprobe: int | None = None,
             id_col: str = "vec_id", emb_col: str = "embedding",
             kmeans_iters: int = 2) -> pd.DataFrame:
    """IVF-bucketed top-k. ``nprobe=None`` probes all buckets (exact)."""
    cents = kmeans_centroids(ds, n_centroids, emb_col, iters=kmeans_iters)
    nprobe = n_centroids if nprobe is None else nprobe
    bucketed = assign_ivf_buckets(ds, cents, emb_col)
    qn = _normalize(np.asarray(query_mat, dtype=np.float64))
    probe = np.argsort(-(_normalize(cents) @ qn.T), axis=0)[:nprobe]  # (nprobe, q)
    wanted = sorted(set(probe.ravel().tolist()))
    # prune the corpus to probed buckets BEFORE the scan fan-out
    sub = bucketed.filter(expr=f"ivf_bucket in {wanted}")
    return brute_force_topk(sub, query_ids, query_mat, k, id_col, emb_col)


# ---------------------------------------------------------------------------
# Persisted IVF index: the 100 TB path. Building once writes the corpus as a
# bucket-partitioned Parquet lake; probing then reads ONLY the probed bucket
# DIRECTORIES — a file-level prune, not a row filter over a full scan (the
# round-1 ivf_topk pruned rows but still scanned everything).
# ---------------------------------------------------------------------------


def build_ivf_index(ds: ray.data.Dataset, index_dir: str, n_centroids: int = 8,
                    emb_col: str = "embedding", kmeans_iters: int = 4,
                    seed: int = 11) -> np.ndarray:
    """Build + persist: k-means centroids, then the corpus written as
    hive-partitioned Parquet (one directory per ivf_bucket)."""
    import json
    import os

    cents = kmeans_centroids(ds, n_centroids, emb_col, iters=kmeans_iters,
                             seed=seed)
    bucketed = assign_ivf_buckets(ds, cents, emb_col)
    os.makedirs(index_dir, exist_ok=True)
    bucketed.write_parquet(index_dir, partition_cols=["ivf_bucket"])
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    with open(os.path.join(index_dir, "ivf_meta.json"), "w") as f:
        json.dump({"n_centroids": int(n_centroids), "emb_col": emb_col}, f)
    return cents


def append_ivf_index(index_dir: str, new_ds: ray.data.Dataset) -> int:
    """Append new vectors into a persisted IVF index WITHOUT rebuilding:
    assign each new vector to the existing centroids and write into the same
    hive-partitioned bucket layout (parquet file names are unique per write,
    so existing data is never rewritten). The CDC analogue of
    ``build_ivf_index`` — an ingest increment becomes searchable by
    ``ivf_search`` immediately, and only its own buckets gain files.

    Centroids are NOT updated (standard IVF practice: re-train k-means
    offline when drift accumulates, then rebuild). Returns the number of
    vectors appended."""
    import json
    import os

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    meta = json.load(open(os.path.join(index_dir, "ivf_meta.json")))
    bucketed = assign_ivf_buckets(new_ds, cents, meta["emb_col"]).materialize()
    n = bucketed.count()
    if n:
        bucketed.write_parquet(index_dir, partition_cols=["ivf_bucket"])
    return int(n)


def embedding_cosine_pairs(ds: ray.data.Dataset, tau: float,
                           id_col: str = "vec_id", emb_col: str = "embedding",
                           exact_threshold: int = 200_000) -> pd.DataFrame:
    """Exact embedding near-dup pairs: all (a < b) with cosine ≥ ``tau``.

    The normalized corpus matrix is broadcast ONCE (``ray.put``); each batch
    computes its block-row of the similarity matrix — O(N²/batches) compute
    per task, O(N·dim) broadcast, output-sized collection. Exact path for
    corpora whose matrix fits the object store (~5 GB at 10M×128·f32).

    Exact-below / bucketed-above gate (the engine's standard pattern — cf.
    LSH ``streaming_threshold``, ``winner_exact_threshold``,
    ``frontier_threshold``, PageRank ``driver_threshold``): a corpus larger
    than ``exact_threshold`` rows would broadcast a matrix that scales with
    the corpus, so it auto-routes to ``embedding_bucketed_pairs`` with
    2-probe IVF blocking (approximate: pairs sharing no probed bucket are
    missed; same output schema and rounding rule).

    Scores are 4-decimal floor(x+.5)-rounded BEFORE thresholding so the
    membership boundary is reproducible across engines (same rule as the
    top-k oracle parity)."""
    # pin before counting: a derived (lazy) corpus would otherwise execute
    # once for count() and again for the pairs pass (cf. dedup_apply's gate)
    ds = ds.materialize()
    if ds.count() > exact_threshold:
        return embedding_bucketed_pairs(ds, tau, id_col=id_col,
                                        emb_col=emb_col, assign_probes=2)
    corpus = ds.select_columns([id_col, emb_col]).to_pandas()
    ids = corpus[id_col].to_numpy()
    mat = _normalize(np.stack(corpus[emb_col].to_numpy()).astype(np.float64))
    ref = ray.put({"ids": ids, "mat": mat})

    def block(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        bids = batch.column(id_col).to_numpy()
        bm = _normalize(_batch_matrix(batch, emb_col))
        sims = np.floor(bm @ c["mat"].T * 1e4 + 0.5) / 1e4
        bi, cj = np.nonzero(sims >= tau)
        a, b = bids[bi], c["ids"][cj]
        keep = a < b  # each unordered pair reported once, no self-pairs
        return pa.table({"vec_a": pa.array(a[keep], pa.int64()),
                         "vec_b": pa.array(b[keep], pa.int64()),
                         "cos_4": pa.array(sims[bi, cj][keep], pa.float64())})

    out = ds.map_batches(block, batch_format="pyarrow", batch_size=2048).to_pandas()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def embedding_bucketed_pairs(ds: ray.data.Dataset, tau: float,
                             n_centroids: int = 8, id_col: str = "vec_id",
                             emb_col: str = "embedding",
                             kmeans_iters: int = 2,
                             assign_probes: int = 2) -> pd.DataFrame:
    """Scale path for embedding near-dup: candidates only WITHIN an IVF
    bucket (k-means blocked — near neighbors land in the same bucket with
    high probability), pairwise cosine per group.

    Multi-probe assignment: each vector lands in its ``assign_probes``
    nearest buckets (default 2), so a pair straddling a bucket boundary —
    the two members' primary centroids differ but they share a secondary —
    is still co-bucketed and found; duplicate reports from shared buckets
    are dropped downstream. Costs ``assign_probes``× shuffle volume.
    Still approximate (pairs sharing NO probed bucket are missed);
    ``assign_probes=1`` recovers the primary-bucket-only behavior."""
    cents = kmeans_centroids(ds, n_centroids, emb_col, iters=kmeans_iters)
    cref = ray.put(_normalize(cents))
    p = max(1, min(assign_probes, len(cents)))

    def assign_multi(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("ivf_bucket", pa.array([], pa.int32()))
        c = ray.get(cref)
        m = _normalize(_batch_matrix(batch, emb_col))
        sims = c @ m.T  # (C, n)
        top = np.argpartition(-sims, p - 1, axis=0)[:p]  # (p, n), distinct
        rep = batch.take(pa.array(np.tile(np.arange(batch.num_rows), p)))
        return rep.append_column(
            "ivf_bucket", pa.array(top.ravel().astype(np.int32), pa.int32()))

    bucketed = ds.map_batches(assign_multi, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        m = _normalize(np.stack(group[emb_col].to_numpy()).astype(np.float64))
        sims = np.floor(m @ m.T * 1e4 + 0.5) / 1e4
        a, b = np.nonzero(sims >= tau)
        keep = ids[a] < ids[b]
        return pd.DataFrame({"vec_a": ids[a][keep], "vec_b": ids[b][keep],
                             "cos_4": sims[a, b][keep]})

    out = bucketed.groupby("ivf_bucket").map_groups(
        pairs, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({"vec_a": pd.Series(dtype=np.int64),
                             "vec_b": pd.Series(dtype=np.int64),
                             "cos_4": pd.Series(dtype=np.float64)})
    return (out.drop_duplicates(subset=["vec_a", "vec_b"])
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))


def ivf_search(index_dir: str, query_ids: np.ndarray, query_mat: np.ndarray,
               k: int = 5, nprobe: int | None = None,
               id_col: str = "vec_id", emb_col: str = "embedding") -> pd.DataFrame:
    """Probe a persisted index: reads only the ``nprobe`` nearest buckets'
    directories. ``nprobe=None`` probes everything (exact)."""
    import json
    import os

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    meta = json.load(open(os.path.join(index_dir, "ivf_meta.json")))
    nprobe = meta["n_centroids"] if nprobe is None else nprobe
    qn = _normalize(np.asarray(query_mat, dtype=np.float64))
    probe = np.argsort(-(_normalize(cents) @ qn.T), axis=0)[:nprobe]
    dirs = [os.path.join(index_dir, f"ivf_bucket={b}")
            for b in sorted(set(probe.ravel().tolist()))]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        # every probed centroid owns an empty cluster (k-means collapse on
        # skewed data): no candidates, not an error
        return pd.DataFrame({"query_id": pd.Series(dtype=np.int64),
                             "vec_id": pd.Series(dtype=np.int64),
                             "rank": pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64)})
    sub = ray.data.read_parquet(files, columns=[id_col, emb_col])
    return brute_force_topk(sub, query_ids, query_mat, k, id_col, emb_col)


def standardize_embeddings(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Per-dimension z-score standardization of an embedding column — the
    feature-scaling pass before clustering / quantization. Two streaming
    passes: (1) per-batch integer moment sums over values quantized to
    ``floor(x*scale + 0.5)`` (O(dim) rows per batch, one tiny hash
    aggregate, exact in int64/python-int — no float summation order to
    disagree on across engines or partitionings); (2) one vectorized
    broadcast apply. The z-score is a single float expression from exact
    integers (μ = s/n, σ = sqrt(n·ss − s²)/n, population variance), so the
    output is bit-identical to the SQL oracle. Output is exploded
    (id, dim, z) rows. Zero-variance dimensions divide by zero (±inf/nan)
    — same in both engines; filter upstream if the data allows them."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, emb_col)
        q = np.floor(m * scale + 0.5).astype(np.int64)
        dim = q.shape[1] if q.size else 0
        return pa.table({
            "dim": pa.array(np.arange(dim, dtype=np.int64)),
            "n": pa.array(np.full(dim, q.shape[0], np.int64)),
            "s": pa.array(q.sum(axis=0), pa.int64()),
            "ss": pa.array((q * q).sum(axis=0), pa.int64()),
        })

    sums = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("dim")
            .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                       Sum("ss", alias_name="ss"))
            .to_pandas().sort_values("dim"))
    mu = np.empty(len(sums)); sig = np.empty(len(sums))
    for j, r in sums.reset_index(drop=True).iterrows():
        n, s, ss = int(r["n"]), int(r["s"]), int(r["ss"])
        mu[j] = float(s) / float(n)
        sig[j] = np.sqrt(float(n * ss - s * s)) / float(n)

    def apply(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, emb_col)
        q = np.floor(m * scale + 0.5)  # float64, exactly integral
        z = (q - mu) / sig
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        d = z.shape[1] if z.size else 0
        return pa.table({
            id_col: pa.array(np.repeat(ids, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(ids))),
            "z": pa.array(z.ravel(), pa.float64()),
        })

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)
