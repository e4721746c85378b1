"""Int8 embedding quantization + quantized top-k tests."""

import numpy as np
import pyarrow as pa
import ray.data

from ethereum_etl_ray.stages.quantize import (
    quantize_embeddings,
    quantize_matrix,
    quantized_topk,
)

SF = "/root/testdata/sf0.001"


def test_quantize_matrix_roundtrip_error_bounded():
    rng = np.random.default_rng(3)
    m = rng.normal(size=(50, 32))
    q, scale = quantize_matrix(m)
    assert q.dtype == np.int8 and scale.dtype == np.float32
    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    err = np.abs(q * scale[:, None].astype(np.float64) - u).max()
    assert err <= 0.5 / 127 + 1e-6  # half a quantization step


def test_quantize_embeddings_schema(ray_session):
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    out = quantize_embeddings(ds)
    schema = out.schema()
    names = schema.names
    assert "q_vec" in names and "q_scale" in names
    t = out.limit(4).to_pandas()
    assert all(len(v) == len(t.q_vec.iloc[0]) for v in t.q_vec)


def test_quantized_topk_recall_vs_exact(ray_session):
    from ethereum_etl_ray.stages.ann import brute_force_topk

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    df = ds.filter(expr="vec_id < 8").to_pandas().sort_values("vec_id")
    ids = df.vec_id.to_numpy()
    mat = np.stack(df.embedding.to_numpy()).astype(np.float64)
    exact = brute_force_topk(ds, ids, mat, k=5)
    approx = quantized_topk(ds, ids, mat, k=5)
    hits = total = 0
    for qid in ids:
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.8, f"recall@5 = {hits / total:.2f}"


def test_quantized_topk_exact_on_separated_clusters(ray_session):
    """Well-separated clusters: quantization noise cannot flip the ranking."""
    rng = np.random.default_rng(9)
    centers = np.eye(4)  # 4 orthogonal unit centers in R^4
    vecs, owners = [], []
    for c in range(4):
        for _ in range(10):
            v = centers[c] + rng.normal(scale=0.01, size=4)
            vecs.append(v.astype(np.float32))
            owners.append(c)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })).repartition(3)
    qids = np.array([0, 10, 20, 30], dtype=np.int64)
    qmat = np.stack([vecs[i] for i in qids]).astype(np.float64)
    out = quantized_topk(ds, qids, qmat, k=3)
    for qid in qids:
        neigh = out[out.query_id == qid].vec_id.to_numpy()
        assert all(owners[int(v)] == owners[int(qid)] for v in neigh)


def test_quantized_topk_reads_persisted_index(ray_session, tmp_path):
    """The quantized index round-trips through Parquet and is searched
    WITHOUT re-quantizing (q_vec/q_scale already present)."""
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    idx_dir = str(tmp_path / "qidx")
    quantize_embeddings(ds).drop_columns(["embedding"]).write_parquet(idx_dir)
    back = ray.data.read_parquet(idx_dir)
    df = ds.filter(expr="vec_id < 4").to_pandas().sort_values("vec_id")
    ids = df.vec_id.to_numpy()
    mat = np.stack(df.embedding.to_numpy()).astype(np.float64)
    live = quantized_topk(ds, ids, mat, k=5)
    persisted = quantized_topk(back, ids, mat, k=5)
    lm = {(r.query_id, r.rank): r.vec_id for r in live.itertuples()}
    pm = {(r.query_id, r.rank): r.vec_id for r in persisted.itertuples()}
    assert lm == pm
