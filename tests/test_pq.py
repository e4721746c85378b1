"""Product-quantization tests (stages/quantize.py PQ section).

PQ collapses near-identical vectors to identical codes, so exact float-top-k
recall is the wrong oracle on tie-heavy data; the contractual properties are
(1) a planted near-duplicate is retrieved at rank 1 over a random corpus,
(2) neighbors stay within their cluster on clustered data, and (3) the
persisted uint8 index round-trips and is searched without the float column."""

import numpy as np
import pyarrow as pa
import ray.data

from ethereum_etl_ray.stages.quantize import pq_encode, pq_topk, pq_train


def _ds(vecs, ids=None, npart=3):
    ids = list(range(len(vecs))) if ids is None else ids
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(t).repartition(npart)


def test_pq_planted_near_dup_found(ray_session):
    rng = np.random.default_rng(4)
    base = rng.normal(size=(300, 64))
    qmat = rng.normal(size=(4, 64))
    planted = qmat + rng.normal(scale=0.02, size=qmat.shape)
    ds = _ds(np.vstack([base, planted]))
    qids = np.array([900, 901, 902, 903], dtype=np.int64)
    books = pq_train(ds, m=8, k=16, iters=4)
    assert books.shape == (8, 16, 8)
    out = pq_topk(ds, qids, qmat, books, k=3)
    for i, qid in enumerate(qids):
        top = out[out.query_id == qid].sort_values("rank").vec_id.tolist()
        assert top[0] == 300 + i, f"planted near-dup not at rank 1 for q{i}"


def test_pq_neighbors_stay_in_cluster(ray_session):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(6, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, 20, axis=0) + rng.normal(scale=0.05, size=(120, 32))
    ds = _ds(vecs)
    books = pq_train(ds, m=8, k=16, iters=4)
    qids = np.array([0, 20, 40], dtype=np.int64)
    out = pq_topk(ds, qids, vecs[qids], books, k=5)
    for q in qids:
        neigh = out[out.query_id == q].vec_id.to_numpy()
        assert (neigh // 20 == q // 20).all()


def test_pq_codes_are_one_byte_per_subspace(ray_session):
    rng = np.random.default_rng(2)
    ds = _ds(rng.normal(size=(50, 64)))
    books = pq_train(ds, m=8, k=16, iters=2)
    enc = pq_encode(ds, books).limit(5).to_pandas()
    assert all(len(c) == 8 for c in enc.pq_code)
    assert all(0 <= v < 16 for c in enc.pq_code for v in c)


def test_pq_persisted_index_roundtrip(ray_session, tmp_path):
    rng = np.random.default_rng(9)
    base = rng.normal(size=(150, 64))
    qmat = rng.normal(size=(3, 64))
    planted = qmat + rng.normal(scale=0.02, size=qmat.shape)
    ds = _ds(np.vstack([base, planted]))
    qids = np.array([800, 801, 802], dtype=np.int64)
    books = pq_train(ds, m=8, k=16, iters=3)
    idx = str(tmp_path / "pqidx")
    pq_encode(ds, books).drop_columns(["embedding"]).write_parquet(idx)
    back = ray.data.read_parquet(idx)
    assert "embedding" not in back.schema().names  # float column gone
    live = pq_topk(ds, qids, qmat, books, k=4)
    persisted = pq_topk(back, qids, qmat, books, k=4)
    lm = {(r.query_id, r.rank): r.vec_id for r in live.itertuples()}
    pm = {(r.query_id, r.rank): r.vec_id for r in persisted.itertuples()}
    assert lm == pm
