"""Similarity-search tests: brute force vs numpy ground truth; IVF ≡ exact."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from ethereum_etl_ray.stages.ann import brute_force_topk, ivf_topk


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    n, d = 300, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(mat)})
    return ray.data.from_pandas(df), mat


def _truth_topk(mat, qids, k):
    m = mat.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m[qids] @ m.T
    out = {}
    for i, q in enumerate(qids):
        order = sorted(range(len(m)), key=lambda j: (-sims[i, j], j))
        out[q] = [j for j in order if j != q][:k]
    return out


def test_brute_force_matches_numpy(corpus):
    ds, mat = corpus
    qids = np.array([0, 1, 2], dtype=np.int64)
    got = brute_force_topk(ds, qids, mat[qids], k=4)
    truth = _truth_topk(mat, qids, 4)
    for q in qids:
        sub = got[got.query_id == q].sort_values("rank")
        assert sub.vec_id.tolist() == truth[q]
        assert (sub["rank"].to_numpy() == np.arange(1, 5)).all()
        assert (sub.score.to_numpy() <= 1.0 + 1e-9).all()


def test_ivf_full_probe_equals_brute_force(corpus):
    ds, mat = corpus
    qids = np.array([3, 7], dtype=np.int64)
    bf = brute_force_topk(ds, qids, mat[qids], k=5)
    ivf = ivf_topk(ds, qids, mat[qids], k=5, n_centroids=6, nprobe=None)
    pd.testing.assert_frame_equal(bf.reset_index(drop=True), ivf.reset_index(drop=True))


def test_ivf_partial_probe_high_recall(corpus):
    ds, mat = corpus
    qids = np.array([11], dtype=np.int64)
    bf = brute_force_topk(ds, qids, mat[qids], k=5)
    ivf = ivf_topk(ds, qids, mat[qids], k=5, n_centroids=6, nprobe=3)
    recall = len(set(bf.vec_id) & set(ivf.vec_id)) / 5
    assert recall >= 0.4  # partial probe trades recall for pruning


@pytest.fixture(scope="module")
def clustered():
    """4 well-separated clusters — k-means should recover them."""
    rng = np.random.default_rng(17)
    centers = np.eye(4, 12) * 10.0
    mat = np.concatenate([
        centers[i] + rng.normal(scale=0.3, size=(50, 12)) for i in range(4)
    ]).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                       "embedding": list(mat)})
    return ray.data.from_pandas(df), mat


def test_kmeans_centroids_recover_clusters(clustered):
    from ethereum_etl_ray.stages.ann import kmeans_centroids

    ds, mat = clustered
    cents = kmeans_centroids(ds, 4, iters=5)
    assert cents.shape == (4, 12)
    # each true center has a centroid at cosine ≥ 0.95
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    for i in range(4):
        true = np.eye(4, 12)[i] * 10.0
        true = true / np.linalg.norm(true)
        assert (cn @ true).max() > 0.95


def test_embedding_cosine_pairs_exact_and_bucketed(clustered):
    from ethereum_etl_ray.stages.ann import (
        embedding_bucketed_pairs,
        embedding_cosine_pairs,
    )

    ds, mat = clustered
    exact = embedding_cosine_pairs(ds, tau=0.9)
    # ground truth: within-cluster pairs only (clusters are near-orthogonal)
    mn = mat.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    sims = np.floor(mn @ mn.T * 1e4 + 0.5) / 1e4
    a, b = np.nonzero(np.triu(sims >= 0.9, k=1))
    assert set(zip(exact.vec_a, exact.vec_b)) == set(zip(a, b))
    # bucketed path: clusters map to buckets, so recall is total here and
    # every reported pair is a true pair (subset of exact)
    bucketed = embedding_bucketed_pairs(ds, tau=0.9, n_centroids=4,
                                        kmeans_iters=5)
    assert set(zip(bucketed.vec_a, bucketed.vec_b)) == set(zip(a, b))


def test_bucketed_pairs_multiprobe_recovers_boundary_pair():
    """A near-dup pair straddling a k-means bucket boundary (each member's
    primary centroid differs, secondary is shared) is missed by primary-only
    assignment but found with the default 2-probe assignment."""
    from ethereum_etl_ray.stages.ann import embedding_bucketed_pairs

    rng = np.random.default_rng(29)
    c1, c2, c3 = np.eye(3, 12) * 10.0
    clusters = [c + rng.normal(scale=0.2, size=(50, 12)) for c in (c1, c2, c3)]
    # two near-identical vectors midway between clusters 1 and 2, nudged to
    # opposite sides so their PRIMARY buckets differ (2 probes = {b1, b2},
    # a strict subset of the 3 buckets — not a probe-everything degenerate)
    # nudge 0.5 units along each axis: primary cos gap ≈ 0.07 (robust to
    # centroid perturbation from the straddlers' own membership) while the
    # pair's mutual cosine stays ≈ 0.9955 ≥ tau
    mid = (c1 + c2) / 2.0
    straddle = np.stack([mid + 0.5 * c1 / 10.0, mid + 0.5 * c2 / 10.0])
    mat = np.concatenate(clusters + [straddle]).astype(np.float64)
    df = pd.DataFrame({"vec_id": np.arange(152, dtype=np.int64),
                       "embedding": list(mat)})
    ds = ray.data.from_pandas(df)

    kw = dict(tau=0.99, n_centroids=3, kmeans_iters=5)
    primary_only = embedding_bucketed_pairs(ds, assign_probes=1, **kw)
    multi = embedding_bucketed_pairs(ds, assign_probes=2, **kw)
    assert (150, 151) not in set(zip(primary_only.vec_a, primary_only.vec_b))
    assert (150, 151) in set(zip(multi.vec_a, multi.vec_b))
    # multi-probe adds no false pairs (every report is exact-cosine verified)
    assert set(zip(multi.vec_a, multi.vec_b)) >= set(
        zip(primary_only.vec_a, primary_only.vec_b))


def test_ivf_search_empty_probed_buckets_returns_empty(tmp_path):
    """k-means can leave empty clusters; probing only those must return an
    empty result, not crash on a zero-path read."""
    import json
    import os

    from ethereum_etl_ray.stages.ann import ivf_search

    idx = str(tmp_path / "emptyidx")
    os.makedirs(idx)
    np.save(os.path.join(idx, "centroids.npy"), np.eye(2, 4))
    json.dump({"n_centroids": 2, "emb_col": "embedding"},
              open(os.path.join(idx, "ivf_meta.json"), "w"))
    out = ivf_search(idx, np.array([0]), np.eye(1, 4), k=3, nprobe=1)
    assert out.empty
    assert list(out.columns) == ["query_id", "vec_id", "rank", "score"]


def test_persisted_ivf_index_prunes_and_matches(clustered, tmp_path):
    from ethereum_etl_ray.stages.ann import build_ivf_index, ivf_search

    ds, mat = clustered
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, n_centroids=4, kmeans_iters=5)
    import os
    bucket_dirs = [d for d in os.listdir(idx) if d.startswith("ivf_bucket=")]
    assert len(bucket_dirs) == 4  # one directory per non-empty bucket

    qids = np.array([0, 60], dtype=np.int64)
    exact = ivf_search(idx, qids, mat[qids], k=5, nprobe=None)
    bf = brute_force_topk(ds, qids, mat[qids], k=5)
    pd.testing.assert_frame_equal(exact.reset_index(drop=True),
                                  bf.reset_index(drop=True))
    # well-clustered data: probing ONE bucket directory keeps full recall
    pruned = ivf_search(idx, qids, mat[qids], k=5, nprobe=1)
    assert set(pruned.vec_id) == set(bf.vec_id)


def test_cosine_pairs_auto_gate_routes_large_corpora(clustered, monkeypatch):
    """Above exact_threshold the stage must take the bucketed multi-probe
    route instead of broadcasting the whole corpus matrix."""
    import ethereum_etl_ray.stages.ann as ann

    ds, _ = clustered
    calls = {}
    real = ann.embedding_bucketed_pairs

    def spy(*a, **kw):
        calls["kw"] = kw
        return real(*a, **kw)

    monkeypatch.setattr(ann, "embedding_bucketed_pairs", spy)
    # under the threshold: exact path, spy untouched
    ann.embedding_cosine_pairs(ds, tau=0.9, exact_threshold=10_000)
    assert not calls
    # over the threshold: routed, 2-probe
    out = ann.embedding_cosine_pairs(ds, tau=0.9, exact_threshold=0)
    assert calls["kw"].get("assign_probes") == 2
    assert {"vec_a", "vec_b", "cos_4"} <= set(out.columns)


def test_append_ivf_index_searchable_and_pruned(clustered, tmp_path):
    """Appended vectors join the existing bucket layout (no rebuild): a
    full-probe search equals brute force over corpus+increment, the
    increment's nearest neighbor is itself, and a 1-probe search of a
    well-clustered query still finds appended points — while the original
    files are untouched."""
    import glob
    import os

    from ethereum_etl_ray.stages.ann import (
        append_ivf_index,
        build_ivf_index,
        ivf_search,
    )

    ds, mat = clustered
    idx = str(tmp_path / "ivf_app")
    build_ivf_index(ds, idx, n_centroids=4, kmeans_iters=5)
    before = sorted(glob.glob(os.path.join(idx, "ivf_bucket=*", "*.parquet")))

    # increment: 5 new points in a TIGHT sub-cluster at cluster 2's center
    # (tighter than the 0.3-noise originals, so appended points are each
    # other's nearest neighbors — proves they're searchable post-append)
    rng = np.random.default_rng(23)
    inc_mat = (np.eye(4, 12)[2] * 10.0
               + rng.normal(scale=0.02, size=(5, 12))).astype(np.float32)
    inc = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(1000, 1005, dtype=np.int64),
        "embedding": list(inc_mat)}))
    assert append_ivf_index(idx, inc) == 5

    after = sorted(glob.glob(os.path.join(idx, "ivf_bucket=*", "*.parquet")))
    assert set(before) <= set(after) and len(after) > len(before)

    full = np.concatenate([mat, inc_mat])
    ids = np.concatenate([np.arange(200), np.arange(1000, 1005)]).astype(np.int64)
    union = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": list(full)}))
    qids = np.array([1001], dtype=np.int64)
    bf = brute_force_topk(union, qids, inc_mat[1:2], k=5)
    exact = ivf_search(idx, qids, inc_mat[1:2], k=5, nprobe=None)
    pd.testing.assert_frame_equal(exact.reset_index(drop=True),
                                  bf.reset_index(drop=True))
    pruned = ivf_search(idx, qids, inc_mat[1:2], k=5, nprobe=1)
    assert set(pruned.vec_id) == set(bf.vec_id)
    assert (pruned.vec_id >= 1000).any()  # appended points are searchable
