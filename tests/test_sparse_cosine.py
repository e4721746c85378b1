"""stages/invindex.py:sparse_cosine_pairs — planted sparse vectors with
hand-computed cosines, df pruning, and threshold behavior."""

import numpy as np
import pyarrow as pa
import ray.data

from ethereum_etl_ray.stages.invindex import sparse_cosine_pairs


def _run(texts, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    return sparse_cosine_pairs(ds, **kw)


def test_planted_cosines():
    texts = [
        "apple apple banana",      # 0: apple:2 banana:1
        "apple banana banana",     # 1: apple:1 banana:2
        "cherry cherry cherry",    # 2: disjoint from 0/1
        "apple cherry",            # 3: shares one term with each
    ]
    out = _run(texts, max_df=10, threshold=0.0)
    sims = {(a, b): s for a, b, s in
            zip(out["doc_a"], out["doc_b"], out["sim"])}
    # cos(0,1) = (2*1 + 1*2) / (sqrt(5)*sqrt(5)) = 4/5
    assert abs(sims[(0, 1)] - 0.8) < 1e-12
    # cos(2,3) = 3*1 / (sqrt(9)*sqrt(2))
    assert abs(sims[(2, 3)] - 3 / (3 * np.sqrt(2))) < 1e-12
    assert (0, 2) not in sims and (1, 2) not in sims  # no shared terms


def test_df_prune_drops_stopword_pairs():
    # "the" appears in every doc (df=4 > max_df=3) -> contributes nothing
    texts = ["the apple", "the apple", "the cherry", "the banana"]
    out = _run(texts, max_df=3, threshold=0.5)
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert pairs == {(0, 1)}           # identical pruned vectors, sim 1.0
    assert np.allclose(out["sim"], 1.0)


def test_threshold_filters():
    texts = ["a b", "a c", "b c"]
    hi = _run(texts, max_df=10, threshold=0.9)
    lo = _run(texts, max_df=10, threshold=0.1)
    assert len(hi) == 0                # every cosine is 0.5
    assert len(lo) == 3


def test_fractional_max_df_scales_with_corpus():
    # 8 docs; max_df=0.5 -> cap 4: 'common' (df 8) dropped, pairs only via
    # the df-2 shared rare token
    texts = ["common rare%d x" % (i // 2) for i in range(8)]
    out = _run(texts, max_df=0.5, threshold=0.3)
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert pairs == {(0, 1), (2, 3), (4, 5), (6, 7)}
