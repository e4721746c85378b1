"""Connected components / dedup cluster resolution tests (stages.components
— the transitive, corpus-wide generalization of the reference's
distinct-as-dedup, src/tasks/extract/account.py:7-27)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from ethereum_etl_ray.stages.components import (
    connected_components_ds,
    dedup_apply,
    union_find_labels,
)


def _truth_labels(pairs: pd.DataFrame) -> dict[int, int]:
    """Independent oracle: BFS flood fill over an adjacency dict."""
    adj: dict[int, set] = {}
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    label = {}
    for start in adj:
        if start in label:
            continue
        seen, todo = {start}, [start]
        while todo:
            n = todo.pop()
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    todo.append(m)
        lo = min(seen)
        for n in seen:
            label[n] = lo
    return label


def _rand_pairs(seed: int, n_nodes: int, n_edges: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, size=n_edges)
    b = rng.integers(0, n_nodes, size=n_edges)
    keep = a != b
    return pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep]})


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(7, 200, 80), (11, 500, 600)])
def test_union_find_matches_bfs_oracle(seed, n_nodes, n_edges):
    pairs = _rand_pairs(seed, n_nodes, n_edges)
    got = union_find_labels(pairs)
    want = _truth_labels(pairs)
    assert dict(zip(got.node, got.component)) == want


def test_distributed_matches_union_find():
    pairs = _rand_pairs(23, 300, 250)
    uf = union_find_labels(pairs)
    ds = ray.data.from_pandas(pairs)
    comp = (connected_components_ds(ds).to_pandas()
            .sort_values("node").reset_index(drop=True))
    assert comp.node.tolist() == uf.node.tolist()
    assert comp.component.tolist() == uf.component.tolist()


def test_transitive_chain_collapses_to_one():
    """Planted A~B~C chains (no direct A~C pair) must form one cluster and
    keep only the min doc."""
    pairs = pd.DataFrame({"doc_a": [1, 2, 10, 11], "doc_b": [2, 3, 11, 12]})
    docs = ray.data.from_items([{"doc_id": i} for i in range(14)])
    kept = sorted(dedup_apply(docs, pairs).to_pandas().doc_id)
    # clusters {1,2,3}→1 and {10,11,12}→10; everything else untouched
    assert kept == [0, 1, 4, 5, 6, 7, 8, 9, 10, 13]


def test_long_chain_converges_in_log_rounds():
    """A 64-node path graph has diameter 63; pointer jumping must converge
    well before 63 rounds (log2(63) ≈ 6, plus slack)."""
    n = 64
    pairs = ray.data.from_pandas(
        pd.DataFrame({"doc_a": np.arange(1, n), "doc_b": np.arange(0, n - 1)}))
    comp = connected_components_ds(pairs, max_rounds=10).to_pandas()
    assert comp.component.nunique() == 1 and comp.component.iloc[0] == 0
    assert len(comp) == n


def test_dedup_apply_routes_agree():
    pairs = _rand_pairs(5, 100, 60)
    docs = ray.data.from_items([{"doc_id": i, "payload": f"p{i}"}
                                for i in range(100)])
    a = sorted(dedup_apply(docs, pairs).to_pandas().doc_id)
    ds_pairs = ray.data.from_pandas(pairs)
    b = sorted(dedup_apply(docs, ds_pairs, route="broadcast").to_pandas().doc_id)
    c_df = dedup_apply(docs, ds_pairs, route="shuffle").to_pandas()
    assert a == b == sorted(c_df.doc_id)
    # shuffle route must preserve the doc schema (columns and payloads)
    assert list(c_df.columns) == ["doc_id", "payload"]
    assert set(c_df.payload) == {f"p{i}" for i in a}


def test_empty_pairs_keeps_all_docs():
    docs = ray.data.from_items([{"doc_id": i} for i in range(10)])
    empty = pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                          "doc_b": pd.Series(dtype=np.int64)})
    assert sorted(dedup_apply(docs, empty).to_pandas().doc_id) == list(range(10))


def test_self_pairs_are_harmless():
    """A (x, x) pair must not drop x or crash the propagation."""
    pairs = pd.DataFrame({"doc_a": [4, 1], "doc_b": [4, 2]})
    docs = ray.data.from_items([{"doc_id": i} for i in range(5)])
    assert sorted(dedup_apply(docs, pairs).to_pandas().doc_id) == [0, 1, 3, 4]
    ds_pairs = ray.data.from_pandas(pairs)
    got = sorted(dedup_apply(docs, ds_pairs, route="shuffle").to_pandas().doc_id)
    assert got == [0, 1, 3, 4]


def test_dataset_pairs_auto_route_agrees_with_forced_distributed():
    """The pairs_exact_threshold gate: a small pair Dataset collects to
    driver union-find by default; forcing threshold=0 takes distributed
    label propagation — identical survivors either way, on both apply
    routes."""
    pairs = _rand_pairs(11, 80, 50)
    docs = ray.data.from_items([{"doc_id": i} for i in range(80)])
    ds_pairs = ray.data.from_pandas(pairs).materialize()
    auto = sorted(dedup_apply(docs, ds_pairs).to_pandas().doc_id)
    dist = sorted(dedup_apply(docs, ds_pairs,
                              pairs_exact_threshold=0).to_pandas().doc_id)
    auto_sh = sorted(dedup_apply(docs, ds_pairs,
                                 route="shuffle").to_pandas().doc_id)
    assert auto == dist == auto_sh
