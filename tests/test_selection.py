"""Distributed k-th-element selection tests (stages.selection)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from ethereum_etl_ray.stages.selection import kth_smallest


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(23)
    n = 20_000
    df = pd.DataFrame({
        "a": rng.integers(0, 50, size=n),       # heavy ties on the lead col
        "b": rng.permutation(n),                # unique tie-break
    })
    return df


def _truth(df, k):
    s = df.sort_values(["a", "b"], kind="stable").reset_index(drop=True)
    row = s.iloc[k - 1]
    return (row.a, row.b)


@pytest.mark.parametrize("k", [1, 2, 137, 10_000, 19_999, 20_000])
def test_kth_matches_full_sort(data, k):
    ds = ray.data.from_pandas(data).map_batches(lambda t: t, batch_size=1024,
                                                batch_format="pyarrow")
    got = kth_smallest(ds, ["a", "b"], k, sample_per_batch=64)
    assert tuple(int(x) for x in got) == tuple(int(x) for x in _truth(data, k))


def test_kth_tiny_sample_rate_still_exact(data):
    # stress the bracketing: 8 samples per 1024-row batch
    ds = ray.data.from_pandas(data).map_batches(lambda t: t, batch_size=1024,
                                                batch_format="pyarrow")
    k = 4_242
    got = kth_smallest(ds, ["a", "b"], k, sample_per_batch=8)
    assert tuple(int(x) for x in got) == tuple(int(x) for x in _truth(data, k))


def test_kth_out_of_range(data):
    ds = ray.data.from_pandas(data)
    with pytest.raises(ValueError):
        kth_smallest(ds, ["a", "b"], 0)
    with pytest.raises(ValueError):
        kth_smallest(ds, ["a", "b"], len(data) + 1)


def test_kth_rejects_null_sort_columns():
    """Nulls rank last in sort_by but vanish from lex_lt counts — the two
    passes would disagree, so null sort columns must be rejected early."""
    df = pd.DataFrame({"a": [1.0, None, 3.0, 4.0], "b": [0, 1, 2, 3]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="contains nulls"):
        kth_smallest(ds, ["a", "b"], 1)


# ---------------------------------------------------------------------------
# take_until_budget — deterministic md5-priority prefix under a weight budget

import hashlib

from ethereum_etl_ray.stages.selection import take_until_budget


def _budget_truth(df, budget):
    """Brute force: sort by md5 hex of id, cut at the cumulative budget."""
    d = df.copy()
    d["hex"] = [hashlib.md5(str(i).encode()).hexdigest() for i in d.doc_id]
    d = d.sort_values("hex")
    return set(d.doc_id[d.w.cumsum() <= budget])


@pytest.fixture()
def budget_df():
    rng = np.random.RandomState(7)
    return pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64),
                         "w": rng.randint(1, 50, 2000).astype(np.int64)})


@pytest.mark.parametrize("budget", [0, 1, 500, 10_000, 10**9])
def test_budget_take_matches_brute_force(budget_df, budget):
    ds = ray.data.from_pandas(budget_df).repartition(8)
    out = take_until_budget(ds, budget=budget, weight_col="w")
    # take_all, not to_pandas: this Ray version's to_pandas drops the
    # schema (zero columns) for a fully-empty Dataset
    got = {r["doc_id"] for r in out.take_all()}
    assert got == _budget_truth(budget_df, budget)


def test_budget_take_is_partitioning_invariant(budget_df):
    a = set(take_until_budget(ray.data.from_pandas(budget_df).repartition(2),
                              budget=3000, weight_col="w").to_pandas().doc_id)
    b = set(take_until_budget(ray.data.from_pandas(budget_df).repartition(16),
                              budget=3000, weight_col="w").to_pandas().doc_id)
    assert a == b


def test_budget_take_whole_corpus_under_budget(budget_df):
    ds = ray.data.from_pandas(budget_df)
    out = take_until_budget(ds, budget=int(budget_df.w.sum()), weight_col="w")
    assert out.count() == len(budget_df)


def test_budget_take_refinement_levels_match_brute_force(budget_df):
    """A tiny boundary cap forces digest-prefix refinement (deeper levels);
    the kept set must be identical to the single-level answer."""
    ds = ray.data.from_pandas(budget_df).repartition(8)
    out = take_until_budget(ds, budget=3000, weight_col="w",
                            max_boundary_rows=2)
    got = {r["doc_id"] for r in out.take_all()}
    assert got == _budget_truth(budget_df, 3000)


def test_budget_take_boundary_cap_raises_when_depth_exhausted(budget_df):
    ds = ray.data.from_pandas(budget_df)
    with pytest.raises(RuntimeError, match="refinement levels"):
        take_until_budget(ds, budget=3000, weight_col="w",
                          max_boundary_rows=1, max_depth=1)


# property-based: arbitrary weights/budgets match the brute-force cut
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(1, 100), min_size=1, max_size=300),
       st.integers(0, 4000))
def test_budget_take_property(ws, budget):
    df = pd.DataFrame({"doc_id": np.arange(len(ws), dtype=np.int64),
                       "w": np.array(ws, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(4)
    got = {r["doc_id"] for r in
           take_until_budget(ds, budget=budget, weight_col="w").take_all()}
    assert got == _budget_truth(df, budget)


def test_stratified_sample_partitioning_invariant():
    from ethereum_etl_ray.pipelines.queries import QUERIES

    out = QUERIES["stratified_sample"]("/root/testdata/sf0.001")
    # exactly 20 per language (every lang has >20 docs at sf0.001)
    assert (out.groupby("lang").size() == 20).all()
    out2 = QUERIES["stratified_sample"]("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(out, out2)


def test_weighted_sample_deterministic_and_partition_invariant(ray_session):
    from ethereum_etl_ray.stages.selection import weighted_sample_k

    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64),
                       "w": np.random.default_rng(4).uniform(0.1, 5.0, 1000)})
    a = weighted_sample_k(ray.data.from_pandas(df).repartition(2),
                          k=50, weight_col="w", id_col="id")
    b = weighted_sample_k(ray.data.from_pandas(df).repartition(9),
                          k=50, weight_col="w", id_col="id")
    assert len(a) == 50
    assert sorted(a.id) == sorted(b.id)  # partitioning-independent

    # exact parity with a local single-machine computation of the same rule
    from ethereum_etl_ray.functions.hashing import hash64
    h = hash64(np.char.add(df.id.to_numpy().astype(str), "\x00"))
    pri = np.log((h.astype(np.float64) + 0.5) / 2.0**64) / df.w.to_numpy()
    want = set(df.id.to_numpy()[np.argsort(-pri)][:50])
    assert set(a.id) == want


def test_weighted_sample_inclusion_scales_with_weight(ray_session):
    from ethereum_etl_ray.stages.selection import weighted_sample_k

    # 100 heavy (w=10) + 900 light (w=1): expected heavy inclusion rate is
    # ~10x light; across salts the counts must clearly separate
    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64),
                       "w": np.where(np.arange(1000) < 100, 10.0, 1.0)})
    ds = ray.data.from_pandas(df)
    heavy = light = 0
    for s in range(30):
        got = weighted_sample_k(ds, k=100, weight_col="w", id_col="id",
                                salt=str(s))
        heavy += int((got.id < 100).sum())
        light += int((got.id >= 100).sum())
    assert heavy / 30 > 35  # ≫ 10 expected under uniform sampling
    assert heavy / (heavy + light) > 0.35


def test_weighted_sample_skips_nonpositive_weights(ray_session):
    from ethereum_etl_ray.stages.selection import weighted_sample_k

    df = pd.DataFrame({"id": [1, 2, 3, 4], "w": [1.0, 0.0, -2.0, 1.0]})
    got = weighted_sample_k(ray.data.from_pandas(df), k=10,
                            weight_col="w", id_col="id")
    assert sorted(got.id) == [1, 4]
