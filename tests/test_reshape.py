"""ROLLUP and UNPIVOT reshape operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ethereum_etl_ray.stages.reshape import pivot_counts, rollup_aggregate, unpivot


def test_rollup_levels_and_exact_sums(ray_session):
    df = pd.DataFrame({
        "a": ["x", "x", "x", "y"],
        "b": ["p", "p", "q", "p"],
        "val": [1.005, 2.0, 3.5, 10.0],  # cents: 100(+ε floor→100), 200, 350, 1000
    })
    out = (rollup_aggregate(ray.data.from_pandas(df).repartition(2),
                            ["a", "b"], sum_cents={"val": "c"})
           .to_pandas())
    rows = {(r.a, r.b): (r.n, r.c) for r in out.itertuples()}
    assert rows[("x", "p")] == (2, 300)
    assert rows[("x", "q")] == (1, 350)
    assert rows[("y", "p")] == (1, 1000)
    assert rows[("x", None)] == (3, 650)
    assert rows[("y", None)] == (1, 1000)
    assert rows[(None, None)] == (4, 1650)
    assert len(out) == 6  # 3 fine + 2 mid + 1 total


def test_rollup_total_equals_input(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"a": rng.choice(list("abc"), 500),
                       "b": rng.choice(list("xy"), 500),
                       "val": rng.uniform(0, 50, 500)})
    out = rollup_aggregate(ray.data.from_pandas(df).repartition(4),
                           ["a", "b"], sum_cents={"val": "c"}).to_pandas()
    total = out[out.a.isna() & out.b.isna()]
    assert int(total.n.iloc[0]) == 500
    assert int(total.c.iloc[0]) == int(np.floor(df.val.to_numpy() * 100 + 0.5)
                                       .astype(np.int64).sum())


def test_unpivot_long_form(ray_session):
    df = pd.DataFrame({"id": [1, 2], "m1": [1.5, 2.5], "m2": [10, 20]})
    out = (unpivot(ray.data.from_pandas(df), ["id"], ["m1", "m2"])
           .to_pandas().sort_values(["id", "metric"]).reset_index(drop=True))
    assert len(out) == 4
    got = {(r.id, r.metric): r.value for r in out.itertuples()}
    assert got == {(1, "m1"): 1.5, (1, "m2"): 10.0,
                   (2, "m1"): 2.5, (2, "m2"): 20.0}


def test_unpivot_empty_batch(ray_session):
    ds = ray.data.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                       "m1": pa.array([], pa.float64())}))
    assert unpivot(ds, ["id"], ["m1"]).count() == 0


def test_pivot_counts_wide_form(ray_session):
    df = pd.DataFrame({"k": ["a", "a", "a", "b", "b"],
                       "t": ["x", "x", "y", "y", "z"]})
    out = (pivot_counts(ray.data.from_pandas(df).repartition(3),
                        "k", "t", ["x", "y", "z"])
           .to_pandas().set_index("k").sort_index())
    assert out.loc["a"].tolist() == [2, 1, 0]
    assert out.loc["b"].tolist() == [0, 1, 1]
    assert list(out.columns) == ["n_x", "n_y", "n_z"]


def test_pivot_roundtrips_unpivot(ray_session):
    rng = np.random.default_rng(8)
    df = pd.DataFrame({"k": rng.choice(list("pqr"), 300),
                       "t": rng.choice(["u", "v"], 300)})
    wide = pivot_counts(ray.data.from_pandas(df), "k", "t", ["u", "v"])
    total = wide.to_pandas()[["n_u", "n_v"]].to_numpy().sum()
    assert total == 300


def test_cube_all_subsets(ray_session):
    df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
                       "val": [1.0, 2.0, 4.0]})
    out = rollup_aggregate(ray.data.from_pandas(df), ["a", "b"],
                           sum_cents={"val": "c"}, cube=True).to_pandas()
    rows = {(r.a, r.b): (r.n, r.c) for r in out.itertuples()}
    # fine (3) + a-level (2) + b-level (2) + total (1)
    assert len(out) == 8
    assert rows[(None, "p")] == (2, 500)   # the CUBE-only grouping set
    assert rows[(None, "q")] == (1, 200)
    assert rows[("x", None)] == (2, 300)
    assert rows[(None, None)] == (3, 700)
