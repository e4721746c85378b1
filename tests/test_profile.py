"""Data-quality profiling: column audits and key-uniqueness checks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ethereum_etl_ray.stages.profile import key_violations, profile_table


def test_profile_counts_nulls_and_extrema(ray_session):
    df = pd.DataFrame({
        "a": [3.0, None, 10.0, 9.0],
        "b": ["x", "y", None, None],
    })
    out = (profile_table(ray.data.from_pandas(df).repartition(3))
           .to_pandas().set_index("column"))
    assert out.loc["a"].n == 4 and out.loc["a"].nulls == 1
    # value-domain extrema, not string-domain ("10" < "9" lexicographically)
    assert float(out.loc["a"]["min"]) == 3.0
    assert float(out.loc["a"]["max"]) == 10.0
    assert out.loc["b"].nulls == 2
    assert out.loc["b"]["min"] == "x" and out.loc["b"]["max"] == "y"


def test_profile_all_null_column(ray_session):
    df = pd.DataFrame({"a": [None, None]}, dtype="float64")
    out = profile_table(ray.data.from_pandas(df)).to_pandas().set_index("column")
    assert out.loc["a"].nulls == 2
    assert out.loc["a"]["min"] is None and out.loc["a"]["max"] is None


def test_key_violations_finds_duplicates(ray_session):
    df = pd.DataFrame({
        "k1": [1, 1, 2, 2, 2, 3],
        "k2": ["a", "a", "b", "b", "c", "d"],
    })
    out = (key_violations(ray.data.from_pandas(df).repartition(3),
                          ["k1", "k2"]).to_pandas()
           .sort_values(["k1", "k2"]).reset_index(drop=True))
    got = [(r.k1, r.k2, r.n) for r in out.itertuples(index=False)]
    assert got == [(1, "a", 2), (2, "b", 2)]


def test_key_violations_unique_table_empty(ray_session):
    df = pd.DataFrame({"k": [1, 2, 3]})
    assert key_violations(ray.data.from_pandas(df), ["k"]).count() == 0
