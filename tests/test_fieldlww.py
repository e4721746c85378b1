"""Field-level LWW merge: column-wise survivorship must equal the literal
sequential rule under nulls, ties-by-version-absence, and any partitioning."""

import numpy as np
import pandas as pd
import ray.data

from ethereum_etl_ray.stages.fieldlww import (
    field_lww_merge,
    field_lww_pick,
    sequential_field_lww_oracle,
)

import pyarrow as pa


def _events(n=12_000, keys=300, seed=4) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "k": rng.integers(0, keys, n).astype(np.int64),
        "ts": rng.integers(0, 10_000, n).astype(np.int64),
        "eid": np.arange(n, dtype=np.int64),
        "a": rng.normal(size=n),
        "b": rng.choice(list("xyzw"), n).astype(object),
    })
    df.loc[rng.random(n) < 0.4, "a"] = np.nan
    df.loc[rng.random(n) < 0.6, "b"] = None
    # some keys never set b at all
    df.loc[df.k % 17 == 0, "b"] = None
    return df


def _merge(df, parts=8, num_partitions=16):
    ds = ray.data.from_pandas(df).repartition(parts)
    out = field_lww_merge(ds, key="k", version=("ts", "eid"),
                          fields=("a", "b"),
                          num_partitions=num_partitions).to_pandas()
    return out.sort_values("k").reset_index(drop=True)[
        ["k", "ts", "eid", "a", "b"]]


def _want(df):
    w = sequential_field_lww_oracle(df, key="k", version=("ts", "eid"),
                                    fields=("a", "b"))
    return w.sort_values("k").reset_index(drop=True)[
        ["k", "ts", "eid", "a", "b"]]


def test_matches_sequential_oracle():
    df = _events()
    got, want = _merge(df), _want(df)
    pd.testing.assert_frame_equal(got, want)
    # the planted all-null-b keys actually surface as null
    assert got[got.k % 17 == 0].b.isna().all()
    # and field-LWW differs from row-LWW somewhere (nulls didn't clobber)
    row_lww = df.sort_values(["k", "ts", "eid"]).groupby("k").tail(1)
    assert not got.a.equals(row_lww.sort_values("k").a.reset_index(drop=True))


def test_partitioning_invariance():
    df = _events(4000, keys=80, seed=9)
    a = _merge(df, parts=1, num_partitions=4)
    b = _merge(df, parts=13, num_partitions=32)
    pd.testing.assert_frame_equal(a, b)


def test_pick_is_idempotent_on_combined_form():
    df = _events(2000, keys=50, seed=2)
    t = pa.Table.from_pandas(df, preserve_index=False)
    once = field_lww_pick(t, key="k", version=("ts", "eid"),
                          fields=("a", "b"))
    twice = field_lww_pick(once, key="k", version=("ts", "eid"),
                           fields=("a", "b"))
    assert once.equals(twice)


def test_string_keys():
    df = _events(3000, keys=40, seed=7)
    df["k"] = "u" + df.k.astype(str)
    ds = ray.data.from_pandas(df).repartition(5)
    got = field_lww_merge(ds, key="k", version=("ts", "eid"),
                          fields=("a", "b")).to_pandas()
    want = sequential_field_lww_oracle(df, key="k", version=("ts", "eid"),
                                       fields=("a", "b"))
    got = got.sort_values("k").reset_index(drop=True)[["k", "ts", "eid", "a", "b"]]
    want = want.sort_values("k").reset_index(drop=True)[["k", "ts", "eid", "a", "b"]]
    pd.testing.assert_frame_equal(got, want)
