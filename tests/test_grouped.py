"""Per-key grouped operators: top-N per key, grouped quantile, keyed window."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data

from ethereum_etl_ray.stages.grouped import (
    grouped_quantile,
    keyed_window,
    topn_per_key,
)


def _events(n=400, keys=17, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "k": np.char.add("u", rng.integers(0, keys, n).astype(str)),
        "ts": rng.integers(0, 10_000, n).astype(np.int64),
        "v": rng.uniform(0, 100, n),
    })


def test_topn_per_key_matches_pandas(ray_session):
    df = _events()
    ds = ray.data.from_pandas(df).repartition(5)
    out = (topn_per_key(ds, "k", ["v", "eid"], 3, descending=[True, False])
           .to_pandas().sort_values(["k", "v", "eid"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    want = (df.sort_values(["v", "eid"], ascending=[False, True])
            .groupby("k").head(3)
            .sort_values(["k", "v", "eid"], ascending=[True, False, True])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["eid", "k", "v"]].reset_index(drop=True),
                                  want[["eid", "k", "v"]].reset_index(drop=True))


def test_topn_smaller_groups_survive_whole(ray_session):
    df = pd.DataFrame({"eid": [1, 2, 3], "k": ["a", "a", "b"],
                       "v": [1.0, 2.0, 3.0]})
    out = topn_per_key(ray.data.from_pandas(df), "k", ["v"], 10,
                       descending=True).to_pandas()
    assert len(out) == 3


def test_grouped_quantile_disc_convention(ray_session):
    # per-key medians with known answers: k = ceil(0.5·n), 1-indexed
    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 5 + ["c"] * 1,
        "v": [1.0, 2.0, 3.0, 4.0,      # n=4 → k=2 → 2.0
              10.0, 20.0, 30.0, 40.0, 50.0,  # n=5 → k=3 → 30.0
              7.5],                     # n=1 → 7.5
    })
    out = (grouped_quantile(ray.data.from_pandas(df).repartition(3),
                            "k", "v", 0.5, out_col="med")
           .to_pandas().set_index("k").med)
    assert out.loc["a"] == 2.0 and out.loc["b"] == 30.0 and out.loc["c"] == 7.5


def test_grouped_quantile_p90_matches_duckdb(ray_session):
    import duckdb

    df = _events(600, keys=23, seed=5)
    out = (grouped_quantile(ray.data.from_pandas(df).repartition(4),
                            "k", "v", 0.9, out_col="q90")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT k, quantile_disc(v, 0.9) AS q90 FROM df GROUP BY k ORDER BY k"
    ).df()
    pd.testing.assert_frame_equal(out, want)


def test_keyed_window_lag_and_cumsum(ray_session):
    df = pd.DataFrame({
        "eid": [1, 2, 3, 4, 5],
        "k": ["a", "a", "a", "b", "b"],
        "ts": [10, 20, 30, 5, 6],
        "v": [1.00, 2.50, 2.00, 10.00, 0.25],
    })
    out = (keyed_window(ray.data.from_pandas(df).repartition(2),
                        "k", ["ts", "eid"], "v")
           .to_pandas().sort_values("eid").reset_index(drop=True))
    assert out.cum_c100.tolist() == [100, 350, 550, 1000, 1025]
    deltas = out.delta_c100.tolist()
    assert pd.isna(deltas[0]) and deltas[1] == 150 and deltas[2] == -50
    assert pd.isna(deltas[3]) and deltas[4] == -975


def test_keyed_window_empty(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "eid": pa.array([], pa.int64()), "k": pa.array([], pa.string()),
        "ts": pa.array([], pa.int64()), "v": pa.array([], pa.float64())}))
    assert keyed_window(ds, "k", ["ts", "eid"], "v").count() == 0


def test_string_agg_ordered(ray_session):
    from ethereum_etl_ray.stages.grouped import string_agg_ordered

    df = pd.DataFrame({
        "k": ["a", "b", "a", "a", "b"],
        "v": ["x", "q", "y", "z", "r"],
        "ts": [3, 1, 1, 2, 2],
        "eid": [1, 2, 3, 4, 5],
    })
    out = (string_agg_ordered(ray.data.from_pandas(df).repartition(3),
                              "k", "v", ["ts", "eid"], out_col="seq")
           .to_pandas().set_index("k").seq)
    assert out.loc["a"] == "y,z,x"
    assert out.loc["b"] == "q,r"


def test_grouped_mad_known_values(ray_session):
    from ethereum_etl_ray.stages.grouped import grouped_mad

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 4,
        "v": [1.0, 2.0, 3.0, 4.0, 100.0,   # med=3; devs 2,1,0,1,97 → mad=1
              10.0, 10.0, 10.0, 10.0],      # med=10; devs all 0 → mad=0
    })
    out = (grouped_mad(ray.data.from_pandas(df).repartition(2), "k", "v")
           .to_pandas().set_index("k").mad)
    assert out.loc["a"] == 1.0 and out.loc["b"] == 0.0


def test_grouped_mad_matches_duckdb(ray_session):
    import duckdb

    df = _events(500, keys=19, seed=7)
    out = (grouped_mad_helper(df).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = duckdb.sql("""
        WITH med AS (SELECT k, quantile_disc(v, 0.5) AS m FROM df GROUP BY k)
        SELECT e.k, quantile_disc(abs(e.v - med.m), 0.5) AS mad
        FROM df e JOIN med USING (k) GROUP BY e.k ORDER BY e.k
    """).df()
    pd.testing.assert_frame_equal(out, want)


def grouped_mad_helper(df):
    from ethereum_etl_ray.stages.grouped import grouped_mad

    return grouped_mad(ray.data.from_pandas(df).repartition(4), "k", "v")


# ---- property-based: random frames vs pandas oracles -----------------------

from hypothesis import given, settings, strategies as st


@st.composite
def _frames(draw):
    n = draw(st.integers(5, 120))
    nk = draw(st.integers(1, 8))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    return pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "k": np.char.add("u", rng.integers(0, nk, n).astype(str)),
        "ts": rng.integers(0, 50, n).astype(np.int64),
        "v": rng.uniform(-10, 10, n),
    })


@settings(max_examples=15, deadline=None)
@given(_frames(), st.integers(1, 5))
def test_topn_property(df, n):
    ds = ray.data.from_pandas(df).repartition(3)
    got = (topn_per_key(ds, "k", ["v", "eid"], n, descending=[True, False])
           .to_pandas())
    want = (df.sort_values(["v", "eid"], ascending=[False, True])
            .groupby("k").head(n))
    assert sorted(got.eid) == sorted(want.eid)


@settings(max_examples=15, deadline=None)
@given(_frames())
def test_keyed_window_property(df):
    ds = ray.data.from_pandas(df).repartition(3)
    got = (keyed_window(ds, "k", ["ts", "eid"], "v")
           .to_pandas().sort_values("eid").reset_index(drop=True))
    w = df.sort_values(["k", "ts", "eid"]).copy()
    w["c"] = np.floor(w.v.to_numpy() * 100.0 + 0.5).astype(np.int64)
    w["cum"] = w.groupby("k").c.cumsum()
    w["delta"] = w.c - w.groupby("k").c.shift()
    w = w.sort_values("eid").reset_index(drop=True)
    assert got.cum_c100.tolist() == w.cum.tolist()
    pd.testing.assert_series_equal(got.delta_c100.astype("float64"),
                                   w.delta.astype("float64"),
                                   check_names=False)


def test_robust_outliers_flags_planted(ray_session):
    from ethereum_etl_ray.stages.grouped import robust_outliers

    df = pd.DataFrame({
        "eid": range(12),
        "k": ["a"] * 10 + ["b"] * 2,
        "v": [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.5, 9.0, 10.0, 500.0,
              1.0, 1.0],  # 500 is the planted outlier; b has mad=0
    })
    out = (robust_outliers(ray.data.from_pandas(df).repartition(3),
                           "k", "v", k=3.0).to_pandas())
    assert out.eid.tolist() == [9]
    assert out.med.iloc[0] == 10.0


def test_grouped_quantile_multi_p_single_pass(ray_session):
    import duckdb

    from ethereum_etl_ray.stages.grouped import grouped_quantile

    df = _events(400, keys=13, seed=9)
    out = (grouped_quantile(ray.data.from_pandas(df).repartition(4),
                            "k", "v", [0.25, 0.5, 0.99])
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT k, quantile_disc(v, 0.25) AS q25, quantile_disc(v, 0.5) AS q50,
               quantile_disc(v, 0.99) AS q99
        FROM df GROUP BY k ORDER BY k""").df()
    pd.testing.assert_frame_equal(out, want)


def test_keyed_window_rejects_null_values(ray_session):
    df = pd.DataFrame({"eid": [1, 2], "k": ["a", "a"],
                       "ts": [1, 2], "v": [1.0, None]})
    with pytest.raises(Exception, match="nulls"):
        keyed_window(ray.data.from_pandas(df), "k", ["ts", "eid"],
                     "v").to_pandas()


def test_grouped_quantile_approx_bounds_and_determinism(ray_session):
    from ethereum_etl_ray.stages.grouped import (
        grouped_quantile,
        grouped_quantile_approx,
    )

    rng = np.random.default_rng(12)
    n = 30_000
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "k": np.where(np.arange(n) < 25_000, "hot", "cold"),  # Zipf-hot key
        "v": rng.uniform(0, 1000, n),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    approx = (grouped_quantile_approx(ds, "k", "v", 0.5, id_col="eid",
                                      sample_k=1024)
              .to_pandas().set_index("k").q50)
    exact = (grouped_quantile(ds, "k", "v", 0.5)
             .to_pandas().set_index("k").q50)
    # rank error O(1/sqrt(k)) → value error small for a uniform distribution
    for kk in ("hot", "cold"):
        assert abs(approx.loc[kk] - exact.loc[kk]) < 60.0, kk
    # partitioning-independent (deterministic hash sample)
    again = (grouped_quantile_approx(ds.repartition(2), "k", "v", 0.5,
                                     id_col="eid", sample_k=1024)
             .to_pandas().set_index("k").q50)
    assert (again == approx).all()
    # small keys (≤ sample_k rows) are EXACT — the sample is the whole key
    assert approx.loc["cold"] == exact.loc["cold"] or len(
        df[df.k == "cold"]) > 1024
