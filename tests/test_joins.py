"""Join-stage unit tests (stages.joins)."""

import pandas as pd
import pytest
import ray.data

from ethereum_etl_ray.stages.joins import broadcast_lookup, bucketed_asof


def test_broadcast_lookup_inner_and_left():
    ds = ray.data.from_items([{"k": 1, "v": "a"}, {"k": 2, "v": "b"},
                              {"k": 9, "v": "c"}])
    dim = pd.DataFrame({"key": [1, 2], "name": ["one", "two"]})
    inner = broadcast_lookup(ds, dim, left_on="k", right_on="key").to_pandas()
    assert sorted(zip(inner.k, inner.name)) == [(1, "one"), (2, "two")]
    left = broadcast_lookup(ds, dim, left_on="k", right_on="key",
                            how="left").to_pandas()
    assert len(left) == 3
    assert left.set_index("k").loc[9, "name"] is None or \
        pd.isna(left.set_index("k").loc[9, "name"])


def test_bucketed_asof_backward_semantics():
    left = ray.data.from_items([
        {"eid": 1, "who": 10, "t": 5},
        {"eid": 2, "who": 10, "t": 12},
        {"eid": 3, "who": 20, "t": 7},
        {"eid": 4, "who": 30, "t": 9},   # no right rows for this key
    ])
    right = ray.data.from_items([
        {"rk": 10, "rt": 4, "val": "x"},
        {"rk": 10, "rt": 11, "val": "y"},
        {"rk": 20, "rt": 8, "val": "z"},  # after left t=7 → no match
    ])
    out = bucketed_asof(left, right, left_ts="t", right_ts="rt",
                        left_by="who", right_by="rk",
                        num_partitions=4).to_pandas()
    got = dict(zip(out.eid, out.val))
    assert got == {1: "x", 2: "y"}  # eid 3 (no earlier right) and 4 dropped


def test_cogroup_join_inner_left_and_post_aggregate():
    from ethereum_etl_ray.stages.joins import cogroup_join

    left = ray.data.from_items([{"k": 1, "v": "a"}, {"k": 1, "v": "a"},
                                {"k": 2, "v": "b"}, {"k": 9, "v": "c"}])
    right = ray.data.from_items([{"rk": 1, "name": "one"}, {"rk": 2, "name": "two"}])
    # left side produced by a hash AGGREGATE — the case Dataset.join breaks on
    dl = left.groupby(["k", "v"]).map_groups(lambda g: g.head(1),
                                             batch_format="pandas")
    inner = cogroup_join(dl, right, left_on="k", right_on="rk",
                         num_partitions=4).to_pandas()
    assert sorted(zip(inner.k, inner.name)) == [(1, "one"), (2, "two")]
    lj = cogroup_join(dl, right, left_on="k", right_on="rk", how="left",
                      num_partitions=4).to_pandas()
    assert len(lj) == 3 and pd.isna(lj.set_index("k").loc[9, "name"])


def test_bucketed_asof_rejects_overlapping_columns():
    a = ray.data.from_items([{"k": 1, "t": 1}])
    b = ray.data.from_items([{"k": 1, "t": 1}])
    with pytest.raises(ValueError, match="disjoint"):
        bucketed_asof(a, b, left_ts="t", right_ts="t", left_by="k", right_by="k")


def test_interval_join_containment_and_overlap():
    from ethereum_etl_ray.stages.joins import interval_join

    left = ray.data.from_items([
        {"eid": 1, "v": 5.0},    # in [0,10) and [4,30)
        {"eid": 2, "v": 10.0},   # hi-exclusive: NOT in [0,10); in [4,30)
        {"eid": 3, "v": 4.0},    # lo-inclusive: in [0,10) and [4,30)
        {"eid": 4, "v": 99.0},   # no window
    ])
    right = ray.data.from_items([
        {"wid": 10, "lo": 0.0, "hi": 10.0},
        {"wid": 11, "lo": 4.0, "hi": 30.0},   # spans several buckets
    ])
    out = interval_join(left, right, left_on="v", right_lo="lo",
                        right_hi="hi", bucket_width=8.0).to_pandas()
    got = sorted(zip(out.eid, out.wid))
    assert got == [(1, 10), (1, 11), (2, 11), (3, 10), (3, 11)]


def test_interval_join_wide_interval_replication():
    from ethereum_etl_ray.stages.joins import interval_join

    # one interval covering everything; every left row matches exactly once
    left = ray.data.from_items([{"eid": i, "v": float(i * 7)}
                                for i in range(50)]).repartition(4)
    right = ray.data.from_items([{"wid": 1, "lo": 0.0, "hi": 1000.0}])
    out = interval_join(left, right, left_on="v", right_lo="lo",
                        right_hi="hi", bucket_width=10.0).to_pandas()
    assert len(out) == 50 and set(out.wid) == {1}
    assert sorted(out.eid) == list(range(50))


def test_interval_join_rejects_column_collision():
    from ethereum_etl_ray.stages.joins import interval_join

    a = ray.data.from_items([{"v": 1.0, "x": 1}])
    b = ray.data.from_items([{"lo": 0.0, "hi": 2.0, "x": 5}])
    with pytest.raises(ValueError, match="collision"):
        interval_join(a, b, left_on="v", right_lo="lo", right_hi="hi",
                      bucket_width=1.0)


def test_interval_join_empty_match_set():
    from ethereum_etl_ray.stages.joins import interval_join

    left = ray.data.from_items([{"eid": 1, "v": 100.0}])
    right = ray.data.from_items([{"wid": 1, "lo": 0.0, "hi": 1.0}])
    out = interval_join(left, right, left_on="v", right_lo="lo",
                        right_hi="hi", bucket_width=5.0).to_pandas()
    assert len(out) == 0


def test_cogroup_join_outer_and_right():
    from ethereum_etl_ray.stages.joins import cogroup_join

    left = ray.data.from_items([{"lk": 1, "lv": "a"}, {"lk": 2, "lv": "b"}])
    right = ray.data.from_items([{"rk": 2, "rv": "x"}, {"rk": 3, "rv": "y"}])
    out = (cogroup_join(left, right, left_on="lk", right_on="rk", how="outer")
           .to_pandas())
    assert len(out) == 3
    rows = {tuple(None if pd.isna(v) else v for v in r)
            for r in out[["lk", "lv", "rk", "rv"]].itertuples(index=False)}
    assert rows == {(1, "a", None, None), (2, "b", 2, "x"),
                    (None, None, 3, "y")}

    out_r = (cogroup_join(left, right, left_on="lk", right_on="rk",
                          how="right").to_pandas())
    assert len(out_r) == 2 and set(out_r.rk.dropna()) == {2, 3}
    only_r = out_r[out_r.rk == 3]
    assert only_r.lk.isna().all()


def test_cogroup_join_composite_key():
    from ethereum_etl_ray.stages.joins import cogroup_join

    left = ray.data.from_items([
        {"a": 1, "b": "x", "lv": 10},
        {"a": 1, "b": "y", "lv": 20},
        {"a": 2, "b": "x", "lv": 30},
    ]).repartition(2)
    right = ray.data.from_items([
        {"ra": 1, "rb": "x", "rv": 100},
        {"ra": 2, "rb": "x", "rv": 200},
        {"ra": 9, "rb": "z", "rv": 900},
    ])
    out = (cogroup_join(left, right, left_on=["a", "b"],
                        right_on=["ra", "rb"]).to_pandas())
    got = sorted(zip(out.lv, out.rv))
    assert got == [(10, 100), (30, 200)]  # (1,y) and (9,z) unmatched


def test_cogroup_join_key_length_mismatch():
    from ethereum_etl_ray.stages.joins import cogroup_join

    a = ray.data.from_items([{"x": 1}])
    b = ray.data.from_items([{"y": 1, "z": 2}])
    with pytest.raises(ValueError, match="equal length"):
        cogroup_join(a, b, left_on=["x"], right_on=["y", "z"])
