"""Bloom filter tests: no false negatives, bounded FP, mergeable, Ray stage."""

import numpy as np
import pandas as pd
import ray.data

from ethereum_etl_ray.stages.joins import semi_anti_filter
from ethereum_etl_ray.state.bloom import BloomFilter


def test_no_false_negatives_and_bounded_fp():
    members = np.char.add("m", np.arange(5000).astype(str))
    others = np.char.add("x", np.arange(20000).astype(str))
    bf = BloomFilter(capacity=5000, fp_rate=0.01)
    bf.add_many(members)
    assert bf.contains_many(members).all()
    fp = bf.contains_many(others).mean()
    assert fp < 0.03, fp


def test_merge_and_serialize_roundtrip():
    a, b = BloomFilter(1000), BloomFilter(1000)
    a.add_many(["k1", "k2"])
    b.add_many(["k3"])
    m = a.merge(b)
    assert m.contains_many(["k1", "k2", "k3"]).all()
    rt = BloomFilter.deserialize(m.serialize())
    assert rt.contains_many(["k1", "k2", "k3"]).all()
    assert rt.n_bits == m.n_bits and rt.n_hashes == m.n_hashes


def test_semi_anti_filter_with_bloom_stage():
    keys = [f"u{i}" for i in range(0, 100, 2)]  # even users
    bf = BloomFilter(capacity=len(keys), fp_rate=0.001)
    bf.add_many(np.asarray(keys, dtype=object))
    df = pd.DataFrame({"user": [f"u{i}" for i in range(100)], "v": range(100)})
    ds = ray.data.from_pandas(df)
    semi = semi_anti_filter(ds, bf, on="user").to_pandas()
    got = set(semi.user)
    assert set(keys) <= got            # zero false negatives
    assert len(got) <= len(keys) + 3   # tiny FP surplus at fp_rate=0.001
