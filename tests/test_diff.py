"""Lake generation-diff tests: the distributed diff must equal the dict-diff
of the sequential-replay oracle at the two watermarks."""

import glob

import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from ethereum_etl_ray.config import EngineConfig
from ethereum_etl_ray.pipelines.diff import lake_diff
from ethereum_etl_ray.pipelines.replay import replay
from ethereum_etl_ray.state.oracle import sequential_replay


def _oracle_at(corpus, watermark):
    evs = []
    for d in corpus.event_dirs:
        for f in sorted(glob.glob(d + "/*.parquet")):
            t = pq.read_table(f)
            evs.append(t.filter(pc.less_equal(t.column("seq"), watermark))
                       if watermark is not None else t)
    snap = pq.read_table(glob.glob(corpus.snapshot_dir + "/*.parquet")[0])
    return sequential_replay(evs, snap)


def _expected_diff(o_a, o_b):
    exp = {}
    for url in o_b.keys() - o_a.keys():
        exp[url] = ("added", None, o_b[url]["seq"])
    for url in o_a.keys() - o_b.keys():
        exp[url] = ("deleted", o_a[url]["seq"], None)
    for url in o_a.keys() & o_b.keys():
        if o_a[url]["seq"] != o_b[url]["seq"]:
            exp[url] = ("updated", o_a[url]["seq"], o_b[url]["seq"])
    return exp


@pytest.fixture(scope="module")
def two_gen_lake(tmp_path_factory, tiny_corpus):
    out = str(tmp_path_factory.mktemp("diff_lake"))
    cfg = EngineConfig(num_partitions=8)
    wm_half = tiny_corpus.watermark // 2
    r1 = replay(tiny_corpus, out, cfg, watermark=wm_half)
    r2 = replay(tiny_corpus, out, cfg)
    return out, r1.manifest.generation, r2.manifest.generation, wm_half


def _check(df, expected):
    got = {}
    for r in df.itertuples():
        a = None if pd.isna(r.seq_a) else int(r.seq_a)
        b = None if pd.isna(r.seq_b) else int(r.seq_b)
        got[r.url] = (r.change, a, b)
    assert got == expected


def test_diff_matches_oracle_dict_diff(two_gen_lake, tiny_corpus):
    out, g1, g2, wm_half = two_gen_lake
    df = lake_diff(out, g1, g2).to_pandas()
    expected = _expected_diff(_oracle_at(tiny_corpus, wm_half),
                              _oracle_at(tiny_corpus, None))
    _check(df, expected)
    # the second window really changed something
    assert len(expected) > 0
    assert set(df.change) <= {"added", "deleted", "updated"}


def test_diff_same_generation_is_empty_and_readless(two_gen_lake):
    out, g1, g2, _ = two_gen_lake
    ds = lake_diff(out, g2, g2)
    assert ds.count() == 0


def test_diff_is_symmetric(two_gen_lake, tiny_corpus):
    """Reversing the generations swaps added/deleted and flips update seqs."""
    out, g1, g2, wm_half = two_gen_lake
    fwd = lake_diff(out, g1, g2).to_pandas()
    rev = lake_diff(out, g2, g1).to_pandas()
    assert len(fwd) == len(rev)
    swap = {"added": "deleted", "deleted": "added", "updated": "updated"}
    fwd_map = dict(zip(fwd.url, fwd.change))
    rev_map = dict(zip(rev.url, rev.change))
    assert rev_map == {u: swap[c] for u, c in fwd_map.items()}


def test_diff_fallback_route_matches_fast_path(two_gen_lake):
    """A lake re-partitioned between generations takes the co-group fallback,
    which must produce the identical diff (forced here by doctoring manifest
    B's num_partitions — the partition entries and files stay untouched)."""
    out, g1, g2, _ = two_gen_lake

    fast = lake_diff(out, g1, g2).to_pandas().sort_values("url")

    import json
    import os

    gen_path = os.path.join(out, f"manifest-g{g2:08d}.json")
    doctored = json.load(open(gen_path))
    doctored["num_partitions"] = 999  # entries untouched — same files
    json.dump(doctored, open(gen_path, "w"))
    fast_v = lake_diff(out, g1, g2, value_cols=["lang"]) \
        .to_pandas().sort_values("url")
    try:
        slow = lake_diff(out, g1, g2).to_pandas().sort_values("url")
        slow_v = lake_diff(out, g1, g2, value_cols=["lang"]) \
            .to_pandas().sort_values("url")
    finally:
        doctored["num_partitions"] = 8
        json.dump(doctored, open(gen_path, "w"))
    assert list(fast.url) == list(slow.url)
    assert list(fast.change) == list(slow.change)
    # value columns survive the fallback route identically (NaN-safe compare)
    for col in ("url", "change", "lang_a", "lang_b"):
        fa, sl = list(fast_v[col].fillna("~")), list(slow_v[col].fillna("~"))
        assert fa == sl, col


def test_diff_missing_generation_raises(two_gen_lake):
    out, g1, g2, _ = two_gen_lake
    with pytest.raises(FileNotFoundError):
        lake_diff(out, 998877, g2)


def _counts_at(out, gen):
    import os

    import pyarrow as pa

    from ethereum_etl_ray.pipelines.diff import load_generation_manifest

    m = load_generation_manifest(out, gen)
    tabs = [pq.read_table(os.path.join(out, e.file), columns=["lang"])
            for e in m.partitions.values() if e.rows > 0]
    t = pa.concat_tables(tabs)
    vc = pc.value_counts(pc.cast(t.column("lang"), pa.string()))
    return {v["values"]: v["counts"] for v in vc.to_pylist()}


def test_maintain_counts_equals_full_recompute(two_gen_lake):
    """Incremental view maintenance: prev aggregate + diff deltas must equal
    the aggregate recomputed from scratch at generation B."""
    import pyarrow as pa

    from ethereum_etl_ray.pipelines.diff import lake_diff, maintain_counts

    out, g1, g2, _ = two_gen_lake
    prev_counts = _counts_at(out, g1)
    prev = pa.table({"lang": pa.array(list(prev_counts), pa.string()),
                     "n": pa.array([prev_counts[k] for k in prev_counts],
                                   pa.int64())})
    diff = lake_diff(out, g1, g2, value_cols=["lang"])
    got = {r.lang: int(r.n)
           for r in maintain_counts(prev, diff, "lang").to_pandas().itertuples()}
    assert got == _counts_at(out, g2)


def test_diff_value_cols_carry_lake_values(two_gen_lake):
    from ethereum_etl_ray.pipelines.diff import lake_diff

    out, g1, g2, _ = two_gen_lake
    df = lake_diff(out, g1, g2, value_cols=["lang"]).to_pandas()
    assert {"lang_a", "lang_b"} <= set(df.columns)
    # invariants per change type
    assert df[df.change == "added"].lang_a.isna().all()
    assert df[df.change == "deleted"].lang_b.isna().all()
    upd = df[df.change == "updated"]
    assert upd.lang_a.notna().all() and upd.lang_b.notna().all()
