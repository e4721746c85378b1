"""Merge-on-read delta ingest (pipelines/mor.py).

Oracle: LWW winner-pick is commutative/associative over (warc_ts, seq), so a
merged read of {base ∪ deltas} must equal the copy-on-write replay of the
same log — which is itself pinned against the sequential-replay oracle. The
non-commutative hazard (copy-on-write's tombstone drop) is pinned by the
refusal tests and the tombstone-shadowing test.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

from ethereum_etl_ray.config import EngineConfig
from ethereum_etl_ray.pipelines.mor import compact_deltas, ingest_delta
from ethereum_etl_ray.pipelines.replay import load_lake, lookup_urls, replay
from ethereum_etl_ray.state.manifest import gc_uncommitted, load_manifest


def _state(out_dir):
    df = load_lake(out_dir).to_pandas()
    return (df[["url", "seq", "lang", "text"]]
            .sort_values("url").reset_index(drop=True))


@pytest.fixture(scope="module")
def cow_lake(tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mor_cow"))
    replay(tiny_corpus, out, EngineConfig(num_partitions=8))
    return out


@pytest.fixture(scope="module")
def mor_lake(tiny_corpus, tmp_path_factory):
    """Three MOR windows, never compacted — every partition has deltas."""
    out = str(tmp_path_factory.mktemp("mor_delta"))
    cfg = EngineConfig(num_partitions=8)
    wm = tiny_corpus.watermark
    for w in (wm // 3, (2 * wm) // 3, wm):
        ingest_delta(tiny_corpus, out, cfg, watermark=w)
    return out


def test_merged_view_equals_cow_replay(cow_lake, mor_lake):
    a, b = _state(cow_lake), _state(mor_lake)
    assert a.equals(b)
    assert load_manifest(mor_lake).has_deltas()


def test_merged_view_equals_sequential_oracle(mor_lake, tiny_oracle):
    df = load_lake(mor_lake).to_pandas()
    assert dict(zip(df.url, df.text)) == \
        {u: o["text"] for u, o in tiny_oracle.items()}


def test_reingest_same_window_is_noop(tiny_corpus, mor_lake):
    m0 = load_manifest(mor_lake)
    res = ingest_delta(tiny_corpus, mor_lake, EngineConfig(num_partitions=8))
    assert res.merged_partitions == 0
    assert load_manifest(mor_lake).generation == m0.generation


def test_lookup_urls_merges_deltas(cow_lake, mor_lake):
    urls = _state(cow_lake).url.head(7).tolist()
    a = lookup_urls(cow_lake, urls).to_pandas().sort_values("url")
    b = lookup_urls(mor_lake, urls).to_pandas().sort_values("url")
    assert a[["url", "seq", "text"]].reset_index(drop=True).equals(
        b[["url", "seq", "text"]].reset_index(drop=True))


def test_base_rewriters_refuse_on_pending_deltas(tiny_corpus, mor_lake):
    from ethereum_etl_ray.pipelines.replicate import replicate
    from ethereum_etl_ray.pipelines.retention import (
        apply_retention,
        compact_lake,
        delete_where,
    )

    with pytest.raises(ValueError, match="delta"):
        replay(tiny_corpus, mor_lake, EngineConfig(num_partitions=8),
               watermark=tiny_corpus.watermark + 10)
    with pytest.raises(ValueError, match="delta"):
        apply_retention(mor_lake, keep_ratio=0.5)
    with pytest.raises(ValueError, match="delta"):
        delete_where(mor_lake, "seq", ">", 0)
    with pytest.raises(ValueError, match="delta"):
        compact_lake(mor_lake)
    with pytest.raises(ValueError, match="delta"):
        replicate(mor_lake, mor_lake + "_follower")


def test_layout_and_mode_pinned(tiny_corpus, mor_lake):
    with pytest.raises(ValueError, match="num_partitions"):
        ingest_delta(tiny_corpus, mor_lake, EngineConfig(num_partitions=16),
                     watermark=tiny_corpus.watermark + 10)
    with pytest.raises(ValueError, match="merge_mode"):
        ingest_delta(tiny_corpus, mor_lake,
                     EngineConfig(num_partitions=8, merge_mode="ignore"),
                     watermark=tiny_corpus.watermark + 10)


def test_tombstone_in_delta_shadows_base(tiny_corpus, tmp_path_factory):
    """A delete arriving as a delta must hide the base row at read time,
    in point lookups, and after compaction — never resurrect."""
    import pandas as pd

    events = pd.concat([
        pq.read_table(f, columns=["seq", "op", "url"]).to_pandas()
        for d in tiny_corpus.event_dirs
        for f in sorted(glob.glob(d + "/*.parquet"))])
    mid = tiny_corpus.watermark // 2
    late_dels = events[(events.op == "delete") & (events.seq > mid)]
    assert len(late_dels), "corpus should contain late deletes"
    out = str(tmp_path_factory.mktemp("mor_tomb"))
    cfg = EngineConfig(num_partitions=8)
    replay(tiny_corpus, out, cfg, watermark=mid)          # COW base
    base_urls = set(_state(out).url)
    victims = [u for u in late_dels.url if u in base_urls]
    assert victims, "some late delete should hit a base row"
    ingest_delta(tiny_corpus, out, cfg)                   # deltas on top
    merged_urls = set(_state(out).url)
    dead = [u for u in victims
            if u not in merged_urls]  # not re-upserted even later
    got = lookup_urls(out, victims).to_pandas()
    for u in dead:
        assert u not in set(got.url)
    compact_deltas(out)
    after = set(_state(out).url)
    for u in dead:
        assert u not in after


def test_compaction_preserves_state(tiny_corpus, cow_lake, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mor_compact"))
    cfg = EngineConfig(num_partitions=8)
    wm = tiny_corpus.watermark
    for w in (wm // 2, wm):
        ingest_delta(tiny_corpus, out, cfg, watermark=w)
    before = _state(out)
    rep = compact_deltas(out)
    assert rep["compacted_partitions"] > 0
    m = load_manifest(out)
    assert not m.has_deltas()
    assert m.watermark == wm
    after = _state(out)
    assert before.equals(after)
    assert after.equals(_state(cow_lake))
    # now a plain (delta-free) lake: base rewriters work again
    rep2 = compact_deltas(out)  # idempotent no-op
    assert rep2["compacted_partitions"] == 0


def test_crash_before_ingest_commit_is_invisible(tiny_corpus, tiny_oracle,
                                                 tmp_path_factory,
                                                 monkeypatch):
    out = str(tmp_path_factory.mktemp("mor_crash"))
    cfg = EngineConfig(num_partitions=8)
    mid = tiny_corpus.watermark // 2
    ingest_delta(tiny_corpus, out, cfg, watermark=mid)
    wm0 = load_manifest(out).watermark

    import ethereum_etl_ray.pipelines.mor as mor_mod

    def boom(*a, **k):
        raise RuntimeError("injected crash before manifest commit")

    monkeypatch.setattr(mor_mod, "commit_manifest", boom)
    with pytest.raises(RuntimeError, match="injected"):
        ingest_delta(tiny_corpus, out, cfg)
    monkeypatch.undo()
    # uncommitted delta files exist on disk but are invisible
    assert load_manifest(out).watermark == wm0
    # rerun reconverges to the oracle
    ingest_delta(tiny_corpus, out, cfg)
    df = load_lake(out).to_pandas()
    assert dict(zip(df.url, df.text)) == \
        {u: o["text"] for u, o in tiny_oracle.items()}


def test_crash_mid_compaction_recovers(tiny_corpus, tiny_oracle,
                                       tmp_path_factory, monkeypatch):
    out = str(tmp_path_factory.mktemp("mor_ccrash"))
    cfg = EngineConfig(num_partitions=8)
    ingest_delta(tiny_corpus, out, cfg)

    import ethereum_etl_ray.pipelines.mor as mor_mod

    def boom(*a, **k):
        raise RuntimeError("injected crash mid-compaction")

    monkeypatch.setattr(mor_mod, "commit_manifest", boom)
    with pytest.raises(RuntimeError, match="injected"):
        compact_deltas(out)
    monkeypatch.undo()
    assert load_manifest(out).has_deltas()  # pointer never flipped
    compact_deltas(out)                     # rerun rewrites identical bytes
    assert not load_manifest(out).has_deltas()
    df = load_lake(out).to_pandas()
    assert dict(zip(df.url, df.text)) == \
        {u: o["text"] for u, o in tiny_oracle.items()}


def test_gc_protects_pending_delta_files(tiny_corpus, tiny_oracle,
                                         tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mor_gc"))
    cfg = EngineConfig(num_partitions=8)
    ingest_delta(tiny_corpus, out, cfg)
    gc_uncommitted(out)
    df = load_lake(out).to_pandas()
    assert dict(zip(df.url, df.text)) == \
        {u: o["text"] for u, o in tiny_oracle.items()}


def test_fsck_scrubs_delta_files(tiny_corpus, tmp_path_factory):
    from ethereum_etl_ray.pipelines.retention import fsck_lake

    out = str(tmp_path_factory.mktemp("mor_fsck"))
    cfg = EngineConfig(num_partitions=8)
    mid = tiny_corpus.watermark // 2
    replay(tiny_corpus, out, cfg, watermark=mid)
    ingest_delta(tiny_corpus, out, cfg)
    rep = fsck_lake(out)
    n_base = sum(1 for e in load_manifest(out).partitions.values() if e.rows)
    assert rep["corrupt"] == [] and rep["checked"] > n_base
    # corrupt one delta file → flagged
    m = load_manifest(out)
    victim = next(os.path.join(out, e.file)
                  for es in m.deltas.values() for e in es if e.rows > 0)
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, max(0, t.num_rows - 1)), victim)
    bad = fsck_lake(out)["corrupt"]
    assert any(c["file"] in victim for c in bad)


def test_fww_mode_mor_equals_cow(tiny_corpus, tmp_path_factory):
    cfg = EngineConfig(num_partitions=8, merge_mode="ignore")
    cow = str(tmp_path_factory.mktemp("mor_fww_cow"))
    mor = str(tmp_path_factory.mktemp("mor_fww_mor"))
    replay(tiny_corpus, cow, cfg)
    wm = tiny_corpus.watermark
    for w in (wm // 2, wm):
        ingest_delta(tiny_corpus, mor, cfg, watermark=w)
    assert _state(cow).equals(_state(mor))
    compact_deltas(mor)
    assert _state(cow).equals(_state(mor))
