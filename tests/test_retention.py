"""Retention eviction tests (pipelines.retention ↔ reference A8 free_space)."""

import pytest

from ethereum_etl_ray.config import EngineConfig
from ethereum_etl_ray.pipelines.replay import load_lake, replay
from ethereum_etl_ray.pipelines.retention import apply_retention
from ethereum_etl_ray.state.manifest import gc_uncommitted


@pytest.fixture()
def lake(tiny_corpus, tmp_path):
    out = str(tmp_path / "rlake")
    replay(tiny_corpus, out, EngineConfig(num_partitions=6))
    return out


def test_retention_keeps_newest_fraction(lake):
    before = load_lake(lake).to_pandas()
    n = len(before)
    stats = apply_retention(lake, keep_ratio=0.8)
    after = load_lake(lake).to_pandas()
    assert stats["evicted"] == n - len(after)
    assert len(after) == n - int(n * 0.2)
    # exactly the newest rows survive (deterministic version order,
    # url as the unique tie-break)
    expect = set(
        before.sort_values(["warc_ts", "seq", "url"], ascending=False)
        .head(len(after)).url
    )
    assert set(after.url) == expect


def test_retention_exact_within_version_tie_block(lake):
    """Snapshot-origin rows share one (warc_ts, seq=-1) version; a cutoff
    landing inside that tie block must still evict EXACTLY floor(n*(1-keep))
    rows (regression: keep_ratio=0.99 evicted the whole tie block)."""
    n = load_lake(lake).count()
    stats = apply_retention(lake, keep_ratio=0.99)
    expect_evicted = int(n * 0.01)
    assert stats["evicted"] == expect_evicted
    assert load_lake(lake).count() == n - expect_evicted


def test_retention_noop_at_full_ratio(lake):
    n = load_lake(lake).count()
    stats = apply_retention(lake, keep_ratio=1.0)
    assert stats == {"evicted": 0, "partitions_rewritten": 0}
    assert load_lake(lake).count() == n


def test_retention_refuses_during_live_replay(lake):
    """Retention rewrites + commits; racing a live replay would corrupt the
    lake — it must refuse while a foreign lock is held."""
    import os

    from ethereum_etl_ray.state.manifest import REPLAY_LOCK

    path = os.path.join(lake, REPLAY_LOCK)
    with open(path, "w") as f:
        f.write("1")  # live foreign pid
    with pytest.raises(RuntimeError, match="another replay"):
        apply_retention(lake, keep_ratio=0.9)
    os.remove(path)
    assert apply_retention(lake, keep_ratio=1.0) == {
        "evicted": 0, "partitions_rewritten": 0}
    assert not os.path.exists(path)  # lock released


def test_gc_removes_superseded_files_only_after_history_expires(lake):
    """Pre-retention partition files are a RETAINED generation now (X5
    backups) — bare GC must keep them; they become collectable only once
    enough commits push their generation out of the retained window."""
    from ethereum_etl_ray.state.manifest import (
        KEEP_GENERATIONS,
        commit_manifest,
        load_manifest,
    )

    apply_retention(lake, keep_ratio=0.5)
    assert gc_uncommitted(lake) == []  # protected by generation history
    assert load_lake(lake).count() > 0
    # age the pre-retention generation out of the retained window
    for _ in range(KEEP_GENERATIONS):
        commit_manifest(lake, load_manifest(lake))
    removed = gc_uncommitted(lake)
    assert removed  # the pre-retention partition files, finally collectable
    assert load_lake(lake).count() > 0


class TestDeleteWhere:
    @pytest.fixture(scope="class")
    def del_lake(self, tmp_path_factory, tiny_corpus):
        from ethereum_etl_ray.config import EngineConfig
        from ethereum_etl_ray.pipelines.replay import replay

        out = str(tmp_path_factory.mktemp("del_lake"))
        replay(tiny_corpus, out, EngineConfig(num_partitions=6))
        return out

    def test_delete_matches_pandas_filter(self, del_lake):
        from ethereum_etl_ray.pipelines.replay import load_lake
        from ethereum_etl_ray.pipelines.retention import delete_where

        before = load_lake(del_lake).to_pandas()
        lang = before.lang.mode()[0]
        n_match = int((before.lang == lang).sum())
        stats = delete_where(del_lake, "lang", "==", lang)
        assert stats["deleted"] == n_match > 0
        after = load_lake(del_lake).to_pandas()
        assert len(after) == len(before) - n_match
        assert (after.lang != lang).all()
        # untouched rows are byte-identical
        keep = before[before.lang != lang].sort_values("url")
        after = after.sort_values("url")
        assert list(after.url) == list(keep.url)
        assert list(after.text) == list(keep.text)

    def test_match_free_partitions_keep_lineage(self, del_lake):
        from ethereum_etl_ray.pipelines.retention import delete_where
        from ethereum_etl_ray.state.manifest import load_manifest

        m0 = load_manifest(del_lake)
        stats = delete_where(del_lake, "lang", "==", "no-such-lang")
        assert stats["deleted"] == 0 and stats["partitions_rewritten"] == 0
        m1 = load_manifest(del_lake)
        assert {p: e.checksum for p, e in m0.partitions.items()} == \
            {p: e.checksum for p, e in m1.partitions.items()}
        assert {p: e.file for p, e in m0.partitions.items()} == \
            {p: e.file for p, e in m1.partitions.items()}

    def test_delete_is_restorable(self, del_lake):
        from ethereum_etl_ray.pipelines.replay import load_lake
        from ethereum_etl_ray.pipelines.retention import delete_where
        from ethereum_etl_ray.state.manifest import (
            load_manifest,
            restore_generation,
        )

        n_before = load_lake(del_lake).count()
        gen_before = load_manifest(del_lake).generation
        stats = delete_where(del_lake, "seq", ">=", 0)  # delete ~everything
        assert stats["deleted"] > 0
        assert load_lake(del_lake).count() < n_before
        restore_generation(del_lake, generation=gen_before)
        assert load_lake(del_lake).count() == n_before

    def test_bad_op_raises(self, del_lake):
        from ethereum_etl_ray.pipelines.retention import delete_where

        with pytest.raises(ValueError):
            delete_where(del_lake, "lang", "like", "x")
