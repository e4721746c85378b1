"""Exactly-once sink state tests (state.manifest)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

import pytest

from ethereum_etl_ray.state.manifest import (
    REPLAY_LOCK,
    Manifest,
    PartitionEntry,
    acquire_replay_lock,
    atomic_write_table,
    commit_manifest,
    gc_uncommitted,
    load_manifest,
    release_replay_lock,
)


def test_manifest_roundtrip(tmp_path):
    out = str(tmp_path)
    m = Manifest(watermark=99, schema_version=2, num_partitions=4, merge_mode="replace",
                 partitions={"0": PartitionEntry("part=00000/data-99.parquet", 10, "123", 99)})
    commit_manifest(out, m)
    got = load_manifest(out)
    assert got == m
    assert got.entry(0).rows == 10
    assert got.entry(3) is None


def test_load_missing_returns_none(tmp_path):
    assert load_manifest(str(tmp_path)) is None


def test_atomic_write_no_partial_file(tmp_path):
    path = os.path.join(str(tmp_path), "nested", "f.parquet")
    t = pa.table({"a": [1, 2, 3]})
    atomic_write_table(t, path)
    assert pq.read_table(path).equals(t)
    # no temp leftovers
    assert [n for n in os.listdir(os.path.dirname(path)) if ".tmp." in n] == []


def test_gc_removes_orphans_keeps_committed(tmp_path):
    out = str(tmp_path)
    t = pa.table({"a": [1]})
    atomic_write_table(t, os.path.join(out, "part=00000", "data-5.parquet"))
    atomic_write_table(t, os.path.join(out, "part=00000", "data-3.parquet"))  # superseded
    m = Manifest(watermark=5, partitions={
        "0": PartitionEntry("part=00000/data-5.parquet", 1, "1", 5)})
    commit_manifest(out, m)
    removed = gc_uncommitted(out)
    assert any("data-3" in r for r in removed)
    assert os.path.exists(os.path.join(out, "part=00000", "data-5.parquet"))
    assert not os.path.exists(os.path.join(out, "part=00000", "data-3.parquet"))


def test_gc_refuses_while_foreign_replay_lock_live(tmp_path):
    """GC racing an in-flight replay could delete renamed-but-uncommitted
    partition files; a live foreign lock must abort it."""
    out = str(tmp_path)
    commit_manifest(out, Manifest(watermark=1))
    with open(os.path.join(out, REPLAY_LOCK), "w") as f:
        f.write("1")  # pid 1: always alive, never ours
    with pytest.raises(RuntimeError, match="replay in progress"):
        gc_uncommitted(out)
    os.remove(os.path.join(out, REPLAY_LOCK))
    gc_uncommitted(out)  # proceeds once the lock is gone


def test_replay_lock_stale_pid_is_claimable(tmp_path):
    out = str(tmp_path)
    with open(os.path.join(out, REPLAY_LOCK), "w") as f:
        f.write("999999999")  # beyond pid_max: dead
    path = acquire_replay_lock(out)  # steals the stale lock
    assert open(path).read() == str(os.getpid())
    # a live foreign holder blocks acquisition
    with open(path, "w") as f:
        f.write("1")
    with pytest.raises(RuntimeError, match="another replay"):
        acquire_replay_lock(out)
    release_replay_lock(path)
    assert not os.path.exists(path)


def test_replay_lock_not_reentrant_same_pid(tmp_path):
    """A same-process re-acquire must raise, not silently steal the lock
    (stealing would end mutual exclusion against third processes the moment
    either holder releases)."""
    out = str(tmp_path)
    path = acquire_replay_lock(out)
    with pytest.raises(RuntimeError, match="not reentrant"):
        acquire_replay_lock(out)
    # the original holder's lock survives the failed re-acquire intact
    assert open(path).read() == str(os.getpid())
    release_replay_lock(path)


def _commit_with_file(out, wm, name):
    t = pa.table({"a": [wm]})
    atomic_write_table(t, os.path.join(out, "part=00000", name))
    m = Manifest(watermark=wm, partitions={
        "0": PartitionEntry(f"part=00000/{name}", 1, str(wm), wm)})
    commit_manifest(out, m)
    return m


def test_generation_history_retained_and_pruned(tmp_path):
    from ethereum_etl_ray.state.manifest import KEEP_GENERATIONS, list_generations

    out = str(tmp_path)
    for i in range(KEEP_GENERATIONS + 3):
        commit_manifest(out, Manifest(watermark=i))
    gens = list_generations(out)
    assert len(gens) == KEEP_GENERATIONS
    assert [wm for _, wm in gens] == list(range(3, KEEP_GENERATIONS + 3))
    assert load_manifest(out).generation == KEEP_GENERATIONS + 3


def test_restore_flips_live_pointer_and_keeps_history(tmp_path):
    from ethereum_etl_ray.state.manifest import list_generations, restore_generation

    out = str(tmp_path)
    _commit_with_file(out, 10, "data-10.parquet")
    _commit_with_file(out, 20, "data-20.parquet")
    m = restore_generation(out, 10)
    assert m.watermark == 10
    live = load_manifest(out)
    assert live.watermark == 10
    # the restore is itself a new generation — history stays linear and the
    # pre-restore state (wm=20) remains restorable
    assert live.generation == 3
    assert [wm for _, wm in list_generations(out)] == [10, 20, 10]
    m2 = restore_generation(out, 20)
    assert m2.watermark == 20 and load_manifest(out).watermark == 20


def test_restore_unknown_watermark_raises(tmp_path):
    from ethereum_etl_ray.state.manifest import restore_generation

    out = str(tmp_path)
    _commit_with_file(out, 10, "data-10.parquet")
    with pytest.raises(FileNotFoundError, match="no retained generation"):
        restore_generation(out, 99)


def test_restore_refuses_when_files_missing(tmp_path):
    from ethereum_etl_ray.state.manifest import restore_generation

    out = str(tmp_path)
    _commit_with_file(out, 10, "data-10.parquet")
    _commit_with_file(out, 20, "data-20.parquet")
    os.remove(os.path.join(out, "part=00000", "data-10.parquet"))
    with pytest.raises(RuntimeError, match="missing"):
        restore_generation(out, 10)


def test_gc_protects_retained_generation_files(tmp_path):
    """Files referenced only by OLDER retained generations must survive GC —
    deleting them would break restore_generation."""
    out = str(tmp_path)
    _commit_with_file(out, 10, "data-10.parquet")
    _commit_with_file(out, 20, "data-20.parquet")
    # a true orphan (never committed) for contrast
    atomic_write_table(pa.table({"a": [1]}),
                       os.path.join(out, "part=00000", "orphan.parquet"))
    removed = gc_uncommitted(out)
    assert [os.path.basename(p) for p in removed] == ["orphan.parquet"]
    assert os.path.exists(os.path.join(out, "part=00000", "data-10.parquet"))
    assert os.path.exists(os.path.join(out, "part=00000", "data-20.parquet"))
