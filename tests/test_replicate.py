"""Leader→follower replication tests: convergence against the sequential
oracle, incremental checksum-skip, exactly-once crash behaviour,
point-in-time generation replicas, and integrity refusal paths."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from ethereum_etl_ray.config import EngineConfig
from ethereum_etl_ray.pipelines.replay import load_lake, replay
from ethereum_etl_ray.pipelines.replicate import replica_verify, replicate
from ethereum_etl_ray.state.manifest import load_manifest


def _texts(out_dir, generation=None):
    df = load_lake(out_dir, generation=generation).to_pandas()
    return dict(zip(df.url, df.text))


@pytest.fixture(scope="module")
def leader(tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("leader"))
    replay(tiny_corpus, out, EngineConfig(num_partitions=8))
    return out


def test_full_sync_matches_leader_and_oracle(leader, tiny_oracle,
                                             tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("follower"))
    r = replicate(leader, dst)
    assert r.copied > 0 and r.skipped == 0
    assert _texts(dst) == _texts(leader)
    assert _texts(dst) == {u: o["text"] for u, o in tiny_oracle.items()}
    rep = replica_verify(leader, dst, deep=True)
    assert rep["in_sync"] and not rep["mismatched"] and not rep["deep_corrupt"]
    # the follower carries the leader's lineage in its commit metrics
    m = load_manifest(dst)
    assert m.metrics["leader_watermark"] == load_manifest(leader).watermark


def test_incremental_sync_ships_only_changed_partitions(tiny_corpus,
                                                        tmp_path_factory):
    src = str(tmp_path_factory.mktemp("leader_inc"))
    dst = str(tmp_path_factory.mktemp("follower_inc"))
    cfg = EngineConfig(num_partitions=8)
    wm = tiny_corpus.watermark
    replay(tiny_corpus, src, cfg, watermark=wm // 2)
    first = replicate(src, dst)
    assert first.copied > 0

    # no leader change → a re-run ships nothing (checksum skip, no reads)
    again = replicate(src, dst)
    assert again.copied == 0
    assert again.skipped == len(load_manifest(src).partitions)

    gen_a = load_manifest(src)
    replay(tiny_corpus, src, cfg)  # advance the leader
    gen_b = load_manifest(src)
    changed = {k for k, e in gen_b.partitions.items()
               if (k not in gen_a.partitions
                   or gen_a.partitions[k].checksum != e.checksum)}
    inc = replicate(src, dst)
    assert inc.copied == len(changed)
    assert inc.skipped == len(gen_b.partitions) - len(changed)
    assert _texts(dst) == _texts(src)
    assert replica_verify(src, dst)["in_sync"]


def test_crash_before_commit_is_invisible_then_reconverges(leader,
                                                           tmp_path_factory,
                                                           monkeypatch):
    dst = str(tmp_path_factory.mktemp("follower_crash"))
    import ethereum_etl_ray.state.manifest as mstate

    real = mstate.commit_manifest

    def boom(*a, **k):
        raise RuntimeError("injected crash before manifest commit")

    monkeypatch.setattr(mstate, "commit_manifest", boom)
    with pytest.raises(RuntimeError, match="injected"):
        replicate(leader, dst)
    # files were shipped but the follower is still uncommitted → invisible
    assert load_manifest(dst) is None
    assert glob.glob(os.path.join(dst, "part=*", "*.parquet"))
    monkeypatch.setattr(mstate, "commit_manifest", real)
    r = replicate(leader, dst)  # re-run converges (overwrites in place)
    assert _texts(dst) == _texts(leader)
    assert replica_verify(leader, dst, deep=True)["in_sync"]
    assert r.copied + r.skipped == len(load_manifest(leader).partitions)


def test_point_in_time_generation_replica(tiny_corpus, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("leader_pit"))
    cfg = EngineConfig(num_partitions=6)
    wm = tiny_corpus.watermark
    replay(tiny_corpus, src, cfg, watermark=wm // 2)
    g1 = load_manifest(src).generation
    replay(tiny_corpus, src, cfg)
    dst = str(tmp_path_factory.mktemp("follower_pit"))
    r = replicate(src, dst, generation=g1)
    assert r.manifest.watermark == wm // 2
    assert _texts(dst) == _texts(src, generation=g1)


def test_partitioning_mismatch_refuses(tiny_corpus, leader, tmp_path_factory):
    other = str(tmp_path_factory.mktemp("leader5"))
    replay(tiny_corpus, other, EngineConfig(num_partitions=5))
    dst = str(tmp_path_factory.mktemp("follower_mismatch"))
    replicate(other, dst)
    with pytest.raises(ValueError, match="partitioning"):
        replicate(leader, dst)


def test_corrupt_leader_file_refuses_to_ship(tiny_corpus, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("leader_bad"))
    replay(tiny_corpus, src, EngineConfig(num_partitions=4))
    m = load_manifest(src)
    victim = next(os.path.join(src, e.file)
                  for e in m.partitions.values() if e.rows > 0)
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, max(0, t.num_rows - 1)), victim)
    dst = str(tmp_path_factory.mktemp("follower_bad"))
    with pytest.raises(Exception, match="lineage"):
        replicate(src, dst)


def test_deep_verify_detects_follower_bitrot(leader, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("follower_rot"))
    replicate(leader, dst)
    m = load_manifest(dst)
    victim = next(os.path.join(dst, e.file)
                  for e in m.partitions.values() if e.rows > 0)
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, max(0, t.num_rows - 1)), victim)
    shallow = replica_verify(leader, dst)
    assert shallow["in_sync"]  # lineage alone cannot see bit rot
    deep = replica_verify(leader, dst, deep=True)
    assert not deep["in_sync"] and deep["deep_corrupt"]
