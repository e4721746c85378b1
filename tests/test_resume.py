"""Checkpoint/resume and crash-recovery tests.

The reference's recovery story is operational (idempotent ``INSERT OR
REPLACE`` + manual backup/restore, ``src/repositories/sqlite/base.py:81-136``);
the engine makes it a first-class guarantee: replay from ANY committed
watermark reconverges to the identical final state, and uncommitted partial
output (crash before manifest commit) is invisible and garbage-collectable.
"""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from ethereum_etl_ray.config import EngineConfig
from ethereum_etl_ray.pipelines.replay import load_lake, replay
from ethereum_etl_ray.state.manifest import gc_uncommitted, load_manifest


def _texts(out_dir):
    df = load_lake(out_dir).to_pandas()
    return dict(zip(df.url, df.text))


@pytest.fixture(scope="module")
def oracle_texts(tiny_oracle):
    return {u: o["text"] for u, o in tiny_oracle.items()}


def test_two_stage_resume_equals_single_shot(tiny_corpus, tmp_path_factory, oracle_texts):
    cfg = EngineConfig(num_partitions=8)
    out = str(tmp_path_factory.mktemp("resume"))
    mid = tiny_corpus.watermark // 2
    r1 = replay(tiny_corpus, out, cfg, watermark=mid)
    assert load_manifest(out).watermark == mid
    r2 = replay(tiny_corpus, out, cfg)  # resume: only seq > mid replayed
    assert r2.manifest.watermark == tiny_corpus.watermark
    assert _texts(out) == oracle_texts


def test_many_checkpoints_reconverge(tiny_corpus, tmp_path_factory, oracle_texts):
    cfg = EngineConfig(num_partitions=5)
    out = str(tmp_path_factory.mktemp("resume4"))
    wm = tiny_corpus.watermark
    for w in (wm // 4, wm // 2, (3 * wm) // 4, wm):
        replay(tiny_corpus, out, cfg, watermark=w)
    assert _texts(out) == oracle_texts


def test_late_route_file_shuffle_resume(tiny_corpus, tmp_path_factory, oracle_texts):
    """Late materialization with the explicit file-bucket shuffle (the bench
    default): checkpointed tail windows must reconverge to the oracle."""
    cfg = EngineConfig(num_partitions=8, shuffle="file")
    out = str(tmp_path_factory.mktemp("latefile"))
    wm = tiny_corpus.watermark
    for w in (wm // 3, (2 * wm) // 3, wm):
        r = replay(tiny_corpus, out, cfg, watermark=w)
        assert r.manifest.metrics.get("route") == "late"
    assert _texts(out) == oracle_texts


def test_sharded_winner_route_resume_with_file_shuffle(tiny_corpus,
                                                       tmp_path_factory,
                                                       oracle_texts):
    """Most-distributed configuration: sharded Bloom winner election +
    file-bucket shuffle, across checkpointed windows — still oracle-exact."""
    cfg = EngineConfig(num_partitions=8, shuffle="file", winner_exact_threshold=0)
    out = str(tmp_path_factory.mktemp("shardfile"))
    wm = tiny_corpus.watermark
    for w in (wm // 2, wm):
        r = replay(tiny_corpus, out, cfg, watermark=w)
        assert r.manifest.metrics.get("winner_filter") == "sharded_bloom"
    assert _texts(out) == oracle_texts


def test_file_shuffle_requires_shared_scratch_on_multinode(tiny_corpus, tmp_path,
                                                           monkeypatch):
    """On a >1-node cluster with default (node-local) scratch, the file
    shuffle must fail fast instead of silently dropping other nodes'
    buckets."""
    import ray as ray_mod

    monkeypatch.setattr(ray_mod, "nodes",
                        lambda: [{"Alive": True}, {"Alive": True}])
    with pytest.raises(ValueError, match="SHARED storage"):
        replay(tiny_corpus, str(tmp_path / "mn"),
               EngineConfig(num_partitions=4, shuffle="file"))
    # asserting shared scratch re-enables the route
    monkeypatch.setattr(ray_mod, "nodes", lambda: [{"Alive": True}])
    r = replay(tiny_corpus, str(tmp_path / "mn"),
               EngineConfig(num_partitions=4, shuffle="file"))
    assert r.manifest.watermark == tiny_corpus.watermark


def test_crash_before_commit_is_invisible(tiny_corpus, tmp_path_factory, oracle_texts):
    """Simulate a crash after partition files were written but before the
    manifest commit: the extra files must not be readable state, and a rerun
    reconverges."""
    cfg = EngineConfig(num_partitions=4)
    out = str(tmp_path_factory.mktemp("crash"))
    mid = tiny_corpus.watermark // 2
    replay(tiny_corpus, out, cfg, watermark=mid)
    manifest_path = os.path.join(out, "_manifest.json")
    saved = open(manifest_path).read()

    # full run, then roll the manifest back → "crashed before commit".
    # A real pre-commit crash writes neither the live pointer nor the
    # generation snapshot, so drop the full run's generation file too
    # (leaving it would make the files a retained — GC-protected — backup).
    from ethereum_etl_ray.state.manifest import list_generations

    gens_before = {g for g, _ in list_generations(out)}
    replay(tiny_corpus, out, cfg)
    for g, _wm in list_generations(out):
        if g not in gens_before:
            os.remove(os.path.join(out, f"manifest-g{g:08d}.json"))
    with open(manifest_path, "w") as f:
        f.write(saved)

    m = load_manifest(out)
    assert m.watermark == mid
    committed = {os.path.join(out, e.file) for e in m.partitions.values()}
    all_parquet = set(glob.glob(os.path.join(out, "part=*", "*.parquet")))
    orphans = all_parquet - committed
    assert orphans, "crash simulation should leave uncommitted files"
    # lake read sees only committed state
    lake_files = {os.path.abspath(p) for p in load_lake(out).input_files()}
    assert lake_files == {os.path.abspath(p) for p in committed if pq.read_metadata(p).num_rows > 0}

    removed = gc_uncommitted(out)
    assert set(removed) == {os.path.abspath(p) for p in orphans}

    replay(tiny_corpus, out, cfg)  # resume after crash
    assert _texts(out) == oracle_texts


def test_fresh_vs_resumed_manifests_agree_per_partition(tiny_corpus, tmp_path_factory):
    """Checksum lineage: a resumed run's final per-partition checksums equal a
    fresh single-shot run's (content-addressed convergence)."""
    cfg = EngineConfig(num_partitions=6)
    a = str(tmp_path_factory.mktemp("a"))
    b = str(tmp_path_factory.mktemp("b"))
    replay(tiny_corpus, a, cfg)
    mid = tiny_corpus.watermark // 3
    replay(tiny_corpus, b, cfg, watermark=mid)
    replay(tiny_corpus, b, cfg)
    ma, mb = load_manifest(a), load_manifest(b)
    assert {k: (v.rows, v.checksum) for k, v in ma.partitions.items()} == \
           {k: (v.rows, v.checksum) for k, v in mb.partitions.items()}


def test_resume_rejects_layout_or_mode_change(tiny_corpus, tmp_path_factory):
    """Resuming with a different hash fan-out or merge mode must refuse —
    either would silently corrupt the keyed layout / winner semantics."""
    import pytest

    out = str(tmp_path_factory.mktemp("layout"))
    mid = tiny_corpus.watermark // 2
    replay(tiny_corpus, out, EngineConfig(num_partitions=8), watermark=mid)
    with pytest.raises(ValueError, match="num_partitions"):
        replay(tiny_corpus, out, EngineConfig(num_partitions=16))
    with pytest.raises(ValueError, match="merge_mode"):
        replay(tiny_corpus, out, EngineConfig(num_partitions=8, merge_mode="ignore"))
    # unchanged config resumes fine
    replay(tiny_corpus, out, EngineConfig(num_partitions=8))


def test_ignore_mode_first_writer_wins_end_to_end(tiny_corpus, tmp_path_factory):
    """INSERT OR IGNORE semantics end-to-end (reference
    src/repositories/sqlite/base.py:159-172): with the snapshot disabled, every
    url's surviving version is its MIN (warc_ts, seq) event."""
    import glob as g

    import pyarrow.parquet as pq

    from ethereum_etl_ray.state.oracle import sequential_replay

    cfg = EngineConfig(num_partitions=4, merge_mode="ignore")
    out = str(tmp_path_factory.mktemp("ignore"))
    corpus_no_snap = type(tiny_corpus)(**{**tiny_corpus.__dict__, "snapshot_dir": ""})
    replay(corpus_no_snap, out, cfg)
    events = [pq.read_table(f) for d in tiny_corpus.event_dirs
              for f in sorted(g.glob(d + "/*.parquet"))]
    oracle = sequential_replay(events, None, mode="ignore")
    got = _texts(out)
    assert got == {u: o["text"] for u, o in oracle.items()}


def test_restore_generation_matches_oracle_at_watermark(tiny_corpus,
                                                        tmp_path_factory,
                                                        oracle_texts):
    """Full X5 parity (reference src/repositories/sqlite/base.py:81-136):
    after replaying past W, `restore --watermark W` must reproduce the lake
    the sequential-replay oracle computes at W byte-identically, and a
    subsequent forward replay must reconverge to the full-corpus state."""
    import pyarrow.compute as pc

    from ethereum_etl_ray.state.manifest import restore_generation
    from ethereum_etl_ray.state.oracle import sequential_replay

    cfg = EngineConfig(num_partitions=6)
    out = str(tmp_path_factory.mktemp("restore"))
    wm = tiny_corpus.watermark
    mid = wm // 2
    replay(tiny_corpus, out, cfg, watermark=mid)
    replay(tiny_corpus, out, cfg)
    assert load_manifest(out).watermark == wm
    assert _texts(out) == oracle_texts  # sanity: full state first

    restore_generation(out, mid)
    assert load_manifest(out).watermark == mid
    events_mid = [
        t.filter(pc.less_equal(t.column("seq"), mid))
        for d in tiny_corpus.event_dirs
        for t in [pq.read_table(f) for f in sorted(glob.glob(d + "/*.parquet"))]
    ]
    snap = pq.read_table(glob.glob(tiny_corpus.snapshot_dir + "/*.parquet")[0])
    oracle_mid = sequential_replay(events_mid, snap)
    assert _texts(out) == {u: o["text"] for u, o in oracle_mid.items()}

    # redo: resuming from the restored watermark reconverges exactly
    replay(tiny_corpus, out, cfg)
    assert load_manifest(out).watermark == wm
    assert _texts(out) == oracle_texts


def test_tail_allowed_lateness_side_output(tiny_corpus, tmp_path_factory):
    """`cli tail --allowed-lateness-us` must route watermark-late events to
    the out/_late side output (full rows), withhold them from the merge, and
    leave the lake equal to a sequential replay of the KEPT stream — with
    the high-water mark carried correctly across tail windows."""
    import json
    from argparse import Namespace

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ethereum_etl_ray import cli as climod
    from ethereum_etl_ray.pipelines.replay import read_late_events
    from ethereum_etl_ray.state.oracle import sequential_replay

    # sequential ground truth for the lateness decision: per-event lag
    # against the running max warc_ts in seq (arrival) order
    tabs = [pq.read_table(f)
            for d in tiny_corpus.event_dirs
            for f in sorted(glob.glob(d + "/*.parquet"))]
    # slim columns only: the two event-schema generations differ on payload
    # columns (schema evolution), but (seq, warc_ts) is generation-stable
    slim = pa.concat_tables([t.select(["seq", "warc_ts"]) for t in tabs])
    slim = slim.take(pc.sort_indices(slim.column("seq")))
    seqs = slim.column("seq").to_numpy()
    ts = pc.cast(slim.column("warc_ts"), pa.int64()).to_numpy()
    lag = np.maximum.accumulate(ts) - ts
    allowed = int(np.median(lag[lag > 0]))  # split the stream non-trivially
    late_mask = lag > allowed
    assert late_mask.any() and not late_mask.all()
    want_late = set(seqs[late_mask].tolist())

    out = str(tmp_path_factory.mktemp("tail_lateness"))
    args = Namespace(sf_dir="/root/testdata/sf0.001", events_per_doc=6.0,
                     out=out, partitions=8, mode="replace",
                     window=700,  # several rounds -> cross-window hwm carry
                     allowed_lateness_us=allowed, num_cpus=4)
    climod.cmd_tail(args)

    side = read_late_events(out)
    assert side is not None
    assert set(side.column("seq").to_numpy().tolist()) == want_late

    # lake == sequential replay of the kept stream only (filter each
    # generation's table separately; the oracle accepts a heterogeneous list)
    kept = [t.filter(pa.array(
                ~np.isin(t.column("seq").to_numpy(), list(want_late))))
            for t in tabs]
    snap = pq.read_table(glob.glob(tiny_corpus.snapshot_dir + "/*.parquet")[0])
    want = sequential_replay(kept, snap)
    got = _texts(out)
    assert got == {u: o["text"] for u, o in want.items()}

    # the carry state survives for the next process (crash resumability)
    with open(os.path.join(out, "_late", "_state.json")) as f:
        st = json.load(f)
    assert st["watermark"] == tiny_corpus.watermark
    assert st["hwm_us"] == int(ts.max())
