"""Dead-letter quarantine + Bloom winner-filter tests."""

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ethereum_etl_ray.config import EngineConfig
from ethereum_etl_ray.pipelines.replay import load_lake, read_dead_letters, replay
from ethereum_etl_ray.schemas import EVENTS_SCHEMA_V2
from ethereum_etl_ray.sources.synth import Corpus
from ethereum_etl_ray.state.oracle import sequential_replay


@pytest.fixture()
def corpus_with_bad_rows(tiny_corpus, tmp_path):
    """Copy the tiny corpus and inject malformed events into the v2 log:
    null url, unknown op, and — crucially — a malformed row that would WIN
    its url's election if not quarantined."""
    root = str(tmp_path / "badcorpus")
    shutil.copytree(tiny_corpus.root, root)
    v2 = os.path.join(root, "events_v2")
    f = sorted(glob.glob(v2 + "/*.parquet"))[0]
    t = pq.read_table(f)
    steal_url = t.column("url")[0].as_py()
    bad = pa.table({
        "seq": pa.array([10**9, 10**9 + 1, 10**9 + 2], pa.int64()),
        "op": pa.array(["insert", "frobnicate", "update"]),
        "url": pa.array([None, "https://ok.example/p/1", steal_url]),
        "warc_ts": pa.array([t.column("warc_ts")[0].as_py()] * 2 + [None],
                            pa.timestamp("us")),
        "html": pa.array([b"x", b"y", b"z"], pa.binary()),
        "lang": pa.array(["en", "en", "en"], pa.large_string()),
        "content_len": pa.array([1, 1, 1], pa.int64()),
        "fetch_status": pa.array([200, 200, 200], pa.int32()),
    }, schema=EVENTS_SCHEMA_V2)
    pq.write_table(pa.concat_tables([t, bad]), f)
    meta = {**tiny_corpus.__dict__}
    meta.update(root=root, snapshot_dir=os.path.join(root, "snapshot"),
                events_v1_dir=os.path.join(root, "events_v1"),
                events_v2_dir=v2, watermark=10**9 + 2)
    return Corpus(**meta), steal_url


def test_quarantine_spills_and_preserves_correctness(corpus_with_bad_rows,
                                                     tiny_oracle, tmp_path):
    corpus, steal_url = corpus_with_bad_rows
    out = str(tmp_path / "qlake")
    replay(corpus, out, EngineConfig(num_partitions=4))
    dl = read_dead_letters(out)
    assert dl is not None and dl.num_rows == 3
    assert sorted(dl.column("seq").to_pylist()) == [10**9, 10**9 + 1, 10**9 + 2]
    # the would-be-stealing malformed row must NOT have erased the url's
    # legitimate state: final text equals the clean-corpus oracle
    df = load_lake(out).to_pandas()
    got = dict(zip(df.url, df.text))
    assert got == {u: o["text"] for u, o in tiny_oracle.items()}
    assert steal_url in got or steal_url not in {u for u in tiny_oracle}


def test_quarantine_off_keeps_stream_untouched(tiny_corpus, tmp_path):
    out = str(tmp_path / "noq")
    replay(tiny_corpus, out, EngineConfig(num_partitions=4, quarantine=False))
    assert read_dead_letters(out) is None


def test_sharded_winner_route_matches_exact(tiny_corpus, tiny_oracle, tmp_path):
    """Force the distributed winner route (threshold 0: every election stays
    in the cluster; the driver receives only num_partitions Bloom-shard
    summary rows, never the O(#keys) winner set) — byte-identical result."""
    out = str(tmp_path / "shardlake")
    r = replay(tiny_corpus, out, EngineConfig(num_partitions=4,
                                              winner_exact_threshold=0))
    assert r.manifest.metrics.get("winner_filter") == "sharded_bloom"
    # winners counts every event-won key (incl. tombstoned ones) — at least
    # all surviving event-origin keys
    assert r.manifest.metrics.get("winners") >= sum(
        1 for o in tiny_oracle.values() if o["seq"] >= 0)
    df = load_lake(out).to_pandas()
    assert dict(zip(df.url, df.text)) == {u: o["text"] for u, o in tiny_oracle.items()}


def test_sharded_winner_route_fww_matches_exact(tiny_corpus, tmp_path):
    """Sharded route under first-writer-wins: a Bloom false positive must
    still LOSE the min-version in-partition pick — compare against the exact
    route's lake, byte for byte."""
    cfg_kw = dict(num_partitions=4, merge_mode="ignore")
    out_a = str(tmp_path / "fww_exact")
    out_b = str(tmp_path / "fww_shard")
    replay(tiny_corpus, out_a, EngineConfig(**cfg_kw))
    r = replay(tiny_corpus, out_b, EngineConfig(**cfg_kw, winner_exact_threshold=0))
    assert r.manifest.metrics.get("winner_filter") == "sharded_bloom"
    a = load_lake(out_a).to_pandas().sort_values("url").reset_index(drop=True)
    b = load_lake(out_b).to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)
