"""End-to-end conformance: distributed replay ≡ sequential-replay oracle.

The engine-level correctness gate (FIXTURES.md §4): after full replay of the
change log (schema evolution, deletes, duplicates, out-of-order warc_ts
included), the lake's ``text`` must be byte-identical per url to the
single-threaded oracle, and the key set / versions must match exactly.
"""

import shutil

import pytest

from ethereum_etl_ray.config import EngineConfig
from ethereum_etl_ray.pipelines.replay import load_lake, replay


@pytest.fixture(scope="module")
def replayed(tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lake"))
    res = replay(tiny_corpus, out, EngineConfig(num_partitions=8))
    return res


def _lake_by_url(out_dir):
    df = load_lake(out_dir).to_pandas()
    return {r.url: r for r in df.itertuples(index=False)}


def test_full_replay_matches_oracle_byte_identical(replayed, tiny_oracle):
    got = _lake_by_url(replayed.out_dir)
    assert set(got) == set(tiny_oracle)
    for url, expect in tiny_oracle.items():
        row = got[url]
        assert row.text == expect["text"], url          # byte-identical text
        assert row.seq == expect["seq"], url            # same winning version
        assert row.warc_ts.to_pydatetime() == expect["warc_ts"], url
        assert row.lang == expect["lang"], url


def test_replay_is_idempotent(replayed, tiny_corpus, tiny_oracle):
    # second replay at the same watermark is a no-op and state is unchanged
    res2 = replay(tiny_corpus, replayed.out_dir, EngineConfig(num_partitions=8))
    assert res2.merged_partitions == 0
    got = _lake_by_url(replayed.out_dir)
    assert {u: r.text for u, r in got.items()} == {u: o["text"] for u, o in tiny_oracle.items()}


def test_manifest_checksums_recorded(replayed):
    m = replayed.manifest
    assert m.watermark == replayed.manifest.watermark >= 0
    assert len(m.partitions) >= 1
    for e in m.partitions.values():
        assert e.rows >= 0 and int(e.checksum) >= 0


def test_delete_winners_absent(replayed, tiny_corpus, tiny_oracle):
    """Urls whose final event is a delete must not appear in the lake."""
    import glob

    import pyarrow.parquet as pq

    urls_seen = set()
    deleted_finals = set()
    best = {}
    for d in tiny_corpus.event_dirs:
        for f in glob.glob(d + "/*.parquet"):
            t = pq.read_table(f, columns=["url", "warc_ts", "seq", "op"])
            for r in t.to_pylist():
                urls_seen.add(r["url"])
                v = (r["warc_ts"], r["seq"])
                if r["url"] not in best or v > best[r["url"]][0]:
                    best[r["url"]] = (v, r["op"])
    for url, (_, op) in best.items():
        if op == "delete":
            deleted_finals.add(url)
    assert deleted_finals, "corpus should exercise tombstones"
    got = _lake_by_url(replayed.out_dir)
    assert not (deleted_finals & set(got))


def test_single_pass_path_matches_oracle(tiny_corpus, tiny_oracle, tmp_path):
    """The non-late-materialized route (payload through the shuffle) must give
    the identical result — the two physical plans share one logical merge."""
    out = str(tmp_path / "lake_sp")
    replay(tiny_corpus, out, EngineConfig(num_partitions=8, late_materialization=False))
    got = _lake_by_url(out)
    assert {u: r.text for u, r in got.items()} == \
        {u: o["text"] for u, o in tiny_oracle.items()}


def test_file_shuffle_path_matches_oracle(tiny_corpus, tiny_oracle, tmp_path):
    """Explicit file-bucket shuffle route ≡ sort-shuffle route ≡ oracle, and
    the shuffle dir is cleaned up after the merge."""
    import glob
    import os

    out = str(tmp_path / "lake_fs")
    replay(tiny_corpus, out, EngineConfig(num_partitions=8,
                                          late_materialization=False,
                                          shuffle="file"))
    got = _lake_by_url(out)
    assert {u: r.text for u, r in got.items()} == \
        {u: o["text"] for u, o in tiny_oracle.items()}
    assert not glob.glob(os.path.join(out, "_shuffle-*"))


def test_rmtree_and_fresh_replay_reconverges(tiny_corpus, tiny_oracle, tmp_path):
    out = str(tmp_path / "lake2")
    shutil.rmtree(out, ignore_errors=True)
    res = replay(tiny_corpus, out, EngineConfig(num_partitions=3))  # different P
    got = _lake_by_url(out)
    assert {u: r.text for u, r in got.items()} == {u: o["text"] for u, o in tiny_oracle.items()}
    assert res.manifest.num_partitions == 3
