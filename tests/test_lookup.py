"""Point-read by url: manifest-directed hash pruning (PK SELECT analogue)."""

import pytest

from ethereum_etl_ray.config import EngineConfig
from ethereum_etl_ray.pipelines.replay import (
    files_for_urls,
    load_lake,
    lookup_urls,
    replay,
)
from ethereum_etl_ray.state.manifest import load_manifest


@pytest.fixture(scope="module")
def lake(tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lookup_lake"))
    replay(tiny_corpus, out, EngineConfig(num_partitions=8))
    return out


def test_lookup_matches_full_scan(lake, tiny_oracle):
    df = load_lake(lake).to_pandas()
    sample = sorted(df.url)[:7] + ["url://does-not-exist"]
    got = lookup_urls(lake, sample).to_pandas()
    assert set(got.url) == set(sample) - {"url://does-not-exist"}
    full = df.set_index("url")
    for r in got.itertuples():
        assert r.text == full.loc[r.url].text
        assert r.text == tiny_oracle[r.url]["text"]


def test_lookup_prunes_to_hashed_files(lake):
    m = load_manifest(lake)
    df = load_lake(lake).to_pandas()
    one = sorted(df.url)[0]
    by_file = files_for_urls(m, [one])
    assert len(by_file) == 1  # exactly one partition file for one url
    # every url in the request maps to its own hash partition's file
    many = sorted(df.url)[:20]
    by_file = files_for_urls(m, many)
    assert sum(len(v) for v in by_file.values()) == 20
    assert len(by_file) <= m.num_partitions


def test_lookup_no_manifest_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        lookup_urls(str(tmp_path), ["u"])


def test_lookup_all_missing_returns_empty_typed(lake):
    t = lookup_urls(lake, ["url://nope-1", "url://nope-2"])
    assert t.num_rows == 0 and "url" in t.schema.names


def test_cli_get(lake, capsys):
    import json

    from ethereum_etl_ray.cli import main

    df = load_lake(lake).to_pandas()
    u = sorted(df.url)[0]
    main(["get", "--out", lake, "--url", u, "--url", "url://nope"])
    out = json.loads(capsys.readouterr().out)
    assert out["found"] == 1 and out["rows"][0]["url"] == u


def test_time_travel_read(tiny_corpus, tmp_path_factory):
    """load_lake(generation=) reads a retained generation WITHOUT flipping
    the live pointer — the state must equal what the lake held right after
    that generation's commit."""
    out = str(tmp_path_factory.mktemp("tt_lake"))
    mid = tiny_corpus.watermark // 2
    replay(tiny_corpus, out, EngineConfig(num_partitions=8), watermark=mid)
    df_g1 = load_lake(out).to_pandas()
    g1 = load_manifest(out).generation
    replay(tiny_corpus, out, EngineConfig(num_partitions=8))
    g2 = load_manifest(out).generation
    assert g2 > g1

    old = load_lake(out, generation=g1).to_pandas()
    assert dict(zip(old.url, old.text)) == dict(zip(df_g1.url, df_g1.text))
    # live pointer untouched
    assert load_manifest(out).generation == g2
    live = load_lake(out).to_pandas()
    assert len(live) >= len(old)


def test_time_travel_unknown_generation(tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tt_missing"))
    replay(tiny_corpus, out, EngineConfig(num_partitions=8))
    with pytest.raises(FileNotFoundError):
        load_lake(out, generation=999)


def test_compact_cluster_preserves_content_and_sorts(tiny_corpus, tmp_path_factory, tiny_oracle):
    import glob

    import pyarrow.parquet as pq

    from ethereum_etl_ray.pipelines.retention import compact_lake

    out = str(tmp_path_factory.mktemp("cluster_lake"))
    replay(tiny_corpus, out, EngineConfig(num_partitions=8))
    before = load_lake(out).to_pandas()
    stats = compact_lake(out, row_group_rows=64, cluster_by_url=True)
    assert stats["partitions_rewritten"] > 0
    after = load_lake(out).to_pandas()
    assert dict(zip(after.url, after.text)) == dict(zip(before.url, before.text))
    # every live file is url-sorted → row-group stats are disjoint ranges
    m = load_manifest(out)
    for f in m.files(out):
        urls = pq.read_table(f, columns=["url"]).column("url").to_pylist()
        assert urls == sorted(urls)
    # point lookup still byte-identical against the oracle
    some = sorted(after.url)[:5]
    got = lookup_urls(out, some).to_pandas()
    assert {r.url: r.text for r in got.itertuples()} == \
        {u: tiny_oracle[u]["text"] for u in some}


def test_fsck_clean_and_corrupt(lake, tmp_path):
    import os
    import shutil

    import pyarrow.parquet as pq

    from ethereum_etl_ray.pipelines.retention import fsck_lake

    rep = fsck_lake(lake)
    assert rep["checked"] > 0 and rep["corrupt"] == []

    # corrupt a COPY of the lake, not the shared fixture
    bad = str(tmp_path / "bad_lake")
    shutil.copytree(lake, bad)
    m = load_manifest(bad)
    victim = os.path.join(bad, next(e.file for e in m.partitions.values()
                                    if e.rows > 0))
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, max(0, t.num_rows - 1)), victim)  # drop a row
    rep = fsck_lake(bad)
    assert len(rep["corrupt"]) == 1
    assert rep["corrupt"][0]["rows_actual"] == rep["corrupt"][0]["rows_expected"] - 1

    # unreadable file also flagged, not fatal
    with open(victim, "wb") as f:
        f.write(b"garbage")
    rep = fsck_lake(bad)
    assert len(rep["corrupt"]) == 1
    assert "unreadable" in rep["corrupt"][0]["checksum_actual"]


def test_cli_fsck_exit_code(lake, capsys):
    import json

    from ethereum_etl_ray.cli import main

    main(["fsck", "--out", lake])
    out = json.loads(capsys.readouterr().out)
    assert out["corrupt"] == []
