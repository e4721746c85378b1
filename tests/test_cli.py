"""Admin-CLI output tests (X6-X8): every subcommand exercised against a tiny
lake with its JSON/CSV output asserted — reference analogues in
src/clis/historical.py, src/repositories/sqlite/base.py:26-52 (inspect),
:126-136 (GC), :177-185 (COPY TO export)."""

import json
import os

import pytest

from ethereum_etl_ray.cli import main
from ethereum_etl_ray.pipelines.replay import load_lake

SF = "/root/testdata/sf0.001"
EPD = ["--events-per-doc", "6"]


def _run(capsys, argv) -> dict:
    main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


@pytest.fixture(scope="module")
def cli_lake(tmp_path_factory, tiny_corpus):
    out = str(tmp_path_factory.mktemp("clilake") / "lake")
    main(["replay", "--sf-dir", SF, *EPD, "--out", out, "--partitions", "6"])
    return out


def test_cli_init_reports_corpus(capsys):
    got = _run(capsys, ["init", "--sf-dir", SF, *EPD])
    assert got["n_docs"] > 0 and got["n_events"] > 0
    assert got["watermark"] >= got["v2_start_seq"]


def test_cli_replay_and_inspect_agree(capsys, cli_lake):
    got = _run(capsys, ["inspect", "--out", cli_lake])
    assert got["rows"] == load_lake(cli_lake).count()
    assert got["partitions"] == 6
    assert set(got["schema"]) >= {"url", "warc_ts", "html", "text", "seq"}
    assert len(got["sample"]) == 3
    assert got["metrics"].get("route") == "late"


def test_cli_tail_converges_to_full_replay(capsys, cli_lake, tmp_path):
    out = str(tmp_path / "taillake")
    got = _run(capsys, ["tail", "--sf-dir", SF, *EPD, "--out", out,
                        "--partitions", "6", "--window", "300"])
    assert got["rounds"] >= 2
    one_shot = load_lake(cli_lake).to_pandas().sort_values("url")
    tailed = load_lake(out).to_pandas().sort_values("url")
    assert tailed.url.tolist() == one_shot.url.tolist()
    assert tailed.text.tolist() == one_shot.text.tolist()


def test_cli_export_csv_roundtrip(capsys, cli_lake, tmp_path):
    import pandas as pd

    dest = str(tmp_path / "csv")
    got = _run(capsys, ["export", "--out", cli_lake, "--dest", dest,
                        "--include-html"])
    assert got["dest"] == dest
    files = [os.path.join(dest, f) for f in os.listdir(dest) if f.endswith(".csv")]
    assert files
    df = pd.concat([pd.read_csv(f) for f in files])
    lake = load_lake(cli_lake).to_pandas()
    assert len(df) == len(lake)
    assert "html_text" in df.columns and "html" not in df.columns
    assert set(df.url) == set(lake.url)


def test_cli_retention_then_compact_and_restore(capsys, cli_lake):
    n = load_lake(cli_lake).count()
    pre_wm = _run(capsys, ["inspect", "--out", cli_lake])["watermark"]
    got = _run(capsys, ["retention", "--out", cli_lake, "--keep-ratio", "0.9"])
    assert got["evicted"] == int(n * 0.1)
    # pre-retention files are a retained generation now (X5 backups) — bare
    # GC must NOT remove them, and `restore` must resurrect the evicted rows
    got = _run(capsys, ["compact", "--out", cli_lake])
    assert got["removed"] == 0
    assert load_lake(cli_lake).count() == n - int(n * 0.1)
    gens = _run(capsys, ["inspect", "--out", cli_lake])["generations"]
    assert sum(1 for g in gens if g["watermark"] == pre_wm) >= 2
    # restore by watermark picks the NEWEST matching generation (the
    # post-retention state, same wm) — the pre-retention backup needs the
    # exact generation address
    pre_gen = min(g["generation"] for g in gens)
    _run(capsys, ["restore", "--out", cli_lake, "--generation", str(pre_gen)])
    assert load_lake(cli_lake).count() == n  # evicted rows resurrected


def test_cli_compact_rewrite_uniform_row_groups(capsys, cli_lake):
    import pyarrow.parquet as pq

    from ethereum_etl_ray.state.manifest import load_manifest

    n = load_lake(cli_lake).count()
    got = _run(capsys, ["compact", "--out", cli_lake, "--rewrite",
                        "--row-group-rows", "16"])
    assert got["partitions_rewritten"] > 0
    m = load_manifest(cli_lake)
    for e in m.partitions.values():
        if e.rows > 16:
            md = pq.read_metadata(os.path.join(cli_lake, e.file))
            assert md.num_row_groups >= 2  # row groups actually resized
    assert load_lake(cli_lake).count() == n  # content untouched


def test_cli_inspect_missing_lake_errors(capsys, tmp_path):
    with pytest.raises(SystemExit):
        main(["inspect", "--out", str(tmp_path / "nope")])
    assert "error" in json.loads(capsys.readouterr().out.strip())


def test_cli_diff_counts_and_parquet(capsys, tiny_corpus, tmp_path):
    out = str(tmp_path / "difflake")
    wm_half = tiny_corpus.watermark // 2
    main(["replay", "--sf-dir", SF, *EPD, "--out", out, "--partitions", "6",
          "--watermark", str(wm_half)])
    capsys.readouterr()
    main(["replay", "--sf-dir", SF, *EPD, "--out", out, "--partitions", "6"])
    capsys.readouterr()
    got = _run(capsys, ["diff", "--out", out, "--from-gen", "1",
                        "--to-gen", "2"])
    assert got["total"] > 0
    assert set(got["changes"]) <= {"added", "deleted", "updated"}
    assert sum(got["changes"].values()) == got["total"]

    dest = str(tmp_path / "diff_rows")
    got2 = _run(capsys, ["diff", "--out", out, "--from-gen", "1",
                         "--to-gen", "2", "--dest", dest])
    import pyarrow.parquet as pq

    rows = pq.read_table(dest)
    assert rows.num_rows == got["total"]


def test_cli_curate_writes_report_and_parquet(capsys, tmp_path):
    dest = str(tmp_path / "curated")
    got = _run(capsys, ["curate", "--docs", SF + "/documents.parquet",
                        "--dest", dest, "--langs", "en,fr",
                        "--min-quality-ppm", "1"])
    assert got["dest"] == dest
    stages = got["stages"]
    assert stages["input"] > 0
    assert 0 < stages["after_near_dedup"] <= stages["after_exact_dedup"] \
        <= stages["after_lang_quality"] <= stages["input"]
    import glob as _glob

    import pyarrow.parquet as pq

    rows = sum(pq.read_metadata(f).num_rows
               for f in _glob.glob(dest + "/*.parquet"))
    assert rows == stages["output"]


def test_cli_delete_predicate(capsys, tiny_corpus, tmp_path):
    out = str(tmp_path / "dellake")
    main(["replay", "--sf-dir", SF, *EPD, "--out", out, "--partitions", "6"])
    capsys.readouterr()
    before = load_lake(out).to_pandas()
    lang = before.lang.mode()[0]
    got = _run(capsys, ["delete", "--out", out, "--column", "lang",
                        "--op", "==", "--value", lang])
    assert got["deleted"] == int((before.lang == lang).sum()) > 0
    assert load_lake(out).count() == len(before) - got["deleted"]


def test_cli_export_jsonl_roundtrip(cli_lake, tmp_path, capsys):
    import glob
    import json as _json

    from ethereum_etl_ray.cli import main
    from ethereum_etl_ray.pipelines.replay import load_lake

    dest = str(tmp_path / "jsonl_out")
    main(["export", "--out", cli_lake, "--dest", dest, "--format", "jsonl"])
    rep = _json.loads(capsys.readouterr().out)
    assert rep["format"] == "jsonl"
    rows = []
    for f in sorted(glob.glob(dest + "/*.jsonl")):
        with open(f) as fh:
            rows += [_json.loads(l) for l in fh if l.strip()]
    lake = load_lake(cli_lake).to_pandas()
    assert rep["rows"] == len(rows) == len(lake)
    got = {r["url"]: r["text"] for r in rows}
    assert got == dict(zip(lake.url, lake.text))


def test_cli_shards(tmp_path):
    import glob
    import json
    import subprocess
    import sys

    docs = str(tmp_path / "docs.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array([f"short english doc {i} with the and of words t{i}"
                          for i in range(20)])}), docs)
    dest = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "ethereum_etl_ray.cli", "--num-cpus", "4",
         "shards", "--docs", docs, "--dest", dest, "--shards", "2",
         "--tokens-per-seq", "16"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    manifest = json.loads(r.stdout.strip().splitlines()[-1])
    assert manifest["shards"] == 2 and manifest["docs"] == 20
    assert len(glob.glob(dest + "/shard=*/*.parquet")) >= 2


def test_cli_replicate_sync_and_verify(capsys, cli_lake, tmp_path):
    dst = str(tmp_path / "replica")
    got = _run(capsys, ["replicate", "--src", cli_lake, "--dst", dst,
                        "--deep"])
    assert got["copied"] > 0 and got["skipped"] == 0
    assert got["in_sync"] and not got["mismatched"] and not got["deep_corrupt"]
    lake = load_lake(cli_lake).to_pandas()
    rep = load_lake(dst).to_pandas()
    assert dict(zip(rep.url, rep.text)) == dict(zip(lake.url, lake.text))
    # idempotent re-run ships nothing
    again = _run(capsys, ["replicate", "--src", cli_lake, "--dst", dst,
                          "--verify"])
    assert again["copied"] == 0 and again["in_sync"]
