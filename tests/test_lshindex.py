"""Incremental near-dedup against a persisted LSH index.

Two oracles:
  * planted duplicates — exact copies and near-copies of indexed corpus
    docs must be flagged against the RIGHT corpus doc, fresh text must not;
  * a driver-side numpy oracle built with the SAME signature kernels —
    for every (increment, corpus) pair sharing ≥1 band bucket, the
    signature-agreement estimate; the distributed pipeline must reproduce
    that pair set and every ppm value exactly.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from ethereum_etl_ray.functions.dedup import (
    lsh_band_hashes,
    minhash_signatures,
    tokenize_column,
    word_ngram_hashes,
)
from ethereum_etl_ray.pipelines.lshindex import (
    _BK_MULT,
    append_lsh_index,
    build_lsh_index,
    query_lsh_index,
)

PARAMS = dict(num_perm=64, bands=16, ngram=3, shards=8)


def _docs_table(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])


def _sigs_and_bks(texts):
    th, lens = tokenize_column(pa.array(texts, pa.string()))
    sh, cnt = word_ngram_hashes(th, lens, n=PARAMS["ngram"])
    sigs = minhash_signatures(sh, cnt, num_perm=PARAMS["num_perm"])
    bh = lsh_band_hashes(sigs, bands=PARAMS["bands"])
    bk = (bh * _BK_MULT) ^ np.arange(1, PARAMS["bands"] + 1, dtype=np.uint64)
    return sigs, bk


def _oracle_pairs(inc_ids, inc_texts, corp_ids, corp_texts, threshold):
    """All (inc, corp) pairs sharing ≥1 band bucket, sig-estimated ppm."""
    isig, ibk = _sigs_and_bks(inc_texts)
    csig, cbk = _sigs_and_bks(corp_texts)
    want = {}
    for i, iid in enumerate(inc_ids):
        hits = np.nonzero((cbk[:, None, :] == ibk[i][None, None, :]).any(
            axis=(1, 2)))[0]
        for j in hits:
            if corp_ids[j] == iid:
                continue
            frac = (isig[i] == csig[j]).mean()
            ppm = int(np.floor(frac * 1_000_000 + 0.5))
            if ppm >= int(np.floor(threshold * 1_000_000 + 0.5)):
                want[(iid, corp_ids[j])] = ppm
    return want


@pytest.fixture(scope="module")
def built(sf_dir, tmp_path_factory):
    docs = _docs_table(sf_dir)
    ids = docs.column("doc_id").to_numpy()
    corpus = docs.filter(pa.array(ids % 10 != 0))
    index_dir = str(tmp_path_factory.mktemp("lshidx"))
    build_lsh_index(ray.data.from_arrow(corpus), index_dir, **PARAMS)
    return index_dir, corpus


def test_planted_copies_flagged(built):
    index_dir, corpus = built
    ctexts = corpus.column("text").to_pylist()
    cids = corpus.column("doc_id").to_numpy()
    base = max(cids) + 1_000
    near = ctexts[3].split()
    near[len(near) // 2] = "substituted"
    inc_rows = [
        {"doc_id": base + 1, "text": ctexts[0]},            # exact copy
        {"doc_id": base + 2, "text": ctexts[7]},            # exact copy
        {"doc_id": base + 3, "text": " ".join(near)},       # near copy
        {"doc_id": base + 4, "text": "entirely fresh words about nothing "
                                     "previously ingested by any pipeline"},
    ]
    out = query_lsh_index(index_dir, ray.data.from_items(inc_rows),
                          threshold=0.5).to_pandas()
    got = dict(zip(zip(out.doc_id, out.dup_id), out.est_jaccard_ppm))
    assert got[(base + 1, cids[0])] == 1_000_000
    assert got[(base + 2, cids[7])] == 1_000_000
    assert any(d == base + 3 and c == cids[3] and p >= 500_000
               for (d, c), p in got.items())
    assert not any(d == base + 4 for d, _ in got)


def test_matches_driver_oracle(built):
    index_dir, corpus = built
    # query with near-copies AND verbatim corpus docs under new ids so the
    # oracle exercises both the prune path and multi-band collisions
    cids = corpus.column("doc_id").to_numpy()
    ctexts = corpus.column("text").to_pylist()
    rng = np.random.RandomState(5)
    pick = rng.choice(len(cids), size=12, replace=False)
    base = int(max(cids)) + 5_000
    inc_ids, inc_texts = [], []
    for k, j in enumerate(pick):
        words = ctexts[j].split()
        if k % 3 == 1 and len(words) > 4:   # light perturbation
            words[k % len(words)] = "edited"
        inc_ids.append(base + k)
        inc_texts.append(" ".join(words))
    want = _oracle_pairs(inc_ids, inc_texts, cids.tolist(), ctexts,
                         threshold=0.5)
    inc = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(inc_ids, pa.int64()),
        "text": pa.array(inc_texts, pa.string())}))
    out = query_lsh_index(index_dir, inc, threshold=0.5).to_pandas()
    got = dict(zip(zip(out.doc_id.astype(int), out.dup_id.astype(int)),
                   out.est_jaccard_ppm.astype(int)))
    assert got == want


def test_append_then_query_and_self_exclusion(built, tmp_path_factory):
    index_dir, corpus = built
    cids = corpus.column("doc_id").to_numpy()
    base = int(max(cids)) + 9_000
    novel = ("a brand new document that exists nowhere in the corpus and "
             "talks at length about incremental ingestion semantics")
    appended = [{"doc_id": base + 1, "text": novel}]
    append_lsh_index(index_dir, ray.data.from_items(appended))
    # querying the appended doc under ITS OWN id → self-pair excluded
    # (ray to_pandas drops columns on an all-empty result; reindex for that)
    out_self = (query_lsh_index(index_dir, ray.data.from_items(appended),
                                threshold=0.5).to_pandas()
                .reindex(columns=["doc_id", "dup_id", "est_jaccard_ppm"]))
    assert not ((out_self.doc_id == base + 1)
                & (out_self.dup_id == base + 1)).any()
    # a later exact copy under a NEW id must hit the appended doc
    copy = [{"doc_id": base + 2, "text": novel}]
    out = query_lsh_index(index_dir, ray.data.from_items(copy),
                          threshold=0.5).to_pandas()
    got = dict(zip(zip(out.doc_id, out.dup_id), out.est_jaccard_ppm))
    assert got[(base + 2, base + 1)] == 1_000_000


def test_no_candidates_returns_empty(built):
    index_dir, _ = built
    inc = ray.data.from_items(
        [{"doc_id": 10**9, "text": "zxqv wvut unseen glyph salad "
                                   "jabberwock vorpal snicker snack"}])
    out = query_lsh_index(index_dir, inc, threshold=0.5).to_pandas()
    assert len(out) == 0


def test_compact_preserves_results_and_recovers_from_crash(built, tmp_path):
    """Compaction merges multi-file shards without changing ANY query result,
    and an interrupted compaction (marker written, rename+deletes not done)
    is rolled forward on the next query so readers never see duplicates."""
    import glob
    import json
    import os
    import shutil

    import pyarrow.parquet as pq2

    from ethereum_etl_ray.pipelines.lshindex import (
        _MARKER,
        _recover_shard,
        compact_lsh_index,
    )

    src, corpus = built
    index_dir = str(tmp_path / "idx_copy")
    shutil.copytree(src, index_dir)

    cids = corpus.column("doc_id").to_numpy()
    base = int(max(cids)) + 20_000
    novel = "compaction era document with enough distinct words to shingle"
    append_lsh_index(index_dir, ray.data.from_items(
        [{"doc_id": base + 1, "text": novel}]))
    inc = ray.data.from_items([
        {"doc_id": base + 2, "text": corpus.column("text")[5].as_py()},
        {"doc_id": base + 3, "text": novel},
    ])

    def run():
        out = (query_lsh_index(index_dir, inc, threshold=0.5).to_pandas()
               .sort_values(["doc_id", "dup_id"]).reset_index(drop=True))
        return list(zip(out.doc_id, out.dup_id, out.est_jaccard_ppm))

    before = run()
    assert any(d == base + 3 and c == base + 1 for d, c, _ in before)

    multi = [d for d in glob.glob(os.path.join(index_dir, "*", "*=*"))
             if len(glob.glob(os.path.join(d, "*.parquet"))) > 1]
    assert multi, "append should have produced multi-file shards"
    stats = compact_lsh_index(index_dir)
    assert stats["compacted"] >= len(multi)
    for d in glob.glob(os.path.join(index_dir, "*", "*=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) <= 1
    assert run() == before

    # crash injection: recreate the post-marker pre-rename state in one shard
    shard = glob.glob(os.path.join(index_dir, "sigs", "*=*"))[0]
    [final] = glob.glob(os.path.join(shard, "*.parquet"))
    tmp_name, final_name = "compact-crash.tmp", "compact-crash.parquet"
    os.rename(final, os.path.join(shard, tmp_name))
    with open(os.path.join(shard, _MARKER), "w") as f:
        json.dump({"tmp": tmp_name, "final": final_name,
                   "olds": [os.path.basename(final)]}, f)
    # reader path must roll forward before reading
    assert run() == before
    assert glob.glob(os.path.join(shard, "*.parquet")) == [
        os.path.join(shard, final_name)]
    assert not os.path.exists(os.path.join(shard, _MARKER))
    assert not _recover_shard(shard)  # idempotent, nothing left to repair
    pq2.read_table(os.path.join(shard, final_name))  # intact parquet


def test_cli_dedup_index_end_to_end(built, tmp_path, capsys):
    """build → append → compact → query through the admin CLI."""
    import json

    import pyarrow.parquet as pq2

    from ethereum_etl_ray.cli import main

    _, corpus = built
    docs_pq = str(tmp_path / "docs.parquet")
    pq2.write_table(corpus, docs_pq)
    cids = corpus.column("doc_id").to_numpy()
    base = int(max(cids)) + 30_000
    inc_pq = str(tmp_path / "inc.parquet")
    pq2.write_table(pa.table({
        "doc_id": pa.array([base + 1], pa.int64()),
        "text": pa.array([corpus.column("text")[0].as_py()], pa.string()),
    }), inc_pq)
    idx = str(tmp_path / "cli_idx")
    dest = str(tmp_path / "pairs")

    main(["dedup-index", "build", "--index", idx, "--docs", docs_pq,
          "--index-shards", "8"])
    main(["dedup-index", "append", "--index", idx, "--docs", inc_pq])
    main(["dedup-index", "compact", "--index", idx])
    main(["dedup-index", "query", "--index", idx, "--docs", inc_pq,
          "--threshold", "0.5", "--dest", dest])
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    by_action = {d["action"]: d for d in lines}
    assert by_action["build"]["shards"] == 8
    assert by_action["query"]["pairs"] >= 1
    pairs = pq2.read_table(dest).to_pandas()
    # the appended exact copy matches its corpus original; self-pair excluded
    assert ((pairs.doc_id == base + 1) & (pairs.dup_id == cids[0])
            & (pairs.est_jaccard_ppm == 1_000_000)).any()
    assert not ((pairs.doc_id == base + 1) & (pairs.dup_id == base + 1)).any()


def test_string_ids_and_empty_init(tmp_path):
    """Ids may be strings (the tailer indexes by url): init an EMPTY index,
    append url-keyed docs, query — same semantics as integer ids, and a
    query against the still-empty index returns a typed empty frame."""
    from ethereum_etl_ray.pipelines.lshindex import init_lsh_index

    idx = str(tmp_path / "uidx")
    meta = init_lsh_index(idx, id_col="url", num_perm=64, bands=16,
                          ngram=3, shards=4)
    assert meta["id_col"] == "url"
    # idempotent re-init; different params refuse
    assert init_lsh_index(idx, id_col="url", shards=4) == meta
    with pytest.raises(ValueError):
        init_lsh_index(idx, id_col="url", shards=8)

    txt = ("the quick brown fox jumps over the lazy dog and keeps on "
           "running through the endless synthetic corpus")
    probe = ray.data.from_items([{"url": "https://q/x", "text": txt}])
    empty = (query_lsh_index(idx, probe, threshold=0.5).to_pandas()
             .reindex(columns=["doc_id", "dup_id", "est_jaccard_ppm"]))
    assert len(empty) == 0

    append_lsh_index(idx, ray.data.from_items([
        {"url": "https://a/1", "text": txt},
        {"url": "https://a/2", "text": "completely different words in here "
                                       "about unrelated topics entirely"},
    ]))
    out = query_lsh_index(
        idx, ray.data.from_items([{"url": "https://b/copy", "text": txt}]),
        threshold=0.5).to_pandas()
    got = dict(zip(zip(out.doc_id, out.dup_id), out.est_jaccard_ppm))
    assert got == {("https://b/copy", "https://a/1"): 1_000_000}
    # self-exclusion works for string ids too
    self_q = (query_lsh_index(
        idx, ray.data.from_items([{"url": "https://a/1", "text": txt}]),
        threshold=0.5).to_pandas()
        .reindex(columns=["doc_id", "dup_id", "est_jaccard_ppm"]))
    assert not ((self_q.doc_id == "https://a/1")
                & (self_q.dup_id == "https://a/1")).any()


def test_tail_maintains_dedup_index(tmp_path, sf_dir, capsys):
    """`cli tail --dedup-index`: each window is near-dup-checked against all
    previously ingested pages then appended; the index ends up covering the
    whole lake (an exact copy of any live page under a new url must be
    flagged against THAT url), pair files and the indexed watermark persist
    under out/_dups."""
    import glob
    import json
    import os

    from ethereum_etl_ray.cli import main
    from ethereum_etl_ray.pipelines.replay import load_lake

    out = str(tmp_path / "lake")
    idx = str(tmp_path / "didx")
    main(["tail", "--sf-dir", sf_dir, "--out", out, "--window", "3000",
          "--partitions", "8", "--dedup-index", idx,
          "--dedup-threshold", "0.7"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "near_dup_pairs" in res
    with open(os.path.join(out, "_dups", "_state.json")) as f:
        assert json.load(f)["watermark"] == res["watermark"]
    files = glob.glob(os.path.join(out, "_dups", "window-*.parquet"))
    assert len(files) >= 2  # one artifact per window

    df = load_lake(out).to_pandas()
    row = df.iloc[7]
    probe = ray.data.from_items([{"url": "https://probe/x",
                                  "text": row.text}])
    got = query_lsh_index(idx, probe, threshold=0.7).to_pandas()
    assert ((got.doc_id == "https://probe/x") & (got.dup_id == row.url)
            & (got.est_jaccard_ppm == 1_000_000)).any()


def test_tail_dedup_index_restart_catchup(tmp_path, sf_dir, capsys):
    """A lake that is AHEAD of the index (replay ran without one, or the
    index state was lost) is caught up in one streaming pass before
    tailing resumes."""
    import json
    import os

    from ethereum_etl_ray.cli import main
    from ethereum_etl_ray.pipelines.replay import load_lake
    from ethereum_etl_ray.sources.synth import ensure_corpus

    out = str(tmp_path / "lake2")
    idx = str(tmp_path / "didx2")
    main(["replay", "--sf-dir", sf_dir, "--out", out, "--partitions", "8"])
    main(["tail", "--sf-dir", sf_dir, "--out", out, "--window", "3000",
          "--partitions", "8", "--dedup-index", idx])
    capsys.readouterr()
    corpus = ensure_corpus(sf_dir, events_per_doc=20.0)
    with open(os.path.join(out, "_dups", "_state.json")) as f:
        assert json.load(f)["watermark"] == corpus.watermark

    df = load_lake(out).to_pandas()
    row = df.iloc[3]
    probe = ray.data.from_items([{"url": "https://probe/y",
                                  "text": row.text}])
    got = query_lsh_index(idx, probe, threshold=0.7).to_pandas()
    assert ((got.doc_id == "https://probe/y") & (got.dup_id == row.url)
            & (got.est_jaccard_ppm == 1_000_000)).any()


def test_append_band_table_grows_by_increment_only(tmp_path):
    """Regression: append must derive band rows from the NEW docs only —
    re-exploding the whole sigs table made the band table grow
    quadratically with appends."""
    import glob
    import os

    import pyarrow.parquet as pq2

    texts = [f"document number {i} with some shared filler words plus "
             f"unique token u{i} and more padding text" for i in range(19)]
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    idx = str(tmp_path / "bidx")
    build_lsh_index(docs, idx, **PARAMS)

    def band_rows():
        files = glob.glob(os.path.join(idx, "bands", "*=*", "*.parquet"))
        return sum(pq2.ParquetFile(f).metadata.num_rows for f in files)

    assert band_rows() == 19 * PARAMS["bands"]
    append_lsh_index(idx, ray.data.from_items(
        [{"doc_id": 100, "text": "a wholly new appended document"}]))
    assert band_rows() == 20 * PARAMS["bands"]
    append_lsh_index(idx, ray.data.from_items(
        [{"doc_id": 101, "text": "another appended document arrives"}]))
    assert band_rows() == 21 * PARAMS["bands"]

    # compaction must update the band LEDGER (old sig file names → the
    # compacted one) so the next append doesn't re-explode whole shards
    from ethereum_etl_ray.pipelines.lshindex import compact_lsh_index
    compact_lsh_index(idx)
    append_lsh_index(idx, ray.data.from_items(
        [{"doc_id": 102, "text": "post compaction appended document"}]))
    assert band_rows() == 22 * PARAMS["bands"]


def test_query_empty_increment_returns_typed_empty(built):
    """A zero-row increment (e.g. `dedup-index query --docs empty.parquet`)
    must return the typed empty pairs table, not crash on a None schema."""
    index_dir, _ = built
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    res = query_lsh_index(index_dir, empty, threshold=0.5)
    sch = res.schema()
    # the id type must survive (int64 index) so per-window pair artifacts
    # stay schema-consistent
    assert dict(zip(sch.names, sch.types))["doc_id"] == pa.int64()
    assert res.count() == 0


def test_check_and_append_single_staging_pass(tmp_path):
    """check_and_append: pairs reflect the pre-append index (no self-match),
    and the increment is searchable afterwards."""
    from ethereum_etl_ray.pipelines.lshindex import check_and_append

    idx = str(tmp_path / "caidx")
    base_txt = ("shared content that will be duplicated across ingest "
                "windows with plenty of words to shingle properly")
    build_lsh_index(ray.data.from_items(
        [{"doc_id": 1, "text": base_txt},
         {"doc_id": 2, "text": "unrelated material entirely different"}]),
        idx, **PARAMS)
    inc = ray.data.from_items([{"doc_id": 10, "text": base_txt},
                               {"doc_id": 11, "text": base_txt}])
    pairs, n = check_and_append(idx, inc, threshold=0.5)
    assert n == 2
    got = {(r["doc_id"], r["dup_id"]) for r in pairs.take_all()}
    # both increment docs match the CORPUS doc, not each other (the check
    # ran against the pre-append index)
    assert got == {(10, 1), (11, 1)}
    # and the appended docs are now themselves searchable
    later = query_lsh_index(idx, ray.data.from_items(
        [{"doc_id": 20, "text": base_txt}]), threshold=0.5).to_pandas()
    assert {1, 10, 11} <= set(later.dup_id)


def test_orphaned_sig_files_self_heal(tmp_path):
    """A crash between a sigs write and the band derivation leaves sig
    files with no band rows; the ledger makes the NEXT index write derive
    them, so the docs become searchable without caller intervention."""
    import glob
    import os

    import pyarrow.parquet as pq2

    from ethereum_etl_ray.pipelines.lshindex import (
        _derive_pending_bands,
        _load_meta,
        _stage_increment,
    )

    idx = str(tmp_path / "healidx")
    build_lsh_index(ray.data.from_items(
        [{"doc_id": 1, "text": "base corpus document with several words"}]),
        idx, **PARAMS)
    meta = _load_meta(idx)

    # simulate the crash: write a sig file directly, NO band derivation
    orphan_txt = ("orphaned document whose bands were never derived due to "
                  "a crash between the two writes")
    staged = _stage_increment(ray.data.from_items(
        [{"doc_id": 7, "text": orphan_txt}]), meta, None, None)
    staged.write_parquet(os.path.join(idx, "sigs"),
                         partition_cols=["sig_shard"])
    # invisible now: a copy of the orphan finds nothing
    probe = ray.data.from_items([{"doc_id": 99, "text": orphan_txt}])
    assert query_lsh_index(idx, probe, threshold=0.5).count() == 0

    # ANY subsequent index write heals it (append of an unrelated doc)
    append_lsh_index(idx, ray.data.from_items(
        [{"doc_id": 8, "text": "unrelated filler appended later on"}]))
    got = query_lsh_index(idx, probe, threshold=0.5).to_pandas()
    assert ((got.doc_id == 99) & (got.dup_id == 7)
            & (got.est_jaccard_ppm == 1_000_000)).any()
    # explicit heal API is also idempotent
    assert _derive_pending_bands(idx, meta) == 0
