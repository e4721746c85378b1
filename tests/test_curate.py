"""End-to-end corpus curation (pipelines.curate) — planted-survivor oracle.

The planted corpus exercises every drop reason:
  * doc 1/2/3: a near-dup chain (A~B, B~C above the Jaccard threshold but
    A~C below it) — transitive clustering must still collapse all three to
    the min id;
  * doc 4/5: exact duplicates of each other — keep 4;
  * doc 6: unique good English doc — kept;
  * doc 7: German (language filter drop);
  * doc 8: junk without stopwords (quality filter drop);
  * doc 9: good English doc, later removed only when the sample split is on.
"""

import pandas as pd
import pytest
import ray.data

from ethereum_etl_ray.pipelines.curate import curate_corpus

_EN = ("the cat sat on a mat and the dog lay by the door of the house "
       "while the sun rose over a quiet field of green grass")


def _planted_docs():
    base = _EN + " extra words " + " ".join(f"tok{i}" for i in range(40))
    near_b = base + " tail one"
    near_c = near_b + " tail two more tokens appended here now"
    # docs 4/6/9 share NO prefix with the cluster or each other (short docs
    # with a common prefix exceed a 0.6 token-3-gram Jaccard easily), and
    # they are repeated to ~120 tokens: quality_ppm is dominated by
    # min(n_tokens, 100) so a "good" doc must not be short
    four = ("a miller ground the wheat beside the stream and sold a sack of "
            "flour at the market price to the baker from the village ") * 5
    six = ("the ship left the harbor before dawn and the crew watched the "
           "coast fade while gulls circled over the mast in the cold wind ") * 5
    nine = ("the orchard gave a heavy crop this year and the farmer stored "
            "the apples in the cellar until the frost passed in the spring ") * 5
    four, six, nine = four.strip(), six.strip(), nine.strip()
    rows = [
        {"doc_id": 1, "text": base, "n_chars": len(base)},
        {"doc_id": 2, "text": near_b, "n_chars": len(near_b)},
        {"doc_id": 3, "text": near_c, "n_chars": len(near_c)},
        {"doc_id": 4, "text": four, "n_chars": 10},
        {"doc_id": 5, "text": four, "n_chars": 11},
        {"doc_id": 6, "text": six, "n_chars": 12},
        {"doc_id": 7, "text": "der hund und die katze und der vogel und die maus " * 4, "n_chars": 13},
        # three tokens, one stopword: predicted en but deeply negative
        # quality_ppm (the stop_ppm penalty exceeds the tiny length base)
        {"doc_id": 8, "text": "zzz the qqq", "n_chars": 14},
        {"doc_id": 9, "text": nine, "n_chars": 15},
    ]
    return ray.data.from_items(rows)


def test_planted_survivors_exact():
    kept = curate_corpus(_planted_docs(), langs=("en",), min_quality_ppm=200_000,
                         near_threshold=0.6, keep_cols=["doc_id", "n_chars"])
    out = kept.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # 1 survives its near-dup cluster {1,2,3}; 4 survives the exact pair
    # {4,5}; 6 and 9 are unique good docs; 7 (lang) and 8 (quality) drop
    assert out.doc_id.tolist() == [1, 4, 6, 9]
    # non-key columns ride through untouched
    assert out.set_index("doc_id").n_chars.to_dict()[4] == 10


def test_report_counts_each_stage():
    kept, report = curate_corpus(
        _planted_docs(), langs=("en",), min_quality_ppm=200_000,
        near_threshold=0.6, keep_cols=["doc_id"], collect_report=True)
    assert report["input"] == 9
    assert report["after_lang_quality"] == 7      # drops 7 (de) and 8 (junk)
    assert report["after_exact_dedup"] == 6       # drops 5
    assert report["after_near_dedup"] == 4        # drops 2 and 3
    assert report["output"] == 4
    assert sorted(kept.to_pandas().doc_id) == [1, 4, 6, 9]


def test_sample_split_is_deterministic_subset():
    full = curate_corpus(_planted_docs(), langs=("en",), min_quality_ppm=200_000,
                         near_threshold=0.6, keep_cols=["doc_id"])
    sampled = curate_corpus(_planted_docs(), langs=("en",),
                            min_quality_ppm=200_000, near_threshold=0.6,
                            sample_hex_lt="8", keep_cols=["doc_id"])
    f = set(full.to_pandas().doc_id)
    s = set(sampled.to_pandas().doc_id)
    assert s <= f
    # md5-split: same subset every run
    s2 = set(curate_corpus(_planted_docs(), langs=("en",),
                           min_quality_ppm=200_000, near_threshold=0.6,
                           sample_hex_lt="8", keep_cols=["doc_id"])
             .to_pandas().doc_id)
    assert s == s2


def test_driver_query_runs_at_sf0001():
    from ethereum_etl_ray.pipelines.queries import QUERIES

    out = QUERIES["corpus_curate"]("/root/testdata/sf0.001")
    assert isinstance(out, pd.DataFrame)
    assert len(out) > 0
    assert list(out.columns) == ["doc_id", "n_chars"]
    assert out.doc_id.is_monotonic_increasing


def test_token_budget_cut_is_greedy_md5_prefix():
    """token_budget composes after dedup: survivors are cut in md5 priority
    order at the cumulative n_tokens budget."""
    import hashlib

    kept, report = curate_corpus(
        _planted_docs(), langs=("en",), min_quality_ppm=200_000,
        near_threshold=0.6, token_budget=200,
        keep_cols=["doc_id", "n_tokens"], collect_report=True)
    out = kept.to_pandas().sort_values("doc_id")
    survivors = {1, 4, 6, 9}
    assert set(out.doc_id) <= survivors
    assert report["after_budget"] == len(out)
    # reproduce the greedy cut independently
    full = curate_corpus(_planted_docs(), langs=("en",),
                         min_quality_ppm=200_000, near_threshold=0.6,
                         keep_cols=["doc_id", "n_tokens"],
                         token_budget=10**9).to_pandas()
    full["hex"] = [hashlib.md5(str(i).encode()).hexdigest()
                   for i in full.doc_id]
    full = full.sort_values("hex")
    expect = set(full.doc_id[full.n_tokens.cumsum() <= 200])
    assert set(out.doc_id) == expect
    assert out.n_tokens.sum() <= 200


def test_curate_with_span_strip_collapses_boilerplate_twins():
    """Docs identical except for a shared boilerplate span collapse to one
    survivor once strip_spans_ngram removes the repeated span first."""
    import pyarrow as pa
    import ray.data

    from ethereum_etl_ray.pipelines.curate import curate_corpus

    body = "the quick brown fox jumps over the lazy dog again and again"
    boiler = "subscribe to our newsletter for updates"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            body + " " + boiler,          # twin A (boiler at end)
            boiler + " " + body,          # twin B (boiler at front)
            "a completely different page about other things entirely ok",
        ]),
        "n_chars": pa.array([10, 10, 10], pa.int64()),
    })
    ds = ray.data.from_arrow(docs)
    kept, report = curate_corpus(
        ds, langs=("en",), min_quality_ppm=0, near_threshold=0.99,
        strip_spans_ngram=4, keep_cols=["doc_id"], collect_report=True)
    ids = sorted(r["doc_id"] for r in kept.take_all())
    # every 4-gram of body AND boiler repeats across docs 1/2 (only the
    # seam grams differ) -> both docs strip to the same remnant -> exact
    # dedup keeps the min doc_id
    assert ids == [1, 3]
    assert report["after_span_strip"] == 3
    assert report["after_exact_dedup"] == 2


def test_make_training_shards_deterministic_and_complete(tmp_path):
    """Shard build: every curated doc lands in exactly one shard, shard
    token totals add up, and two runs produce identical manifests."""
    import glob

    import duckdb
    import pyarrow as pa
    import ray.data

    from ethereum_etl_ray.pipelines.curate import make_training_shards

    texts = [f"doc number {i} with several english words like the and of "
             f"unique tail token{i}" for i in range(40)]
    docs = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                     "text": pa.array(texts)})
    outs = []
    for run in (1, 2):
        out = str(tmp_path / f"shards{run}")
        m = make_training_shards(ray.data.from_arrow(docs), out,
                                 shards=4, tokens_per_seq=32,
                                 langs=("en",), near_threshold=0.95)
        outs.append(m)
        files = glob.glob(out + "/shard=*/*.parquet")
        assert len({f.split("/shard=")[1].split("/")[0] for f in files}) == 4
        df = duckdb.sql(
            f"SELECT * FROM read_parquet('{out}/shard=*/*.parquet', "
            "hive_partitioning=1)").df()
        assert sorted(df["doc_id"]) == list(range(40))  # nothing dropped
        assert (df.groupby("shard")["n_tokens"].sum().sum()
                == df["n_tokens"].sum())
        # pack invariant: every sequence holds >= 1 doc; seq ids are dense
        assert set(df["seq_id"]) == set(range(m["sequences"]))
    assert outs[0] == outs[1]


def test_make_training_shards_idempotent_restart(tmp_path):
    """A re-run with identical params returns the committed manifest
    without rebuilding; different params on the same dir fail loudly."""
    import os

    import pyarrow as pa
    import pytest
    import ray.data

    from ethereum_etl_ray.pipelines.curate import make_training_shards

    docs = pa.table({"doc_id": pa.array(range(12), pa.int64()),
                     "text": pa.array(
                         [f"doc number {i} with several english words "
                          f"like the and of unique tail token{i}"
                          for i in range(12)])})
    out = str(tmp_path / "s")
    m1 = make_training_shards(ray.data.from_arrow(docs), out, shards=2,
                              tokens_per_seq=16, langs=("en",))
    mpath = os.path.join(out, "_shards_manifest.json")
    mtime = os.path.getmtime(mpath)
    m2 = make_training_shards(ray.data.from_arrow(docs), out, shards=2,
                              tokens_per_seq=16, langs=("en",))
    assert m1 == m2
    assert os.path.getmtime(mpath) == mtime  # nothing rewritten
    with pytest.raises(ValueError, match="different parameters"):
        make_training_shards(ray.data.from_arrow(docs), out, shards=4,
                             tokens_per_seq=16, langs=("en",))
