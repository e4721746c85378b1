"""Inverted-index tests (stages/invindex.py). The driver query
`inverted_postings` carries the DuckDB oracle; these pin the explode
semantics, bucket pruning, and persisted round-trip."""

import os

import pandas as pd
import pyarrow as pa
import ray.data

from ethereum_etl_ray.functions.hashing import partition_ids
from ethereum_etl_ray.stages.invindex import (
    build_inverted_index,
    doc_term_batch,
    lookup_postings,
)


def _docs(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def test_doc_term_batch_tf():
    g = doc_term_batch(_docs([(1, "a b a a"), (2, "b"), (3, "")])).to_pandas()
    m = {(r.token, r.doc_id): r.tf for r in g.itertuples()}
    assert m == {("a", 1): 3, ("b", 1): 1, ("b", 2): 1}


def test_build_and_lookup_matches_naive(ray_session, tmp_path):
    rows = [(i, f"w{i % 5} w{i % 3} w{i % 5}") for i in range(40)]
    idx = str(tmp_path / "inv")
    build_inverted_index(ray.data.from_arrow(_docs(rows)).repartition(3),
                         idx, buckets=8)
    got = (lookup_postings(idx, ["w0", "w2"]).to_pandas()
           .sort_values(["token", "doc_id"]).reset_index(drop=True))
    naive = []
    for i, text in rows:
        for tok in set(text.split()):
            if tok in ("w0", "w2"):
                naive.append((tok, i, text.split().count(tok)))
    want = (pd.DataFrame(naive, columns=["token", "doc_id", "tf"])
            .sort_values(["token", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "tf": "int64"}), want)


def test_lookup_prunes_to_term_buckets(ray_session, tmp_path):
    rows = [(i, f"tok{i % 6}") for i in range(64)]
    idx = str(tmp_path / "inv")
    build_inverted_index(ray.data.from_arrow(_docs(rows)), idx, buckets=64)
    written = {d for d in os.listdir(idx) if d.startswith("tok_bucket=")}
    assert 1 < len(written) <= 6  # only the occupied buckets materialize
    term = "tok3"
    want_bucket = int(partition_ids([term], 64)[0])
    out = lookup_postings(idx, [term]).to_pandas()
    assert set(out.token) == {term}
    assert sorted(out.doc_id) == [i for i in range(64) if i % 6 == 3]
    # pruning: the read plan touches exactly the term's bucket directory —
    # asserted structurally: a term hashing to a missing bucket reads nothing
    missing = next(t for t in (f"zz{i}" for i in range(500))
                   if f"tok_bucket={int(partition_ids([t], 64)[0])}" not in written)
    assert lookup_postings(idx, [missing]).to_pandas().empty
    assert f"tok_bucket={want_bucket}" in written


def test_multi_term_lookup_distinct_buckets(ray_session, tmp_path):
    rows = [(1, "alpha beta"), (2, "beta gamma"), (3, "gamma alpha alpha")]
    idx = str(tmp_path / "inv")
    build_inverted_index(ray.data.from_arrow(_docs(rows)), idx, buckets=4)
    out = lookup_postings(idx, ["alpha", "gamma"]).to_pandas()
    m = {(r.token, r.doc_id): r.tf for r in out.itertuples()}
    assert m == {("alpha", 1): 1, ("alpha", 3): 2,
                 ("gamma", 2): 1, ("gamma", 3): 1}


def test_bm25_ranking_properties(ray_session):
    from ethereum_etl_ray.stages.invindex import bm25_scores

    rows = [
        (1, "cat dog cat cat"),          # tf(cat)=3, dl=4
        (2, "cat dog bird fish mouse"),  # tf(cat)=1, dl=5
        (3, "cat " + "filler " * 20 + "end"),  # tf(cat)=1, long doc
        (4, "dog dog dog"),              # no cat
        (5, "rare unique term here"),
    ]
    ds = ray.data.from_arrow(_docs(rows)).repartition(2)
    out = bm25_scores(ds, ["cat", "rare"]).to_pandas()
    cat = out[out.token == "cat"].set_index("doc_id")
    assert set(cat.index) == {1, 2, 3}
    # higher tf wins at comparable dl; longer doc scores below shorter at same tf
    assert cat.loc[1].score > cat.loc[2].score > cat.loc[3].score
    # rarer term carries higher idf: doc 5's 'rare' (df=1) beats doc 2's
    # 'cat' (df=3) at tf=1 and comparable dl
    rare = out[out.token == "rare"].set_index("doc_id")
    assert rare.loc[5].score > cat.loc[2].score
    assert (out.tf >= 1).all() and (out.score > 0).all()


def test_bm25_no_match_terms_empty(ray_session):
    from ethereum_etl_ray.stages.invindex import bm25_scores

    ds = ray.data.from_arrow(_docs([(1, "a b c"), (2, "d e")]))
    out = bm25_scores(ds, ["zz_not_present"]).to_pandas()
    assert len(out) == 0


def test_phrase_count_overlapping_and_boundaries(ray_session):
    from ethereum_etl_ray.stages.invindex import phrase_count

    rows = [
        (1, "a b c a b"),       # 'a b' twice
        (2, "a a a"),           # 'a a' overlapping: positions 0,1 → 2
        (3, "x y z"),           # no match
        (4, "b a"),             # reversed — no match
        (5, "a"),               # shorter than phrase
    ]
    ds = ray.data.from_arrow(_docs(rows)).repartition(2)
    ab = {r.doc_id: r.n_matches
          for r in phrase_count(ds, ["a", "b"]).to_pandas().itertuples()}
    assert ab == {1: 2}
    aa = {r.doc_id: r.n_matches
          for r in phrase_count(ds, ["a", "a"]).to_pandas().itertuples()}
    assert aa == {2: 2}


def test_phrase_count_never_straddles_docs(ray_session):
    from ethereum_etl_ray.stages.invindex import phrase_count

    # doc 1 ends with 'a', doc 2 starts with 'b' in the same batch: the
    # flattened array contains "... a b ..." across the boundary
    ds = ray.data.from_arrow(_docs([(1, "x a"), (2, "b y")]))
    out = phrase_count(ds, ["a", "b"]).to_pandas()
    assert len(out) == 0
