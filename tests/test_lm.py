"""Bigram LM quality-scoring tests: pure-Python oracle + route equivalence."""

import pyarrow as pa
import ray.data

from ethereum_etl_ray.pipelines.lm import lm_score, train_bigram_counts


def _docs(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(3)


TEXTS = [
    "the cat sat on the mat",
    "the cat ran",
    "solo",
    "",
    "mat mat mat mat",
    "on the mat the cat sat",
]


def _python_oracle(texts):
    c1, c2 = {}, {}
    for s in texts:
        toks = s.split(" ")
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    out = {}
    for i, s in enumerate(texts):
        toks = s.split(" ")
        grams = list(zip(toks, toks[1:]))
        if not grams:
            out[i] = (0, 0)
            continue
        conds = [c2[(a, b)] * 1_000_000 // c1[a] for a, b in grams]
        out[i] = (len(grams), sum(conds) // len(grams))
    return out


def test_lm_score_matches_python_oracle(ray_session):
    got = {r.doc_id: (int(r.n_bigrams), int(r.lm_score_ppm))
           for r in lm_score(_docs(TEXTS)).to_pandas().itertuples()}
    assert got == _python_oracle(TEXTS)


def test_lm_routes_equivalent(ray_session):
    """broadcast_threshold=0 forces the cogroup-join route; results must be
    identical to the broadcast route (including <2-token docs at (0, 0))."""
    fast = {r.doc_id: (int(r.n_bigrams), int(r.lm_score_ppm))
            for r in lm_score(_docs(TEXTS)).to_pandas().itertuples()}
    slow = {r.doc_id: (int(r.n_bigrams), int(r.lm_score_ppm))
            for r in lm_score(_docs(TEXTS), broadcast_threshold=0)
            .to_pandas().itertuples()}
    assert fast == slow == _python_oracle(TEXTS)


def test_train_counts_are_corpus_totals(ray_session):
    uni, bi = train_bigram_counts(_docs(TEXTS))
    uni = {r.gram: int(r.c) for r in uni.to_pandas().itertuples()}
    assert uni["the"] == 5 and uni["mat"] == 6 and uni["solo"] == 1
    assert uni[""] == 1  # empty doc contributes one empty-string token
    bi = {tuple(r.gram.split("\x00")): int(r.c)
          for r in bi.to_pandas().itertuples()}
    assert bi[("the", "cat")] == 3
    assert bi[("mat", "mat")] == 3
    assert ("sat", "on") in bi and ("cat", "ran") in bi
