"""Dedup operator tests with planted exact and near duplicates."""

import numpy as np
import pytest
import ray.data

from ethereum_etl_ray.functions.dedup import (
    hamming64,
    jaccard,
    minhash_signatures,
    simhash_signatures,
    tokenize_column,
    word_ngram_hashes,
)
from ethereum_etl_ray.pipelines.dedup import (
    exact_dedup,
    minhash_lsh_dedup_pairs,
    simhash_pairs,
)

BASE = ("the quick brown fox jumps over the lazy dog while the cat sleeps "
        "near the warm fire and dreams of chasing mice all day long")


@pytest.fixture(scope="module")
def planted():
    near = BASE.replace("warm fire", "cold stove")           # high-Jaccard near-dup
    other = "completely different text about database engines and arrow batches"
    rows = [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": BASE},                          # exact dup of 1
        {"doc_id": 3, "text": near},                          # near dup of 1
        {"doc_id": 4, "text": other},
        {"doc_id": 5, "text": "tiny"},
    ]
    return ray.data.from_items(rows)


def test_exact_dedup_keeps_min_id(planted):
    out = exact_dedup(planted, keep_cols=["doc_id"]).to_pandas()
    assert sorted(out.doc_id) == [1, 3, 4, 5]


def test_minhash_finds_planted_near_dup(planted):
    pairs = minhash_lsh_dedup_pairs(planted, threshold=0.5)
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert (1, 2) in got            # exact dup → jaccard 1.0
    assert (1, 3) in got or (2, 3) in got   # near dup found
    assert all(j >= 500_000 for j in pairs.jaccard_ppm)
    assert not any({4, 5} & {a, b} for a, b in got)


def test_simhash_finds_exact_and_near(planted):
    pairs = simhash_pairs(planted, max_hamming=6)
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert (1, 2) in got
    ham = dict(zip(zip(pairs.doc_a, pairs.doc_b), pairs.hamming))
    assert ham[(1, 2)] == 0


def test_minhash_similarity_estimates_jaccard():
    import pyarrow as pa

    texts = pa.array([BASE, BASE.replace("warm fire", "cold stove")])
    tok_h, lens = tokenize_column(texts)
    sh, counts = word_ngram_hashes(tok_h, lens, n=3)
    sigs = minhash_signatures(sh, counts, num_perm=256)
    est = (sigs[0] == sigs[1]).mean()
    s0 = set(sh[: counts[0]].tolist())
    s1 = set(sh[counts[0]:].tolist())
    true_j = jaccard(s0, s1)
    assert abs(est - true_j) < 0.15


def test_simhash_signature_properties():
    import pyarrow as pa

    texts = pa.array([BASE, BASE, "other words entirely here today"])
    tok_h, lens = tokenize_column(texts)
    sigs = simhash_signatures(tok_h, lens)
    assert sigs[0] == sigs[1]
    assert hamming64(sigs[:1], sigs[2:3])[0] > 10


def test_degenerate_bucket_is_capped():
    """1k identical texts put every doc into one band bucket per band —
    uncapped that is ~500k pairs per band; the cap must drop the bucket and
    finish in bounded time with zero candidate pairs."""
    import time

    from ethereum_etl_ray.pipelines.dedup import minhash_candidate_pairs

    rows = [{"doc_id": i, "text": BASE} for i in range(1000)]
    t0 = time.perf_counter()
    pairs = minhash_candidate_pairs(ray.data.from_items(rows), bands=4, num_perm=32)
    # uncapped this is ~500k pairs/band and minutes of work; capped it is
    # seconds (bound is generous for CI-under-load, not a perf assertion)
    assert time.perf_counter() - t0 < 120
    assert pairs.empty  # every bucket degenerate → dropped (exact_dedup owns these)


def test_verify_pairs_is_distributed_and_exact(planted):
    """The verify stage must produce the exact jaccard for planted pairs via
    the pairs⋈docs⋈docs shuffle path (no driver text materialization)."""
    import pandas as pd

    from ethereum_etl_ray.pipelines.dedup import _ngram_sets, verify_jaccard_pairs

    cand = pd.DataFrame({"doc_a": [1, 1, 4], "doc_b": [2, 3, 5]})
    out = verify_jaccard_pairs(planted, cand, threshold=0.0, ngram=3)
    got = dict(zip(zip(out.doc_a, out.doc_b), out.jaccard_ppm))
    assert got[(1, 2)] == 1_000_000
    near = BASE.replace("warm fire", "cold stove")
    expect = jaccard(_ngram_sets(BASE, 3), _ngram_sets(near, 3))
    assert got[(1, 3)] == int(expect * 1_000_000)
    assert got[(4, 5)] == 0


def test_streaming_path_equals_collected_path(planted):
    """The all-Dataset pipeline (candidates never on the driver) must produce
    exactly the collected path's verified pairs."""
    collected = minhash_lsh_dedup_pairs(planted, threshold=0.5, streaming=False)
    streamed = (minhash_lsh_dedup_pairs(planted, threshold=0.5, streaming=True)
                .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert streamed.equals(collected)


def test_streaming_auto_route_by_metadata_count(planted):
    """streaming=None routes by the free metadata row count: a corpus above
    the threshold takes the streaming (Dataset) route, a small one collects
    (DataFrame) — and both answer identically either way."""
    import pandas as pd

    small = minhash_lsh_dedup_pairs(planted, threshold=0.5)  # 5 docs ≪ default
    assert isinstance(small, pd.DataFrame)
    big = minhash_lsh_dedup_pairs(planted, threshold=0.5, streaming_threshold=2)
    assert isinstance(big, ray.data.Dataset)
    big_df = (big.to_pandas().sort_values(["doc_a", "doc_b"])
              .reset_index(drop=True))
    assert big_df.equals(small)


def test_jaccard_edge_cases():
    assert jaccard(set(), set()) == 1.0
    assert jaccard({1}, set()) == 0.0
    assert jaccard({1, 2}, {2, 3}) == pytest.approx(1 / 3)


def test_dup_span_stats_planted():
    """Cross-doc and within-doc repeated 4-grams; overlap merges coverage."""
    import pyarrow as pa
    import ray.data

    from ethereum_etl_ray.pipelines.dedup import dup_span_stats

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d x y z w",          # shares "a b c d" with doc 2
            "q a b c d r",              # coverage pos 2..5
            "totally unrelated words here",   # no dup grams -> absent
            "p q r s p q r s",          # same gram twice within one doc
        ]),
    })
    out = dup_span_stats(ray.data.from_arrow(docs), ngram=4, min_count=2)
    got = {r["doc_id"]: r["n_dup_tokens"] for r in out.take_all()}
    assert got == {1: 4, 2: 4, 4: 8}


def test_dup_span_strip_planted():
    """Apply step: duplicated spans removed, clean docs byte-identical."""
    import pyarrow as pa
    import ray.data

    from ethereum_etl_ray.pipelines.dedup import dup_span_strip

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d x y z w",
            "q a b c d r",
            "totally unrelated words here",
            "p q r s p q r s",
        ]),
    })
    out = dup_span_strip(ray.data.from_arrow(docs), ngram=4, min_count=2)
    got = {r["doc_id"]: r["text"] for r in out.take_all()}
    assert got == {1: "x y z w", 2: "q r",
                   3: "totally unrelated words here", 4: ""}


def test_dup_span_strip_consistent_with_stats():
    """Invariant: tokens removed by strip == coverage counted by stats,
    on a seeded corpus with planted repeats."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ethereum_etl_ray.pipelines.dedup import dup_span_stats, dup_span_strip

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    boiler = "copy right footer text"
    texts = []
    for i in range(30):
        words = list(rng.choice(vocab, rng.integers(6, 14)))
        if i % 3 == 0:
            words.insert(int(rng.integers(0, len(words))), boiler)
        texts.append(" ".join(" ".join(words).split(" ")))
    docs = pa.table({"doc_id": pa.array(range(30), pa.int64()),
                     "text": pa.array(texts)})
    ds = ray.data.from_arrow(docs)
    stats = {r["doc_id"]: r["n_dup_tokens"]
             for r in dup_span_stats(ds, ngram=4, min_count=2).take_all()}
    stripped = {r["doc_id"]: r["text"]
                for r in dup_span_strip(ds, ngram=4, min_count=2).take_all()}
    assert len(stripped) == 30
    for i, orig in enumerate(texts):
        n_orig = len(orig.split(" "))
        n_new = len(stripped[i].split(" ")) if stripped[i] else 0
        assert n_orig - n_new == stats.get(i, 0), (i, orig, stripped[i])
