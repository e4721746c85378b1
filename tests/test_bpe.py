"""BPE merge training: the distributed merge sequence must EXACTLY equal the
single-process reference (deterministic (count desc, pair asc) tie-break
over exact integer counts makes this partitioning-independent)."""

import numpy as np
import pandas as pd
import ray.data

from ethereum_etl_ray.pipelines.bpe import (
    merge_word,
    reference_bpe,
    train_bpe,
    word_frequencies,
)

TEXTS = [
    "the lower the newer the lowest",
    "low low lower newest newest",
    "wider wide widest new newer",
    "the low new wide",
    "",  # empty doc must be a no-op
    "LOW Low lOw",  # case folding
] * 3


def _ds(texts, parts=5):
    return ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(parts)


def test_merge_word_non_overlapping_left_to_right():
    assert merge_word(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert merge_word(["x", "y", "x", "y"], "x", "y") == ["xy", "xy"]
    assert merge_word(["a", "b"], "b", "a") == ["a", "b"]


def test_word_frequencies_match_python():
    import re

    wf = word_frequencies(_ds(TEXTS)).to_pandas()
    truth: dict[str, int] = {}
    for t in TEXTS:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            truth[w] = truth.get(w, 0) + 1
    got = dict(zip(wf.word, wf.freq))
    assert got == truth


def test_merge_sequence_matches_reference_exactly():
    got = train_bpe(_ds(TEXTS), num_merges=12)
    want = reference_bpe(TEXTS, num_merges=12)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    assert len(got) > 5  # the corpus actually yields a deep merge sequence


def test_partitioning_invariance():
    a = train_bpe(_ds(TEXTS, parts=1), num_merges=8)
    b = train_bpe(_ds(TEXTS, parts=7), num_merges=8)
    pd.testing.assert_frame_equal(a, b)


def test_min_count_stops_early():
    out = train_bpe(_ds(["zq xv", "pm kj"]), num_merges=50, min_count=2)
    want = reference_bpe(["zq xv", "pm kj"], num_merges=50, min_count=2)
    pd.testing.assert_frame_equal(out.reset_index(drop=True), want)
    assert len(out) < 50
