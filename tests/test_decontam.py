"""Decontamination tests: planted benchmark overlap, gram explode unit."""

import numpy as np
import pyarrow as pa
import ray.data

from ethereum_etl_ray.pipelines.decontam import decontaminate, gram_batch


def _docs(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def test_gram_batch_windows():
    t = _docs([(1, "a b c d e f"), (2, "x y"), (3, "")])
    g = gram_batch(t, n=5, with_row=True)
    assert g.column("gram").to_pylist() == ["a b c d e", "b c d e f"]
    assert g.column("doc_id").to_pylist() == [1, 1]
    assert g.column("__row").to_pylist() == [0, 0]


def test_planted_contamination(ray_session):
    bench = ray.data.from_arrow(_docs([
        (1000, "the quick brown fox jumps over the lazy dog"),
    ]))
    corpus = ray.data.from_arrow(_docs([
        (1, "clean text with no overlap at all whatsoever here"),
        (2, "prefix words then the quick brown fox jumps over the lazy dog suffix"),
        (3, "too short"),
        # the same benchmark 5-gram twice -> instance-level n_hits == 2
        (4, "the quick brown fox jumps and the quick brown fox jumps"),
    ])).repartition(2)
    out = decontaminate(corpus, bench, n=5).to_pandas().set_index("doc_id")
    assert not out.loc[1].contaminated
    assert out.loc[2].contaminated and out.loc[2].n_hits >= 5
    assert not out.loc[3].contaminated and out.loc[3].n_hits == 0
    assert out.loc[4].contaminated and out.loc[4].n_hits == 2


def test_transitive_sentence_detection(ray_session):
    """Any 5-token verbatim span triggers, not only full-doc copies."""
    bench = ray.data.from_arrow(_docs([(9, "alpha beta gamma delta epsilon zeta")]))
    corpus = ray.data.from_arrow(_docs([
        (1, "x y alpha beta gamma delta epsilon q r"),   # 5-token span shared
        (2, "alpha beta gamma delta other epsilon"),      # only 4 in a row
    ]))
    out = decontaminate(corpus, bench, n=5).to_pandas().set_index("doc_id")
    assert out.loc[1].contaminated
    assert not out.loc[2].contaminated


def test_clean_corpus_all_zero(ray_session):
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(50)]
    corpus = ray.data.from_arrow(_docs([
        (i, " ".join(rng.choice(words, size=12))) for i in range(20)
    ]))
    bench = ray.data.from_arrow(_docs([(99, "p q r s t u v")]))
    out = decontaminate(corpus, bench, n=5).to_pandas()
    assert len(out) == 20 and not out.contaminated.any()
