"""Text-analysis operator tests."""

import numpy as np
import pyarrow as pa

from ethereum_etl_ray.functions.textstats import (
    lang_scores_batch,
    md5_fingerprint_batch,
    quality_batch,
    rolling_fingerprint_batch,
    token_count,
)


def _tbl(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


def test_token_count_matches_python_split():
    texts = ["a b c", "single", "the quick brown fox", "x y"]
    out = token_count(pa.array(texts))
    assert out.to_pylist() == [len(t.split(" ")) for t in texts]


def test_lang_scores_and_argmax_tiebreak():
    t = _tbl(["the cat sat of the mat a lot", "le chat et le chien et les oiseaux",
              "nothing matching here"])
    out = lang_scores_batch(t)
    rows = out.to_pylist()
    assert rows[0]["predicted_lang"] == "en" and rows[0]["score_en"] >= 3
    assert rows[1]["predicted_lang"] == "fr"
    # all-zero scores → alphabetically-first language wins deterministically
    assert rows[2]["predicted_lang"] == "de"


def test_quality_integer_formulas():
    text = "the aa bbb cccc"
    t = _tbl([text])
    row = quality_batch(t).to_pylist()[0]
    n_tok = 4
    n_chars = len(text)
    stop_hits = 1  # only "the"
    assert row["n_tokens"] == n_tok
    assert row["n_chars_txt"] == n_chars
    assert row["stop_ppm"] == (stop_hits * 1_000_000) // n_tok
    assert row["mtl_c"] == ((n_chars - (n_tok - 1)) * 100) // n_tok
    assert row["quality_ppm"] == min(n_tok, 100) * 10_000 - row["stop_ppm"] // 2 \
        + row["mtl_c"] * 10


def test_md5_fingerprint_matches_hashlib():
    import hashlib

    texts = ["abc", "def"]
    out = md5_fingerprint_batch(_tbl(texts))
    assert out.column("fingerprint").to_pylist() == \
        [hashlib.md5(t.encode()).hexdigest() for t in texts]


def test_rolling_fingerprint_deterministic_and_discriminative():
    texts = ["one two three four five six", "one two three four five six",
             "totally different words here now ok"]
    out = rolling_fingerprint_batch(_tbl(texts), window=3)
    fps = out.column("winnow_fp").to_pylist()
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_compression_ratio_separates_repetition_from_entropy(ray_session):
    import zlib

    from ethereum_etl_ray.functions.textstats import compression_stats_batch

    rng = np.random.default_rng(6)
    noise = "".join(chr(rng.integers(33, 127)) for _ in range(2000))
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["spam " * 400, noise, ""], pa.string()),
    })
    out = compression_stats_batch(docs).to_pandas().set_index("doc_id")
    assert out.loc[1].ratio_ppm < 50_000       # repetitive: compresses hard
    assert out.loc[2].ratio_ppm > 500_000      # high entropy: barely
    assert out.loc[3].ratio_ppm == 1_000_000   # empty: defined as 1.0
    # exact parity with a direct zlib call
    assert out.loc[1].zlib_len == len(zlib.compress(b"spam " * 400, 6))


def test_compression_ratio_distributed(ray_session, sf_dir):
    import ray.data

    from ethereum_etl_ray.functions.textstats import compression_stats_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = ds.map_batches(compression_stats_batch, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    assert len(out) == ds.count()
    # tiny docs can exceed 1.0 (zlib header overhead); prose sits well below
    assert (out.ratio_ppm > 0).all()
    assert out.ratio_ppm.median() < 1_000_000
