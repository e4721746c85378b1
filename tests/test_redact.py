"""PII-redaction, normalization, repetition-stats and sequence-packing tests.

Each operator's pure-Python oracle is independent of the Arrow kernels it
checks (re module vs RE2 kernels, dict counting vs np.unique, running sum vs
the distributed prefix sum)."""

import re

import numpy as np
import pyarrow as pa
import ray.data

from ethereum_etl_ray.functions.redact import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    normalize_text_batch,
    plant_pii_batch,
    redact_pii_batch,
)
from ethereum_etl_ray.functions.textstats import rep_stats_batch


def _docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


def test_redact_masks_all_planted_pii():
    t = plant_pii_batch(_docs(["hello world", "x", "a b c"]))
    out = redact_pii_batch(t)
    for row in out.to_pylist():
        assert row["n_emails"] == 1 and row["n_ips"] == 1 and row["n_phones"] == 1
        assert "<EMAIL>" in row["clean"] and "<IP>" in row["clean"] \
            and "<PHONE>" in row["clean"]
        assert "@" not in row["clean"]


def test_redact_matches_python_re_oracle():
    texts = [
        "mail me at jo.doe+spam@sub.example.org today",
        "servers 192.168.0.1 and 10.0.0.255 are up",
        "call +44-20-7946-0958 or +1-555-0100 now",
        "no pii here at all",
        "edge: a@b.co 1.2.3.4 +12345678",
    ]
    out = redact_pii_batch(_docs(texts), text_col="text")
    for row, s in zip(out.to_pylist(), texts):
        expect = re.sub(EMAIL_RE, "<EMAIL>", s)
        expect = re.sub(IPV4_RE, "<IP>", expect)
        expect = re.sub(PHONE_RE, "<PHONE>", expect)
        assert row["clean"] == expect
        assert row["n_emails"] == len(re.findall(EMAIL_RE, s))
        assert row["n_ips"] == len(re.findall(IPV4_RE, s))
        assert row["n_phones"] == len(re.findall(PHONE_RE, s))


def test_normalize_collapses_case_and_whitespace():
    t = pa.table({"s": ["  Hello\t\tWORLD \n x ", "already clean", ""]})
    out = normalize_text_batch(t, "s").column("norm").to_pylist()
    assert out == ["hello world x", "already clean", ""]


def test_rep_stats_python_oracle():
    texts = ["a a a a", "a b c d", "x x y", "solo", "a b a b a"]
    out = rep_stats_batch(_docs(texts))
    for row, s in zip(out.to_pylist(), texts):
        toks = s.split(" ")
        counts = {}
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
        assert row["n_tokens"] == len(toks)
        assert row["n_distinct"] == len(counts)
        assert row["dup_ppm"] == (len(toks) - len(counts)) * 1_000_000 // len(toks)
        assert row["top_tok_ppm"] == max(counts.values()) * 1_000_000 // len(toks)


def test_pack_sequences_matches_running_sum(ray_session):
    from ethereum_etl_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(7)
    n, budget = 1000, 500
    weights = rng.integers(1, 120, size=n)
    # shuffled input order: the prefix sum must follow doc_id, not block order
    perm = rng.permutation(n)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(perm, pa.int64()),
        "n_tokens": pa.array(weights[perm], pa.int64()),
    })).repartition(7)
    out = (pack_sequences(ds, key="doc_id", weight="n_tokens", budget=budget,
                          n_buckets=16)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    cum = np.concatenate(([0], np.cumsum(weights)[:-1]))
    assert (out.seq_id.to_numpy() == cum // budget).all()
    assert (out.n_tokens.to_numpy() == weights).all()
    # sequences are contiguous and non-decreasing in doc order
    assert (np.diff(out.seq_id.to_numpy()) >= 0).all()


def test_pack_sequences_sparse_keys(ray_session):
    """Non-dense keys (gaps) still pack correctly — buckets may be empty."""
    from ethereum_etl_ray.stages.packing import pack_sequences

    keys = np.array([3, 900, 17, 404, 5000, 42], dtype=np.int64)
    w = np.array([10, 20, 30, 40, 50, 60], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys, "w": w})).repartition(3)
    out = (pack_sequences(ds, key="k", weight="w", budget=64, n_buckets=8)
           .to_pandas().sort_values("k").reset_index(drop=True))
    order = np.argsort(keys)
    cum = np.concatenate(([0], np.cumsum(w[order])[:-1]))
    assert (out.seq_id.to_numpy() == cum // 64).all()


def test_chunk_docs_python_oracle():
    from ethereum_etl_ray.functions.textstats import chunk_docs_batch

    texts = ["", "a", "a b c", " ".join(f"t{i}" for i in range(25))]
    t = _docs(texts)
    out = chunk_docs_batch(t, window=10, stride=7).to_pylist()
    expected = []
    for doc_id, s in enumerate(texts):
        toks = s.split(" ")
        k = 0
        while k * 7 < len(toks) or k == 0:
            chunk = toks[k * 7:k * 7 + 10]
            expected.append({"doc_id": doc_id, "chunk_id": k,
                             "chunk_text": " ".join(chunk),
                             "n_chunk_tokens": len(chunk)})
            k += 1
    assert out == expected


def test_chunk_docs_overlap_and_coverage():
    from ethereum_etl_ray.functions.textstats import chunk_docs_batch

    toks = [f"w{i}" for i in range(100)]
    t = _docs([" ".join(toks)])
    rows = chunk_docs_batch(t, window=64, stride=48).to_pylist()
    # consecutive chunks overlap by window - stride tokens
    c0, c1 = rows[0]["chunk_text"].split(" "), rows[1]["chunk_text"].split(" ")
    assert c0[48:] == c1[:16]
    # every chunk is exactly its strided slice, and the union covers all tokens
    seen = set()
    for r in rows:
        s = r["chunk_id"] * 48
        assert r["chunk_text"].split(" ") == toks[s:s + 64]
        seen.update(range(s, min(s + 64, 100)))
    assert seen == set(range(100))


def test_chunk_docs_rejects_bad_stride():
    import pytest as _pytest

    from ethereum_etl_ray.functions.textstats import chunk_docs_batch

    with _pytest.raises(ValueError):
        chunk_docs_batch(_docs(["a b"]), window=4, stride=0)
    with _pytest.raises(ValueError):
        chunk_docs_batch(_docs(["a b"]), window=4, stride=5)
