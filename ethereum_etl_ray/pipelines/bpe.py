"""Distributed BPE merge training (Sennrich-style subword learning).

The tokenizer-training member of the engine's LLM-data family: learn the
top-``num_merges`` byte-pair merges over a corpus. One corpus pass builds
the distinct word-frequency table (the combiner pattern — per-batch word
counts, one small hash aggregate); every later iteration runs over the WORD
table only (bounded by vocabulary, not corpus size — the classic reason
BPE training scales: 100 TB of text collapses to ~10^7 distinct words).

Per iteration: ``map_batches`` emits per-batch (pair, weighted-count)
partials → ``groupby(pair).sum`` (pair cardinality is vocab-bounded) →
the single best pair by (count desc, pair asc) — exact integer counts, so
the merge sequence is DETERMINISTIC under any partitioning; the pytest
oracle replays a reference single-process BPE and requires the identical
sequence. The symbol rewrite is a Python loop over distinct words (the
standard algorithm; per-word lists resist vectorization) — bounded by
vocab per batch, never by corpus rows.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

_WORD_RE = re.compile(r"[a-z0-9]+")
_END = "</w>"


def _word_count_batch(text_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for txt in batch.column(text_col).to_pylist():
            if not txt:
                continue
            for w in _WORD_RE.findall(txt.lower()):
                counts[w] = counts.get(w, 0) + 1
        return pa.table({"word": pa.array(list(counts), pa.string()),
                         "freq": pa.array(list(counts.values()), pa.int64())})
    return fn


def word_frequencies(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Distinct-word frequency table: per-batch combiner + one hash agg."""
    partials = ds.map_batches(_word_count_batch(text_col),
                              batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("word").aggregate(Sum("freq", alias_name="freq"))


def _to_symbols(t: pa.Table) -> pa.Table:
    syms = [list(w) + [_END] for w in t.column("word").to_pylist()]
    return pa.table({"syms": pa.array(syms, pa.list_(pa.string())),
                     "freq": t.column("freq")})


def _pair_partials(t: pa.Table) -> pa.Table:
    counts: dict[tuple[str, str], int] = {}
    freqs = t.column("freq").to_pylist()
    for syms, f in zip(t.column("syms").to_pylist(), freqs):
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
    keys = list(counts)
    return pa.table({"a": pa.array([k[0] for k in keys], pa.string()),
                     "b": pa.array([k[1] for k in keys], pa.string()),
                     "n": pa.array(list(counts.values()), pa.int64())})


def merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping replacement of (a, b) → a+b."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _apply_merge(a: str, b: str):
    def fn(t: pa.Table) -> pa.Table:
        syms = [merge_word(s, a, b) if a in s else s
                for s in t.column("syms").to_pylist()]
        return pa.table({"syms": pa.array(syms, pa.list_(pa.string())),
                         "freq": t.column("freq")})
    return fn


def train_bpe(ds: ray.data.Dataset, *, text_col: str = "text",
              num_merges: int = 20, min_count: int = 2) -> pd.DataFrame:
    """Learn ``num_merges`` merges; returns (rank, tok_a, tok_b, n).

    Stops early when no pair reaches ``min_count``. The per-iteration
    argmax collects the AGGREGATED pair-count table — bounded by the
    symbol-pair vocabulary (≈10^5–10^6 rows at web scale, megabytes), never
    by the corpus — and reduces it with one vectorized lexsort on the
    driver (same O(vocab) collection bound as ``vocab_topk``)."""
    state = (word_frequencies(ds, text_col)
             .map_batches(_to_symbols, batch_format="pyarrow",
                          zero_copy_batch=True)
             .materialize())
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        agg = (state.map_batches(_pair_partials, batch_format="pyarrow",
                                 zero_copy_batch=True)
               .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n")))
        pairs = agg.to_pandas()
        if pairs.empty:
            break
        order = np.lexsort((pairs.b.to_numpy(), pairs.a.to_numpy(),
                            -pairs.n.to_numpy()))
        top = pairs.iloc[order[0]]
        if int(top.n) < min_count:
            break
        a, b, n = str(top.a), str(top.b), int(top.n)
        merges.append((rank, a, b, n))
        state = state.map_batches(_apply_merge(a, b), batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    return pd.DataFrame(merges, columns=["rank", "tok_a", "tok_b", "n"])


def reference_bpe(texts: list[str], num_merges: int = 20,
                  min_count: int = 2) -> pd.DataFrame:
    """Single-process oracle: identical semantics, dict-based."""
    wf: dict[str, int] = {}
    for txt in texts:
        if not txt:
            continue
        for w in _WORD_RE.findall(txt.lower()):
            wf[w] = wf.get(w, 0) + 1
    words = {w: list(w) + [_END] for w in wf}
    merges = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = wf[w]
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), n = best
        if n < min_count:
            break
        merges.append((rank, a, b, n))
        for w in words:
            if a in words[w]:
                words[w] = merge_word(words[w], a, b)
    return pd.DataFrame(merges, columns=["rank", "tok_a", "tok_b", "n"])
