"""Benchmark decontamination: flag corpus documents that share any token
n-gram with an evaluation benchmark (the GPT-3/PaLM-style train/test overlap
check — a training corpus must not contain eval data verbatim).

Shape (Ray-Data-first):

  benchmark side   map_batches gram explode → groupby(gram).count() distinct
                   → the DISTINCT gram strings come back to the driver and
                   are broadcast once with ray.put. Eval benchmarks are small
                   by definition (MBs of text, bounded distinct grams); the
                   shuffle-dedup keeps the driver collection at distinct-only.
  corpus side      actor-pool map_batches: grams per batch via one split +
                   one fancy-gather + one binary_join (no per-row Python),
                   membership via ONE vectorized ``pc.is_in`` against the
                   broadcast gram array, per-doc hit counts via
                   ``np.add.reduceat`` — zero shuffle over the corpus.

A doc with fewer than ``n`` tokens has no n-grams and is trivially clean.
Duplicate grams inside one corpus doc count once per occurrence (``n_hits``
is instance-level); the benchmark side is distinct-deduped.

The reference has no decontamination analogue (SURVEY §2.8 lists near-dedup
as absent); the nearest semantic is the distinct-as-dedup A1–A3
(src/tasks/extract/account.py:7-27) applied across two corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ethereum_etl_ray.util import pool_size


def gram_batch(batch: pa.Table, n: int = 5, text_col: str = "text",
               id_col: str = "doc_id", with_row: bool = False) -> pa.Table:
    """Explode each document into its whitespace-token n-grams (stride 1,
    full windows only: ``max(len-n+1, 0)`` grams per doc). Vectorized: one
    split, one gather over the flat token stream, one ``binary_join``.
    ``with_row=True`` adds ``__row`` (the gram's row index within this
    batch) so callers can reduce per-doc without an id lookup."""
    text = batch.column(text_col).combine_chunks()
    ids = batch.column(id_col)
    ids_np = (ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
              else ids).to_numpy()
    toks = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    lens = np.asarray(pc.list_value_length(toks).fill_null(0)
                      .to_numpy(zero_copy_only=False), dtype=np.int64)
    n_grams = np.maximum(lens - n + 1, 0)
    total = int(n_grams.sum())
    if total == 0:
        cols = {id_col: pa.array([], pa.int64()),
                "gram": pa.array([], pa.string())}
        if with_row:
            cols["__row"] = pa.array([], pa.int64())
        return pa.table(cols)
    doc_idx = np.repeat(np.arange(len(lens)), n_grams)
    before = np.concatenate(([0], np.cumsum(n_grams)[:-1]))
    start = np.arange(total) - np.repeat(before, n_grams)  # gram pos in doc
    tok_before = np.concatenate(([0], np.cumsum(lens)[:-1]))
    base = tok_before[doc_idx] + start                      # flat start index
    gather = (base[:, None] + np.arange(n)[None, :]).ravel()
    taken = flat.take(pa.array(gather, pa.int64()))
    windows = pa.FixedSizeListArray.from_arrays(pc.cast(taken, pa.string()), n)
    cols = {
        id_col: pa.array(ids_np[doc_idx], pa.int64()),
        "gram": pc.binary_join(pc.cast(windows, pa.list_(pa.string())), " "),
    }
    if with_row:
        cols["__row"] = pa.array(doc_idx, pa.int64())
    return pa.table(cols)


def benchmark_gram_set(bench_ds: ray.data.Dataset, n: int = 5,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Array:
    """Distinct n-gram strings of the benchmark corpus. Shuffle-deduped so
    the driver receives distinct grams only (bounded: eval sets are small)."""
    grams = (bench_ds
             .map_batches(lambda b: gram_batch(b, n, text_col, id_col),
                          batch_format="pyarrow", zero_copy_batch=True)
             .groupby("gram").count())
    distinct = grams.to_pandas()["gram"]
    return pa.array(distinct, pa.string())


class _GramHits:
    """Actor-pool stage: benchmark gram set fetched once per actor."""

    def __init__(self, grams_ref, n: int, text_col: str, id_col: str):
        self.grams = ray.get(grams_ref)
        self.n = n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        ids_np = (ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
                  else ids).to_numpy()
        grams = gram_batch(batch, self.n, self.text_col, self.id_col,
                           with_row=True)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if grams.num_rows:
            isin = pc.is_in(grams.column("gram"), value_set=self.grams)
            isin_np = isin.to_numpy(zero_copy_only=False).astype(np.int64)
            row = grams.column("__row").to_numpy()
            np.add.at(hits, row, isin_np)
        return pa.table({
            self.id_col: pa.array(ids_np, pa.int64()),
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0, pa.bool_()),
        })


def decontaminate(corpus_ds: ray.data.Dataset, bench_ds: ray.data.Dataset,
                  *, n: int = 5, text_col: str = "text",
                  id_col: str = "doc_id",
                  concurrency: int | None = None) -> ray.data.Dataset:
    """Per-corpus-doc benchmark-overlap audit: ``(doc_id, n_hits,
    contaminated)``. Filter ``contaminated == False`` downstream to apply
    the drop (kept separate so pipelines can audit before deleting)."""
    grams = benchmark_gram_set(bench_ds, n=n, text_col=text_col, id_col=id_col)
    ref = ray.put(grams)
    return corpus_ds.map_batches(
        _GramHits, fn_constructor_args=(ref, n, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=pool_size(concurrency))
