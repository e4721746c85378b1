"""Corpus-trained bigram language-model quality scoring (CCNet-style).

A web-scale curation pipeline scores each page by how "language-like" it is
under a model trained on the corpus (CCNet scores against a KenLM; the same
two-phase shape): TRAIN — count unigrams and bigrams corpus-wide; SCORE —
average each document's bigram conditional probabilities. Documents far
below the corpus norm are boilerplate / gibberish candidates.

Integer-exact parity contract (same discipline as functions/textstats.py):
no logs, no floats — the score is the MEAN BIGRAM CONDITIONAL in ppm:

    cond_ppm(w1, w2) = C2(w1, w2) * 1e6 // C1(w1)
    lm_score_ppm(doc) = sum(cond_ppm over the doc's bigrams) // n_bigrams

so the DuckDB oracle reproduces it bit-for-bit. Docs with < 2 tokens score
(0, 0).

Scale shape:
  train   one pass, per-batch value_counts combiners → two groupby sums;
          the shuffle moves one row per (batch, distinct gram), never raw
          tokens. Counts tables are vocabulary-sized, not corpus-sized.
  score   broadcast route (default below ``broadcast_threshold`` distinct
          bigrams): counts ship once via ray.put, each batch scores itself
          with two hash-based Arrow ``index_in`` lookups — zero shuffle. Above the gate: distributed route — explode bigram rows,
          two cogroup joins against the count Datasets, one groupby(doc).
          Same exact-below / distributed-above pattern as the engine's
          other gates (README "Scale design notes"); both routes are
          equivalence-tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

SEP = "\x00"  # joins (w1, w2) into one key; NUL never appears in tokens


def _ca(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _doc_grams(batch: pa.Table, text_col: str, id_col: str):
    """Vectorized per-batch token stream → (unigrams, bigram keys, bigram
    first-words, bigram doc index). One split; bigrams via shifted views of
    the flat token array with document-boundary masking."""
    text = _ca(batch.column(text_col))
    toks = pc.split_pattern(text, pattern=" ")
    flat = _ca(pc.list_flatten(toks))
    parent = _ca(pc.list_parent_indices(toks)).to_numpy()
    if len(flat) == 0:
        empty = pa.array([], pa.string())
        return flat, empty, empty, parent
    # bigram = token i joined with token i+1 where both share a parent doc
    w1 = flat.slice(0, len(flat) - 1)
    w2 = flat.slice(1)
    same_mask = pa.array(parent[:-1] == parent[1:])
    keys = _ca(pc.binary_join_element_wise(w1, w2, SEP)).filter(same_mask)
    w1f = _ca(w1).filter(same_mask)
    return flat, keys, w1f, parent[:-1][parent[:-1] == parent[1:]]


def train_bigram_counts(ds: ray.data.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id"
                        ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """One corpus pass → (unigram counts ``(w, c1)``, bigram counts
    ``(w1w2 key, c2)``) Datasets, combiner-reduced per batch before the
    groupby so the shuffle is vocabulary-bounded."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        flat, keys, _, _ = _doc_grams(t, text_col, id_col)
        out_k, out_c, kind = [], [], []
        for col, tag in ((flat, 0), (keys, 1)):
            if len(col) == 0:
                continue
            vc = pc.value_counts(col)
            out_k.append(vc.field("values"))
            out_c.append(pc.cast(vc.field("counts"), pa.int64()))
            kind.append(np.full(len(vc), tag, dtype=np.int8))
        if not out_k:
            return pa.table({"gram": pa.array([], pa.string()),
                             "kind": pa.array([], pa.int8()),
                             "c": pa.array([], pa.int64())})
        return pa.table({
            "gram": pa.concat_arrays([pc.cast(k, pa.string()) for k in out_k]),
            "kind": pa.array(np.concatenate(kind), pa.int8()),
            "c": pa.concat_arrays(out_c),
        })

    counts = (ds.map_batches(partials, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["kind", "gram"]).aggregate(Sum("c", alias_name="c"))
              # vocabulary-sized by construction — safe to pin, and it stops
              # every downstream consumer (count probe, two filter views)
              # from re-executing the full corpus pass through lineage
              .materialize())
    uni = counts.filter(expr="kind == 0").select_columns(["gram", "c"])
    bi = counts.filter(expr="kind == 1").select_columns(["gram", "c"])
    return uni, bi


def _score_table(ids_np, doc_ids, cond_ppm, n_rows_ids) -> pa.Table:
    """Aggregate per-doc (sum // count) from the bigram-level scores."""
    n_big = np.bincount(doc_ids, minlength=n_rows_ids).astype(np.int64)
    ssum = np.zeros(n_rows_ids, dtype=np.int64)
    np.add.at(ssum, doc_ids, cond_ppm)
    score = np.where(n_big > 0, ssum // np.maximum(n_big, 1), 0)
    return pa.table({"doc_id": pa.array(ids_np, pa.int64()),
                     "n_bigrams": pa.array(n_big, pa.int64()),
                     "lm_score_ppm": pa.array(score, pa.int64())})


def lm_score(ds: ray.data.Dataset, *, text_col: str = "text",
             id_col: str = "doc_id", broadcast_threshold: int = 2_000_000,
             ) -> ray.data.Dataset:
    """(doc_id, n_bigrams, lm_score_ppm) for every document.

    Trains on ``ds`` itself, then scores. Routes by distinct-bigram count:
    broadcast lookup below ``broadcast_threshold`` (counts ship once via
    ``ray.put``, ~48 B/bigram — the default gate is ~100 MB), two cogroup
    joins above it.
    """
    uni_ds, bi_ds = train_bigram_counts(ds, text_col=text_col, id_col=id_col)
    # probe the gate on a cheap count of the (small) bigram table; above the
    # gate the count Datasets are reused as join sides WITHOUT collecting
    n_bi = bi_ds.count()

    if n_bi <= broadcast_threshold:
        def pack(df: pd.DataFrame):
            return (pa.array(df.gram, pa.string()),
                    df.c.to_numpy().astype(np.int64))

        # cheap: the upstream counts Dataset is materialized, so these
        # collect vocabulary-sized tables without re-running the train pass
        ref = ray.put((pack(uni_ds.to_pandas()), pack(bi_ds.to_pandas())))

        def score(t: pa.Table) -> pa.Table:
            (uk, uc), (bk, bc) = ray.get(ref)
            ids_np = _ca(t.column(id_col)).to_numpy()
            _, keys, w1f, bdoc = _doc_grams(t, text_col, id_col)
            if len(keys) == 0:
                return _score_table(ids_np, np.array([], dtype=np.int64),
                                    np.array([], dtype=np.int64), len(ids_np))
            # hash-based Arrow lookups — no Python objects in the hot path
            c2 = bc[_ca(pc.index_in(keys, value_set=bk)).to_numpy()]
            c1 = uc[_ca(pc.index_in(w1f, value_set=uk)).to_numpy()]
            cond = c2 * 1_000_000 // c1
            return _score_table(ids_np, bdoc, cond, len(ids_np))

        return ds.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)

    # distributed route: bigram rows join the count Datasets, then one
    # groupby(doc) — for vocabularies too large to broadcast
    from ray.data.aggregate import Count, Sum

    from ethereum_etl_ray.stages.joins import cogroup_join

    def explode(t: pa.Table) -> pa.Table:
        ids_np = _ca(t.column(id_col)).to_numpy()
        _, keys, w1f, bdoc = _doc_grams(t, text_col, id_col)
        return pa.table({"doc_id": pa.array(ids_np[bdoc], pa.int64()),
                         "bkey": pc.cast(keys, pa.string()),
                         "w1key": pc.cast(w1f, pa.string())})

    grams = ds.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True)
    bi_r = bi_ds.rename_columns({"gram": "bkey_r", "c": "c2"})
    uni_r = uni_ds.rename_columns({"gram": "ukey_r", "c": "c1"})
    j1 = cogroup_join(grams, bi_r, left_on="bkey", right_on="bkey_r",
                      how="inner")
    j2 = cogroup_join(j1.select_columns(["doc_id", "w1key", "c2"]), uni_r,
                      left_on="w1key", right_on="ukey_r", how="inner")

    def cond(t: pa.Table) -> pa.Table:
        c2 = _ca(t.column("c2")).to_numpy().astype(np.int64)
        c1 = _ca(t.column("c1")).to_numpy().astype(np.int64)
        return pa.table({"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                         "cond_ppm": pa.array(c2 * 1_000_000 // c1,
                                              pa.int64())})

    per_doc = (j2.map_batches(cond, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("doc_id")
               .aggregate(Sum("cond_ppm", alias_name="ssum"),
                          Count(alias_name="n_bigrams")))

    def finish(t: pa.Table) -> pa.Table:
        ssum = _ca(t.column("ssum")).to_numpy().astype(np.int64)
        nb = _ca(t.column("n_bigrams")).to_numpy().astype(np.int64)
        return pa.table({"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                         "n_bigrams": pa.array(nb, pa.int64()),
                         "lm_score_ppm": pa.array(ssum // np.maximum(nb, 1),
                                                  pa.int64())})

    scored = per_doc.map_batches(finish, batch_format="pyarrow")
    # docs with < 2 tokens have no bigram rows: re-attach them with (0, 0)
    all_ids = ds.select_columns([id_col])
    from ethereum_etl_ray.stages.joins import semi_anti_filter  # noqa: F401

    def zero_rows(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(t.column(id_col), pa.int64()),
                         "n_bigrams": pa.nulls(t.num_rows, pa.int64()),
                         "lm_score_ppm": pa.nulls(t.num_rows, pa.int64())})

    left = cogroup_join(all_ids.map_batches(zero_rows, batch_format="pyarrow",
                                            zero_copy_batch=True)
                        .rename_columns({"n_bigrams": "nb0",
                                         "lm_score_ppm": "s0"}),
                        scored.rename_columns({"doc_id": "doc_id_r"}),
                        left_on="doc_id", right_on="doc_id_r", how="left")

    def coalesce(t: pa.Table) -> pa.Table:
        nb = pc.fill_null(pc.cast(t.column("n_bigrams"), pa.int64()), 0)
        sc = pc.fill_null(pc.cast(t.column("lm_score_ppm"), pa.int64()), 0)
        return pa.table({"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                         "n_bigrams": nb, "lm_score_ppm": sc})

    return left.map_batches(coalesce, batch_format="pyarrow",
                            zero_copy_batch=True)
