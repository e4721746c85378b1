"""Inverted index: token → (doc_id, tf) postings, persisted bucket-partitioned.

The retrieval-side primitive of a text lake (BM25 candidates, keyword
filters, contamination spot-checks). Build is one pass: per-batch
(token, doc_id, tf) explode — exact, since a document is one row and never
splits across batches — then hive-partitioned Parquet by ``tok_bucket =
hash64(token) % buckets``. A term lookup reads ONLY its terms' bucket
directories (file-level prune, the same layout discipline as the persisted
IVF index in stages/ann.py:185) and then row-filters with one vectorized
``is_in``.

Scale: the explode is one split + one C-speed groupby per batch, the build
shuffles nothing (write-partitioning fans out at the sink); a lookup touches
``#distinct-term-buckets / buckets`` of the index. Raise ``buckets`` so one
bucket directory stays at a few hundred MB at corpus scale.

Reference analogue: none (SURVEY §2.8 — the reference has no search-side
structures); the keyed-lake layout mirrors its PRIMARY-KEY identity (§1.4).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ethereum_etl_ray.functions.hashing import partition_ids

_META = "invindex_meta.json"


def doc_term_batch(batch: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """Explode documents into ``(token, doc_id, tf)`` term-frequency rows.
    One whitespace split + one C-speed (token, doc) groupby per batch."""
    text = batch.column(text_col).combine_chunks()
    ids = batch.column(id_col)
    ids_np = (ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
              else ids).to_numpy()
    toks = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).fill_null(0).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(ids_np)), lens)
    df = pd.DataFrame({"token": flat.to_pandas(), "doc_id": ids_np[doc_idx]})
    df = df[df.token != ""]  # empty docs split to [""] — not a term
    g = df.groupby(["token", "doc_id"], sort=False).size().reset_index(name="tf")
    return pa.table({"token": pa.array(g.token, pa.string()),
                     "doc_id": pa.array(g.doc_id, pa.int64()),
                     "tf": pa.array(g.tf, pa.int64())})


def build_inverted_index(ds: ray.data.Dataset, index_dir: str, *,
                         buckets: int = 64, text_col: str = "text",
                         id_col: str = "doc_id") -> None:
    """One pass: explode to postings, stamp ``tok_bucket``, write
    hive-partitioned Parquet (one directory per bucket)."""

    def stamp(t: pa.Table) -> pa.Table:
        b = partition_ids(t.column("token"), buckets)
        return t.append_column("tok_bucket", pa.array(b, pa.int32()))

    postings = (ds.select_columns([id_col, text_col])
                .map_batches(lambda b: doc_term_batch(b, text_col, id_col),
                             batch_format="pyarrow", zero_copy_batch=True)
                .map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True))
    os.makedirs(index_dir, exist_ok=True)
    postings.write_parquet(index_dir, partition_cols=["tok_bucket"])
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump({"buckets": buckets}, f)


def lookup_postings(index_dir: str, terms: list[str]) -> ray.data.Dataset:
    """Postings for ``terms``: reads only the terms' bucket directories,
    then one vectorized ``is_in`` row filter."""
    meta = json.load(open(os.path.join(index_dir, _META)))
    want = sorted(set(partition_ids(list(terms), meta["buckets"]).tolist()))
    dirs = [os.path.join(index_dir, f"tok_bucket={b}") for b in want]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    term_arr = pa.array(sorted(set(terms)), pa.string())
    if not files:
        return ray.data.from_arrow(pa.table({
            "token": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64())}))
    return (ray.data.read_parquet(files, columns=["token", "doc_id", "tf"])
            .map_batches(
                lambda t: t.filter(pc.is_in(t.column("token"),
                                            value_set=term_arr)),
                batch_format="pyarrow", zero_copy_batch=True))


def bm25_scores(ds: ray.data.Dataset, terms: list[str], *, k1: float = 1.2,
                b: float = 0.75, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-(term, doc) BM25 relevance contributions for a fixed term set.

    Rational-idf BM25 (no transcendentals, so both engines compute
    bit-identical doubles — the ln-idf variant would differ in the last
    ulp across libm builds):

        score = ((N - df + 0.5) / (df + 0.5))
                * (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    ``dl`` counts ALL whitespace-split tokens (SQL ``unnest`` parity —
    an empty text splits to one empty token). Two streaming passes:
    (1) per-batch (N, total_tokens) partials — O(1) rows per batch;
    (2) postings filtered to ``terms`` INSIDE the batch before anything
    moves, with ``dl`` attached from the same batch. ``df`` comes off the
    filtered postings (bounded by the term set's match count). Scores are
    emitted per (term, doc) — no float summation order to disagree on.
    """
    term_arr = pa.array(sorted(set(terms)), pa.string())

    def stats(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column(text_col).combine_chunks(),
                                pattern=" ")
        lens = pc.list_value_length(toks).fill_null(0)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64()),
                         "tt": pa.array([pc.sum(lens).as_py() or 0], pa.int64())})

    agg = (ds.select_columns([text_col])
           .map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
           .to_pandas())
    n_docs = int(agg["n"].sum())
    avgdl = int(agg["tt"].sum()) / n_docs  # exact int → double division

    def filtered_postings(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col).combine_chunks()
        ids = batch.column(id_col)
        ids_np = (ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
                  else ids).to_numpy()
        toks = pc.split_pattern(text, pattern=" ")
        dl = pc.list_value_length(toks).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        pt = doc_term_batch(batch, text_col, id_col)
        pt = pt.filter(pc.is_in(pt.column("token"), value_set=term_arr))
        # attach dl: postings reference docs of THIS batch
        pos = {int(d): i for i, d in enumerate(ids_np)}
        prow = np.fromiter((pos[int(d)] for d in pt.column("doc_id").to_numpy()),
                           dtype=np.int64, count=pt.num_rows)
        return pt.append_column("dl", pa.array(dl[prow], pa.int64()))

    posts = (ds.select_columns([id_col, text_col])
             .map_batches(filtered_postings, batch_format="pyarrow",
                          zero_copy_batch=True))

    # df per term: the filtered postings are bounded by the term set's
    # matches; the per-term counts are a tiny aggregate
    df_map = posts.groupby("token").count().to_pandas()
    if "token" not in df_map.columns:  # zero matches: groupby drops columns
        return ray.data.from_arrow(pa.table({
            "token": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    dfs = dict(zip(df_map["token"], df_map["count()"]))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        tf = batch.column("tf").to_numpy().astype(np.float64)
        dl = batch.column("dl").to_numpy().astype(np.float64)
        df = np.array([dfs[t] for t in batch.column("token").to_pylist()],
                      dtype=np.float64)
        # mirror the SQL expression's association order exactly
        idf = (n_docs - df + 0.5) / (df + 0.5)
        s = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
        return pa.table({"token": batch.column("token"),
                         "doc_id": batch.column("doc_id"),
                         "tf": pc.cast(batch.column("tf"), pa.int64()),
                         "score": pa.array(s, pa.float64())})

    return posts.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def phrase_count(ds: ray.data.Dataset, phrase: list[str], *,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-document count of exact token-phrase occurrences (overlapping
    included) — the positional companion to the bag-of-words postings: a
    curation pipeline counts benchmark phrases / boilerplate n-grams this
    way. Purely map-side (each doc is one row — no shuffle): the batch's
    tokens flatten to ONE array and the phrase match is a chain of shifted
    vector equalities, with a doc-boundary mask so matches never straddle
    documents. Emits docs with ≥1 match as (doc_id, n_matches).
    """
    if not phrase:
        raise ValueError("phrase must contain at least one token")
    L = len(phrase)

    def count(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "n_matches": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern(t.column(text_col).combine_chunks(),
                                pattern=" ")
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(flat) < L:
            return empty
        did = np.repeat(np.arange(t.num_rows), lens)
        m = flat[: len(flat) - L + 1] == phrase[0]
        for k in range(1, L):
            m &= flat[k: len(flat) - L + 1 + k] == phrase[k]
        # a match is valid only if its last token is still in the same doc
        m &= did[: len(flat) - L + 1] == did[L - 1:]
        counts = np.bincount(did[: len(flat) - L + 1][m],
                             minlength=t.num_rows)
        hit = counts > 0
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(ids[hit], pa.int64()),
                         "n_matches": pa.array(counts[hit], pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        count, batch_format="pyarrow", zero_copy_batch=True)


def sparse_cosine_pairs(
    ds: ray.data.Dataset,
    *,
    max_df: int | float = 32,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """All-pairs document cosine similarity over raw term-frequency vectors,
    restricted to discriminative terms (document frequency <= ``max_df``) —
    the sparse similarity self-join of near-dup / clustering pipelines.

    Classic df-pruned term-at-a-time plan, fully distributed:
      tf       exact per batch (a doc is one row, never split);
      df cap   one hash aggregate; terms above ``max_df`` dropped — this
               bounds every per-term pair expansion at max_df^2 partials
               (the skew guard: without it a stopword term is |corpus|^2);
      pairs    groupby(term).map_groups emits (doc_a, doc_b, tf_a*tf_b);
      dot      one hash aggregate over pairs; norms likewise per doc;
      sim      dot / (sqrt(n2_a) * sqrt(n2_b)) from exact integer sums —
               bit-identical to the SQL oracle (no float summation).
    Similarity here is over the PRUNED vectors (norms too) so the score is
    self-consistent and engine-independent."""
    import ray

    from ethereum_etl_ray.stages.joins import cogroup_join

    if isinstance(max_df, float):
        # fraction of the corpus (0 < f < 1): an absolute cap tuned for one
        # corpus size silently keeps nothing at 20x the docs (soak finding)
        if not 0 < max_df < 1:
            raise ValueError("fractional max_df must be in (0, 1)")
        max_df = max(1, int(max_df * ds.count()))

    tf = ds.map_batches(
        lambda b: doc_term_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True)

    kept = (tf.groupby("token").count()
            .map_batches(lambda t: pa.table(
                {"keep_tok": t.column("token").filter(
                    pc.less_equal(t.column("count()"),
                                  pa.scalar(max_df)))}),
                batch_format="pyarrow", zero_copy_batch=True))
    I64, STR = pa.int64(), pa.string()
    t2 = cogroup_join(
        tf, kept, left_on="token", right_on="keep_tok", how="inner",
        left_fields=[("token", STR), ("doc_id", I64), ("tf", I64)],
        right_fields=[("keep_tok", STR)],
    ).select_columns(["token", "doc_id", "tf"])
    # t2 fans out to THREE consumers (norms, pair expansion, df probe);
    # materialize once so Ray doesn't re-run the corpus scan + join per
    # consumer. Bounded: df-pruned postings are Σ df over kept terms —
    # a sliver of the corpus by construction (the cap did the work).
    t2 = t2.materialize()

    def norm_partial(t: pa.Table) -> pa.Table:
        c = t.column("tf").to_numpy(zero_copy_only=False)
        return (pa.table({"doc_id": t.column("doc_id"),
                          "n2": pa.array(c * c, pa.int64())})
                .group_by("doc_id").aggregate([("n2", "sum")])
                .rename_columns(["doc_id", "n2"]))

    norms = (t2.map_batches(norm_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("doc_id").sum("n2")
             .map_batches(lambda t: t.rename_columns(["doc_id", "n2"]),
                          batch_format="pyarrow", zero_copy_batch=True))

    def expand(g: pa.Table) -> pa.Table:
        d = np.sort(g.column("doc_id").to_numpy(zero_copy_only=False))
        order = np.argsort(g.column("doc_id").to_numpy(zero_copy_only=False),
                           kind="stable")
        c = g.column("tf").to_numpy(zero_copy_only=False)[order]
        n = len(d)
        if n < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(n, k=1)
        return pa.table({"doc_a": pa.array(d[ii], pa.int64()),
                         "doc_b": pa.array(d[jj], pa.int64()),
                         "x": pa.array(c[ii] * c[jj], pa.int64())})

    dot = (t2.groupby("token").map_groups(expand, batch_format="pyarrow")
           .groupby(["doc_a", "doc_b"]).sum("x")
           .map_batches(lambda t: t.rename_columns(["doc_a", "doc_b", "dot"]),
                        batch_format="pyarrow", zero_copy_batch=True))

    # norms are BOUNDED by the df cap (docs holding any kept term ≤
    # #kept_terms × max_df rows), so they broadcast — one ray.put, two Acero
    # joins inside a single stateless map task (an actor pool here can
    # starve the shuffle stages on small clusters, cf. semi_anti_filter)
    norms_tbl = pa.Table.from_pandas(norms.to_pandas(), preserve_index=False)
    norms_ref = ray.put(norms_tbl)

    def attach_norms(t: pa.Table) -> pa.Table:
        nrm = ray.get(norms_ref)
        na = nrm.rename_columns(["na_key", "na2"])
        nb = nrm.rename_columns(["nb_key", "nb2"])
        out = t.join(na, keys=["doc_a"], right_keys=["na_key"],
                     join_type="inner")
        return out.join(nb, keys=["doc_b"], right_keys=["nb_key"],
                        join_type="inner")

    joined = dot.map_batches(attach_norms, batch_format="pyarrow",
                             zero_copy_batch=True)

    def score(t: pa.Table) -> pa.Table:
        d = t.column("dot").to_numpy(zero_copy_only=False).astype(np.float64)
        a2 = t.column("na2").to_numpy(zero_copy_only=False).astype(np.float64)
        b2 = t.column("nb2").to_numpy(zero_copy_only=False).astype(np.float64)
        sim = d / (np.sqrt(a2) * np.sqrt(b2))
        out = pa.table({"doc_a": t.column("doc_a"),
                        "doc_b": t.column("doc_b"),
                        "sim": pa.array(sim, pa.float64())})
        return out.filter(pa.array(sim >= threshold))

    out = joined.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if out.empty:
        out = pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                            "doc_b": pd.Series(dtype=np.int64),
                            "sim": pd.Series(dtype=np.float64)})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
