"""Text / LLM-data-pipeline operator queries: dedup (exact, MinHash-LSH,
SimHash, n-gram Jaccard, dup-span), fingerprints, lang-ID/quality,
tokenization, inverted index + BM25, decontamination, curation and
training-shard endpoints.
"""

# This module is one shard of the query registry; see
# ethereum_etl_ray/pipelines/queries.py for assembly and ordering.

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ethereum_etl_ray.pipelines.queries_common import _read


def q_exact_dedup_docs(sf_dir: str):
    from ethereum_etl_ray.pipelines.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    return exact_dedup(ds, keep_cols=["doc_id", "lang", "n_chars"])


def q_doc_fingerprint(sf_dir: str):
    from ethereum_etl_ray.functions.textstats import md5_fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(md5_fingerprint_batch, batch_format="pyarrow",
                          zero_copy_batch=True).select_columns(["doc_id", "fingerprint"])


def q_lang_id_docs(sf_dir: str):
    from ethereum_etl_ray.functions.textstats import lang_scores_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(lang_scores_batch, batch_format="pyarrow", zero_copy_batch=True)
    return out.select_columns(["doc_id", "score_de", "score_en", "score_es",
                               "score_fr", "score_zh", "predicted_lang"])


def q_quality_docs(sf_dir: str):
    from ethereum_etl_ray.functions.textstats import quality_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)
    return out.select_columns(["doc_id", "n_tokens", "n_chars_txt", "stop_ppm",
                               "mtl_c", "quality_ppm"])


_BPE_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def q_bpe_token_count(sf_dir: str):
    """BPE-ish tokenizer token counts (GPT-2-style pretokenizer pattern,
    lookahead-free so RE2 semantics match between Arrow and DuckDB): the
    token-budget accounting a training pipeline runs per document, alongside
    the whitespace count."""
    from ethereum_etl_ray.functions.textstats import token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_ws_tokens": token_count(t.column("text")),
            "n_bpe_tokens": pc.cast(
                pc.count_substring_regex(t.column("text"), pattern=_BPE_PAT),
                pa.int64()),
        })

    return ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)


def q_winnow_fingerprint(sf_dir: str):
    from ethereum_etl_ray.functions.textstats import rolling_fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(rolling_fingerprint_batch, batch_format="pyarrow",
                          zero_copy_batch=True).select_columns(["doc_id", "winnow_fp"])


def q_minhash_lsh_pairs(sf_dir: str):
    from ethereum_etl_ray.pipelines.dedup import minhash_lsh_dedup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_dedup_pairs(ds, threshold=0.7)


def q_near_dedup_keep(sf_dir: str):
    """End-to-end corpus near-dedup: MinHash-LSH pairs (fully streaming) →
    distributed connected components → keep the min-doc_id representative
    per duplicate cluster (shuffle route: nothing driver-resident)."""
    from ethereum_etl_ray.pipelines.dedup import minhash_lsh_dedup_pairs
    from ethereum_etl_ray.stages.components import dedup_apply

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    pairs = minhash_lsh_dedup_pairs(docs, threshold=0.7, streaming=True)
    kept = dedup_apply(docs, pairs, route="shuffle")
    out = kept.select_columns(["doc_id", "n_chars"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_lsh_index_query(sf_dir: str):
    """Incremental near-dedup against a PERSISTED corpus LSH index
    (pipelines.lshindex — the CDC-tier dedup: new docs checked against
    everything already ingested without re-shingling the corpus; the query
    reads only the band/sig shards the increment touches). Corpus =
    doc_id % 10 != 0, increment = the % 10 == 0 docs. Rows-only at the
    driver (MinHash is not SQL-expressible); tests/test_lshindex.py pins
    the pair set and every ppm value against a same-kernel driver
    recomputation plus planted exact/near copies."""
    import shutil
    import tempfile

    from ethereum_etl_ray.pipelines.lshindex import (
        build_lsh_index,
        query_lsh_index,
    )

    def split(keep_corpus: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(
                zero_copy_only=False)
            m = (ids % 10 != 0) if keep_corpus else (ids % 10 == 0)
            return t.filter(pa.array(m))
        return f

    idx = tempfile.mkdtemp(prefix="webcdc_lshidx_")
    try:
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        corpus = docs.map_batches(split(True), batch_format="pyarrow",
                                  zero_copy_batch=True)
        increment = docs.map_batches(split(False), batch_format="pyarrow",
                                     zero_copy_batch=True)
        build_lsh_index(corpus, idx, num_perm=64, bands=16, ngram=3,
                        shards=16)
        out = (query_lsh_index(idx, increment, threshold=0.5).to_pandas()
               .reindex(columns=["doc_id", "dup_id", "est_jaccard_ppm"]))
        return (out.sort_values(["doc_id", "dup_id"])
                   .reset_index(drop=True))
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def q_corpus_curate(sf_dir: str):
    """Full training-corpus curation chain (pipelines.curate): language
    filter → quality filter → exact dedup → near-dedup keep-one. Rows-only
    at the driver (the near-dup step is hash-based); the pytest oracle
    (tests/test_curate.py) pins exact survivors on a planted corpus."""
    from ethereum_etl_ray.pipelines.curate import curate_corpus

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    kept = curate_corpus(docs, langs=("en",), min_quality_ppm=300_000,
                         near_threshold=0.7, keep_cols=["doc_id", "n_chars"])
    out = kept.to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_keywords(sf_dir: str):
    """Per-document keyword extraction — the top-5 tokens per doc by an
    integer-exact tf-idf-style score (``tf * 1e6 // df``; pure int math so
    the DuckDB oracle hashes identically — float idf would drift at floor
    boundaries). Fully distributed: per-batch exact tf (each row is one
    complete document, so term counts need no shuffle), one token-keyed
    aggregate for df, a co-group hash join back, and a per-doc cap via the
    combiner-bounded partition-parallel shape."""
    from ethereum_etl_ray.functions.hashing import partition_ids
    from ethereum_etl_ray.stages.joins import cogroup_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_batch(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        doc = pc.take(t.column("doc_id"), parents)
        g = (pd.DataFrame({"doc_id": doc.to_pandas(),
                           "token": flat.to_pandas()})
             .groupby(["doc_id", "token"], sort=False)
             .size().reset_index(name="tf"))
        return pa.Table.from_pandas(g, preserve_index=False)

    tf = docs.map_batches(tf_batch, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    df = (tf.groupby("token").count()
          .map_batches(lambda t: pa.table({
              "__tok": t.column("token"),
              "df": pc.cast(t.column("count()"), pa.int64())})
              if "token" in t.column_names else
              pa.table({"__tok": pa.array([], pa.string()),
                        "df": pa.array([], pa.int64())}),
              batch_format="pyarrow", zero_copy_batch=True))
    joined = cogroup_join(tf, df, left_on="token", right_on="__tok",
                          how="inner")

    k = 5
    keys = [("doc_id", "ascending"), ("score", "descending"),
            ("token", "ascending")]

    def score_cap(t: pa.Table) -> pa.Table:
        if "score" in t.column_names:  # second (per-group) pass re-caps only
            t = t.drop_columns(["score"])
        score = pc.divide(
            pc.multiply(pc.cast(t.column("tf"), pa.int64()),
                        pa.scalar(1_000_000, pa.int64())),
            pc.cast(t.column("df"), pa.int64()))
        t = t.append_column("score", score).sort_by(keys)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
        run_id = np.cumsum(np.concatenate(
            [[0], (d[1:] != d[:-1]).astype(np.int64)]))
        rank = np.arange(len(d)) - starts[run_id]
        return t.filter(pa.array(rank < k))

    def assign(t: pa.Table) -> pa.Table:
        return t.append_column("__part", pa.array(
            partition_ids(t.column("doc_id"), 32), pa.int32()))

    out = (joined.map_batches(score_cap, batch_format="pyarrow",
                              zero_copy_batch=True)
           .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("__part")
           .map_groups(lambda g: score_cap(g.drop_columns(["__part"])),
                       batch_format="pyarrow")
           .select_columns(["doc_id", "token", "tf", "df", "score"])
           .to_pandas())
    return out.sort_values(["doc_id", "token"]).reset_index(drop=True)


def q_vocab_topk(sf_dir: str):
    """Corpus-wide vocabulary: the 50 most frequent whitespace tokens with
    exact counts. Explode → per-batch Arrow `value_counts` combiner (the
    shuffle moves one row per distinct token per batch, never the token
    stream) → hash-aggregate sum → shuffle-free partial top-k with a
    deterministic (count DESC, token ASC) tie-break."""
    from ethereum_etl_ray.stages.topk import topk

    docs = _read(sf_dir, "documents", ["text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t.column("text"), pattern=" "))
        vc = toks.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partial = docs.map_batches(count_tokens, batch_format="pyarrow",
                               zero_copy_batch=True)
    totals = (partial.groupby("token").sum("n")
              .map_batches(lambda t: t.rename_columns(["token", "n"]),
                           batch_format="pyarrow", zero_copy_batch=True))
    out = topk(totals, ["n", "token"], 50, descending=[True, False])
    return out.reset_index(drop=True)


def q_corpus_filter_dedup(sf_dir: str):
    """The SQL-expressible prefix of the curation chain — language filter +
    quality filter + exact dedup — with a full DuckDB oracle (the near-dup
    suffix is hash-based and covered by `corpus_curate`'s pytest oracle).
    Pins the fused annotate-and-drop stage cross-engine."""
    from ethereum_etl_ray.pipelines.curate import _annotate_filter
    from ethereum_etl_ray.pipelines.dedup import exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    filtered = docs.map_batches(
        _annotate_filter(("en",), 300_000, "text"),
        batch_format="pyarrow", zero_copy_batch=True)
    out = exact_dedup(filtered, keep_cols=["doc_id", "predicted_lang",
                                           "quality_ppm", "n_chars"])
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_simhash_pairs(sf_dir: str):
    from ethereum_etl_ray.pipelines.dedup import simhash_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)


def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact n-gram Jaccard over LSH candidates at a lower threshold."""
    from ethereum_etl_ray.pipelines.dedup import (
        minhash_candidate_pairs,
        verify_jaccard_pairs,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = minhash_candidate_pairs(ds, bands=32, num_perm=128)
    out = verify_jaccard_pairs(ds, cands, threshold=0.4, ngram=2)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_pii_redact(sf_dir: str):
    """PII redaction over the corpus: emails / IPv4s / phone numbers masked
    with RE2 kernels, per-kind match counts retained for audit. The synthetic
    corpus carries no PII, so the pipeline first PLANTS it deterministically
    from doc_id (the oracle repeats the derivation) — every row exercises
    every pattern. Stateless task-pool stage, zero-copy Arrow throughout."""
    from ethereum_etl_ray.functions.redact import plant_pii_batch, redact_pii_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def both(t: pa.Table) -> pa.Table:
        return redact_pii_batch(plant_pii_batch(t))

    return (ds.map_batches(both, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(["doc_id", "n_emails", "n_ips", "n_phones", "clean"]))


def q_normalize_part(sf_dir: str):
    """Text canonicalization (NFC → lower → whitespace-collapse → trim) over a
    deterministically-dirtied mixed-case string — the normalize-before-dedup
    step of a crawl pipeline, on the one table with real mixed-case text."""
    from ethereum_etl_ray.functions.redact import normalize_text_batch

    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_type"])

    def dirty_then_norm(t: pa.Table) -> pa.Table:
        # "  " + UPPER(p_name) + "\t" + p_type + "  " — mirrored in SQL
        raw = pc.binary_join_element_wise(
            "  ", pc.utf8_upper(t.column("p_name")), "\t", t.column("p_type"),
            "  ", "")
        t = t.append_column("raw", raw)
        return normalize_text_batch(t, "raw", "norm")

    return (ds.map_batches(dirty_then_norm, batch_format="pyarrow",
                           zero_copy_batch=True)
            .select_columns(["p_partkey", "norm"]))


def q_rep_stats(sf_dir: str):
    """Token-repetition quality filter (Gopher-style): per-doc duplicate-token
    and top-token shares in integer ppm; fully vectorized (one dictionary
    encode + one np.unique per batch)."""
    from ethereum_etl_ray.functions.textstats import rep_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(rep_stats_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
            .select_columns(["doc_id", "n_tokens", "n_distinct", "dup_ppm",
                             "top_tok_ppm"]))


_CHUNK_W, _CHUNK_S = 64, 48


def q_chunk_docs(sf_dir: str):
    """Document chunking for embedding / RAG indexing: fixed 64-token
    windows at stride 48 (16-token overlap), trailing chunks short, every
    token covered. One split + one fancy-gather + one binary_join per batch
    (functions/textstats.py:chunk_docs_batch); rows multiply ~n_tokens/48
    and re-block downstream."""
    from ethereum_etl_ray.functions.textstats import chunk_docs_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: chunk_docs_batch(t, window=_CHUNK_W, stride=_CHUNK_S),
        batch_format="pyarrow", zero_copy_batch=True)


def q_lm_score(sf_dir: str):
    """CCNet-style bigram LM quality scoring: train unigram/bigram counts on
    the corpus (one combiner-reduced pass), score each doc by its mean
    bigram conditional in ppm (integer-exact; see pipelines/lm.py). Routes
    broadcast-below / cogroup-join-above by distinct-bigram count."""
    from ethereum_etl_ray.pipelines.lm import lm_score

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return lm_score(ds)


_PACK_BUDGET = 2000


def q_pack_sequences(sf_dir: str):
    """Sequence packing: cut the doc_id-ordered token stream into
    fixed-budget training sequences via the distributed prefix sum in
    stages/packing.py (per-bucket partials → driver prefix over O(#buckets)
    rows → one narrow hash shuffle)."""
    from ethereum_etl_ray.functions.textstats import token_count
    from ethereum_etl_ray.stages.packing import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def with_tokens(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": token_count(t.column("text"))})

    counted = ds.map_batches(with_tokens, batch_format="pyarrow",
                             zero_copy_batch=True)
    # doc_ids are dense 0..N-1, so the metadata-only parquet row count bounds
    # the key space without an extra full pass (pack_sequences would
    # otherwise run a max() aggregation)
    return pack_sequences(counted, key="doc_id", weight="n_tokens",
                          budget=_PACK_BUDGET, n_buckets=64,
                          key_upper_bound=ds.count())


def _build_urls(batch: pa.Table) -> pa.Table:
    """Deterministic URL per document, derived from (doc_id, source) —
    mixed-case hosts, default/non-default ports, queries and fragments so the
    parser has something to normalize. The SQL oracle reconstructs the PARSED
    fields constructively from the same arithmetic; the engine must recover
    them by actually parsing the assembled string."""
    ids = batch.column("doc_id").to_numpy()
    src = batch.column("source").to_numpy(zero_copy_only=False).astype(str)
    scheme = np.where(ids % 2 == 0, "http", "https")
    sub = np.where(ids % 3 == 0, "M.", "www.")
    host = np.char.add(np.char.add(sub, np.char.upper(src)), ".Org")
    port = np.select([ids % 10 == 0, ids % 10 == 5], [":8080", ":443"], "")
    path = np.char.add("/d/", (ids % 100).astype(str))
    query = np.where(ids % 4 == 0, np.char.add("?ref=", src), "")
    frag = np.where(ids % 7 == 0, "#top", "")
    url = np.char.add(scheme, "://")
    for part in (host, port, path, query, frag):
        url = np.char.add(url, part.astype(str))
    return batch.append_column("url", pa.array(url, pa.string()))


def q_url_parse(sf_dir: str):
    """URL parse + canonicalization (webtext key machinery — the reference
    keys rows on 0x-hex addresses, SURVEY §1.4; a web CDC lake keys on the
    canonical URL): lowercase scheme/host, default port stripped, fragment
    dropped, registrable domain extracted. One RE2 extract per batch."""
    from ethereum_etl_ray.functions.url import (
        canonicalize_urls_batch,
        parse_urls_batch,
    )

    def fn(batch: pa.Table) -> pa.Table:
        batch = _build_urls(batch)
        batch = parse_urls_batch(batch)
        batch = canonicalize_urls_batch(batch)
        return batch.select(["doc_id", "scheme", "host", "port", "domain",
                             "canonical_url"])

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_domain_stats(sf_dir: str):
    """Per-registrable-domain corpus stats (crawl-politeness / quota view):
    doc count, distinct host count, total chars. Combiner-bounded: per-batch
    (domain, host) partials → one small groupby → one tiny groupby."""
    from ethereum_etl_ray.functions.url import parse_urls_batch

    def partial(batch: pa.Table) -> pa.Table:
        batch = parse_urls_batch(_build_urls(batch))
        df = batch.select(["domain", "host", "n_chars"]).to_pandas()
        agg = df.groupby(["domain", "host"], as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    def one_host(batch: pa.Table) -> pa.Table:
        return batch.append_column("n_hosts",
                                   pa.array(np.ones(batch.num_rows, np.int64)))

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["domain", "host"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("sum_chars", alias_name="sum_chars"))
            .map_batches(one_host, batch_format="pyarrow")
            .groupby("domain")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_hosts", alias_name="n_hosts"),
                       Sum("sum_chars", alias_name="sum_chars")))


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: per-corpus-doc count of 5-gram overlaps
    with the eval 'benchmark' (docs with doc_id % 37 == 0). The benchmark's
    distinct grams broadcast once; the corpus is audited with one vectorized
    is_in per batch — zero shuffle over the corpus."""
    from ethereum_etl_ray.pipelines.decontam import decontaminate

    def _mod_filter(want_bench: bool):
        def fn(t: pa.Table) -> pa.Table:
            mask = (t.column("doc_id").to_numpy() % 37 == 0) == want_bench
            return t.filter(pa.array(mask))
        return fn

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.map_batches(_mod_filter(True), batch_format="pyarrow",
                             zero_copy_batch=True)
    corpus = docs.map_batches(_mod_filter(False), batch_format="pyarrow",
                              zero_copy_batch=True)
    return decontaminate(corpus, bench, n=5)


def q_shuffle_rank(sf_dir: str):
    """Deterministic global corpus shuffle: every document's 1-based position
    in the md5(doc_id) permutation — reproducible across runs, engines and
    partitionings (epoch ordering / shard assignment). No global sort: digest
    range-bucketing + per-bucket rank (stages/shuffle.py)."""
    from ethereum_etl_ray.stages.shuffle import deterministic_shuffle

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return deterministic_shuffle(ds, key_col="doc_id", out_col="pos")


def q_inverted_postings(sf_dir: str):
    """Inverted-index build + bucket-pruned term lookup: postings
    (token, doc_id, tf) for three fixed query terms, read from a
    hive-partitioned index that prunes at the bucket-directory level
    (stages/invindex.py). The oracle recomputes the same postings with a
    SQL unnest + group by."""
    import shutil
    import tempfile

    from ethereum_etl_ray.stages.invindex import (
        build_inverted_index,
        lookup_postings,
    )

    idx = tempfile.mkdtemp(prefix="webcdc_inv_")
    try:
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        build_inverted_index(ds, idx, buckets=64)
        return lookup_postings(idx, ["scan", "merge", "window"]).to_pandas()
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def q_bm25_scores(sf_dir: str):
    """Per-(term, doc) BM25 relevance for three fixed query terms
    (stages/invindex.py:bm25_scores). Rational-idf variant — no
    transcendentals, so the float expression is bit-identical across
    engines when mirrored literal-for-literal."""
    from ethereum_etl_ray.stages.invindex import bm25_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_scores(ds, ["scan", "merge", "window"], k1=1.2, b=0.75)


def q_search_topk(sf_dir: str):
    """End-to-end search ranking: BM25 scores → top-3 docs per query term —
    two engine operators composed (stages/invindex.py:bm25_scores feeding
    stages/grouped.py:topn_per_key); the combiner bounds the shuffle at 3
    rows per (batch, term)."""
    from ethereum_etl_ray.stages.grouped import topn_per_key
    from ethereum_etl_ray.stages.invindex import bm25_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    scored = bm25_scores(ds, ["scan", "merge", "window"], k1=1.2, b=0.75)
    top = topn_per_key(scored, "token", ["score", "doc_id"], 3,
                       descending=[True, False])
    return top.select_columns(["token", "doc_id", "score"])


def q_phrase_count(sf_dir: str):
    """Exact token-phrase occurrence counts per document
    (stages/invindex.py:phrase_count) — overlapping matches included,
    purely map-side via chained shifted vector equalities over the batch's
    flattened token array with a doc-boundary mask."""
    from ethereum_etl_ray.stages.invindex import phrase_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return phrase_count(ds, ["table", "scan"])


def q_compression_ratio(sf_dir: str):
    """Per-document zlib compression ratio (repetition/boilerplate quality
    signal — functions/textstats.py:compression_stats_batch). Rows-only at
    the driver (SQL has no zlib); planted-docs oracle in
    tests/test_textstats.py."""
    from ethereum_etl_ray.functions.textstats import compression_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(compression_stats_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
    return out.select_columns(["doc_id", "zlib_len", "ratio_ppm"])


_LANG_SCORE = {
    lang: " + ".join(
        f"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' {w} ', ''))) // (length(' {w} ')) AS BIGINT)"
        for w in words
    )
    for lang, words in {
        "de": ["der", "und", "die"],
        "en": ["the", "a", "of"],
        "es": ["el", "la", "que"],
        "fr": ["le", "et", "les"],
        "zh": ["he", "shi", "de0"],
    }.items()
}


def _adjacent_pair_counts(t: pa.Table) -> pa.Table:
    """Doc-boundary-masked adjacent token-pair counts for one batch —
    shared combiner of q_bpe_pair_counts and q_pmi_bigrams. Null text is
    treated as empty (fill_null, like every sibling tokenizer); pairs are
    0x1f-joined so pair-string order equals (tok_a, tok_b) tuple order."""
    text = pc.fill_null(t.column("text").combine_chunks(), "")
    toks = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(toks)
    n = len(flat)
    if n < 2:
        return pa.table({"pair": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    ends = np.cumsum(lens) - 1          # last-token index of each doc
    mask = np.ones(n - 1, bool)
    mask[ends[ends < n - 1]] = False    # drop pairs straddling docs
    joined = pc.binary_join_element_wise(
        flat.slice(0, n - 1), flat.slice(1), "\x1f")
    vc = joined.filter(pa.array(mask)).value_counts()
    return pa.table({"pair": vc.field("values"),
                     "n": pc.cast(vc.field("counts"), pa.int64())})


def q_bpe_pair_counts(sf_dir: str):
    """First BPE merge-induction step: exact corpus-wide counts of adjacent
    token pairs, top 30. Pairs are formed by a shifted-vector zip over the
    flattened token stream with doc-boundary masking (no per-row Python),
    counted by a per-batch `value_counts` combiner — the shuffle moves one
    row per distinct pair per batch, never the token stream. Tokens are
    joined with a 0x1f separator (below any printable byte), so pair-string
    order equals (tok_a, tok_b) tuple order for the tie-break."""
    from ethereum_etl_ray.stages.topk import topk

    docs = _read(sf_dir, "documents", ["text"])

    partial = docs.map_batches(_adjacent_pair_counts, batch_format="pyarrow",
                               zero_copy_batch=True)
    totals = (partial.groupby("pair").sum("n")
              .map_batches(lambda t: t.rename_columns(["pair", "n"]),
                           batch_format="pyarrow", zero_copy_batch=True))
    out = topk(totals, ["n", "pair"], 30, descending=[True, False])
    toks = out["pair"].str.split("\x1f", n=1, expand=True)
    return pd.DataFrame({"tok_a": toks[0], "tok_b": toks[1],
                         "n": out["n"]}).reset_index(drop=True)


def q_fuzzy_name_pairs(sf_dir: str):
    """Blocked fuzzy entity resolution (stages/fuzzy.py:edit1_pairs):
    same-nation customer pairs whose names are within Levenshtein distance
    1, via vectorized byte-matrix Hamming / single-indel tests — no per-pair
    DP, one hash shuffle on the blocking key."""
    from ethereum_etl_ray.stages.fuzzy import edit1_pairs

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    out = edit1_pairs(ds, key_col="c_custkey", text_col="c_name",
                      block_col="c_nationkey")
    pdf = out.to_pandas()
    if pdf.empty:  # this Ray's to_pandas drops the schema when fully empty
        pdf = pd.DataFrame(columns=["key_a", "key_b", "c_nationkey"])
    return (pdf[["c_nationkey", "key_a", "key_b"]]
            .sort_values(["c_nationkey", "key_a", "key_b"])
            .reset_index(drop=True))


def q_dup_span_stats(sf_dir: str):
    """Exact duplicated-span coverage (pipelines/dedup.py:dup_span_stats):
    per doc, how many token positions sit inside a 4-gram that repeats
    corpus-wide — the fixed-n approximation of exact-substring dedup used
    to strip boilerplate from training corpora."""
    from ethereum_etl_ray.pipelines.dedup import dup_span_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dup_span_stats(ds, ngram=4, min_count=2)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_sparse_cosine_pairs(sf_dir: str):
    """Sparse TF cosine similarity self-join over discriminative terms
    (stages/invindex.py:sparse_cosine_pairs): df-pruned term-at-a-time
    pair expansion, integer dot/norm sums, one float expression — the
    lexical near-dup/cluster counterpart of embedding_cosine_pairs."""
    from ethereum_etl_ray.stages.invindex import sparse_cosine_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return sparse_cosine_pairs(ds, max_df=32, threshold=0.2)


def q_dup_span_strip(sf_dir: str):
    """Apply step of duplicated-span dedup: every doc rewritten with
    corpus-repeated 4-gram spans removed (pipelines/dedup.py:dup_span_strip);
    clean docs pass through byte-identical."""
    from ethereum_etl_ray.pipelines.dedup import dup_span_strip

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dup_span_strip(ds, ngram=4, min_count=2)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_pmi_bigrams(sf_dir: str):
    """Collocation extraction: top-20 adjacent token pairs by a rational
    PMI score c_ab·T² / (B·n_a·n_b) — exact integers end to end, one float
    division, no log (bit-identical across engines). Bigram counts reuse
    the bpe_pair_counts combiner; the unigram table is aggregate-bounded by
    |vocab| (the size of a tokenizer vocabulary, not the corpus) so it
    broadcasts; the final selection is the shuffle-free partial top-k."""
    from ethereum_etl_ray.stages.topk import topk

    docs = _read(sf_dir, "documents", ["text"])

    def uni_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t.column("text"),
                                                pattern=" "))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    uni = (docs.map_batches(uni_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("tok").sum("n").to_pandas())
    uni.columns = ["tok", "n"]
    uni_map = dict(zip(uni["tok"], (int(x) for x in uni["n"])))
    T = sum(uni_map.values())

    bi = (docs.map_batches(_adjacent_pair_counts, batch_format="pyarrow",
                           zero_copy_batch=True)
          .groupby("pair").sum("n")
          .map_batches(lambda t: t.rename_columns(["pair", "n"]),
                       batch_format="pyarrow", zero_copy_batch=True))
    # each doc of L tokens contributes L-1 in-doc pairs, so the bigram
    # total is T - #docs — no second execution of the pair pipeline
    B = T - docs.count()

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("n"), pa.scalar(5)))
        pairs = t.column("pair").to_pylist()
        cnts = t.column("n").to_pylist()
        toks_ab = [p.split("\x1f", 1) for p in pairs]
        # exact-int numerator/denominator, one float division (HUGEINT twin)
        s = [float(c * T * T) / float(B * uni_map[a] * uni_map[b])
             for (a, b), c in zip(toks_ab, cnts)]
        return pa.table({
            "tok_a": pa.array([ab[0] for ab in toks_ab], pa.string()),
            "tok_b": pa.array([ab[1] for ab in toks_ab], pa.string()),
            "n": pa.array(cnts, pa.int64()),
            "pmi_ratio": pa.array(s, pa.float64())})

    scored = bi.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = topk(scored, ["pmi_ratio", "tok_a", "tok_b"], 20,
               descending=[True, False, False])
    return out.reset_index(drop=True)


def q_training_shards(sf_dir: str):
    """The training-data endpoint run end to end (pipelines/curate.py:
    make_training_shards): curate → deterministic shuffle → fixed-token
    packing → hive-partitioned shard write under /tmp scratch; returns the
    deterministic per-shard manifest. Rows-only at the driver (the chain
    includes hash-based near-dedup); structure + determinism oracle in
    tests/test_curate.py."""
    import shutil

    from ethereum_etl_ray.pipelines.curate import make_training_shards

    out_dir = "/tmp/webcdc_training_shards"
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    m = make_training_shards(docs, out_dir, shards=8, tokens_per_seq=256,
                             langs=("en",), near_threshold=0.7)
    rows = sorted(m["per_shard"].items())
    return pa.table({
        "shard": pa.array([s for s, _ in rows], pa.int64()),
        "docs": pa.array([v["docs"] for _, v in rows], pa.int64()),
        "tokens": pa.array([v["tokens"] for _, v in rows], pa.int64())})


def q_bpe_train_merges(sf_dir: str):
    """Tokenizer training: the first 8 BPE merges learned over the corpus
    (pipelines/bpe.py — corpus pass to a word-frequency table, then
    vocab-bounded iterations). Rows-only at the driver (SQL cannot express
    the iterative argmax-rewrite loop); the exact-sequence oracle vs a
    single-process reference BPE lives in tests/test_bpe.py, including
    partitioning invariance."""
    from ethereum_etl_ray.pipelines.bpe import train_bpe

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return train_bpe(ds, num_merges=8)


def q_mixture_sample(sf_dir: str):
    """Domain-mixing resampler (DataComp/Pile-style): downsample each
    ``lang`` stratum to a uniform target mixture with a deterministic
    hash gate, so the sampled corpus approaches equal per-lang shares
    without any shuffle. Per-lang keep rates derive from one tiny
    ``groupby(lang).count()`` (O(#langs) driver rows); the gate is
    md5(doc_id) prefix < floor(rate·65536) rendered as a 4-hex string —
    the same engine-portable convention as ``deterministic_sample`` —
    with a ``'g'`` sentinel for rate ≥ 1 (keep-all strata)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    counts = ds.groupby("lang").count().to_pandas()
    total = float(counts["count()"].sum())
    nl = len(counts)
    thr = {}
    for lang, cnt in zip(counts["lang"], counts["count()"]):
        rate = min(1.0, (1.0 / nl) * total / float(cnt))
        thr[lang] = "g" if rate >= 1.0 else format(int(np.floor(rate * 65536)), "04x")

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        langs = t.column("lang").to_pylist()
        keep = np.fromiter(
            (hashlib.md5(str(i).encode()).hexdigest()[:4] < thr[lg]
             for i, lg in zip(ids, langs)),
            dtype=bool, count=len(ids))
        return t.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


QUERIES = {
    "exact_dedup_docs": q_exact_dedup_docs,
    "doc_fingerprint": q_doc_fingerprint,
    "lang_id_docs": q_lang_id_docs,
    "quality_docs": q_quality_docs,
    "winnow_fingerprint": q_winnow_fingerprint,
    "bpe_token_count": q_bpe_token_count,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "lsh_index_query": q_lsh_index_query,
    "near_dedup_keep": q_near_dedup_keep,
    "corpus_curate": q_corpus_curate,
    "corpus_filter_dedup": q_corpus_filter_dedup,
    "vocab_topk": q_vocab_topk,
    "doc_keywords": q_doc_keywords,
    "simhash_pairs": q_simhash_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "url_parse": q_url_parse,
    "domain_stats": q_domain_stats,
    "decontaminate": q_decontaminate,
    "shuffle_rank": q_shuffle_rank,
    "inverted_postings": q_inverted_postings,
    "bm25_scores": q_bm25_scores,
    "phrase_count": q_phrase_count,
    "search_topk": q_search_topk,
    "compression_ratio": q_compression_ratio,
    "pii_redact": q_pii_redact,
    "normalize_part": q_normalize_part,
    "rep_stats": q_rep_stats,
    "pack_sequences": q_pack_sequences,
    "chunk_docs": q_chunk_docs,
    "lm_score": q_lm_score,
    "bpe_pair_counts": q_bpe_pair_counts,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "dup_span_stats": q_dup_span_stats,
    "sparse_cosine_pairs": q_sparse_cosine_pairs,
    "dup_span_strip": q_dup_span_strip,
    "pmi_bigrams": q_pmi_bigrams,
    "training_shards": q_training_shards,
    "mixture_sample": q_mixture_sample,
    "bpe_train_merges": q_bpe_train_merges,
}

ORACLE = {
    "mixture_sample": """
        WITH c AS (
          SELECT lang, CAST(count(*) AS DOUBLE) AS cnt FROM documents GROUP BY lang
        ), t AS (
          SELECT CAST(count(*) AS DOUBLE) AS total,
                 (SELECT CAST(count(*) AS BIGINT) FROM c) AS nl
          FROM documents
        ), thr AS (
          SELECT lang,
                 CASE WHEN least(1.0, (1.0 / nl) * total / cnt) >= 1.0 THEN 'g'
                      ELSE printf('%04x', CAST(floor(least(1.0, (1.0 / nl) * total / cnt) * 65536) AS INT))
                 END AS h
          FROM c, t
        )
        SELECT d.doc_id, d.lang
        FROM documents d JOIN thr USING (lang)
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < thr.h
    """,
    "exact_dedup_docs": """
        SELECT doc_id, lang, n_chars FROM (
          SELECT doc_id, lang, n_chars,
                 row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM documents
        ) WHERE rn = 1
    """,
    "doc_fingerprint": "SELECT doc_id, md5(text) AS fingerprint FROM documents",
    "lang_id_docs": f"""
        SELECT doc_id, score_de, score_en, score_es, score_fr, score_zh,
               CASE
                 WHEN score_de >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
                 WHEN score_en >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
                 WHEN score_es >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
                 WHEN score_fr >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
                 ELSE 'zh'
               END AS predicted_lang
        FROM (
          SELECT doc_id,
                 {_LANG_SCORE['de']} AS score_de,
                 {_LANG_SCORE['en']} AS score_en,
                 {_LANG_SCORE['es']} AS score_es,
                 {_LANG_SCORE['fr']} AS score_fr,
                 {_LANG_SCORE['zh']} AS score_zh
          FROM documents
        )
    """,
    "quality_docs": """
        SELECT doc_id, n_tokens, n_chars_txt, stop_ppm, mtl_c,
               CAST(LEAST(n_tokens, 100) * 10000 - stop_ppm // 2 + mtl_c * 10 AS BIGINT) AS quality_ppm
        FROM (
          SELECT doc_id, n_tokens, n_chars_txt,
                 (stop_hits * 1000000) // n_tokens AS stop_ppm,
                 ((n_chars_txt - (n_tokens - 1)) * 100) // n_tokens AS mtl_c
          FROM (
            SELECT doc_id,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_txt,
                   CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5
                      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) // 3
                      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' of ', ''))) // 4
                      AS BIGINT) AS stop_hits
            FROM documents
          )
        )
    """,
    "bpe_token_count": f"""
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
                 AS n_ws_tokens,
               CAST(length(regexp_extract_all(text,
                 ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS BIGINT)
                 AS n_bpe_tokens
        FROM documents
    """,
    "corpus_filter_dedup": f"""
        WITH scored AS (
          SELECT doc_id, text, n_chars,
                 CASE
                   WHEN score_de >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
                   WHEN score_en >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
                   WHEN score_es >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
                   WHEN score_fr >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
                   ELSE 'zh'
                 END AS predicted_lang,
                 CAST(LEAST(n_tokens, 100) * 10000
                      - ((stop_hits * 1000000) // n_tokens) // 2
                      + (((n_chars_txt - (n_tokens - 1)) * 100) // n_tokens) * 10
                   AS BIGINT) AS quality_ppm
          FROM (
            SELECT doc_id, text, n_chars,
                   {_LANG_SCORE['de']} AS score_de,
                   {_LANG_SCORE['en']} AS score_en,
                   {_LANG_SCORE['es']} AS score_es,
                   {_LANG_SCORE['fr']} AS score_fr,
                   {_LANG_SCORE['zh']} AS score_zh,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_txt,
                   CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5
                      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) // 3
                      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' of ', ''))) // 4
                      AS BIGINT) AS stop_hits
            FROM documents
          )
        )
        SELECT doc_id, predicted_lang, quality_ppm, n_chars FROM (
          SELECT doc_id, predicted_lang, quality_ppm, n_chars,
                 row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM scored
          WHERE predicted_lang = 'en' AND quality_ppm >= 300000
        ) WHERE rn = 1
    """,
    "vocab_topk": """
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ) GROUP BY token
        ORDER BY n DESC, token ASC
        LIMIT 50
    """,
    "doc_keywords": """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents
        ), tf AS (
          SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
          FROM tok GROUP BY doc_id, token
        ), df AS (
          SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
        )
        SELECT doc_id, token, tf, df, score FROM (
          SELECT tf.doc_id, tf.token, tf.tf, df.df,
                 CAST(tf.tf * 1000000 // df.df AS BIGINT) AS score,
                 row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * 1000000 // df.df DESC, tf.token) AS rn
          FROM tf JOIN df USING (token)
        ) WHERE rn <= 5
    """,
    "url_parse": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END AS scheme,
               (CASE WHEN doc_id % 3 = 0 THEN 'm.' ELSE 'www.' END)
                 || lower(source) || '.org' AS host,
               CASE WHEN doc_id % 10 = 0 THEN '8080'
                    WHEN doc_id % 10 = 5 THEN '443' ELSE NULL END AS port,
               lower(source) || '.org' AS domain,
               (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
                 || '://'
                 || (CASE WHEN doc_id % 3 = 0 THEN 'm.' ELSE 'www.' END)
                 || lower(source) || '.org'
                 || (CASE WHEN doc_id % 10 = 0 THEN ':8080' ELSE '' END)
                 || '/d/' || (doc_id % 100)
                 || (CASE WHEN doc_id % 4 = 0 THEN '?ref=' || source ELSE '' END)
                 AS canonical_url
        FROM documents
    """,
    "domain_stats": """
        WITH parsed AS (
          SELECT lower(source) || '.org' AS domain,
                 (CASE WHEN doc_id % 3 = 0 THEN 'm.' ELSE 'www.' END)
                   || lower(source) || '.org' AS host,
                 n_chars
          FROM documents
        )
        SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM parsed GROUP BY domain
    """,
    "decontaminate": """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
          SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
          FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
        ),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 37 = 0),
        hits AS (
          SELECT gr.doc_id, count(*) AS n
          FROM grams gr JOIN bench b ON gr.g = b.g
          WHERE gr.doc_id % 37 <> 0
          GROUP BY gr.doc_id
        )
        SELECT d.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
               coalesce(h.n, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 37 <> 0
    """,
    "shuffle_rank": """
        SELECT doc_id, lang,
               CAST(row_number() OVER (
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                 AS pos
        FROM documents
    """,
    "inverted_postings": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents
        )
        SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
        FROM toks
        WHERE token IN ('scan', 'merge', 'window')
        GROUP BY token, doc_id
    """,
    "bm25_scores": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents
        ),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(dl) AS BIGINT) AS tt FROM dl),
        tf AS (
          SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
          FROM toks WHERE token IN ('scan', 'merge', 'window')
          GROUP BY token, doc_id
        ),
        df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token)
        SELECT tf.token, tf.doc_id, tf.tf,
               ((n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
                 * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
                 / (tf + 1.2::DOUBLE * ((1.0::DOUBLE - 0.75::DOUBLE)
                    + 0.75::DOUBLE * dl / (tt / n))) AS score
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
    """,
    "phrase_count": """
        SELECT * FROM (
          SELECT doc_id,
                 CAST(len(list_filter(range(1, len(l)),
                      i -> l[i] = 'table' AND l[i+1] = 'scan')) AS BIGINT)
                   AS n_matches
          FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
        WHERE n_matches > 0
    """,
    "search_topk": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents
        ),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(dl) AS BIGINT) AS tt FROM dl),
        tf AS (
          SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
          FROM toks WHERE token IN ('scan', 'merge', 'window')
          GROUP BY token, doc_id
        ),
        df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
        scored AS (
          SELECT tf.token, tf.doc_id,
                 ((n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
                   * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
                   / (tf + 1.2::DOUBLE * ((1.0::DOUBLE - 0.75::DOUBLE)
                      + 0.75::DOUBLE * dl / (tt / n))) AS score
          FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats)
        SELECT token, doc_id, score FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY token
                                       ORDER BY score DESC, doc_id) AS rn
          FROM scored) WHERE rn <= 3
    """,
    "pii_redact": """
        WITH planted AS (
          SELECT doc_id,
                 'contact user' || doc_id || '@mail.example.com or +1-202-555-'
                   || (doc_id % 9000 + 1000) || ' from 10.' || (doc_id % 256)
                   || '.0.1 re: ' || text AS dirty
          FROM documents
        )
        SELECT doc_id,
               CAST(length(regexp_extract_all(dirty,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                 AS n_emails,
               CAST(length(regexp_extract_all(dirty,
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT)
                 AS n_ips,
               CAST(length(regexp_extract_all(dirty,
                 '\\+[0-9][0-9-]{6,}[0-9]')) AS BIGINT) AS n_phones,
               regexp_replace(regexp_replace(regexp_replace(dirty,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
                 '\\+[0-9][0-9-]{6,}[0-9]', '<PHONE>', 'g') AS clean
        FROM planted
    """,
    "normalize_part": """
        SELECT p_partkey,
               trim(regexp_replace(lower(nfc_normalize(
                 '  ' || upper(p_name) || chr(9) || p_type || '  ')),
                 '\\s+', ' ', 'g')) AS norm
        FROM part
    """,
    "rep_stats": """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ), cnt AS (
          SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
        )
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct,
               CAST((sum(c) - count(*)) * 1000000 // sum(c) AS BIGINT) AS dup_ppm,
               CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS top_tok_ppm
        FROM cnt GROUP BY doc_id
    """,
    "pack_sequences": f"""
        SELECT doc_id, n_tokens,
               CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS seq_id
        FROM (
          SELECT doc_id, n_tokens,
                 sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM (
            SELECT doc_id,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1
                     AS BIGINT) AS n_tokens
            FROM documents))
    """,
    "chunk_docs": f"""
        WITH d AS (
          SELECT doc_id, text,
                 length(text) - length(replace(text, ' ', '')) + 1 AS ntok
          FROM documents
        ), starts AS (
          SELECT doc_id, text, ntok,
                 unnest(generate_series(1, ntok, {_CHUNK_S})) AS i
          FROM d
        )
        SELECT doc_id, CAST((i - 1) // {_CHUNK_S} AS BIGINT) AS chunk_id,
               array_to_string(list_slice(string_split(text, ' '), i,
                                          least(i + {_CHUNK_W} - 1, ntok)),
                               ' ') AS chunk_text,
               least(i + {_CHUNK_W} - 1, ntok) - i + 1 AS n_chunk_tokens
        FROM starts
    """,
    "lm_score": """
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 length(text) - length(replace(text, ' ', '')) + 1 AS ntok
          FROM documents
        ), big AS (
          SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, ntok - 1)) AS i
                FROM d WHERE ntok >= 2)
        ), c2 AS (
          SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2
        ), c1 AS (
          SELECT w, count(*) AS c
          FROM (SELECT unnest(toks) AS w FROM d) GROUP BY w
        ), scored AS (
          SELECT b.doc_id, c2.c * 1000000 // c1.c AS cond_ppm
          FROM big b
          JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
          JOIN c1 ON c1.w = b.w1
        )
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum(cond_ppm) // count(*) AS BIGINT) AS lm_score_ppm
        FROM scored GROUP BY doc_id
        UNION ALL
        SELECT doc_id, 0 AS n_bigrams, CAST(0 AS BIGINT) AS lm_score_ppm
        FROM d WHERE ntok < 2
    """,
    "bpe_pair_counts": """
    WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
    pairs AS (
      -- ts[1:-2] = all but last, ts[2:-1] = all but first (DuckDB slicing)
      SELECT unnest(list_zip(ts[1:-2], ts[2:-1])) AS pr
      FROM toks WHERE len(ts) >= 2
    )
    SELECT pr[1] AS tok_a, pr[2] AS tok_b, CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY 1, 2
    ORDER BY n DESC, tok_a, tok_b LIMIT 30
""",
    "fuzzy_name_pairs": """
    SELECT a.c_nationkey, a.c_custkey AS key_a, b.c_custkey AS key_b
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY 1, 2, 3
""",
    "dup_span_stats": """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(range(1, len(ts) - 2)) AS pos,
             unnest(list_zip(ts[1:-4], ts[2:-3], ts[3:-2], ts[4:-1])) AS g
      FROM toks WHERE len(ts) >= 4
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    cov AS (
      SELECT DISTINCT doc_id, unnest(range(pos, pos + 4)) AS p
      FROM grams JOIN dup USING (g)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_tokens
    FROM cov GROUP BY doc_id ORDER BY doc_id
""",
    "sparse_cosine_pairs": """
    WITH tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      WHERE tok <> '' GROUP BY 1, 2
    ),
    keep AS (SELECT tok FROM tf GROUP BY tok HAVING count(*) <= 32),
    t2 AS (SELECT tf.* FROM tf JOIN keep USING (tok)),
    dot AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.c * b.c) AS dot
      FROM t2 a JOIN t2 b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    norm AS (SELECT doc_id, sum(c * c) AS n2 FROM t2 GROUP BY 1)
    SELECT doc_a, doc_b,
           CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
             AS sim
    FROM dot
    JOIN norm na ON dot.doc_a = na.doc_id
    JOIN norm nb ON dot.doc_b = nb.doc_id
    WHERE CAST(dot AS DOUBLE)
            / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
          >= 0.2
    ORDER BY doc_a, doc_b
""",
    "dup_span_strip": """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(range(1, len(ts) - 2)) AS pos,
             unnest(list_zip(ts[1:-4], ts[2:-3], ts[3:-2], ts[4:-1])) AS g
      FROM toks WHERE len(ts) >= 4
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    cov AS (
      SELECT doc_id, list(DISTINCT p) AS cps
      FROM (SELECT DISTINCT doc_id, unnest(range(pos, pos + 4)) AS p
            FROM grams JOIN dup USING (g))
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           CASE WHEN cov.cps IS NULL THEN array_to_string(t.ts, ' ')
                -- array_to_string([]) is NULL in DuckDB; a fully-stripped
                -- doc is the empty string
                ELSE coalesce(array_to_string(
                    list_filter(t.ts, (x, i) -> NOT list_contains(cov.cps, i)),
                    ' '), '') END AS text
    FROM toks t LEFT JOIN cov USING (doc_id)
    ORDER BY t.doc_id
""",
    "pmi_bigrams": """
    WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
    uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(ts) AS tok FROM toks) GROUP BY 1
    ),
    tot AS (SELECT sum(c) AS t FROM uni),
    pairs AS (
      SELECT unnest(list_zip(ts[1:-2], ts[2:-1])) AS pr
      FROM toks WHERE len(ts) >= 2
    ),
    bi AS (SELECT pr[1] AS a, pr[2] AS b, CAST(count(*) AS BIGINT) AS c
           FROM pairs GROUP BY 1, 2),
    btot AS (SELECT sum(c) AS bsum FROM bi)
    SELECT a AS tok_a, b AS tok_b, bi.c AS n,
           CAST(bi.c * t * t AS DOUBLE)
             / CAST(bsum * ua.c * ub.c AS DOUBLE) AS pmi_ratio
    FROM bi, tot, btot
    JOIN uni ua ON ua.tok = a
    JOIN uni ub ON ub.tok = b
    WHERE bi.c >= 5
    ORDER BY pmi_ratio DESC, tok_a, tok_b LIMIT 20
""",
}
