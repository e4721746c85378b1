"""Text-analysis operators for large-scale training-data pipelines.

The webtext counterparts of the reference's per-row extract projections
(``src/tasks/extract/*.py``): deterministic, vectorized per-batch transforms
over the ``documents`` corpus — language-ID, quality scoring, token counting,
fingerprinting.

Parity discipline: every operator that is paired with a DuckDB oracle uses
ONLY arithmetic whose result is bit-identical across engines —
  * token counts via the separator-count formula (no tokenizer ambiguity),
  * ratios in integer micro-units with floor division (never float ``round``,
    whose half-even vs half-away behavior differs between numpy and SQL),
  * fingerprints via md5 (same digest everywhere).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# language marker words (heuristic n-gram/keyword scoring; the corpus here is
# synthetic word-soup, so this demonstrates the *operator* — deterministic
# scoring + argmax with a stable tie-break — with a small marker table; real
# deployments plug in real per-language tables)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "die"],
    "en": ["the", "a", "of"],
    "es": ["el", "la", "que"],
    "fr": ["le", "et", "les"],
    "zh": ["he", "shi", "de0"],
}
STOPWORDS = ["the", "a", "of"]


def _occurrences(padded: pa.ChunkedArray | pa.Array, word: str):
    """# occurrences of ``word`` as a space-delimited token (int64)."""
    return pc.cast(pc.count_substring(padded, pattern=f" {word} "), pa.int64())


def _padded(text):
    return pc.binary_join_element_wise(" ", text, " ", "")


def token_count(text) -> pa.Array | pa.ChunkedArray:
    """n_tokens = (# separators) + 1 — exact parity with the SQL formula
    ``length(text) - length(replace(text, ' ', '')) + 1``."""
    return pc.add(pc.cast(pc.count_substring(text, pattern=" "), pa.int64()), 1)


def lang_scores_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds ``score_<lang>`` (marker-occurrence counts) and ``predicted_lang``
    (argmax, ties → alphabetically-first language)."""
    text = batch.column(text_col)
    padded = _padded(text)
    langs = sorted(LANG_MARKERS)
    scores = []
    for lang in langs:
        s = None
        for w in LANG_MARKERS[lang]:
            occ = _occurrences(padded, w)
            s = occ if s is None else pc.add(s, occ)
        scores.append(s)
        batch = batch.append_column(f"score_{lang}", s)
    mat = np.vstack([
        (s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s).to_numpy()
        for s in scores
    ])
    # argmax returns the first (alphabetically-lowest) max index → stable tie-break
    pred = np.array(langs, dtype=object)[np.argmax(mat, axis=0)]
    return batch.append_column("predicted_lang", pa.array(pred, pa.string()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer micro-unit quality features + composite score.

    stop_ppm  = stopword-token share in parts-per-million (floor)
    mtl_c     = mean token length in centi-chars (floor)
    quality_ppm = LEAST(n_tok,100)*10000 - stop_ppm//2 + mtl_c*10
    """
    text = batch.column(text_col)
    padded = _padded(text)
    n_tok = token_count(text)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    stop_hits = None
    for w in STOPWORDS:
        occ = _occurrences(padded, w)
        stop_hits = occ if stop_hits is None else pc.add(stop_hits, occ)
    nt = (n_tok.combine_chunks() if isinstance(n_tok, pa.ChunkedArray) else n_tok).to_numpy()
    nc = (n_chars.combine_chunks() if isinstance(n_chars, pa.ChunkedArray) else n_chars).to_numpy()
    sh = (stop_hits.combine_chunks() if isinstance(stop_hits, pa.ChunkedArray) else stop_hits).to_numpy()
    stop_ppm = (sh * 1_000_000) // nt
    mtl_c = ((nc - (nt - 1)) * 100) // nt
    quality_ppm = np.minimum(nt, 100) * 10_000 - stop_ppm // 2 + mtl_c * 10
    for name, arr in [("n_tokens", nt), ("n_chars_txt", nc), ("stop_ppm", stop_ppm),
                      ("mtl_c", mtl_c), ("quality_ppm", quality_ppm)]:
        batch = batch.append_column(name, pa.array(arr, pa.int64()))
    return batch


def rep_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Token-repetition quality features (Gopher-style repetition filters).

    Per document: n_tokens, n_distinct (distinct tokens), dup_ppm
    (= (n_tokens - n_distinct)*1e6 // n_tokens, the duplicate-token share)
    and top_tok_ppm (= most-frequent-token count *1e6 // n_tokens). High
    dup_ppm / top_tok_ppm marks boilerplate and keyword-stuffed pages for
    eviction before training.

    Vectorized across the whole batch: one split, one dictionary-encode, one
    ``np.unique`` over composite (doc, token-id) keys — no per-row loops.
    All outputs are integers (floor division) for exact SQL-oracle parity.
    """
    text = batch.column(text_col).combine_chunks()
    toks = pc.split_pattern(text, pattern=" ")
    def _ca(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    flat = _ca(pc.list_flatten(toks))
    parent = _ca(pc.list_parent_indices(toks)).to_numpy()
    n_tok = _ca(pc.list_value_length(toks)).to_numpy(zero_copy_only=False)
    n_tok = np.asarray(n_tok, dtype=np.int64)
    code = _ca(flat.dictionary_encode()).indices.to_numpy().astype(np.int64)
    vocab = int(code.max()) + 1 if len(code) else 1
    # composite key (doc, token) → counts; one pass gives both distinct counts
    # and the per-doc max token frequency
    key = parent * vocab + code
    uniq, counts = np.unique(key, return_counts=True)
    udoc = uniq // vocab
    n_rows = batch.num_rows
    n_distinct = np.bincount(udoc, minlength=n_rows).astype(np.int64)
    top = np.zeros(n_rows, dtype=np.int64)
    np.maximum.at(top, udoc, counts)
    dup_ppm = (n_tok - n_distinct) * 1_000_000 // np.maximum(n_tok, 1)
    top_ppm = top * 1_000_000 // np.maximum(n_tok, 1)
    for name, arr in [("n_tokens", n_tok), ("n_distinct", n_distinct),
                      ("dup_ppm", dup_ppm), ("top_tok_ppm", top_ppm)]:
        batch = batch.append_column(name, pa.array(arr, pa.int64()))
    return batch


def chunk_docs_batch(batch: pa.Table, window: int = 64, stride: int = 48,
                     text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Split each document's token stream into fixed-window chunks with
    overlap (the chunk-for-embedding / RAG-indexing step): chunk ``k`` covers
    tokens ``[k·stride, min(k·stride + window, n_tokens))`` for every
    ``k·stride < n_tokens`` — trailing chunks may be short, every token is
    covered, consecutive chunks overlap by ``window - stride`` tokens.

    Vectorized across the batch: one split, one fancy-gather (``take``) over
    the flat token array, one ``binary_join`` — no per-document Python. Rows
    multiply by ~n_tokens/stride; downstream batches stay bounded because
    map_batches re-blocks the output.
    """
    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    text = batch.column(text_col).combine_chunks()
    ids = batch.column(id_col)
    ids_np = (ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
              else ids).to_numpy()
    toks = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    lens = np.asarray(pc.list_value_length(toks).to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    n_chunks = -(-lens // stride)  # ceil; == #starts k·stride < n_tokens
    n_chunks = np.maximum(n_chunks, 1)  # empty text still yields one chunk
    doc_idx = np.repeat(np.arange(len(lens)), n_chunks)
    before = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
    k = np.arange(int(n_chunks.sum())) - np.repeat(before, n_chunks)
    start = k * stride
    end = np.minimum(start + window, lens[doc_idx])
    clen = np.maximum(end - start, 0)
    tok_before = np.concatenate(([0], np.cumsum(lens)[:-1]))
    # gather every chunk's tokens from the flat stream in one take
    total = int(clen.sum())
    inner = np.arange(total) - np.repeat(np.cumsum(clen) - clen, clen)
    gather = np.repeat(tok_before[doc_idx] + start, clen) + inner
    taken = flat.take(pa.array(gather, pa.int64()))
    offsets = np.concatenate(([0], np.cumsum(clen)))
    # binary_join has list<string> kernels only (not large_list/large_string);
    # int32 offsets bound one output batch's chunk text to <2 GiB — fine,
    # map_batches re-blocks and the default batch is far smaller
    if offsets[-1] >= np.iinfo(np.int32).max:
        raise ValueError("chunk output exceeds 2 GiB in one batch; "
                         "lower the map_batches batch_size")
    chunks = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                      pc.cast(taken, pa.string()))
    return pa.table({
        id_col: pa.array(ids_np[doc_idx], pa.int64()),
        "chunk_id": pa.array(k, pa.int64()),
        "chunk_text": pc.binary_join(chunks, " "),
        "n_chunk_tokens": pa.array(clen, pa.int64()),
    })


def md5_fingerprint_batch(batch: pa.Table, text_col: str = "text",
                          out_col: str = "fingerprint") -> pa.Table:
    """md5 hex fingerprint per document (matches SQL ``md5(text)``).

    The digest loop is C-dominated (hashlib); at 100 TB this stage is
    bandwidth-bound, not Python-bound."""
    text = batch.column(text_col).combine_chunks()
    fp = [hashlib.md5(t.encode()).hexdigest() if t is not None else None
          for t in text.to_pylist()]
    return batch.append_column(out_col, pa.array(fp, pa.string()))


def rolling_fingerprint_batch(batch: pa.Table, text_col: str = "text",
                              window: int = 16, out_col: str = "winnow_fp") -> pa.Table:
    """Winnowing-style document fingerprint: min-of-window over a polynomial
    rolling hash of the byte stream, xor-folded. Not SQL-expressible
    (rows-only driver check); tested against planted duplicates."""
    from ethereum_etl_ray.functions.hashing import hash64

    text = batch.column(text_col).combine_chunks()
    # batch-level vectorization: one hash64 call over all tokens of the batch,
    # then per-doc sliding-window mins via offsets (no per-token Python loop)
    toks = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    h = hash64(flat) if len(flat) else np.array([], dtype=np.uint64)
    out = np.empty(len(text), dtype=np.uint64)
    pos = 0
    for i, ln in enumerate(lens):
        if ln is None or ln == 0:
            out[i] = 0
            continue
        hd = h[pos:pos + ln]
        pos += ln
        mins = (np.lib.stride_tricks.sliding_window_view(hd, window).min(axis=1)
                if len(hd) >= window else hd)
        out[i] = np.bitwise_xor.reduce(mins)
    return batch.append_column(out_col, pa.array(out.view(np.int64), pa.int64()))


def compression_stats_batch(batch: pa.Table, text_col: str = "text",
                            level: int = 6) -> pa.Table:
    """Per-document zlib compression ratio — the classic repetition/boiler-
    plate quality signal (highly repetitive or templated text compresses far
    below natural prose; near-random noise compresses above it).

    Emits ``zlib_len`` and ``ratio_ppm = compressed/raw parts-per-million``
    (integer — no cross-engine float division). The per-row zlib calls are
    C-speed; the Python loop is only dispatch (acceptable: compression
    dominates). Not SQL-expressible — oracled in tests/test_textstats.py
    with planted repetitive vs high-entropy docs.
    """
    import zlib

    text = batch.column(text_col).combine_chunks()
    raw = text.cast(pa.binary())
    zlens = np.fromiter(
        (len(zlib.compress(raw[i].as_py() or b"", level))
         for i in range(len(raw))),
        dtype=np.int64, count=len(raw))
    rawlens = pc.binary_length(raw).to_numpy(zero_copy_only=False).astype(np.int64)
    ratio = np.where(rawlens > 0, zlens * 1_000_000 // np.maximum(rawlens, 1),
                     1_000_000)
    out = {c: batch.column(c) for c in batch.column_names}
    out["zlib_len"] = pa.array(zlens, pa.int64())
    out["ratio_ppm"] = pa.array(ratio, pa.int64())
    return pa.table(out)
