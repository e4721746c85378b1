"""Deduplication primitives: shingles, MinHash, SimHash, Jaccard.

First-class training-data operators (not present in the reference — its only
dedup is exact ``set()`` distinct and PK upsert, SURVEY §2.3/§2.8). All
per-batch kernels are numpy-vectorized over a flattened token stream; the
distributed compositions live in ``pipelines.queries`` / ``stages``:

  exact      : content-hash → hash-partition → first-per-group
  MinHash-LSH: per-batch signatures → explode (band, band_hash, doc_id)
               → groupby bands → candidate pairs → exact-Jaccard verify
  SimHash    : 64-bit signature → 4×16-bit band blocking → Hamming ≤ k verify
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ethereum_etl_ray.functions.hashing import hash64

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def tokenize_column(text) -> tuple[np.ndarray, np.ndarray]:
    """text column → (flat token hash64 array, per-doc token counts)."""
    toks = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    h = hash64(flat) if len(flat) else np.array([], dtype=np.uint64)
    return h, np.asarray([0 if x is None else x for x in lens], dtype=np.int64)


def word_ngram_hashes(tok_hashes: np.ndarray, lens: np.ndarray, n: int = 3
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc word n-gram (shingle) hashes from the flat token-hash stream.

    Combines n consecutive token hashes with distinct odd multipliers —
    order-sensitive, so "a b c" ≠ "c b a". Returns (flat shingle hashes,
    per-doc shingle counts). Docs shorter than n get one whole-doc shingle.
    """
    mults = (np.arange(1, n + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    out_chunks, counts = [], np.empty(len(lens), dtype=np.int64)
    pos = 0
    for i, ln in enumerate(lens):
        hd = tok_hashes[pos:pos + ln]
        pos += ln
        if ln >= n:
            win = np.lib.stride_tricks.sliding_window_view(hd, n)
            sh = (win * mults).sum(axis=1, dtype=np.uint64)
        elif ln > 0:
            sh = (hd * mults[:ln]).sum(dtype=np.uint64)[None]
        else:
            sh = np.zeros(1, dtype=np.uint64)
        out_chunks.append(sh)
        counts[i] = len(sh)
    return (np.concatenate(out_chunks) if out_chunks else np.array([], dtype=np.uint64)), counts


def minhash_signatures(shingles: np.ndarray, counts: np.ndarray, num_perm: int = 128,
                       seed: int = 7) -> np.ndarray:
    """(n_docs × num_perm) MinHash signature matrix.

    One broadcasted multiply-add over the whole batch's shingle stream, then
    per-doc segmented min via ``np.minimum.reduceat`` — no per-shingle loop.
    The permutation family is ``mix(a·x + b mod 2^64)`` (odd ``a`` ⇒ a
    bijection, xorshift mix to decorrelate high bits): uniform like the
    Mersenne universal hash but without 32M vectorized uint64 divisions
    (measured 15.5 s → ~1 s for 5k docs × 128 perms).
    """
    a, b = _perm_params(num_perm, seed)
    a = a | np.uint64(1)  # odd multiplier ⇒ bijection mod 2^64
    n_docs = len(counts)
    if len(shingles) == 0:
        return np.full((n_docs, num_perm), _MERSENNE, dtype=np.uint64)
    sigs = np.empty((n_docs, num_perm), dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    nonempty = counts > 0
    for lo in range(0, num_perm, 32):
        hi = min(lo + 32, num_perm)
        hm = shingles[:, None] * a[lo:hi] + b[lo:hi]  # wraps mod 2^64
        hm ^= hm >> np.uint64(29)
        seg = np.minimum.reduceat(hm, starts[nonempty], axis=0)
        sigs[nonempty, lo:hi] = seg
        sigs[~nonempty, lo:hi] = _MERSENNE
    return sigs


def lsh_band_hashes(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """(n_docs × bands) band bucket hashes (rows = num_perm // bands)."""
    n_docs, num_perm = sigs.shape
    rows = num_perm // bands
    view = sigs[:, : bands * rows].reshape(n_docs, bands, rows)
    mix = (np.arange(1, rows + 1, dtype=np.uint64) * np.uint64(0xBF58476D1CE4E5B9)) | np.uint64(1)
    return (view * mix).sum(axis=2, dtype=np.uint64)


def simhash_signatures(tok_hashes: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc: sign of per-bit ±1 vote sums over token hashes."""
    n_docs = len(lens)
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(tok_hashes) == 0:
        return out
    bits = ((tok_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.int32) * 2 - 1  # (n_tokens, 64) in {-1, +1}
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    nonempty = lens > 0
    votes = np.add.reduceat(bits, starts[nonempty], axis=0)
    sig_bits = (votes > 0).astype(np.uint64)
    out[nonempty] = (sig_bits << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of the per-element xor (8 bytes per uint64)."""
    x = np.ascontiguousarray(np.bitwise_xor(a, b))
    if len(x) == 0:
        return np.array([], dtype=np.int64)
    return np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1) \
        .astype(np.int64)


def jaccard(set_a: set, set_b: set) -> float:
    if not set_a and not set_b:
        return 1.0
    inter = len(set_a & set_b)
    return inter / (len(set_a) + len(set_b) - inter)
