"""Mergeable Bloom filter (numpy bitset) — the scale substitute for broadcast
exact key sets.

Used where the engine broadcasts a membership set into ``map_batches`` (the
A1 anti-join heuristic, semi/anti joins, duplicate-event screens): an exact
``np.isin`` set works to ~10^7 keys; beyond that ship this filter instead —
same one-``ray.put`` broadcast shape, O(bits) memory, zero false negatives.

Deterministic (fixed hash key via functions.hashing) and mergeable (bitwise
OR), so per-batch partials can be built distributed and OR-ed on the driver.
"""

from __future__ import annotations

import math

import numpy as np

from ethereum_etl_ray.functions.hashing import hash64


class BloomFilter:
    __slots__ = ("n_bits", "n_hashes", "bits")

    def __init__(self, capacity: int, fp_rate: float = 0.01,
                 bits: np.ndarray | None = None):
        n_bits = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.n_bits = int(2 ** math.ceil(math.log2(n_bits)))  # power of 2 → fast mod
        self.n_hashes = max(1, round(self.n_bits / max(1, capacity) * math.log(2)))
        self.bits = bits if bits is not None else np.zeros(self.n_bits // 8, dtype=np.uint8)

    def _positions(self, keys) -> np.ndarray:
        h = hash64(keys)
        # double hashing: pos_i = h1 + i*h2 (Kirsch–Mitzenmacher)
        h2 = (h >> np.uint64(33)) | np.uint64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return ((h[None, :] + i * h2[None, :]) & np.uint64(self.n_bits - 1)).astype(np.int64)

    def add_many(self, keys) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_many(self, keys) -> np.ndarray:
        pos = self._positions(keys)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
        out = BloomFilter.__new__(BloomFilter)
        out.n_bits, out.n_hashes = self.n_bits, self.n_hashes
        out.bits = np.bitwise_or(self.bits, other.bits)
        return out

    def serialize(self) -> bytes:
        return (self.n_bits.to_bytes(8, "little")
                + self.n_hashes.to_bytes(2, "little") + self.bits.tobytes())

    @classmethod
    def deserialize(cls, raw: bytes, copy: bool = True) -> "BloomFilter":
        """``copy=False`` keeps the bitset zero-copy over ``raw`` (read-only:
        fine for ``contains_many``, not for ``add_many``) — used by per-batch
        membership filters that deserialize broadcast shards in the hot path."""
        out = cls.__new__(cls)
        out.n_bits = int.from_bytes(raw[:8], "little")
        out.n_hashes = int.from_bytes(raw[8:10], "little")
        bits = np.frombuffer(raw[10:], dtype=np.uint8)
        out.bits = bits.copy() if copy else bits
        return out
