"""Deterministic vectorized hashing utilities.

Used for: hash-partitioning by key (the engine's analogue of the reference's
PRIMARY KEY identity, SURVEY §1.4), content checksums in the exactly-once
manifest, and dedup fingerprints. All hashes are process-independent
(fixed key — never Python's randomized ``hash``) so that a resumed or
re-executed task computes identical partitions/checksums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# fixed 16-byte siphash key → stable across processes and nodes
_HASH_KEY = "webcdc-dtrmnstc1"


def _to_object_ndarray(values) -> np.ndarray:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_numpy(zero_copy_only=False)
    return np.asarray(values, dtype=object)


def hash64(values) -> np.ndarray:
    """Vectorized 64-bit hash of a string array (arrow / numpy / list).

    Deterministic across processes (fixed siphash key); C-speed via
    ``pd.util.hash_array``.
    """
    arr = _to_object_ndarray(values)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def partition_ids(keys, num_partitions: int) -> np.ndarray:
    """Stable partition assignment: ``hash64(key) % P`` as int32."""
    return (hash64(keys) % np.uint64(num_partitions)).astype(np.int32)


def content_checksum(*columns) -> int:
    """Order-independent checksum of row contents.

    Sum of per-row hashes of the NUL-joined column values, mod 2**64.
    Order-independence makes the checksum insensitive to intra-partition row
    order, so a re-executed merge task reproduces it exactly.
    """
    if not columns:
        return 0
    parts = [_to_object_ndarray(c) for c in columns]
    n = len(parts[0])
    if n == 0:
        return 0
    joined = parts[0].astype(str)
    for p in parts[1:]:
        joined = np.char.add(np.char.add(joined.astype(str), "\x00"), p.astype(str))
    h = pd.util.hash_array(joined.astype(object), hash_key=_HASH_KEY, categorize=False)
    return int(h.sum(dtype=np.uint64))


def partition_ids_multi(columns: list, num_partitions: int) -> np.ndarray:
    """Stable partition assignment for a COMPOSITE key: per-column hash64
    values mixed with a fixed odd multiplier (same recipe as the count-min
    row derivation) — deterministic across processes, order-sensitive in
    the column list."""
    acc = hash64(columns[0])
    for c in columns[1:]:
        acc = acc * np.uint64(0x9E3779B97F4A7C15) + hash64(c)
    return (acc % np.uint64(num_partitions)).astype(np.int32)
