"""stages/fuzzy.py: blocked edit-distance-1 join — planted cases + a
brute-force Levenshtein cross-check on a seeded random block."""

import numpy as np
import pyarrow as pa
import ray.data

from ethereum_etl_ray.stages.fuzzy import edit1_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _run(rows):
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "name": pa.array([r[1] for r in rows], pa.string()),
        "blk": pa.array([r[2] for r in rows], pa.int64()),
    }))
    out = edit1_pairs(ds, key_col="k", text_col="name", block_col="blk")
    df = out.to_pandas()
    if df.empty:  # fully-empty datasets lose their schema in to_pandas
        return set()
    return set(zip(df["key_a"], df["key_b"]))


def test_planted_cases():
    rows = [
        (1, "hello", 0), (2, "hellp", 0),    # substitution -> pair
        (3, "helloo", 0),                    # insertion vs 1 -> pair
        (4, "hell", 0),                      # deletion vs 1 -> pair
        (5, "help", 0),                      # distance 2 from hello -> no
        (6, "hello", 0),                     # exact dup of 1 -> pair (d=0)
        (7, "hello", 1),                     # other block -> never paired
        (8, "xyzzy", 0),                     # far from everything
    ]
    pairs = _run(rows)
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert (1, 4) in pairs
    assert (1, 6) in pairs
    assert (1, 5) not in pairs
    assert all(7 not in p for p in pairs)
    assert all(8 not in p for p in pairs)
    # hellp/helloo: lev 2 (sub + insert) -> excluded
    assert (2, 3) not in pairs


def test_matches_bruteforce_levenshtein():
    rng = np.random.default_rng(7)
    alphabet = list("ab")
    names = ["".join(rng.choice(alphabet, rng.integers(1, 5)))
             for _ in range(40)]
    rows = [(i, s, 0) for i, s in enumerate(names)]
    got = _run(rows)
    want = {(i, j) for i in range(len(names)) for j in range(i + 1, len(names))
            if _lev(names[i], names[j]) <= 1}
    assert got == want


def test_empty_and_singleton_blocks():
    pairs = _run([(1, "only", 0), (2, "", 1), (3, "x", 2)])
    assert pairs == set()


def test_non_ascii_counts_characters_not_bytes():
    """'café'→'cafe' is one substitution (lev 1) even though the UTF-8
    byte lengths differ; multi-byte substitutions count as one edit."""
    pairs = _run([(1, "café", 0), (2, "cafe", 0),
                  (3, "cafés", 0),              # one insertion vs 1
                  (4, "tea", 0)])               # far from everything
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert all(4 not in p for p in pairs)
