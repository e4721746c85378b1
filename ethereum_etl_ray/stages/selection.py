"""Distributed order statistics: exact k-th smallest row of a Dataset.

The generic form of the lake-retention cutoff search
(``pipelines/retention.py`` — there the per-partition files give exact local
ranks; here any Dataset does, per batch):

  round 1  map_batches: sort the batch on ``cols``, emit every ``stride``-th
           row with its exact local rank and the batch row count —
           O(N / stride) driver rows;
  driver   merge the rank summaries into guaranteed lower/upper rank bounds
           and bracket the k-th element in a window ``[lo, hi]`` of at most
           ``~2 · #batches · stride`` rows;
  round 2  map_batches: exact count of rows < lo plus the window rows; the
           driver sorts the window and reads off the exact k-th tuple.

Replaces ``ds.sort(...).limit(...)`` / threshold selections where the sort's
all-to-all moves the whole table just to locate a boundary: here only rank
summaries and the bounded window move. For an exact row count downstream,
include a unique column in ``cols`` (cf. retention's url tie-break) —
otherwise rows equal to the returned tuple tie.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_TAG = "__batch_tag"


def lex_lt(t: pa.Table, cols: list[str], bound: tuple, *, strict: bool):
    """Vectorized lexicographic ``row < bound`` (``<=`` when not strict)
    over ``cols``; built right-to-left as lt_i OR (eq_i AND tail)."""
    last = len(cols) - 1
    col = t.column(cols[last])
    b = pa.scalar(bound[last], col.type)
    acc = pc.less(col, b) if strict else pc.less_equal(col, b)
    for i in range(last - 1, -1, -1):
        col = t.column(cols[i])
        b = pa.scalar(bound[i], col.type)
        acc = pc.or_(pc.less(col, b), pc.and_(pc.equal(col, b), acc))
    return acc


def kth_smallest(ds: ray.data.Dataset, cols: list[str], k: int,
                 sample_per_batch: int = 1024) -> tuple:
    """Exact k-th smallest (1-indexed) tuple of ``cols`` in ``ds``.

    ``cols`` must be null-free (raises otherwise): Arrow's ``sort_by`` ranks
    null rows last while the round-2 ``lex_lt`` comparisons yield null for
    them, so nulls would be counted in local ranks but excluded from the
    below-count/window — a k near the top would then miss its window or
    shift the cutoff. Ties across rows also shift counts: include a unique
    tie-break column for an exact boundary (see module docstring)."""
    return kth_smallest_multi(ds, cols, [k],
                              sample_per_batch=sample_per_batch)[0]


def kth_smallest_multi(ds: ray.data.Dataset, cols: list[str], ks: list[int],
                       sample_per_batch: int = 1024) -> list[tuple]:
    """Exact k-th smallest tuples for SEVERAL ranks in two shared passes —
    one sampling pass brackets every rank at once, one window pass filters
    the union of the brackets (e.g. all NTILE boundaries in one sweep
    instead of 2 passes per boundary). Same null-free / unique-tie-break
    contract as ``kth_smallest``."""
    if not ks:
        return []
    if any(k < 1 for k in ks):
        raise ValueError("k is 1-indexed and must be >= 1")
    sub = ds.select_columns(cols)
    keys = [(c, "ascending") for c in cols]

    def summarize(t: pa.Table) -> pa.Table:
        import uuid

        for c in cols:
            if t.column(c).null_count:
                raise ValueError(
                    f"kth_smallest: column {c!r} contains nulls — ranking "
                    "with nulls is ill-defined (local ranks would count "
                    "them, lex_lt comparisons would not); filter them out "
                    "or choose null-free sort columns")
        n = t.num_rows
        if n == 0:
            s = t.slice(0, 0)
            s = s.append_column("local_rank", pa.array([], pa.int64()))
            s = s.append_column("batch_rows", pa.array([], pa.int64()))
            return s.append_column(_TAG, pa.array([], pa.string()))
        t = t.sort_by(keys)
        stride = max(1, n // sample_per_batch)
        idx = np.arange(0, n, stride, dtype=np.int64)
        if idx[-1] != n - 1:
            idx = np.append(idx, n - 1)
        s = t.take(pa.array(idx))
        s = s.append_column("local_rank", pa.array(idx, pa.int64()))
        s = s.append_column("batch_rows", pa.array(np.full(len(idx), n), pa.int64()))
        # the tag is assigned INSIDE the task: downstream block re-chunking
        # must never merge two batches' rank sequences into one group
        tag = uuid.uuid4().hex
        return s.append_column(_TAG, pa.array([tag] * len(idx), pa.string()))

    samples = (sub.map_batches(summarize, batch_format="pyarrow")
               .to_pandas())  # O(N / stride) rows by construction
    if samples.empty:
        raise ValueError("k out of range for an empty dataset")
    total = int(samples.groupby(_TAG)["batch_rows"].first().sum())
    for k in ks:
        if not (1 <= k <= total):
            raise ValueError(f"k={k} out of range for {total} rows")
    samples = samples.sort_values(cols, kind="stable").reset_index(drop=True)

    # guaranteed rank bounds from exact local ranks (see retention._bracket)
    r = samples["local_rank"].to_numpy()
    prev_plus1 = samples.groupby(_TAG)["local_rank"].shift().fillna(-1.0) + 1.0
    delta = (r + 1).astype(np.int64) - prev_plus1.to_numpy().astype(np.int64)
    lb_excl = np.concatenate([[0], np.cumsum(delta)[:-1]])
    next_r = samples.groupby(_TAG)["local_rank"].shift(-1)
    next_r = next_r.fillna(samples["batch_rows"].astype(float)).to_numpy().astype(np.int64)
    ub = total + np.cumsum((r - next_r)[::-1])[::-1]
    bounds = []
    for k in ks:
        lo_idx = np.flatnonzero(ub < k)
        lo_j = int(lo_idx[-1]) if len(lo_idx) else 0   # global min always safe
        hi_idx = np.flatnonzero(lb_excl >= k)
        hi_j = int(hi_idx[0]) if len(hi_idx) else len(samples) - 1
        bounds.append((tuple(samples.iloc[lo_j][c] for c in cols),
                       tuple(samples.iloc[hi_j][c] for c in cols)))

    def window(t: pa.Table) -> pa.Table:
        belows = [lex_lt(t, cols, lo, strict=True) for lo, _ in bounds]
        nb_vals = [pc.sum(pc.cast(b, pa.int64())).as_py() or 0 for b in belows]
        keep = None
        for b, (_, hi) in zip(belows, bounds):
            m = pc.and_(pc.invert(b), lex_lt(t, cols, hi, strict=False))
            keep = m if keep is None else pc.or_(keep, m)
        w = t.filter(keep)
        rows = max(w.num_rows, 1)
        cols_out = ({c: w.column(c) for c in cols} if w.num_rows
                    else {c: pa.array([None], t.column(c).type) for c in cols})
        for i, nbv in enumerate(nb_vals):
            nb = np.zeros(rows, dtype=np.int64)
            nb[0] = nbv  # batch's below-count rides on its first row
            cols_out[f"__n_below_{i}"] = pa.array(nb, pa.int64())
        return pa.table(cols_out)

    win = sub.map_batches(window, batch_format="pyarrow").to_pandas()
    rows_all = win.dropna(subset=[cols[0]]).sort_values(cols, kind="stable")
    wt = pa.Table.from_pandas(rows_all[cols], preserve_index=False)
    out = []
    for i, (k, (lo, hi)) in enumerate(zip(ks, bounds)):
        n_below = int(win[f"__n_below_{i}"].sum())
        if wt.num_rows:
            m = pc.and_(pc.invert(lex_lt(wt, cols, lo, strict=True)),
                        lex_lt(wt, cols, hi, strict=False))
            rows = rows_all[m.to_numpy(zero_copy_only=False)]
        else:
            rows = rows_all
        pos = k - n_below - 1
        assert 0 <= pos < len(rows), (
            f"selection window missed rank {k} (below={n_below}, "
            f"window={len(rows)})")
        out.append(tuple(rows.iloc[pos][c] for c in cols))
    return out


# ---------------------------------------------------------------------------
# Deterministic token-budget prefix take — "sample documents in a stable
# pseudo-random order until the corpus hits N tokens", the budgeted-subset
# operator of a training-data pipeline. Priority order is the md5 hex of the
# id (engine-independent, partitioning-independent; equals DuckDB's
# ORDER BY md5(CAST(id AS VARCHAR))). Distributed as iteratively-refined
# range selection over the digest prefix — no global sort:
#
#   per level  map_batches: per-batch weight histogram over the next digest
#              byte among docs matching the chosen prefix — O(256) numbers
#              per batch to the driver; a prefix sum marks bins strictly
#              below the crossing byte fully IN and extends the prefix by
#              that byte. Each level shrinks the boundary bin ~256×; the
#              loop stops once it holds ≤ ``max_boundary_rows`` rows
#              (one level covers ~10^9 docs, two ~10^11, ...).
#   collect    (id, digest, weight) for the final boundary bin only; sort
#              locally, cut at the remaining budget;
#   apply      fused filter: digest-prefix < chosen prefix (vectorized
#              lexicographic compare), or id ∈ broadcast boundary set.


def _digest_mat(ids: np.ndarray) -> np.ndarray:
    """(n, 32) uint8 matrix of md5 hex characters per id. The hashlib loop
    is C-dominated; everything downstream is vectorized numpy."""
    import hashlib

    if not len(ids):
        return np.empty((0, 32), np.uint8)
    hexes = "".join(hashlib.md5(str(i).encode()).hexdigest() for i in ids)
    return np.frombuffer(hexes.encode(), np.uint8).reshape(-1, 32)


def _nibble(mat: np.ndarray, pos: int) -> np.ndarray:
    c = mat[:, pos].astype(np.int64)
    return c - 48 - (c >= 97) * 39  # '0'-'9' → 0-9, 'a'-'f' → 10-15


def _prefix_eq(mat: np.ndarray, prefix: str) -> np.ndarray:
    if not prefix:
        return np.ones(len(mat), bool)
    p = np.frombuffer(prefix.encode(), np.uint8)
    return (mat[:, :len(p)] == p).all(axis=1)


def _prefix_lt(mat: np.ndarray, prefix: str) -> np.ndarray:
    """Vectorized lexicographic ``digest[:len(prefix)] < prefix``."""
    p = np.frombuffer(prefix.encode(), np.uint8)
    less = np.zeros(len(mat), bool)
    eq = np.ones(len(mat), bool)
    for j, pj in enumerate(p):
        c = mat[:, j]
        less |= eq & (c < pj)
        eq &= c == pj
    return less


def take_until_budget(ds: ray.data.Dataset, *, budget: int, weight_col: str,
                      id_col: str = "doc_id",
                      max_boundary_rows: int = 5_000_000,
                      max_depth: int = 4) -> ray.data.Dataset:
    """Largest prefix of ``ds`` in md5(``id_col``)-hex order whose cumulative
    ``weight_col`` is ≤ ``budget``. Ids must be unique (the priority order
    is total because md5 collisions are negligible). The boundary bin is
    refined one digest byte per level until it holds ≤ ``max_boundary_rows``
    rows, so the driver-resident set stays bounded at any corpus size
    (256^``max_depth`` × cap ≈ 2·10^16 docs at the defaults)."""
    prefix = ""
    spent = 0
    for _depth in range(max_depth):
        hex_off = len(prefix)

        def hist(t: pa.Table, _pfx=prefix, _off=hex_off) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            w = t.column(weight_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            mat = _digest_mat(ids)
            m = _prefix_eq(mat, _pfx)
            byte = _nibble(mat, _off) * 16 + _nibble(mat, _off + 1)
            sums = np.bincount(byte[m], weights=w[m],
                               minlength=256).astype(np.int64)
            counts = np.bincount(byte[m], minlength=256).astype(np.int64)
            return pa.table({"wsum": pa.array(sums), "n": pa.array(counts)})

        bins_w = np.zeros(256, np.int64)
        bins_n = np.zeros(256, np.int64)
        # summaries stream to the driver block-by-block (256 rows/batch); an
        # aggregate here would add an all-to-all (see replay's spill barrier)
        for b in ds.map_batches(hist, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            bins_w += _fold256(b, "wsum")
            bins_n += _fold256(b, "n")
        cum = np.cumsum(bins_w)
        full_below = int(np.searchsorted(cum, budget - spent, side="right"))
        if full_below >= 256:
            # only reachable at depth 0 (a deeper boundary bin strictly
            # exceeds the remaining budget by construction)
            return ds
        boundary = full_below
        spent += int(cum[boundary - 1]) if boundary > 0 else 0
        prefix = prefix + format(boundary, "02x")
        if bins_n[boundary] <= max_boundary_rows:
            break
    else:
        raise RuntimeError(
            f"take_until_budget: boundary bin still holds {bins_n[boundary]} "
            f"rows after {max_depth} refinement levels "
            f"(> {max_boundary_rows}); raise max_depth")
    remaining = budget - spent

    def boundary_rows(t: pa.Table, _pfx=prefix) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _digest_mat(ids)
        m = _prefix_eq(mat, _pfx)
        hexes = (mat[m].tobytes().decode()
                 if m.any() else "")
        return pa.table({
            "id": pa.array(ids[m]),
            "hex": pa.array([hexes[i * 32:(i + 1) * 32]
                             for i in range(int(m.sum()))], pa.string()),
            "w": pa.array(w[m]),
        })

    bdf = ds.map_batches(boundary_rows, batch_format="pyarrow").to_pandas()
    bdf = bdf.sort_values("hex", kind="stable")
    keep_mask = bdf.w.cumsum().to_numpy() <= remaining
    keep_ids = np.sort(bdf.id.to_numpy()[keep_mask])
    if not len(keep_ids) and not int(prefix, 16):
        # prefix all-zero and nothing kept in it: provably empty result —
        # return a schema-carrying empty Dataset (a filter-everything map
        # loses the schema on this Ray version: to_pandas of an all-empty
        # Dataset yields zero columns)
        s = ds.schema()  # Ray Schema wrapper, not a pyarrow.Schema
        empty = pa.schema(list(zip(s.names, s.types))).empty_table()
        return ray.data.from_arrow(empty)

    import ray as _ray

    keep_ref = _ray.put(keep_ids)  # broadcast once, read per task

    def apply(t: pa.Table, _pfx=prefix) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        mat = _digest_mat(ids)
        m = _prefix_lt(mat, _pfx) | np.isin(ids, _ray.get(keep_ref))
        return t.filter(pa.array(m))

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def _fold256(b: pa.Table, col: str) -> np.ndarray:
    """Sum a 256-bin summary block (row count a multiple of 256, bins
    cycling 0..255 in order) into one 256-bin array."""
    v = b.column(col).to_numpy(zero_copy_only=False)
    return v.reshape(-1, 256).sum(axis=0)


def weighted_sample_k(
    ds: ray.data.Dataset,
    *,
    k: int,
    weight_col: str,
    id_col: str,
    salt: str = "",
) -> "pd.DataFrame":
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-Res): every row gets priority ``ln(u) / w`` where ``u`` is a
    deterministic uniform derived from ``hash64(id, salt)`` — the k largest
    priorities are the sample, so inclusion probability scales with weight
    while the selection stays reproducible (same ids + salt → same sample,
    regardless of partitioning or cluster size, the engine's determinism
    discipline).

    Distributed as a partial top-k: each batch keeps only its local top-k
    priorities, the driver reduce sees ≤ k·#batches rows — no shuffle, no
    global sort (same shape as ``stages/topk.py``). Rows with weight ≤ 0 or
    null are excluded. Typical use: quality-weighted corpus mixing.
    """

    from ethereum_etl_ray.functions.hashing import hash64
    from ethereum_etl_ray.stages.topk import topk

    def prioritize(t: pa.Table) -> pa.Table:
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = hash64(np.char.add(ids.astype(str), f"\x00{salt}"))
        # u in (0, 1): offset by 0.5 so ln never sees 0
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        pri = np.log(u) / w
        ok = np.isfinite(pri) & (w > 0)
        return t.filter(pa.array(ok)).append_column(
            "__pri", pa.array(pri[ok], pa.float64()))

    scored = ds.map_batches(prioritize, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = topk(scored, ["__pri", id_col], k, descending=[True, False])
    return out.drop(columns="__pri").reset_index(drop=True)
