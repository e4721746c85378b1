"""Lake retention / compaction (reference A8 ``free_space`` + backup GC).

The reference evicts the oldest ``(1 - keep_ratio)`` fraction of rows by its
wall-clock ``updated_time`` audit column with a global ``ORDER BY … LIMIT``
delete (``src/repositories/sqlite/base.py:210-227``). Here eviction is
deterministic (event-time ``(warc_ts, seq, url)`` — never wall-clock; ``url``
is the unique tie-break so snapshot tie-blocks that share one
``(warc_ts, seq=-1)`` version cannot be over-evicted) and exact: exactly
``floor(n * (1 - keep_ratio))`` rows are removed.

The eviction cutoff is found by **distributed k-th-element selection** — the
driver never materializes the version column (the old implementation read
``(warc_ts, seq)`` for every lake row, i.e. 160 GB at 10^10 rows):

  1. round 1 (one task per partition): sort the partition's version triples,
     emit every ``stride``-th triple with its exact local rank plus the
     partition row count — ``O(sqrt(N·P))`` driver rows total, independent
     of N·payload;
  2. the driver merges the rank summaries into guaranteed lower/upper rank
     bounds and brackets the k-th triple in a window ``[lo, hi]`` of at most
     ``~2·P·stride = O(sqrt(N·P))`` rows;
  3. round 2 (one task per partition): exact count of rows below ``lo`` plus
     the window rows — the driver sorts the small window and reads off the
     exact k-th triple;
  4. each partition file is rewritten keeping triples strictly greater than
     the cutoff (a map over partitions — no shuffle, keys never move);
  5. new manifest committed atomically; superseded files removed by
     ``gc_uncommitted``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ethereum_etl_ray.functions.hashing import content_checksum
from ethereum_etl_ray.state.manifest import (
    Manifest,
    PartitionEntry,
    atomic_write_table,
    commit_manifest,
    load_manifest,
)

_KEY_COLS = ["warc_ts", "seq", "url"]
_SORT_KEYS = [(c, "ascending") for c in _KEY_COLS]


def _triple_lt(t: pa.Table, bound: tuple, *, strict: bool) -> pa.ChunkedArray:
    """Vectorized lexicographic compare of ``(warc_ts, seq, url)`` columns
    against a scalar triple: ``< bound`` (strict) or ``<= bound``."""
    ts, seq, url = t.column("warc_ts"), t.column("seq"), t.column("url")
    b_ts = pa.scalar(bound[0], pa.timestamp("us"))
    b_seq, b_url = pa.scalar(int(bound[1])), pa.scalar(str(bound[2]))
    url_cmp = pc.less(url, b_url) if strict else pc.less_equal(url, b_url)
    return pc.or_(
        pc.less(ts, b_ts),
        pc.and_(pc.equal(ts, b_ts),
                pc.or_(pc.less(seq, b_seq),
                       pc.and_(pc.equal(seq, b_seq), url_cmp))),
    )


def _summaries(out_dir: str, entries: list, stride: int) -> pd.DataFrame:
    """Round 1: per-partition sorted version triples at ``stride`` intervals
    with exact local ranks. Driver receives O(N/stride) slim rows."""
    lookup = dict(entries)

    def summarize(batch: pa.Table) -> pa.Table:
        out = []
        for part in batch.column("part").to_pylist():
            entry = lookup[part]
            t = pq.read_table(os.path.join(out_dir, entry.file), columns=_KEY_COLS)
            n = t.num_rows
            if n == 0:
                continue
            t = t.sort_by(_SORT_KEYS)
            idx = np.arange(0, n, stride, dtype=np.int64)
            if idx[-1] != n - 1:
                idx = np.append(idx, n - 1)
            s = t.take(pa.array(idx))
            s = s.append_column("local_rank", pa.array(idx, pa.int64()))
            s = s.append_column("part", pa.array(np.full(len(idx), part), pa.int64()))
            s = s.append_column("part_rows", pa.array(np.full(len(idx), n), pa.int64()))
            out.append(s)
        if not out:
            return pa.table({c: pa.array([], typ) for c, typ in [
                ("warc_ts", pa.timestamp("us")), ("seq", pa.int64()),
                ("url", pa.string()), ("local_rank", pa.int64()),
                ("part", pa.int64()), ("part_rows", pa.int64())]})
        return pa.concat_tables(out, promote_options="none")

    return (
        ray.data.from_items([{"part": p} for p, _ in entries])
        .map_batches(summarize, batch_size=1, batch_format="pyarrow")
        .to_pandas()
        .sort_values(_KEY_COLS, kind="stable")
        .reset_index(drop=True)
    )


def _bracket(samples: pd.DataFrame, k: int, total_rows: int):
    """From rank summaries, derive ``(lo, hi)`` sample triples guaranteed to
    bracket the k-th smallest element (1-indexed)."""
    r = samples["local_rank"].to_numpy()
    # LB_strict(s_j) = Σ_p latest (local_rank+1) among samples before j —
    # a guaranteed lower bound on count_lt(s_j)
    prev_plus1 = samples.groupby("part")["local_rank"].shift().fillna(-1.0) + 1.0
    delta = (r + 1).astype(np.int64) - prev_plus1.to_numpy().astype(np.int64)
    lb_excl = np.concatenate([[0], np.cumsum(delta)[:-1]])
    # UB(s_j) = Σ_p (first local_rank at ≥ j, else part_rows) — a guaranteed
    # upper bound on count_lt(s_j)
    next_r = samples.groupby("part")["local_rank"].shift(-1)
    next_r = next_r.fillna(samples["part_rows"].astype(float)).to_numpy().astype(np.int64)
    dprime = r - next_r  # ≤ 0
    ub = total_rows + (np.cumsum(dprime[::-1])[::-1])
    lo_idx = np.flatnonzero(ub < k)
    lo_j = int(lo_idx[-1]) if len(lo_idx) else 0  # global min is always safe
    hi_idx = np.flatnonzero(lb_excl >= k)
    hi_j = int(hi_idx[0]) if len(hi_idx) else len(samples) - 1  # global max safe
    row_lo, row_hi = samples.iloc[lo_j], samples.iloc[hi_j]
    to_triple = lambda row: (row.warc_ts.to_datetime64(), int(row.seq), str(row.url))
    return to_triple(row_lo), to_triple(row_hi)


def _window_pass(out_dir: str, entries: list, lo: tuple, hi: tuple) -> pd.DataFrame:
    """Round 2: exact per-partition count of triples < lo, plus all triples in
    ``[lo, hi]`` (the bounded uncertainty window)."""
    lookup = dict(entries)

    def scan(batch: pa.Table) -> pa.Table:
        out = []
        for part in batch.column("part").to_pylist():
            entry = lookup[part]
            t = pq.read_table(os.path.join(out_dir, entry.file), columns=_KEY_COLS)
            if t.num_rows == 0:
                continue
            below = _triple_lt(t, lo, strict=True)
            n_below = pc.sum(pc.cast(below, pa.int64())).as_py() or 0
            in_win = pc.and_(pc.invert(below), _triple_lt(t, hi, strict=False))
            w = t.filter(in_win)
            w = w.append_column("n_below", pa.array(
                np.full(w.num_rows, n_below), pa.int64()))
            if w.num_rows == 0:  # still need the below-count row
                w = pa.table({"warc_ts": pa.array([None], pa.timestamp("us")),
                              "seq": pa.array([None], pa.int64()),
                              "url": pa.array([None], pa.string()),
                              "n_below": pa.array([n_below], pa.int64())})
            else:
                # n_below repeated per row; driver takes first() per partition
                pass
            w = w.append_column("part", pa.array(
                np.full(w.num_rows, part), pa.int64()))
            out.append(w)
        if not out:
            return pa.table({"warc_ts": pa.array([], pa.timestamp("us")),
                             "seq": pa.array([], pa.int64()),
                             "url": pa.array([], pa.string()),
                             "n_below": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        return pa.concat_tables(out, promote_options="none")

    return (
        ray.data.from_items([{"part": p} for p, _ in entries])
        .map_batches(scan, batch_size=1, batch_format="pyarrow")
        .to_pandas()
    )


def _cutoff_version(out_dir: str, manifest: Manifest, keep_ratio: float):
    """Exact k-th smallest ``(warc_ts, seq, url)`` with k = floor(n·(1-keep)),
    via two partition-parallel rounds; driver memory O(sqrt(N·P))."""
    entries = [(int(p), e) for p, e in manifest.partitions.items() if e.rows > 0]
    if not entries:
        return None
    total = sum(e.rows for _, e in entries)
    n_evict = int(np.floor(total * (1.0 - keep_ratio)))
    if n_evict <= 0:
        return None
    stride = int(np.clip(np.sqrt(total / max(1, len(entries))), 1, 8192))
    samples = _summaries(out_dir, entries, stride)
    if samples.empty:
        return None
    lo, hi = _bracket(samples, n_evict, total)
    win = _window_pass(out_dir, entries, lo, hi)
    n_below = int(win.groupby("part")["n_below"].first().sum())
    rows = win.dropna(subset=["url"]).sort_values(_KEY_COLS, kind="stable")
    pos = n_evict - n_below - 1
    assert 0 <= pos < len(rows), (
        f"selection window missed rank {n_evict} (below={n_below}, "
        f"window={len(rows)})")
    row = rows.iloc[pos]
    return row.warc_ts.to_datetime64(), int(row.seq), str(row.url)


def compact_lake(out_dir: str, row_group_rows: int = 65536,
                 cluster_by_url: bool = False) -> dict:
    """Lake compaction (reference backup/drop lifecycle,
    ``src/repositories/sqlite/base.py:81-136``): rewrite every live partition
    file with uniform row groups (tail windows append-merge with whatever
    row-group layout the write produced; scans prune at row-group granularity,
    so fragmented groups cost read amplification), then GC superseded files.
    Partition-parallel map — no shuffle, content unchanged (checksums must
    match the manifest; the checksum is order-independent by design, so
    re-ordering is content-preserving).

    ``cluster_by_url=True`` additionally sorts each partition file by url so
    its parquet row-group min/max statistics become disjoint url ranges —
    a ``lookup_urls`` point read then prunes to ONE row group instead of
    scanning every group of the hashed file (hash pruning picks the file,
    clustering prunes within it)."""
    from ethereum_etl_ray.state.manifest import (
        acquire_replay_lock,
        gc_uncommitted,
        release_replay_lock,
    )

    lock = acquire_replay_lock(out_dir)  # writer-exclusive with replay/GC
    try:
        # manifest snapshot taken UNDER the lock — loading it before acquire
        # would let a concurrent writer commit in between, and the rewrite
        # below would then clobber that writer's partitions with stale ones
        manifest = load_manifest(out_dir)
        if manifest is None:
            raise FileNotFoundError(f"no committed manifest in {out_dir}")
        from ethereum_etl_ray.pipelines.mor import require_no_deltas

        require_no_deltas(manifest, "compact_lake")
        return _compact_locked(out_dir, manifest, row_group_rows, gc_uncommitted,
                               cluster_by_url)
    finally:
        release_replay_lock(lock)


def _compact_locked(out_dir, manifest, row_group_rows, gc_uncommitted,
                    cluster_by_url=False) -> dict:
    wm = manifest.watermark
    entries = [(int(p), e) for p, e in manifest.partitions.items() if e.rows > 0]

    def rewrite(batch: pa.Table) -> pa.Table:
        out = []
        for part in batch.column("part").to_pylist():
            entry = dict(entries)[part]
            t = pq.read_table(os.path.join(out_dir, entry.file))
            # verify content BEFORE the rename lands anything on a path the
            # committed manifest may already reference (re-compaction at the
            # same watermark targets the live file)
            checksum = content_checksum(t.column("url"), t.column("text"),
                                        t.column("seq"))
            if str(checksum) != entry.checksum:
                raise RuntimeError(
                    f"compaction read of partition {part} does not match its "
                    f"manifest checksum — refusing to rewrite")
            if cluster_by_url:
                t = t.sort_by([("url", "ascending")])
            rel = os.path.join(f"part={part:05d}", f"data-{wm}-c.parquet")
            tmp = os.path.join(out_dir, rel) + f".tmp.{os.getpid()}"
            os.makedirs(os.path.dirname(tmp), exist_ok=True)
            pq.write_table(t, tmp, row_group_size=row_group_rows)
            os.replace(tmp, os.path.join(out_dir, rel))
            out.append({"part": part, "rows": t.num_rows, "file": rel,
                        "checksum": str(checksum)})
        return pa.Table.from_pylist(out)

    if not entries:
        return {"partitions_rewritten": 0, "gc_removed": len(gc_uncommitted(out_dir))}
    stats = (
        ray.data.from_items([{"part": p} for p, _ in entries])
        .map_batches(rewrite, batch_size=1, batch_format="pyarrow")
        .to_pandas()
    )
    for row in stats.itertuples(index=False):
        manifest.partitions[str(int(row.part))] = PartitionEntry(
            file=row.file, rows=int(row.rows), checksum=row.checksum, watermark=wm)
    commit_manifest(out_dir, manifest)
    removed = gc_uncommitted(out_dir)
    return {"partitions_rewritten": len(stats), "gc_removed": len(removed)}


def apply_retention(out_dir: str, keep_ratio: float = 0.9) -> dict:
    """Evict the oldest ``1-keep_ratio`` of lake rows (exactly
    ``floor(n·(1-keep_ratio))`` rows). Returns stats. Holds the lake's
    replay lock for the rewrite+commit (writer-exclusive with replay/GC)."""
    from ethereum_etl_ray.state.manifest import acquire_replay_lock, release_replay_lock

    lock = acquire_replay_lock(out_dir)
    try:
        # snapshot under the lock (see compact_lake) — a pre-lock load could
        # be stale by the time the lock is held
        manifest = load_manifest(out_dir)
        if manifest is None:
            raise FileNotFoundError(f"no committed manifest in {out_dir}")
        from ethereum_etl_ray.pipelines.mor import require_no_deltas

        require_no_deltas(manifest, "apply_retention")
        return _apply_retention_locked(out_dir, manifest, keep_ratio)
    finally:
        release_replay_lock(lock)


def _apply_retention_locked(out_dir: str, manifest, keep_ratio: float) -> dict:
    cutoff = _cutoff_version(out_dir, manifest, keep_ratio)
    if cutoff is None:
        return {"evicted": 0, "partitions_rewritten": 0}
    wm = manifest.watermark

    entries = [(int(p), e) for p, e in manifest.partitions.items() if e.rows > 0]

    def rewrite(batch: pa.Table) -> pa.Table:
        parts_out = []
        for part in batch.column("part").to_pylist():
            entry = dict(entries)[part]
            t = pq.read_table(os.path.join(out_dir, entry.file))
            keep = pc.invert(_triple_lt(t, cutoff, strict=False))
            kept = t.filter(keep)
            rel = os.path.join(f"part={part:05d}", f"data-{wm}-r{int(keep_ratio*100)}.parquet")
            atomic_write_table(kept, os.path.join(out_dir, rel))
            checksum = content_checksum(kept.column("url"), kept.column("text"),
                                        kept.column("seq"))
            parts_out.append({
                "part": part, "rows": kept.num_rows, "checksum": str(checksum),
                "file": rel, "evicted": t.num_rows - kept.num_rows,
            })
        return pa.Table.from_pylist(parts_out)

    stats = (
        ray.data.from_items([{"part": p} for p, _ in entries])
        .map_batches(rewrite, batch_size=1, batch_format="pyarrow")
        .to_pandas()
    )
    for row in stats.itertuples(index=False):
        manifest.partitions[str(int(row.part))] = PartitionEntry(
            file=row.file, rows=int(row.rows), checksum=row.checksum, watermark=wm)
    commit_manifest(out_dir, manifest)
    return {"evicted": int(stats.evicted.sum()),
            "partitions_rewritten": len(stats)}


# --------------------------------------------------------------------------
# predicate delete (the ALTER TABLE ... DELETE analogue)
# --------------------------------------------------------------------------

_DELETE_OPS = {
    "==": lambda col, v: pc.equal(col, v),
    "!=": lambda col, v: pc.not_equal(col, v),
    "<": lambda col, v: pc.less(col, v),
    "<=": lambda col, v: pc.less_equal(col, v),
    ">": lambda col, v: pc.greater(col, v),
    ">=": lambda col, v: pc.greater_equal(col, v),
    "in": lambda col, v: pc.is_in(col, value_set=pa.array(v)),
    "not in": lambda col, v: pc.invert(pc.is_in(col, value_set=pa.array(v))),
}


def delete_where(out_dir: str, column: str, op: str, value) -> dict:
    """Delete every lake row matching ``column <op> value`` — the engine's
    mutation-maintenance surface (the reference's ClickHouse/SQLite targets
    run these as ``ALTER TABLE ... DELETE`` / ``DELETE FROM``; cf. the A8
    retention DDL, SURVEY §2.3).

    Partition-parallel, no shuffle: each task reads one partition file,
    filters, and atomically rewrites it ONLY when it holds matches
    (match-free partitions keep their file and lineage checksum untouched).
    Commits a new manifest generation under the replay lock, so the
    pre-delete state stays restorable (``cli restore``) until its
    generation ages out. Null comparisons are never matches (Kleene
    semantics) — nulls survive every delete predicate.
    """
    import hashlib

    from ethereum_etl_ray.state.manifest import (
        acquire_replay_lock,
        gc_uncommitted,
        release_replay_lock,
    )

    if op not in _DELETE_OPS:
        raise ValueError(f"op must be one of {sorted(_DELETE_OPS)}, got {op!r}")
    lock = acquire_replay_lock(out_dir)
    try:
        manifest = load_manifest(out_dir)  # snapshot under the lock
        if manifest is None:
            raise FileNotFoundError(f"no committed manifest in {out_dir}")
        from ethereum_etl_ray.pipelines.mor import require_no_deltas

        require_no_deltas(manifest, "delete_where")
        wm = manifest.watermark
        tag = hashlib.sha1(f"{column}|{op}|{value!r}".encode()).hexdigest()[:8]
        entries = [(int(p), e) for p, e in manifest.partitions.items()
                   if e.rows > 0]
        if not entries:
            return {"deleted": 0, "partitions_rewritten": 0}

        def rewrite(batch: pa.Table) -> pa.Table:
            out = []
            for part in batch.column("part").to_pylist():
                entry = dict(entries)[part]
                t = pq.read_table(os.path.join(out_dir, entry.file))
                match = pc.fill_null(
                    _DELETE_OPS[op](t.column(column), value), False)
                n_match = pc.sum(pc.cast(match, pa.int64())).as_py() or 0
                if n_match == 0:
                    out.append({"part": part, "rows": t.num_rows,
                                "checksum": entry.checksum, "file": entry.file,
                                "deleted": 0})
                    continue
                kept = t.filter(pc.invert(match))
                rel = os.path.join(f"part={part:05d}",
                                   f"data-{wm}-d{tag}.parquet")
                atomic_write_table(kept, os.path.join(out_dir, rel))
                checksum = content_checksum(kept.column("url"),
                                            kept.column("text"),
                                            kept.column("seq"))
                out.append({"part": part, "rows": kept.num_rows,
                            "checksum": str(checksum), "file": rel,
                            "deleted": n_match})
            return pa.Table.from_pylist(out)

        stats = (ray.data.from_items([{"part": p} for p, _ in entries])
                 .map_batches(rewrite, batch_size=1, batch_format="pyarrow")
                 .to_pandas())
        for row in stats.itertuples(index=False):
            manifest.partitions[str(int(row.part))] = PartitionEntry(
                file=row.file, rows=int(row.rows), checksum=row.checksum,
                watermark=wm)
        commit_manifest(out_dir, manifest)
        removed = gc_uncommitted(out_dir)
        return {"deleted": int(stats.deleted.sum()),
                "partitions_rewritten": int((stats.deleted > 0).sum()),
                "gc_removed": len(removed)}
    finally:
        release_replay_lock(lock)


def fsck_lake(out_dir: str, generation: int | None = None) -> dict:
    """Integrity scrub: re-read every manifest-listed partition file and
    verify (rows, content checksum) against the committed lineage — the
    operational `fsck` a lake on shared storage needs after a storage
    incident (the reference's nearest analogue is its `inspect` eyeballing,
    src/repositories/sqlite/base.py:26-52; this is the mechanised version).

    Partition-parallel, read-only (no lock needed: atomic manifest loads and
    immutable committed files). With ``generation=`` scrubs a retained
    time-travel generation instead of the live pointer. Returns
    ``{"checked": N, "corrupt": [...]}" — corrupt entries carry the
    partition, file, expected/actual rows and checksums.
    """
    from ethereum_etl_ray.state.manifest import manifest_at

    manifest = (manifest_at(out_dir, generation) if generation is not None
                else load_manifest(out_dir))
    if manifest is None:
        raise FileNotFoundError(f"no committed manifest in {out_dir}")
    # scrub units: base partition files plus any pending merge-on-read delta
    # files — each carries the same (rows, content checksum) lineage
    entries = [(int(p), e) for p, e in manifest.partitions.items() if e.rows > 0]
    entries += [(int(p), d) for p, ds in manifest.deltas.items()
                for d in ds if d.rows > 0]
    if not entries:
        return {"checked": 0, "corrupt": []}
    by_idx = dict(enumerate(entries))

    def scrub(batch: pa.Table) -> pa.Table:
        out = []
        for i in batch.column("i").to_pylist():
            part, entry = by_idx[i]
            path = os.path.join(out_dir, entry.file)
            try:
                t = pq.read_table(path)
                checksum = str(content_checksum(
                    t.column("url"), t.column("text"), t.column("seq")))
                rows = t.num_rows
            except Exception as exc:  # unreadable file is corrupt, not fatal
                checksum, rows = f"<unreadable: {exc}>", -1
            out.append({"part": part, "file": entry.file,
                        "rows_expected": entry.rows, "rows_actual": rows,
                        "checksum_expected": entry.checksum,
                        "checksum_actual": checksum,
                        "ok": rows == entry.rows and checksum == entry.checksum})
        return pa.Table.from_pylist(out)

    stats = (ray.data.from_items([{"i": i} for i in by_idx])
             .map_batches(scrub, batch_size=1, batch_format="pyarrow")
             .to_pandas())
    corrupt = stats[~stats.ok].drop(columns="ok").to_dict("records")
    return {"checked": len(stats), "corrupt": corrupt}
