"""Merge-on-read delta ingest — the high-rate CDC write path.

The copy-on-write replay (``pipelines/replay.py``) rewrites every touched
partition file per window, so a small tail window over a large lake pays
O(touched partitions' full size) in read+extract+write. This module adds the
classic merge-on-read alternative (the Hudi-MOR / Iceberg-v2 shape of the
reference's ``INSERT OR REPLACE`` upsert, ``src/repositories/sqlite/base.py:
152-175``, amortised for streaming ingest):

  * ``ingest_delta``  — a window's per-key winners land as ONE small delta
    file per touched partition (tombstones kept as ``op='delete'`` rows);
    the base files are never read or rewritten. Per-window cost is
    O(window), not O(lake). Committed through the same atomic manifest
    machinery as replay (idempotent file names, all-or-nothing pointer
    flip), so crash/rerun reconverges and uncommitted deltas are invisible.
  * ``merged_lake``   — scan-time merge: partitions WITHOUT deltas stream
    straight from their base files (zero overhead); partitions WITH deltas
    get one merge task each (base ∪ deltas → LWW pick → drop tombstones),
    parallel across partitions with NO shuffle — files are already
    hash-partition-aligned by url.
  * ``compact_deltas`` — folds each partition's deltas into a new base file
    (same per-partition merge as replay) and clears the delta list; the
    amortisation knob (``cli tail --mor --compact-every N``).

Correctness stance: LWW/FWW winner-pick is commutative and associative over
the ``(warc_ts, seq)`` version, so ``merged_lake`` equals a full
copy-on-write replay of the same log — pinned byte-identical in
tests/test_mor.py. The ONE non-commutative step is copy-on-write's tombstone
drop: a COW replay over a delta-pending lake could drop a tombstone that
still has to shadow an older delta row at read time, silently resurrecting
the url. Base-rewriting writers (replay, retention, delete, compact,
replicate) therefore REFUSE while deltas are pending (``require_no_deltas``)
— ``compact_deltas`` first, by design.

Scale notes (100 TB): the delta write shuffles only the window (already
combined per batch, payload included — windows are small by definition; a
bulk bootstrap should use ``replay``); the merged read adds one task per
delta-pending partition whose input is that partition's base + deltas, and
read amplification is bounded by the compaction cadence. Nothing here
materialises on the driver beyond the O(partitions) summary rows.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ethereum_etl_ray.config import EngineConfig
from ethereum_etl_ray.functions.hashing import content_checksum
from ethereum_etl_ray.functions.html import extract_text_array
from ethereum_etl_ray.schemas import LATEST_EVENT_VERSION, PAGES_SCHEMA
from ethereum_etl_ray.stages.merge import (
    MERGE_SCHEMA,
    PART_COL,
    SUMMARY_SCHEMA,
    _merge_one_partition,
    events_to_merge_frame,
    lww_pick,
    make_combiner,
    make_partitioner,
    pages_to_merge_frame,
)
from ethereum_etl_ray.state.manifest import (
    DeltaEntry,
    Manifest,
    atomic_write_table,
    commit_manifest,
    load_manifest,
)

# delta file payload: PAGES columns (text already extracted — the extract
# cost is paid once at ingest, not on every merged read) plus the op so
# tombstones survive until compaction
DELTA_SCHEMA = pa.schema(list(PAGES_SCHEMA) + [pa.field("op", pa.string())])


def require_no_deltas(manifest: Manifest | None, operation: str) -> None:
    """Fail fast for base-rewriting writers on a delta-pending lake (see
    module docstring: COW's tombstone drop is not commutative with pending
    deltas)."""
    if manifest is not None and manifest.has_deltas():
        n = sum(len(v) for v in manifest.deltas.values())
        raise ValueError(
            f"{operation} requires a compacted lake but {n} merge-on-read "
            "delta file(s) are pending — run compact_deltas() "
            "(cli: compact --deltas) first")


def _finalize_delta(t: pa.Table) -> pa.Table:
    """Window winners (MERGE_SCHEMA) → DELTA_SCHEMA: extract text for live
    rows that still need it, KEEP tombstones, deterministic url order."""
    alive = pc.not_equal(t.column("op"), pa.scalar("delete"))
    need = pc.and_(pc.and_(alive, pc.is_null(t.column("text"))),
                   pc.is_valid(t.column("html")))
    if pc.any(need).as_py():
        idx = pc.indices_nonzero(need)
        extracted = extract_text_array(pc.take(t.column("html"), idx))
        text_np = t.column("text").combine_chunks().to_numpy(
            zero_copy_only=False).astype(object)
        if isinstance(extracted, pa.ChunkedArray):
            extracted = extracted.combine_chunks()
        text_np[idx.to_numpy()] = extracted.to_numpy(zero_copy_only=False)
        text = pa.array(text_np, pa.string())
    else:
        text = t.column("text")
    out = pa.table(
        {
            "url": t.column("url"),
            "warc_ts": t.column("warc_ts"),
            "html": t.column("html"),
            "text": text,
            "lang": t.column("lang"),
            "seq": t.column("seq"),
            "fetch_status": t.column("fetch_status"),
            "op": t.column("op"),
        },
        schema=DELTA_SCHEMA,
    )
    return out.sort_by([("url", "ascending")])


def delta_to_merge_frame(t: pa.Table) -> pa.Table:
    """Delta rows → MERGE_SCHEMA (op preserved — tombstones must keep
    shadowing through the compaction merge)."""
    return pa.table(
        {
            "url": t.column("url"),
            "warc_ts": t.column("warc_ts"),
            "seq": t.column("seq"),
            "op": t.column("op"),
            "html": t.column("html"),
            "lang": t.column("lang"),
            "text": t.column("text"),
            "fetch_status": t.column("fetch_status"),
        },
        schema=MERGE_SCHEMA,
    )


def _make_delta_apply(out_dir: str, watermark: int, mode: str):
    """Per-partition ``map_groups`` fn: window winners → one delta file.
    Idempotent under task retry / crash-rerun: the file name is derived from
    (partition, target watermark) and rewrites identical bytes."""

    def delta_apply(group: pa.Table) -> pa.Table:
        part = int(group.column(PART_COL)[0].as_py())
        winners = lww_pick(group.drop_columns([PART_COL]), mode=mode)
        pages = _finalize_delta(winners)
        rel = os.path.join(f"part={part:05d}", f"delta-{watermark}.parquet")
        atomic_write_table(pages, os.path.join(out_dir, rel))
        checksum = content_checksum(pages.column("url"), pages.column("text"),
                                    pages.column("seq"))
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "rows": pa.array([pages.num_rows], pa.int64()),
                "checksum": pa.array([str(checksum)], pa.string()),
                "file": pa.array([rel], pa.string()),
                "watermark": pa.array([watermark], pa.int64()),
            },
            schema=SUMMARY_SCHEMA,
        )

    return delta_apply


def ingest_delta(corpus, out_dir: str, config: EngineConfig | None = None, *,
                 watermark: int | None = None):
    """Merge-on-read ingest of the (committed watermark, ``watermark``]
    window: one delta file per touched partition, no base rewrite.

    Same resumability contract as ``replay``: no-op when already at the
    target, layout/mode pinned at lake creation, atomic manifest commit,
    crash-rerun rewrites identical delta files.
    """
    import time as _time

    from ethereum_etl_ray.pipelines.replay import (
        ReplayResult,
        _elect_winners_exact,
        _elect_winners_sharded,
        _estimate_event_rows,
        _make_seq_excluder,
        _make_validator,
        load_events,
    )
    from ethereum_etl_ray.state.manifest import (
        acquire_replay_lock,
        release_replay_lock,
    )

    t_start = _time.perf_counter()
    cfg = config or EngineConfig()
    target_wm = corpus.watermark if watermark is None else watermark
    lock = acquire_replay_lock(out_dir)
    try:
        prior = load_manifest(out_dir)
        if prior is not None and prior.watermark >= target_wm:
            return ReplayResult(out_dir, prior, 0, len(prior.partitions))
        if prior is not None:
            if prior.num_partitions != cfg.num_partitions:
                raise ValueError(
                    f"lake at {out_dir} was committed with num_partitions="
                    f"{prior.num_partitions}; resuming with "
                    f"{cfg.num_partitions} would split keys across layouts")
            if prior.merge_mode != cfg.merge_mode:
                raise ValueError(
                    f"lake merge_mode is {prior.merge_mode!r}; cannot resume "
                    f"with {cfg.merge_mode!r}")

        seq_gt = prior.watermark if prior is not None else None
        seq_le = None if target_wm >= corpus.watermark else target_wm
        use_snapshot = (prior is None and corpus.snapshot_dir
                        and os.path.isdir(corpus.snapshot_dir))

        validate = _make_validator(out_dir) if cfg.quarantine else None
        exclude = (_make_seq_excluder(cfg.exclude_seqs)
                   if cfg.exclude_seqs is not None else None)
        if exclude is not None:
            validate = ((lambda b, _e=exclude, _v=validate: _v(_e(b)))
                        if validate is not None else exclude)

        if cfg.late_materialization:
            # same two-pass shape as replay: elect the WINDOW's winners over
            # 20-byte version tuples first, then re-read keeping only winner
            # rows — the wide html payload of losing events never enters the
            # shuffle (update-heavy windows reduce 100-1000×; measured 3.5×
            # end-to-end vs the single-pass delta write at sf0.1)
            if _estimate_event_rows(corpus) > cfg.winner_exact_threshold:
                keep_winners, keep_snap, _n = _elect_winners_sharded(
                    corpus, cfg, seq_gt, seq_le, use_snapshot)
            else:
                keep_winners, keep_snap, _n = _elect_winners_exact(
                    corpus, cfg, seq_gt, seq_le, use_snapshot)
            branch = ([validate] if validate else []) + [
                keep_winners, events_to_merge_frame]
        else:
            keep_snap = None
            branch = ([validate] if validate else []) + [
                events_to_merge_frame, make_combiner(mode=cfg.merge_mode)]
        ds = load_events(corpus.event_dirs, seq_gt=seq_gt, seq_le=seq_le,
                         branch_fns=tuple(branch))
        if use_snapshot:
            snap = ray.data.read_parquet(corpus.snapshot_dir)
            if keep_snap is not None:
                snap = snap.map_batches(keep_snap, batch_format="pyarrow",
                                        zero_copy_batch=True)
            snap = snap.map_batches(pages_to_merge_frame,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)
            ds = ds.union(snap)
        ds = ds.map_batches(make_partitioner(cfg.num_partitions),
                            batch_format="pyarrow", zero_copy_batch=True)
        os.makedirs(out_dir, exist_ok=True)
        summaries = (
            ds.groupby(PART_COL)
            .map_groups(_make_delta_apply(out_dir, target_wm, cfg.merge_mode),
                        batch_format="pyarrow")
            .to_pandas()  # tiny: one row per touched partition
        )

        manifest = Manifest(
            watermark=target_wm,
            schema_version=LATEST_EVENT_VERSION,
            num_partitions=cfg.num_partitions,
            merge_mode=cfg.merge_mode,
            partitions=dict(prior.partitions) if prior is not None else {},
            deltas={k: list(v) for k, v in (prior.deltas if prior else {}).items()},
            metrics={"route": "mor_delta",
                     "resumed_from": seq_gt if seq_gt is not None else -1,
                     "wall_sec": round(_time.perf_counter() - t_start, 3)},
        )
        for row in summaries.itertuples(index=False):
            manifest.deltas.setdefault(str(int(row.part)), []).append(
                DeltaEntry(file=row.file, rows=int(row.rows),
                           checksum=row.checksum,
                           watermark=int(row.watermark)))
        commit_manifest(out_dir, manifest)
        return ReplayResult(out_dir, manifest, len(summaries), 0)
    finally:
        release_replay_lock(lock)


def _make_mor_reader(out_dir: str, m: Manifest):
    """Per-partition merged read: base file ∪ delta files → winner pick →
    drop tombstones → PAGES rows. One task per delta-pending partition; the
    files are hash-aligned by url so no shuffle is needed."""
    parts_map = {int(k): v for k, v in m.partitions.items()}
    deltas_map = {int(k): [e.file for e in v if e.rows > 0]
                  for k, v in m.deltas.items()}
    mode = m.merge_mode

    def read_merge(batch: pa.Table) -> pa.Table:
        out = []
        for part in batch.column("part").to_pylist():
            frames = []
            e = parts_map.get(int(part))
            if e is not None and e.rows > 0:
                base = pq.read_table(os.path.join(out_dir, e.file),
                                     columns=list(PAGES_SCHEMA.names))
                frames.append(base.append_column(
                    "op", pa.array(np.full(base.num_rows, "insert"),
                                   pa.string())).cast(DELTA_SCHEMA))
            for f in deltas_map.get(int(part), []):
                frames.append(pq.read_table(os.path.join(out_dir, f))
                              .cast(DELTA_SCHEMA))
            if not frames:
                continue
            merged = (frames[0] if len(frames) == 1
                      else pa.concat_tables(frames, promote_options="none"))
            winners = lww_pick(merged, mode=mode)
            alive = winners.filter(
                pc.not_equal(winners.column("op"), pa.scalar("delete")))
            out.append(alive.select(list(PAGES_SCHEMA.names)))
        if not out:
            return PAGES_SCHEMA.empty_table()
        return pa.concat_tables(out, promote_options="none")

    return read_merge


def merged_lake(out_dir: str, m: Manifest) -> ray.data.Dataset:
    """Scan-time-merged view of a delta-pending lake. Partitions without
    deltas stream from their base files untouched (the common case after a
    compaction cadence); delta-pending partitions get one merge task each."""
    delta_parts = sorted(int(k) for k, v in m.deltas.items() if v)
    clean_files = [os.path.join(out_dir, e.file)
                   for k, e in m.partitions.items()
                   if int(k) not in set(delta_parts) and e.rows > 0]
    pieces = []
    if clean_files:
        pieces.append(ray.data.read_parquet(
            clean_files, columns=list(PAGES_SCHEMA.names)))
    if delta_parts:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        pieces.append(
            ray.data.from_items([{"part": p} for p in delta_parts])
            .map_batches(_make_mor_reader(out_dir, m), batch_size=1,
                         batch_format="pyarrow",
                         num_cpus=max(1, cpus // 16)))
    if not pieces:
        return ray.data.from_arrow(PAGES_SCHEMA.empty_table())
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out


def compact_deltas(out_dir: str) -> dict:
    """Fold every partition's pending deltas into a fresh base file (the
    same per-partition merge replay uses) and commit a manifest with the
    delta lists cleared — watermark unchanged, new generation. Old base and
    delta files stay on disk for retained-generation time travel until
    ``gc_uncommitted`` ages them out. Crash-safe: files are written before
    the pointer flips; a rerun rewrites identical bytes."""
    from ethereum_etl_ray.state.manifest import (
        acquire_replay_lock,
        release_replay_lock,
    )

    lock = acquire_replay_lock(out_dir)
    try:
        m = load_manifest(out_dir)
        if m is None:
            raise FileNotFoundError(f"no committed manifest in {out_dir}")
        delta_parts = sorted(int(k) for k, v in m.deltas.items() if v)
        if not delta_parts:
            return {"out": out_dir, "compacted_partitions": 0,
                    "watermark": m.watermark, "generation": m.generation}
        prior_parts = {int(k): v for k, v in m.partitions.items()}
        deltas_map = {int(k): [e.file for e in v if e.rows > 0]
                      for k, v in m.deltas.items()}
        wm, mode = m.watermark, m.merge_mode

        def fold(batch: pa.Table) -> pa.Table:
            out = []
            for part in batch.column("part").to_pylist():
                frames = [delta_to_merge_frame(
                    pq.read_table(os.path.join(out_dir, f)))
                    for f in deltas_map.get(int(part), [])]
                if not frames:
                    frames = [MERGE_SCHEMA.empty_table()]
                out.append(_merge_one_partition(int(part), frames, out_dir,
                                                wm, prior_parts, mode))
            return pa.concat_tables(out, promote_options="none")

        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        summaries = (
            ray.data.from_items([{"part": p} for p in delta_parts])
            .map_batches(fold, batch_size=1, batch_format="pyarrow",
                         num_cpus=max(1, cpus // 16))
            .to_pandas()  # tiny: one row per compacted partition
        )
        from ethereum_etl_ray.state.manifest import PartitionEntry

        manifest = Manifest(
            watermark=m.watermark,
            schema_version=m.schema_version,
            num_partitions=m.num_partitions,
            merge_mode=m.merge_mode,
            partitions=dict(m.partitions),
            deltas={},
            metrics={"route": "compact_deltas",
                     "compacted": len(delta_parts)},
        )
        for row in summaries.itertuples(index=False):
            manifest.partitions[str(int(row.part))] = PartitionEntry(
                file=row.file, rows=int(row.rows), checksum=row.checksum,
                watermark=int(row.watermark))
        commit_manifest(out_dir, manifest)
        return {"out": out_dir, "compacted_partitions": len(delta_parts),
                "watermark": manifest.watermark,
                "generation": manifest.generation}
    finally:
        release_replay_lock(lock)
