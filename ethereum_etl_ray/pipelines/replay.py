"""The flagship pipeline: CDC change-log replay → Parquet lake upsert.

Ray-Data-native re-expression of the reference's historical backfill driver
(``src/clis/historical.py:35-93``): where the reference admits block-range
batches into an asyncio DAG and funnels rows through idempotent SQL upserts,
this engine expresses the whole job as lazy Dataset pipelines and lets the
streaming executor schedule/backpressure the stages (the reference's
``Graph.run`` scheduler, ``src/tasks/graph.py:19-65``, for free).

Two physical routes share one logical merge (winner per key = max/min
``(warc_ts, seq)``; tombstones drop):

LATE-MATERIALIZED (default; update-heavy logs). The wide ``html`` payload
never enters a shuffle:

    pass 1  read(url, warc_ts, seq, op)                # 20-byte version tuples
              → combiner (fused) → cascaded combiner
              → hash partition → groupby → winner per key
    pass 2  read(all columns) → keep winner seqs (fused filter)
              → ∪ surviving snapshot rows → partition
              → groupby(part).map_groups(merge_apply)  # upsert + extract + write
              → summaries → atomic manifest commit

SINGLE-PASS (``late_materialization=False``; insert-heavy / bulk loads where
nearly every event survives). The payload shuffles once, either through
Ray's sort shuffle or the explicit file-bucket shuffle
(``EngineConfig.shuffle="file"``: spill per-partition lz4 Arrow-IPC from
inside the fused read task; merge tasks read exactly their bucket).

Resume: committed partitions at the target watermark are skipped; only events
with ``seq > prior watermark`` are read (Parquet filter pushdown). Replay of
any suffix is idempotent because the merge is a max-version selection.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ethereum_etl_ray.config import EngineConfig
from ethereum_etl_ray.functions.hashing import partition_ids
from ethereum_etl_ray.schemas import EVENTS_SCHEMA_V2, LATEST_EVENT_VERSION
from ethereum_etl_ray.sources.synth import Corpus
from ethereum_etl_ray.stages.conform import make_conformer
from ethereum_etl_ray.stages.merge import (
    PART_COL,
    events_to_merge_frame,
    make_combiner,
    make_merge_apply,
    make_partitioner,
    pages_to_merge_frame,
)
from ethereum_etl_ray.state.manifest import (
    Manifest,
    PartitionEntry,
    commit_manifest,
    load_manifest,
)


@dataclass
class ReplayResult:
    out_dir: str
    manifest: Manifest
    merged_partitions: int
    skipped_partitions: int

    def lake(self) -> ray.data.Dataset:
        return load_lake(self.out_dir)


def max_seq_in(dirs: list[str]) -> int:
    """Watermark discovery from Parquet row-group statistics (no data read)."""
    hi = -1
    for d in dirs:
        for name in os.listdir(d):
            if not name.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(d, name))
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)  # seq is the first column
                if col.statistics is not None and col.statistics.has_min_max:
                    hi = max(hi, col.statistics.max)
    return hi


def _read_blocks_for(d: str) -> int:
    """Right-size read parallelism: ~64 MiB per block, clamped to [cpus, 4×cpus].

    Ray's default parquet parallelism over-fragments small shard sets into
    hundreds of ~1 MiB blocks, which multiplies sort-shuffle fragmentation
    (#map blocks × #reduce partitions); measured 3× end-to-end on the 1M-event
    bench. At 100 TB the same rule yields ≫ cores blocks, so nothing is lost."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 32)) if _ray.is_initialized() else 32
    total = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
                if f.endswith(".parquet"))
    return int(min(max(total // (64 << 20), cpus), cpus * 4))


def load_events(
    event_dirs: list[str],
    *,
    seq_gt: int | None = None,
    seq_le: int | None = None,
    branch_fns: tuple = (),
) -> ray.data.Dataset:
    """Read the change log (all schema generations) conformed to the latest
    registry schema, with seq-range predicate pushdown to the Parquet scan.

    ``branch_fns`` are extra pyarrow batch fns applied PER BRANCH, directly
    after conform and BEFORE the union. Placement matters enormously: a
    map placed after the union cannot fuse with ``ReadParquet``, so full
    decoded blocks (html inflates ~15× from parquet) transit the object
    store; when a downstream all-to-all (sort/groupby) then reserves most of
    the store budget, the executor throttles the read to one task at a time
    (measured: 470 s vs 3 s for the same scan on the 15M-event bench).
    Fused per-branch, selective fns shrink blocks before they ever leave the
    read task.
    """
    expr = None
    if seq_gt is not None:
        expr = pc.field("seq") > seq_gt
    if seq_le is not None:
        e2 = pc.field("seq") <= seq_le
        expr = e2 if expr is None else expr & e2
    conform = make_conformer(EVENTS_SCHEMA_V2)
    parts = []
    for d in event_dirs:
        if not os.path.isdir(d) or not os.listdir(d):
            continue
        ds = ray.data.read_parquet(d, filter=expr,
                                   override_num_blocks=_read_blocks_for(d))
        ds = ds.map_batches(conform, batch_format="pyarrow", zero_copy_batch=True)
        for fn in branch_fns:
            ds = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        parts.append(ds)
    if not parts:
        raise FileNotFoundError(f"no event files under {event_dirs}")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def replay(
    corpus: Corpus,
    out_dir: str,
    config: EngineConfig | None = None,
    *,
    watermark: int | None = None,
) -> ReplayResult:
    """Replay the corpus change log into the lake at ``out_dir`` (resumable)."""
    import time as _time

    t_start = _time.perf_counter()
    cfg = config or EngineConfig()
    target_wm = corpus.watermark if watermark is None else watermark

    from ethereum_etl_ray.state.manifest import acquire_replay_lock, release_replay_lock

    # the manifest snapshot (and the resume/no-op decisions derived from it)
    # must be taken UNDER the replay lock: a concurrent retention/compaction
    # committing between a pre-lock load and the merge would leave this run
    # merging against files the other writer already rewrote and GC'd
    lock = acquire_replay_lock(out_dir)
    try:
        return _replay_with_lock(corpus, out_dir, cfg, target_wm, t_start)
    finally:
        release_replay_lock(lock)


def _replay_with_lock(corpus, out_dir, cfg, target_wm, t_start) -> ReplayResult:
    prior = load_manifest(out_dir)
    if prior is not None and prior.watermark >= target_wm:
        return ReplayResult(out_dir, prior, 0, len(prior.partitions))
    if prior is not None:
        # copy-on-write over pending merge-on-read deltas is unsafe: this
        # merge drops tombstones that may still have to shadow older delta
        # rows at read time (resurrection) — fold the deltas in first
        from ethereum_etl_ray.pipelines.mor import require_no_deltas

        require_no_deltas(prior, "copy-on-write replay")
        # partition layout and merge mode are fixed at lake creation: resuming
        # with a different hash fan-out would route a url's new events to a
        # different partition than its committed row, duplicating keys; a mode
        # flip would silently change which version wins
        if prior.num_partitions != cfg.num_partitions:
            raise ValueError(
                f"lake at {out_dir} was committed with num_partitions="
                f"{prior.num_partitions}; resuming with {cfg.num_partitions} "
                "would split keys across layouts (repartition via a fresh "
                "full replay instead)")
        if prior.merge_mode != cfg.merge_mode:
            raise ValueError(
                f"lake merge_mode is {prior.merge_mode!r}; cannot resume with "
                f"{cfg.merge_mode!r}")
    metrics: dict = {"route": "late" if cfg.late_materialization
                     else f"single_{cfg.shuffle}",
                     "resumed_from": seq_gt_val if (seq_gt_val := (prior.watermark if prior else None)) is not None else -1}
    return _replay_locked(corpus, out_dir, cfg, prior, target_wm, metrics,
                          t_start)


def _replay_locked(corpus, out_dir, cfg, prior, target_wm, metrics,
                   t_start) -> ReplayResult:
    import time as _time

    seq_gt = prior.watermark if prior is not None else None
    # drop the upper-bound filter when it covers the whole log (row-level
    # filtering in the scan is pure overhead then)
    seq_le = None if target_wm >= corpus.watermark else target_wm
    use_snapshot = (prior is None and corpus.snapshot_dir
                    and os.path.isdir(corpus.snapshot_dir))

    validate = _make_validator(out_dir) if cfg.quarantine else None
    # lateness exclusion runs FIRST (before quarantine): a late event is the
    # tailer's side output, not a malformed row — it must appear in neither
    # the dead-letter spill nor any winner election
    exclude = (_make_seq_excluder(cfg.exclude_seqs)
               if cfg.exclude_seqs is not None else None)
    if exclude is not None:
        validate = ((lambda b, _e=exclude, _v=validate: _v(_e(b)))
                    if validate is not None else exclude)

    if cfg.late_materialization:
        est_events = _estimate_event_rows(corpus)
        if est_events > cfg.winner_exact_threshold:
            keep_winners, keep_snap, n_winners = _elect_winners_sharded(
                corpus, cfg, seq_gt, seq_le, use_snapshot)
            metrics["winner_filter"] = "sharded_bloom"
        else:
            keep_winners, keep_snap, n_winners = _elect_winners_exact(
                corpus, cfg, seq_gt, seq_le, use_snapshot)
            metrics["winner_filter"] = "exact"
        metrics["pass1_sec"] = round(_time.perf_counter() - t_start, 3)
        metrics["winners"] = n_winners

        fns = ([validate] if validate else []) + [keep_winners, events_to_merge_frame]
        shuffle_dir, spiller = (_setup_file_shuffle(cfg, out_dir, target_wm)
                                if cfg.shuffle == "file" else (None, None))
        if spiller is not None:
            # winners spill straight from the fused read task into their
            # bucket files — replaces the sort-shuffle round entirely
            fns.append(spiller)
        ds = load_events(corpus.event_dirs, seq_gt=seq_gt, seq_le=seq_le,
                         branch_fns=tuple(fns))
        if use_snapshot:
            snap = ray.data.read_parquet(corpus.snapshot_dir, override_num_blocks=4)
            snap = snap.map_batches(keep_snap, batch_format="pyarrow",
                                    zero_copy_batch=True)
            snap = snap.map_batches(pages_to_merge_frame, batch_format="pyarrow",
                                    zero_copy_batch=True)
            if spiller is not None:
                snap = snap.map_batches(spiller, batch_format="pyarrow",
                                        zero_copy_batch=True)
            ds = ds.union(snap)
        if shuffle_dir is not None:
            return _finish_via_file_shuffle(ds, shuffle_dir, out_dir, target_wm,
                                            prior, cfg, metrics, t_start)
    else:
        branch = ([validate] if validate else []) + [
            events_to_merge_frame, make_combiner(mode=cfg.merge_mode)]
        shuffle_dir, spiller = (_setup_file_shuffle(cfg, out_dir, target_wm)
                                if cfg.shuffle == "file" else (None, None))
        if spiller is not None:
            # fused into the read task: payload goes straight from the
            # parquet decode to its bucket file, never into the object store
            branch.append(spiller)
        ds = load_events(corpus.event_dirs, seq_gt=seq_gt, seq_le=seq_le,
                         branch_fns=tuple(branch))

        if use_snapshot:
            snap = ray.data.read_parquet(corpus.snapshot_dir)
            snap = snap.map_batches(pages_to_merge_frame, batch_format="pyarrow",
                                    zero_copy_batch=True)
            if spiller is not None:
                snap = snap.map_batches(spiller, batch_format="pyarrow",
                                        zero_copy_batch=True)
            ds = ds.union(snap)

        if shuffle_dir is not None:
            return _finish_via_file_shuffle(ds, shuffle_dir, out_dir, target_wm,
                                            prior, cfg, metrics, t_start)

        if cfg.skew_detect:
            # seq_le (None when the window covers the whole log), not the
            # raw watermark — the probe must see the same filtered range
            ds = _split_and_salt_hot_keys(ds, corpus, cfg, seq_gt, seq_le)

    ds = ds.map_batches(make_partitioner(cfg.num_partitions), batch_format="pyarrow",
                        zero_copy_batch=True)

    merge_apply = make_merge_apply(out_dir, target_wm, prior, mode=cfg.merge_mode)
    os.makedirs(out_dir, exist_ok=True)
    summaries = (
        ds.groupby(PART_COL)
        .map_groups(merge_apply, batch_format="pyarrow")
        .to_pandas()  # tiny: one row per touched partition
    )
    metrics["wall_sec"] = round(_time.perf_counter() - t_start, 3)
    return _commit(out_dir, target_wm, prior, cfg, summaries, metrics)


def _setup_file_shuffle(cfg, out_dir, target_wm):
    """Prepare the explicit file-bucket shuffle (both routes): validated
    scratch dir + the fused spiller fn."""
    import hashlib
    import shutil

    from ethereum_etl_ray.stages.merge import make_spiller

    # node-local scratch silently loses other nodes' buckets on a
    # multi-node cluster: fail fast unless the operator asserts the
    # scratch dir is on shared storage (NFS/FSx/…)
    alive_nodes = sum(1 for n in ray.nodes() if n.get("Alive", False))
    if alive_nodes > 1 and not cfg.shuffle_scratch_shared:
        raise ValueError(
            "shuffle='file' on a multi-node cluster requires "
            "shuffle_scratch on SHARED storage; set "
            "EngineConfig(shuffle_scratch=<shared path>, "
            "shuffle_scratch_shared=True)")
    scratch = cfg.shuffle_scratch or (
        "/dev/shm/webcdc_shuffle" if os.path.isdir("/dev/shm") else out_dir)
    os.makedirs(scratch, exist_ok=True)
    # stable digest (not the per-process-salted builtin hash) so the
    # rmtree below reliably clears residue from prior crashed runs
    tag = hashlib.sha1(os.path.abspath(out_dir).encode()).hexdigest()[:10]
    shuffle_dir = os.path.join(scratch, f"shuf-{tag}-{target_wm}")
    shutil.rmtree(shuffle_dir, ignore_errors=True)
    return shuffle_dir, make_spiller(shuffle_dir, cfg.num_partitions)


def _commit(out_dir, target_wm, prior, cfg, summaries, metrics=None) -> ReplayResult:
    manifest = Manifest(
        watermark=target_wm,
        schema_version=LATEST_EVENT_VERSION,
        num_partitions=cfg.num_partitions,
        merge_mode=cfg.merge_mode,
        partitions=dict(prior.partitions) if prior is not None else {},
        metrics=metrics or {},
    )
    for row in summaries.itertuples(index=False):
        manifest.partitions[str(int(row.part))] = PartitionEntry(
            file=row.file, rows=int(row.rows), checksum=row.checksum,
            watermark=int(row.watermark),
        )
    commit_manifest(out_dir, manifest)
    skipped = len(manifest.partitions) - len(summaries)
    return ReplayResult(out_dir, manifest, len(summaries), skipped)


def _finish_via_file_shuffle(ds, shuffle_dir, out_dir, target_wm, prior, cfg,
                             metrics=None, t_start=None) -> ReplayResult:
    """Consume the spill stage (barrier: every bucket file durable), then run
    one merge task per populated partition reading exactly its bucket. The
    populated-partition set comes from the spill tasks' returned summaries —
    a driver-local listdir would silently miss buckets spilled on other
    nodes' scratch."""
    import shutil
    import time as _time

    from ethereum_etl_ray.stages.merge import make_spill_merge_apply

    metrics = metrics if metrics is not None else {}
    t_start = t_start if t_start is not None else _time.perf_counter()
    os.makedirs(out_dir, exist_ok=True)
    # barrier — drives the spill to completion and collects the touched
    # partition ids from the spill tasks' summary rows. Streamed to the
    # driver block-by-block (summaries are (int32,int64) metadata, one row
    # per batch×partition): an aggregate here (unique/groupby) would add an
    # all-to-all whose object-store reservation throttles the upstream read
    # (measured: 0.86 → 0.72 scaling efficiency on the bulk bench).
    populated_set: set[int] = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        populated_set.update(b.column("part").to_pylist())
    populated = sorted(populated_set)
    metrics["spill_sec"] = round(_time.perf_counter() - t_start, 3)
    if populated:
        merge = make_spill_merge_apply(shuffle_dir, out_dir, target_wm, prior,
                                       mode=cfg.merge_mode)
        # cap concurrent merge tasks at ~16/node: each concat+sort+extract+
        # parquet-write task is memory-bandwidth/IO heavy, and oversubscribing
        # them anti-scales (measured 13.5 s at 16 concurrent vs 65 s at 32)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        summaries = (
            ray.data.from_items([{"part": p} for p in populated])
            .map_batches(merge, batch_size=1, batch_format="pyarrow",
                         num_cpus=max(1, cpus // 16))
            .to_pandas()
        )
    else:
        import pandas as pd

        summaries = pd.DataFrame(columns=["part", "rows", "checksum", "file",
                                          "watermark"])
    shutil.rmtree(shuffle_dir, ignore_errors=True)
    metrics["wall_sec"] = round(_time.perf_counter() - t_start, 3)
    # merge phase = everything after the spill barrier (concat + winner sort
    # + extract + parquet write) — recorded separately so a scaling-leg
    # regression can be attributed to a phase, not just the total
    metrics["merge_sec"] = round(metrics["wall_sec"] - metrics["spill_sec"], 3)
    metrics["merged_parts"] = len(populated)
    return _commit(out_dir, target_wm, prior, cfg, summaries, metrics)


_VALID_OPS = ("insert", "update", "delete")


def _valid_mask(batch: pa.Table):
    return pc.and_(
        pc.and_(pc.is_valid(batch.column("url")), pc.is_valid(batch.column("seq"))),
        pc.and_(pc.is_valid(batch.column("warc_ts")),
                pc.is_in(batch.column("op"), value_set=pa.array(list(_VALID_OPS)))),
    )


def _drop_invalid(batch: pa.Table) -> pa.Table:
    """Slim-pass validity filter (drop only — pass 2's validator owns the
    dead-letter spill). Needed so a malformed row can never win an election
    and then vanish in pass 2, erasing a valid earlier version."""
    return batch.filter(_valid_mask(batch))


def _make_seq_excluder(seqs):
    """Batch fn dropping rows whose ``seq`` is in ``seqs`` (the tailer's
    late-event side output — see ``EngineConfig.exclude_seqs``). The array is
    ``ray.put`` ONCE and read per task, never re-shipped per batch."""
    import ray as _ray

    ref = _ray.put(np.unique(np.asarray(seqs, dtype=np.int64)))

    def drop(batch: pa.Table) -> pa.Table:
        ex = _ray.get(ref)
        s = batch.column("seq").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(s, ex)))

    return drop


def _make_validator(out_dir: str):
    """Dead-letter quarantine (fused into the read branch): rows with a null
    url/seq/warc_ts or an unknown op are spilled to ``out_dir/_deadletter``
    and dropped from the stream instead of failing the job (the reference
    raises on malformed rows, ``src/tasks/extract/transfer.py:25-27``)."""
    dl_dir = os.path.join(out_dir, "_deadletter")

    def validate(batch: pa.Table) -> pa.Table:
        ok = _valid_mask(batch)
        if bool(pc.all(ok).as_py() if batch.num_rows else True):
            return batch
        import uuid

        bad = batch.filter(pc.invert(ok))
        os.makedirs(dl_dir, exist_ok=True)
        pq.write_table(bad, os.path.join(dl_dir, f"dl-{uuid.uuid4().hex[:12]}.parquet"))
        return batch.filter(ok)

    return validate


def route_late_events(corpus, out_dir: str, *, seq_gt: int | None,
                      seq_le: int | None, allowed_lateness_us: int,
                      carry_in_us: int | None = None,
                      ) -> tuple[np.ndarray, int | None, int]:
    """Allowed-lateness routing for one tail window (``cli tail
    --allowed-lateness-us``): events whose ``warc_ts`` lags the running
    high-water mark (max event time in ``seq`` arrival order, carried across
    windows via ``carry_in_us``) by more than ``allowed_lateness_us`` are
    written — full rows — to the ``out_dir/_late`` side output (the
    dead-letter analogue, cf. ``_make_validator``), and their seqs are
    returned for ``EngineConfig.exclude_seqs`` so the merge never sees them.

    Lateness is decided on the SLIM (seq, warc_ts) columns only — one
    column-pruned scan plus the two-phase distributed prefix max
    (``stages.watermark``); the wide html payload is read a second time only
    for the (bounded, typically tiny) late subset. Returns
    ``(late_seqs, new_carry_us, n_late)``; the caller persists
    ``new_carry_us`` AFTER the round's replay commits, so a crash replays
    the window against the same carry-in."""
    from ray.data.aggregate import Max as _Max

    from ethereum_etl_ray.stages.watermark import watermark_filter

    expr = None
    if seq_gt is not None:
        expr = pc.field("seq") > seq_gt
    if seq_le is not None:
        e2 = pc.field("seq") <= seq_le
        expr = e2 if expr is None else expr & e2

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "seq": pc.cast(t.column("seq"), pa.int64()),
            "__ts_us": pc.cast(t.column("warc_ts"), pa.int64())})

    slim = (ray.data.read_parquet(_slim_event_files(corpus),
                                  columns=["seq", "warc_ts"], filter=expr)
            .map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)
            .materialize())  # slim 16-byte rows, consumed twice (max + filter)

    row = slim.aggregate(_Max("__ts_us", alias_name="m"))
    window_max = row.get("m") if row else None
    new_carry = carry_in_us
    if window_max is not None:
        new_carry = (int(window_max) if carry_in_us is None
                     else max(int(window_max), carry_in_us))

    late = watermark_filter(slim, order_col="seq", time_us_col="__ts_us",
                            allowed_lateness_us=allowed_lateness_us,
                            keep=False, carry_in_us=carry_in_us)
    chunks = [b["seq"] for b in late.iter_batches(batch_format="numpy")]
    late_seqs = (np.sort(np.concatenate(chunks)) if chunks
                 else np.array([], np.int64))
    if late_seqs.size:
        ref = ray.put(late_seqs)

        def only_late(batch: pa.Table) -> pa.Table:
            ex = ray.get(ref)
            s = batch.column("seq").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(np.isin(s, ex)))

        side = os.path.join(out_dir, "_late",
                            f"window-{(seq_gt or 0) + 1}-{seq_le}")
        os.makedirs(side, exist_ok=True)
        load_events(corpus.event_dirs, seq_gt=seq_gt, seq_le=seq_le,
                    branch_fns=(only_late,)).write_parquet(side)
    return late_seqs, new_carry, int(late_seqs.size)


def read_late_events(out_dir: str) -> pa.Table | None:
    """All rows routed to the allowed-lateness side output, or None."""
    import glob as _glob

    fs = sorted(_glob.glob(os.path.join(out_dir, "_late", "window-*",
                                        "*.parquet")))
    if not fs:
        return None
    return pa.concat_tables([pq.read_table(f) for f in fs], promote_options="default")


def read_dead_letters(out_dir: str) -> pa.Table | None:
    dl_dir = os.path.join(out_dir, "_deadletter")
    if not os.path.isdir(dl_dir):
        return None
    files = [os.path.join(dl_dir, f) for f in sorted(os.listdir(dl_dir))
             if f.endswith(".parquet")]
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files],
                            promote_options="default")


SLIM_COLS = ["url", "warc_ts", "seq", "op"]


def _slim_event_files(corpus) -> list[str]:
    return [os.path.join(d, f)
            for d in corpus.event_dirs if os.path.isdir(d)
            for f in sorted(os.listdir(d)) if f.endswith(".parquet")]


def _estimate_event_rows(corpus) -> int:
    """Free upper bound on pass-1 winners: total event rows from Parquet
    footers (no data read)."""
    return sum(pq.read_metadata(f).num_rows for f in _slim_event_files(corpus))


def _slim_winner_pipeline(corpus, cfg, seq_gt, seq_le, use_snapshot):
    """Pass 1 of the late-materialized merge: the slim election pipeline up to
    (and including) the hash partitioner — shared by both winner routes.

    Elects the winning (max/min version) event per url using ONLY the
    ~20-byte version-tuple columns. The slim columns are schema-stable across
    event generations, so both generations read as one column-pruned scan
    (no conform needed).
    """
    from ethereum_etl_ray.stages.sketch import sketch_heavy_hitters

    expr = None
    if seq_gt is not None:
        expr = pc.field("seq") > seq_gt
    if seq_le is not None:
        e2 = pc.field("seq") <= seq_le
        expr = e2 if expr is None else expr & e2
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    comb = make_combiner(mode=cfg.merge_mode)
    slim = ray.data.read_parquet(_slim_event_files(corpus), columns=SLIM_COLS,
                                 filter=expr, override_num_blocks=cpus * 2)
    # combiner fused into the read branch (see load_events docstring)
    slim = slim.map_batches(lambda t: t.select(SLIM_COLS), batch_format="pyarrow",
                            zero_copy_batch=True)
    if getattr(cfg, "quarantine", True):
        slim = slim.map_batches(_drop_invalid, batch_format="pyarrow",
                                zero_copy_batch=True)
    if getattr(cfg, "exclude_seqs", None) is not None:
        # late events must not win elections either (see _replay_locked)
        slim = slim.map_batches(_make_seq_excluder(cfg.exclude_seqs),
                                batch_format="pyarrow", zero_copy_batch=True)
    slim = slim.map_batches(comb, batch_format="pyarrow",
                            batch_size=cfg.batch_size_rows, zero_copy_batch=True)
    # cascaded combine: re-batch 16× larger and reduce again. With Zipf keys a
    # single combine pass leaves ~#distinct-per-batch rows; the cascade cuts
    # the sort input by another ~40× for the cost of one cheap slim re-batch.
    slim = slim.map_batches(comb, batch_format="pyarrow",
                            batch_size=cfg.batch_size_rows * 16, zero_copy_batch=True)
    if use_snapshot:
        snap = ray.data.read_parquet(corpus.snapshot_dir,
                                     columns=["url", "warc_ts", "seq"],
                                     override_num_blocks=4)

        def mark_insert(t: pa.Table) -> pa.Table:
            t = t.append_column("op", pa.array(["insert"] * t.num_rows))
            return t.select(SLIM_COLS)

        slim = slim.union(snap.map_batches(mark_insert, batch_format="pyarrow"))

    if cfg.skew_detect:
        from ethereum_etl_ray.stages.joins import semi_anti_filter
        from ethereum_etl_ray.stages.merge import salted_reduce

        probe = ray.data.read_parquet(_slim_event_files(corpus),
                                      columns=["url", "seq"], filter=expr)
        n_sampled = max(1, int(probe.count() * cfg.skew_sample_fraction))
        hh = sketch_heavy_hitters(probe, "url",
                                  sample_fraction=cfg.skew_sample_fraction)
        hot = hh[hh.est_n >= cfg.skew_hot_threshold * n_sampled]["url"].tolist()
        if hot:
            hot_ds = semi_anti_filter(slim, hot, on="url")
            cold_ds = semi_anti_filter(slim, hot, on="url", anti=True)
            slim = cold_ds.union(salted_reduce(hot_ds, mode=cfg.merge_mode))

    return slim.map_batches(make_partitioner(cfg.num_partitions),
                            batch_format="pyarrow", zero_copy_batch=True)


def _elect_winners_exact(corpus, cfg, seq_gt, seq_le, use_snapshot):
    """Small-scale winner route: election result collected to the driver and
    broadcast as exact arrays (``np.isin`` per batch). O(#keys) driver memory
    — above ``cfg.winner_exact_threshold`` estimated events the sharded route
    below is used instead. Returns ``(keep_winners, keep_snap, n_winners)``;
    both filters are plain fns so they fuse into the ReadParquet branch."""
    from ethereum_etl_ray.stages.merge import lww_pick

    slim = _slim_winner_pipeline(corpus, cfg, seq_gt, seq_le, use_snapshot)

    def pick(group: pa.Table) -> pa.Table:
        return lww_pick(group.drop_columns([PART_COL]), mode=cfg.merge_mode)

    winners = slim.groupby(PART_COL).map_groups(pick, batch_format="pyarrow") \
        .to_pandas()  # one row per distinct key
    seqs = winners.seq.to_numpy()
    winner_seqs = seqs[seqs >= 0]
    snap_urls = winners[winners.seq < 0].url.to_numpy()
    sref = ray.put(winner_seqs)
    uref = ray.put(snap_urls)

    def keep_winners(batch):
        keep = np.isin(batch.column("seq").to_numpy(), ray.get(sref))
        return batch.filter(pa.array(keep))

    def keep_snap(batch):
        keep = np.isin(
            batch.column("url").to_numpy(zero_copy_only=False), ray.get(uref))
        return batch.filter(pa.array(keep))

    return keep_winners, keep_snap, int(len(winner_seqs))


def _elect_winners_sharded(corpus, cfg, seq_gt, seq_le, use_snapshot):
    """Web-scale winner route (the fix for the O(#keys) driver
    materialization): the election result NEVER leaves the cluster.

    Each per-partition election group task picks its winners and emits ONE
    summary row ``(part, n_winners, n_snap, seq_bloom, url_bloom)`` — the
    Bloom shards are built where the winners already are. The driver receives
    exactly ``num_partitions`` rows (O(P), regardless of key count), ships
    the shard dict once via ``ray.put``, and pass 2 tests each event's seq
    against its url-partition's shard (events for url u and u's winner hash
    to the same partition, so the lookup is consistent).

    Correctness: Bloom false negatives cannot occur; a false-positive loser
    row merely re-enters the merge and loses the max/min-version pick there
    (both LWW and FWW modes), so the final lake is byte-identical to the
    exact route — verified by tests/test_quarantine.py against the
    sequential-replay oracle. Cost: ~14.4 bits/winner of broadcast at
    fp=1e-3 ≈ 180 MB per 10^8 keys, plus fp·losers wasted merge rows.
    Reference semantics preserved: src/repositories/sqlite/base.py:159-172.
    """
    from ethereum_etl_ray.state.bloom import BloomFilter
    from ethereum_etl_ray.stages.merge import lww_pick

    slim = _slim_winner_pipeline(corpus, cfg, seq_gt, seq_le, use_snapshot)
    fp = cfg.winner_fp_rate

    def pick_to_shard(group: pa.Table) -> pa.Table:
        part = int(group.column(PART_COL)[0].as_py())
        winners = lww_pick(group.drop_columns([PART_COL]), mode=cfg.merge_mode)
        seqs = winners.column("seq").to_numpy()
        ev = seqs[seqs >= 0]
        sb = BloomFilter(capacity=max(64, len(ev)), fp_rate=fp)
        if len(ev):
            sb.add_many(ev.astype(object))
        su = winners.filter(pc.less(winners.column("seq"), pa.scalar(0))) \
            .column("url").to_numpy(zero_copy_only=False)
        ub = BloomFilter(capacity=max(64, len(su)), fp_rate=fp)
        if len(su):
            ub.add_many(su)
        return pa.table({
            "part": pa.array([part], pa.int32()),
            "n_winners": pa.array([len(ev)], pa.int64()),
            "n_snap": pa.array([len(su)], pa.int64()),
            "seq_bloom": pa.array([sb.serialize()], pa.binary()),
            "url_bloom": pa.array([ub.serialize()], pa.binary()),
        })

    shards = slim.groupby(PART_COL).map_groups(
        pick_to_shard, batch_format="pyarrow").take_all()  # ≤ P summary rows
    n_winners = int(sum(r["n_winners"] for r in shards))
    sref = ray.put({int(r["part"]): r["seq_bloom"] for r in shards})
    uref = ray.put({int(r["part"]): r["url_bloom"] for r in shards
                    if r["n_snap"] > 0})
    num_partitions = cfg.num_partitions

    def _filter_by_shard(batch, ref, test_vals):
        shard_bytes = ray.get(ref)
        parts = partition_ids(batch.column("url"), num_partitions)
        keep = np.zeros(len(parts), dtype=bool)
        for part in np.unique(parts):
            raw = shard_bytes.get(int(part))
            if raw is None:
                continue
            m = parts == part
            bf = BloomFilter.deserialize(raw, copy=False)  # zero-copy bits
            keep[m] = bf.contains_many(test_vals[m])
        return batch.filter(pa.array(keep))

    def keep_winners(batch):
        vals = batch.column("seq").to_numpy().astype(object)
        return _filter_by_shard(batch, sref, vals)

    def keep_snap(batch):
        vals = batch.column("url").to_numpy(zero_copy_only=False)
        return _filter_by_shard(batch, uref, vals)

    return keep_winners, keep_snap, n_winners


def _split_and_salt_hot_keys(ds, corpus, cfg, seq_gt, seq_le):
    """Skew handling (SURVEY §7.4): sketch a sample of the key column, split
    hot urls out, pre-reduce them via the salted two-stage merge, and union
    the winners back with the cold stream. Costs one extra (column-pruned)
    sample read plus a second pass over the events — enable via
    ``EngineConfig(skew_detect=True)`` when keys are Zipf-hot."""
    from ethereum_etl_ray.stages.joins import semi_anti_filter
    from ethereum_etl_ray.stages.merge import salted_reduce
    from ethereum_etl_ray.stages.sketch import sketch_heavy_hitters

    expr = None
    if seq_gt is not None:
        expr = pc.field("seq") > seq_gt
    if seq_le is not None:
        e2 = pc.field("seq") <= seq_le
        expr = e2 if expr is None else expr & e2
    files = [os.path.join(d, f)
             for d in corpus.event_dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    sample_src = ray.data.read_parquet(files, columns=["url", "seq"], filter=expr)
    n_sampled = max(1, int(sample_src.count() * cfg.skew_sample_fraction))
    hh = sketch_heavy_hitters(sample_src, "url",
                              sample_fraction=cfg.skew_sample_fraction)
    hot = hh[hh.est_n >= cfg.skew_hot_threshold * n_sampled]["url"].tolist()
    if not hot:
        return ds
    hot_ds = semi_anti_filter(ds, hot, on="url")
    cold_ds = semi_anti_filter(ds, hot, on="url", anti=True)
    hot_winners = salted_reduce(hot_ds, mode=cfg.merge_mode)
    return cold_ds.union(hot_winners)


def load_lake(out_dir: str, generation: int | None = None) -> ray.data.Dataset:
    """Read the committed lake state (manifest-listed files only — orphan
    files from crashed runs are invisible, the exactly-once guarantee).

    ``generation=`` time-travels: reads a RETAINED generation's file set
    without flipping the live pointer (read-only, lock-free — unlike
    ``restore_generation``); the reference's backup tables were readable the
    same way (`src/repositories/sqlite/base.py:81-136`)."""
    if generation is not None:
        from ethereum_etl_ray.state.manifest import manifest_at

        m = manifest_at(out_dir, generation)
    else:
        m = load_manifest(out_dir)
    if m is None:
        raise FileNotFoundError(f"no committed manifest in {out_dir}")
    if m.has_deltas():
        # merge-on-read lake: scan-time merge of base ∪ pending delta files
        # (delta-free partitions still stream straight from their base file)
        from ethereum_etl_ray.pipelines.mor import merged_lake

        return merged_lake(out_dir, m)
    files = m.files(out_dir)
    if not files:
        return ray.data.from_items([])
    from ethereum_etl_ray.schemas import PAGES_SCHEMA

    # columns= also drops the hive-style `part` column inferred from the path
    return ray.data.read_parquet(files, columns=list(PAGES_SCHEMA.names))


def files_for_urls(manifest: Manifest, urls: list[str]) -> dict[str, list[str]]:
    """Map each partition FILE to the urls that can only live in it.

    The lake is hash-partitioned by ``hash64(url) % num_partitions``
    (``make_partitioner``), so a point lookup touches exactly one file per
    url — the reference's PRIMARY-KEY point read
    (``src/repositories/sqlite/base.py:26-52`` inspect / SELECT-by-PK),
    served here by manifest-directed file pruning instead of an index."""
    pids = partition_ids(urls, manifest.num_partitions)
    by_file: dict[str, list[str]] = {}
    for url, pid in zip(urls, pids):
        e = manifest.entry(int(pid))
        if e is not None and e.rows > 0:
            by_file.setdefault(e.file, []).append(url)
    return by_file


def lookup_urls(out_dir: str, urls: list[str]) -> pa.Table:
    """Point-read current rows for ``urls`` from the committed lake.

    Reads ONLY the partition files the urls hash to (O(distinct partitions)
    of the request, never O(lake)), with a parquet-level url filter so row
    groups that can't match are skipped too. Urls with no current row are
    simply absent from the result (tombstoned or never written).

    Delta-aware: on a merge-on-read lake the partition's pending delta files
    are read (same url filter) and merged with the base rows at lookup time
    — still O(request partitions' files), never O(lake).
    """
    m = load_manifest(out_dir)
    if m is None:
        raise FileNotFoundError(f"no committed manifest in {out_dir}")
    from ethereum_etl_ray.schemas import PAGES_SCHEMA

    cols = list(PAGES_SCHEMA.names)
    by_part: dict[int, list[str]] = {}
    for url, pid in zip(urls, partition_ids(list(urls), m.num_partitions)):
        by_part.setdefault(int(pid), []).append(url)
    pieces = []
    for part, wanted in sorted(by_part.items()):
        want = sorted(set(wanted))
        e = m.entry(part)
        base = None
        if e is not None and e.rows > 0:
            base = pq.read_table(os.path.join(out_dir, e.file), columns=cols,
                                 filters=[("url", "in", want)])
        des = [d for d in m.delta_entries(part) if d.rows > 0]
        if not des:
            if base is not None:
                pieces.append(base)
            continue
        from ethereum_etl_ray.pipelines.mor import DELTA_SCHEMA
        from ethereum_etl_ray.stages.merge import lww_pick

        frames = []
        if base is not None:
            frames.append(base.append_column(
                "op", pa.array(np.full(base.num_rows, "insert"), pa.string())
            ).cast(DELTA_SCHEMA))
        for d in des:
            frames.append(pq.read_table(os.path.join(out_dir, d.file),
                                        filters=[("url", "in", want)])
                          .cast(DELTA_SCHEMA))
        merged = (frames[0] if len(frames) == 1
                  else pa.concat_tables(frames, promote_options="none"))
        winners = lww_pick(merged, mode=m.merge_mode)
        alive = winners.filter(
            pc.not_equal(winners.column("op"), pa.scalar("delete")))
        pieces.append(alive.select(cols))
    if not pieces:
        return PAGES_SCHEMA.empty_table()
    return pa.concat_tables(pieces)
