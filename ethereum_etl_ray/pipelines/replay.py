"""The flagship pipeline: CDC change-log replay → Parquet lake upsert.

Ray-Data-native re-expression of the reference's historical backfill driver
(``src/clis/historical.py:35-93``): where the reference admits block-range
batches into an asyncio DAG and funnels rows through idempotent SQL upserts,
this engine expresses the whole job as ONE lazy Dataset pipeline —

    read_parquet(change log, seq-range pushdown)      # S1-S3 fetch stage
      → map_batches(conform to latest schema)          # §1.3 schema evolution
      → map_batches(events_to_merge_frame)             # E* extract projections
      → map_batches(lww combiner)                      # partial agg pre-shuffle
      → [∪ initial snapshot on first run]
      → map_batches(hash partitioner)                  # explicit partition key
      → groupby(part).map_groups(merge_apply)          # A5/A6 LWW upsert + X1/X2 sink
      → summaries (1 row/partition) → atomic manifest commit

and lets the streaming executor pipeline/backpressure the stages (the
reference's ``Graph.run`` scheduler, ``src/tasks/graph.py:19-65``, for free).

Resume: committed partitions at the target watermark are skipped; only events
with ``seq > prior watermark`` are read (Parquet filter pushdown). Replay of
any suffix is idempotent because the merge is a max-version selection.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ethereum_etl_ray.config import EngineConfig
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
) -> ray.data.Dataset:
    """Read the change log (all schema generations) conformed to the latest
    registry schema, with seq-range predicate pushdown to the Parquet scan."""
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
        parts.append(ds.map_batches(conform, batch_format="pyarrow", zero_copy_batch=True))
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
    cfg = config or EngineConfig()
    prior = load_manifest(out_dir)
    target_wm = corpus.watermark if watermark is None else watermark
    if prior is not None and prior.watermark >= target_wm:
        return ReplayResult(out_dir, prior, 0, len(prior.partitions))

    seq_gt = prior.watermark if prior is not None else None
    # drop the upper-bound filter when it covers the whole log (row-level
    # filtering in the scan is pure overhead then)
    seq_le = None if target_wm >= corpus.watermark else target_wm
    ds = load_events(corpus.event_dirs, seq_gt=seq_gt, seq_le=seq_le)
    ds = ds.map_batches(events_to_merge_frame, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(make_combiner(mode=cfg.merge_mode), batch_format="pyarrow",
                        batch_size=cfg.batch_size_rows, zero_copy_batch=True)

    if prior is None and corpus.snapshot_dir and os.path.isdir(corpus.snapshot_dir):
        snap = ray.data.read_parquet(corpus.snapshot_dir)
        snap = snap.map_batches(pages_to_merge_frame, batch_format="pyarrow",
                                zero_copy_batch=True)
        ds = ds.union(snap)

    if cfg.skew_detect:
        ds = _split_and_salt_hot_keys(ds, corpus, cfg, seq_gt, target_wm)

    ds = ds.map_batches(make_partitioner(cfg.num_partitions), batch_format="pyarrow",
                        zero_copy_batch=True)

    merge_apply = make_merge_apply(out_dir, target_wm, prior, mode=cfg.merge_mode)
    os.makedirs(out_dir, exist_ok=True)
    summaries = (
        ds.groupby(PART_COL)
        .map_groups(merge_apply, batch_format="pyarrow")
        .to_pandas()  # tiny: one row per touched partition
    )

    manifest = Manifest(
        watermark=target_wm,
        schema_version=LATEST_EVENT_VERSION,
        num_partitions=cfg.num_partitions,
        merge_mode=cfg.merge_mode,
        partitions=dict(prior.partitions) if prior is not None else {},
    )
    for row in summaries.itertuples(index=False):
        manifest.partitions[str(int(row.part))] = PartitionEntry(
            file=row.file, rows=int(row.rows), checksum=row.checksum,
            watermark=int(row.watermark),
        )
    commit_manifest(out_dir, manifest)
    skipped = len(manifest.partitions) - len(summaries)
    return ReplayResult(out_dir, manifest, len(summaries), skipped)


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


def load_lake(out_dir: str) -> ray.data.Dataset:
    """Read the committed lake state (manifest-listed files only — orphan
    files from crashed runs are invisible, the exactly-once guarantee)."""
    m = load_manifest(out_dir)
    if m is None:
        raise FileNotFoundError(f"no committed manifest in {out_dir}")
    files = m.files(out_dir)
    if not files:
        return ray.data.from_items([])
    from ethereum_etl_ray.schemas import PAGES_SCHEMA

    # columns= also drops the hive-style `part` column inferred from the path
    return ray.data.read_parquet(files, columns=list(PAGES_SCHEMA.names))
