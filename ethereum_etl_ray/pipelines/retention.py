"""Lake retention / compaction (reference A8 ``free_space`` + backup GC).

The reference evicts the oldest ``(1 - keep_ratio)`` fraction of rows by its
wall-clock ``updated_time`` audit column with a global ``ORDER BY … LIMIT``
delete (``src/repositories/sqlite/base.py:210-227``). Here eviction is
deterministic (event-time ``warc_ts`` with ``seq`` tie-break — never
wall-clock) and partition-parallel:

  1. one column-pruned scan collects per-partition ``(warc_ts, seq)``
     histograms → the driver derives the global cutoff version from a small
     sorted sample union (exact: all version pairs are collected, but only
     16 bytes/row);
  2. each partition file is rewritten filtering rows older than the cutoff
     (a map over partitions — no shuffle, keys never move);
  3. new manifest committed atomically; superseded files removed by
     ``gc_uncommitted``.
"""

from __future__ import annotations

import os

import numpy as np
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


def _cutoff_version(out_dir: str, manifest: Manifest, keep_ratio: float):
    files = manifest.files(out_dir)
    if not files:
        return None
    versions = ray.data.read_parquet(files, columns=["warc_ts", "seq"]).to_pandas()
    if versions.empty:
        return None
    versions = versions.sort_values(["warc_ts", "seq"]).reset_index(drop=True)
    n_evict = int(np.floor(len(versions) * (1.0 - keep_ratio)))
    if n_evict <= 0:
        return None
    row = versions.iloc[n_evict - 1]
    return row.warc_ts.to_datetime64(), int(row.seq)


def apply_retention(out_dir: str, keep_ratio: float = 0.9) -> dict:
    """Evict the oldest ``1-keep_ratio`` of lake rows. Returns stats."""
    manifest = load_manifest(out_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed manifest in {out_dir}")
    cutoff = _cutoff_version(out_dir, manifest, keep_ratio)
    if cutoff is None:
        return {"evicted": 0, "partitions_rewritten": 0}
    cut_ts, cut_seq = cutoff
    wm = manifest.watermark

    entries = [(int(p), e) for p, e in manifest.partitions.items() if e.rows > 0]

    def rewrite(batch: pa.Table) -> pa.Table:
        parts_out = []
        for part in batch.column("part").to_pylist():
            entry = dict(entries)[part]
            t = pq.read_table(os.path.join(out_dir, entry.file))
            ts = t.column("warc_ts")
            seq = t.column("seq")
            newer_ts = pc.greater(ts, pa.scalar(cut_ts, pa.timestamp("us")))
            eq_ts = pc.equal(ts, pa.scalar(cut_ts, pa.timestamp("us")))
            tie = pc.and_(eq_ts, pc.greater(seq, pa.scalar(cut_seq)))
            keep = pc.or_(newer_ts, tie)
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
