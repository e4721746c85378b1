"""Leader → follower lake replication (incremental, manifest-driven).

The missing operational half of CDC: the engine's lake is the SOURCE of
downstream consumers, and a read replica (another region, a serving tier, a
training cluster's local copy) must track it without re-running the change
log. The reference's nearest analogue is its backup-table copy flow
(``src/repositories/sqlite/base.py:81-136`` — full-table timestamped copies
on one box); this is the distributed, incremental generalization over the
manifest's per-partition lineage.

Scale design (why a sync is O(changed data), not O(lake)):

  * both sides share the url-hash partitioner, so partition ``p`` maps 1:1 —
    replication is embarrassingly parallel per partition, NO shuffle and no
    row-level work;
  * the manifest's per-partition content checksum is ORDER-INDEPENDENT over
    (url, text, seq) (``functions.hashing.content_checksum``), so a follower
    partition that already holds the same logical rows is skipped WITHOUT
    READING either side — an incremental sync after a bounded replay window
    touches only the partitions that window rewrote, and the skip survives
    leader compaction/retention rewrites that rename files but keep content;
  * each copy task re-computes the checksum from the bytes it shipped and
    fails loudly on mismatch — a torn leader file or a bad copy can never be
    committed into the follower's lineage.

Exactly-once on the follower comes from the same machinery as replay:
partition files land via ``atomic_write_table`` and become visible only when
``commit_manifest`` flips the live pointer, so a crashed sync leaves the
follower readable at its previous watermark and a re-run reconverges
(orphan files are invisible and GC-able). The follower's replay lock
serializes syncs against any other writer on the same directory.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ethereum_etl_ray.functions.hashing import content_checksum
from ethereum_etl_ray.state.manifest import (
    Manifest,
    PartitionEntry,
    acquire_replay_lock,
    atomic_write_table,
    load_manifest,
    manifest_at,
    release_replay_lock,
)


@dataclass
class ReplicateResult:
    dst_dir: str
    manifest: Manifest        # the committed follower manifest
    copied: int               # partitions shipped this sync
    skipped: int              # partitions already in sync (checksum match)


def _entry_in_sync(leader: PartitionEntry, follower: PartitionEntry | None) -> bool:
    """Content equality by lineage alone — no file reads. File names may
    differ (leader compaction renames; follower keeps its own copy)."""
    return (follower is not None
            and follower.rows == leader.rows
            and follower.checksum == leader.checksum)


def _copy_partition(src_dir: str, dst_dir: str, part: int,
                    entry: PartitionEntry) -> PartitionEntry:
    """Ship one partition file and verify the shipped bytes against the
    leader's lineage. Runs inside a Ray task (one per changed partition)."""
    t = pq.read_table(os.path.join(src_dir, entry.file))
    checksum = str(content_checksum(t.column("url"), t.column("text"),
                                    t.column("seq")))
    if t.num_rows != entry.rows or checksum != entry.checksum:
        raise RuntimeError(
            f"replicate: leader partition {part} fails its own lineage "
            f"(rows {t.num_rows} vs {entry.rows}, checksum {checksum} vs "
            f"{entry.checksum}) — refusing to ship corrupt data")
    atomic_write_table(t, os.path.join(dst_dir, entry.file))
    return PartitionEntry(file=entry.file, rows=entry.rows,
                          checksum=entry.checksum, watermark=entry.watermark)


def replicate(src_dir: str, dst_dir: str, *,
              generation: int | None = None) -> ReplicateResult:
    """Sync the follower at ``dst_dir`` to the leader lake at ``src_dir``.

    ``generation=`` replicates a RETAINED leader generation (point-in-time
    replica) instead of the live pointer. Idempotent: a re-run after any
    crash point converges to the same committed state; a no-change re-run
    copies nothing. Partitions are shipped by parallel Ray tasks — at a
    100 TB lake an incremental sync moves only the partitions the last
    replay window touched."""
    leader = (manifest_at(src_dir, generation) if generation is not None
              else load_manifest(src_dir))
    if leader is None:
        raise FileNotFoundError(f"no committed manifest in {src_dir}")
    from ethereum_etl_ray.pipelines.mor import require_no_deltas

    require_no_deltas(leader, "replicate (leader)")

    lock = acquire_replay_lock(dst_dir)
    try:
        follower = load_manifest(dst_dir)
        if follower is not None and follower.partitions and \
                follower.num_partitions != leader.num_partitions:
            raise ValueError(
                f"follower partitioning ({follower.num_partitions}) differs "
                f"from leader ({leader.num_partitions}); physical replication "
                "requires the shared url-hash partitioner — re-init the "
                "follower directory")

        parts: dict[str, PartitionEntry] = {}
        to_copy: list[tuple[int, PartitionEntry]] = []
        skipped = 0
        for key, entry in leader.partitions.items():
            prev = follower.partitions.get(key) if follower is not None else None
            if _entry_in_sync(entry, prev):
                parts[key] = prev          # keep the follower's own file
                skipped += 1
            elif entry.rows == 0:
                # empty partitions carry lineage but no readable file
                # (Manifest.files and fsck skip rows == 0)
                parts[key] = PartitionEntry(file=entry.file, rows=0,
                                            checksum=entry.checksum,
                                            watermark=entry.watermark)
            else:
                to_copy.append((int(key), entry))
        # follower partitions absent from the leader (post-restore shrink)
        # are dropped from lineage; their files become GC-able orphans

        if to_copy:
            src, dst = src_dir, dst_dir

            def ship(batch: pa.Table) -> pa.Table:
                out = []
                for part in batch.column("part").to_pylist():
                    e = by_part[part]
                    ne = _copy_partition(src, dst, part, e)
                    out.append({"part": part, "file": ne.file,
                                "rows": ne.rows, "checksum": ne.checksum,
                                "watermark": ne.watermark})
                return pa.Table.from_pylist(out)

            by_part = dict(to_copy)
            shipped = (ray.data.from_items([{"part": p} for p, _ in to_copy])
                       .map_batches(ship, batch_size=1, batch_format="pyarrow")
                       .to_pandas())  # O(partitions) summary rows
            for row in shipped.itertuples(index=False):
                parts[str(int(row.part))] = PartitionEntry(
                    file=row.file, rows=int(row.rows), checksum=row.checksum,
                    watermark=int(row.watermark))

        manifest = Manifest(
            watermark=leader.watermark,
            schema_version=leader.schema_version,
            num_partitions=leader.num_partitions,
            merge_mode=leader.merge_mode,
            partitions=parts,
            metrics={
                "replica_of": os.path.abspath(src_dir),
                "leader_generation": leader.generation,
                "leader_watermark": leader.watermark,
                "copied_parts": len(to_copy),
                "skipped_parts": skipped,
            },
        )
        from ethereum_etl_ray.state.manifest import commit_manifest

        commit_manifest(dst_dir, manifest)
        return ReplicateResult(dst_dir, manifest, len(to_copy), skipped)
    finally:
        release_replay_lock(lock)


def replica_verify(src_dir: str, dst_dir: str, *, deep: bool = False) -> dict:
    """Convergence check: does the follower's committed lineage match the
    leader's? Zero data reads by default (the checksums ARE content);
    ``deep=True`` additionally re-reads every follower partition file and
    verifies its bytes against the LEADER's checksum (bit-rot audit) —
    partition-parallel like ``fsck_lake``."""
    leader = load_manifest(src_dir)
    follower = load_manifest(dst_dir)
    if leader is None:
        raise FileNotFoundError(f"no committed manifest in {src_dir}")
    from ethereum_etl_ray.pipelines.mor import require_no_deltas

    require_no_deltas(leader, "replica_verify (leader)")
    rep: dict = {
        "watermark_src": leader.watermark,
        "watermark_dst": follower.watermark if follower else None,
        "mismatched": [],
        "deep_corrupt": [],
    }
    if follower is None:
        rep["in_sync"] = False
        rep["mismatched"] = sorted(int(k) for k in leader.partitions)
        return rep
    for key, entry in leader.partitions.items():
        if not _entry_in_sync(entry, follower.partitions.get(key)) \
                and entry.rows > 0:
            rep["mismatched"].append(int(key))
    for key in follower.partitions:
        if key not in leader.partitions:
            rep["mismatched"].append(int(key))
    rep["mismatched"].sort()
    rep["in_sync"] = (not rep["mismatched"]
                      and follower.watermark == leader.watermark)

    if deep and rep["in_sync"]:
        entries = [(int(k), leader.partitions[k], follower.partitions[k])
                   for k in leader.partitions if leader.partitions[k].rows > 0]
        by_part = {p: (le, fe) for p, le, fe in entries}

        def scrub(batch: pa.Table) -> pa.Table:
            out = []
            for part in batch.column("part").to_pylist():
                le, fe = by_part[part]
                try:
                    t = pq.read_table(os.path.join(dst_dir, fe.file))
                    ck = str(content_checksum(t.column("url"),
                                              t.column("text"),
                                              t.column("seq")))
                    ok = t.num_rows == le.rows and ck == le.checksum
                except Exception as exc:
                    ck, ok = f"<unreadable: {exc}>", False
                out.append({"part": part, "ok": ok, "checksum_actual": ck,
                            "checksum_expected": le.checksum})
            return pa.Table.from_pylist(out)

        if entries:
            stats = (ray.data.from_items([{"part": p} for p, _, _ in entries])
                     .map_batches(scrub, batch_size=1, batch_format="pyarrow")
                     .to_pandas())
            bad = stats[~stats.ok]
            rep["deep_corrupt"] = bad.to_dict("records")
            rep["in_sync"] = rep["in_sync"] and bad.empty
    return rep
