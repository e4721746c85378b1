"""Exactly-once sink state: per-partition manifest with atomic commit.

The engine's replacement for the reference's idempotence-based exactly-once
(``INSERT OR REPLACE`` upsert, ``src/repositories/sqlite/base.py:152-175``)
and its manual backup/restore checkpointing
(``src/repositories/sqlite/base.py:81-136``):

  * every merge task writes its partition's Parquet file to a temp name and
    ``os.replace``-renames it into place (idempotent under Ray task retry —
    a re-executed task rewrites identical bytes to the same final name);
  * the driver commits ONE manifest JSON atomically (tmp + rename) after all
    partitions succeed, recording per-partition lineage: file, row count,
    order-independent content checksum, and the offset watermark;
  * resume = load manifest, skip partitions already committed at the target
    watermark, replay only events with ``seq > watermark`` for the rest.

Replay from any checkpoint therefore reconverges to the identical final
table state (verified by tests/test_resume.py).

On a multi-node cluster ``out_dir`` lives on shared storage (S3/NFS); the
rename-based commit maps onto the object store's atomic put.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionEntry:
    file: str            # path relative to out_dir
    rows: int
    checksum: str        # uint64 content checksum as decimal string
    watermark: int       # max seq merged into this partition file


@dataclass
class DeltaEntry:
    """One merge-on-read delta file: a window's per-key winners (tombstones
    kept as ``op='delete'`` rows) for one partition, committed by
    ``pipelines.mor.ingest_delta`` without rewriting the base file."""
    file: str            # path relative to out_dir
    rows: int
    checksum: str        # uint64 content checksum as decimal string
    watermark: int       # max seq folded into this delta file


@dataclass
class Manifest:
    watermark: int = -1
    schema_version: int = 1
    num_partitions: int = 0
    merge_mode: str = "replace"
    partitions: dict[str, PartitionEntry] = field(default_factory=dict)  # str(part) → entry
    # run metrics of the replay that produced this watermark (north_rule:
    # "per-partition lineage + metrics"): phase durations, row counts, route
    metrics: dict = field(default_factory=dict)
    # monotone commit counter — every commit (replay, retention, compaction,
    # restore) is a new generation; the last KEEP_GENERATIONS are retained
    # on disk as manifest-g*.json and restorable (reference backup/restore,
    # src/repositories/sqlite/base.py:81-136)
    generation: int = 0
    # merge-on-read delta files per partition (str(part) → entries in commit
    # order). Non-empty deltas mean the BASE files alone are stale: readers
    # must go through ``pipelines.mor`` / ``load_lake`` (delta-aware), and
    # base-rewriting writers (replay/retention/delete/compact/replicate)
    # refuse until ``compact_deltas`` folds them in.
    deltas: dict[str, list[DeltaEntry]] = field(default_factory=dict)

    def entry(self, part: int) -> PartitionEntry | None:
        return self.partitions.get(str(part))

    def files(self, out_dir: str) -> list[str]:
        return [os.path.join(out_dir, e.file) for e in self.partitions.values() if e.rows > 0]

    def delta_entries(self, part: int) -> list[DeltaEntry]:
        return self.deltas.get(str(part), [])

    def delta_files(self, out_dir: str) -> list[str]:
        return [os.path.join(out_dir, e.file)
                for es in self.deltas.values() for e in es if e.rows > 0]

    def has_deltas(self) -> bool:
        return any(es for es in self.deltas.values())


MANIFEST_NAME = "_manifest.json"
GENERATION_GLOB = "manifest-g*.json"
KEEP_GENERATIONS = 5


def _load_manifest_file(path: str) -> Manifest | None:
    if not os.path.exists(path):
        return None
    raw = json.load(open(path))
    parts = {k: PartitionEntry(**v) for k, v in raw.pop("partitions", {}).items()}
    deltas = {k: [DeltaEntry(**d) for d in v]
              for k, v in raw.pop("deltas", {}).items()}
    return Manifest(partitions=parts, deltas=deltas, **raw)


def load_manifest(out_dir: str) -> Manifest | None:
    return _load_manifest_file(os.path.join(out_dir, MANIFEST_NAME))


def _gen_path(out_dir: str, generation: int) -> str:
    return os.path.join(out_dir, f"manifest-g{generation:08d}.json")


def list_generations(out_dir: str) -> list[tuple[int, int]]:
    """Retained (generation, watermark) pairs, ascending by generation."""
    import glob as _glob

    out = []
    for p in sorted(_glob.glob(os.path.join(out_dir, GENERATION_GLOB))):
        m = _load_manifest_file(p)
        if m is not None:
            out.append((m.generation, m.watermark))
    return out


def _atomic_json(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def commit_manifest(out_dir: str, manifest: Manifest,
                    keep_generations: int = KEEP_GENERATIONS) -> None:
    """Atomic all-or-nothing commit (tmp file + rename) with generation
    history: every commit also lands as ``manifest-g<N>.json`` (the last
    ``keep_generations`` are retained and restorable via
    ``restore_generation``; their partition files are protected from GC).
    The generation file is written BEFORE the live pointer flips — a crash
    in between leaves the live manifest untouched and only an orphan
    generation file, which the next commit's numbering overwrites."""
    os.makedirs(out_dir, exist_ok=True)
    live = load_manifest(out_dir)
    manifest.generation = (live.generation if live else 0) + 1
    payload = asdict(manifest)
    _atomic_json(_gen_path(out_dir, manifest.generation), payload)
    _atomic_json(os.path.join(out_dir, MANIFEST_NAME), payload)
    retained = list_generations(out_dir)
    for gen, _wm in retained[:max(0, len(retained) - keep_generations)]:
        try:
            os.remove(_gen_path(out_dir, gen))
        except OSError:
            pass


def manifest_at(out_dir: str, generation: int) -> Manifest:
    """Read-only load of a RETAINED generation's manifest (time travel —
    no pointer flip, no lock; the generation's partition files are protected
    from GC while it stays inside the retention window). Raises if the
    generation aged out or references missing files."""
    m = _load_manifest_file(_gen_path(out_dir, generation))
    if m is None:
        raise FileNotFoundError(
            f"no retained generation {generation} in {out_dir} "
            f"(retained: {list_generations(out_dir)})")
    missing = [p for p in m.files(out_dir) + m.delta_files(out_dir)
               if not os.path.exists(p)]
    if missing:
        raise RuntimeError(
            f"generation {generation} references {len(missing)} missing "
            f"partition files (e.g. {missing[0]})")
    return m


def restore_generation(out_dir: str, watermark: int | None = None,
                       generation: int | None = None) -> Manifest:
    """Flip the live manifest back to a retained generation — addressed by
    ``watermark`` (the newest generation at it, if several commits share it
    — e.g. a replay then a compaction) or by exact ``generation`` (needed to
    reach e.g. the pre-retention state, which shares its watermark with the
    post-retention commit). The restore itself commits as a NEW generation,
    so history stays linear and the pre-restore state remains restorable
    too. Holds the replay lock (writer-exclusive with replay/retention/GC)."""
    if (watermark is None) == (generation is None):
        raise ValueError("pass exactly one of watermark= or generation=")
    lock = acquire_replay_lock(out_dir)
    try:
        if generation is not None:
            cand = [g for g, _wm in list_generations(out_dir) if g == generation]
        else:
            cand = [g for g, wm in list_generations(out_dir) if wm == watermark]
        if not cand:
            raise FileNotFoundError(
                f"no retained generation at "
                f"{'watermark ' + str(watermark) if generation is None else 'generation ' + str(generation)} "
                f"in {out_dir} (retained: {list_generations(out_dir)})")
        m = _load_manifest_file(_gen_path(out_dir, max(cand)))
        missing = [p for p in m.files(out_dir) + m.delta_files(out_dir)
                   if not os.path.exists(p)]
        if missing:
            raise RuntimeError(
                f"generation {max(cand)} references {len(missing)} missing "
                f"partition files (e.g. {missing[0]}) — cannot restore")
        commit_manifest(out_dir, m)
        return m
    finally:
        release_replay_lock(lock)


def atomic_write_table(table, final_path: str) -> None:
    """Write a Parquet file so it appears atomically at ``final_path``."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = final_path + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, final_path)


REPLAY_LOCK = ".replay.lock"


def _lock_holder_pid(path: str) -> int:
    """The pid recorded in the lock file, or -1 if unreadable/garbage."""
    try:
        return int(open(path).read().strip() or -1)
    except (OSError, ValueError):
        return -1


def _lock_holder_alive(path: str) -> bool:
    """True when the lock's recorded pid is a live process — including our
    OWN pid: a second acquire from the process that already holds the lock
    must NOT treat it as stale (stealing it would end mutual exclusion
    against third processes the moment either holder releases). Only a dead
    pid marks the lock stale (crashed run) and claimable. EPERM from the
    probe signal means the process EXISTS (owned by another user) — that is
    a live holder, not a stale lock."""
    pid = _lock_holder_pid(path)
    if pid <= 0:
        return False
    if pid == os.getpid():
        return True
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def acquire_replay_lock(out_dir: str) -> str:
    """Advisory write lock so compaction/GC cannot race an in-flight replay
    (on a cluster ``out_dir`` is shared storage, so the lock file is visible
    to every driver; the pid liveness check is only meaningful node-local —
    cross-node stale locks must be removed by the operator).

    Atomic: creation uses ``O_CREAT|O_EXCL`` so two racing writers cannot
    both acquire. A stale lock (dead or own pid) is claimed by RENAMING it
    to a unique name first — exactly one claimant's rename succeeds (a bare
    remove would let the loser delete the winner's freshly created lock) —
    then re-racing the O_EXCL create."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, REPLAY_LOCK)
    for _ in range(8):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            if _lock_holder_pid(path) == os.getpid():
                # non-reentrant by design: a same-process re-acquire (e.g. a
                # retention thread while replay holds the lock) must fail
                # loudly, not silently steal the lock
                raise RuntimeError(
                    f"this process already holds {path}; the replay lock is "
                    "not reentrant — finish the other operation first")
            if _lock_holder_alive(path):
                raise RuntimeError(
                    f"another replay holds {path}; concurrent writers would "
                    "corrupt the lake (remove the lock only if that process "
                    "is gone)")
            claim = f"{path}.stale.{os.getpid()}"
            try:  # atomic claim: only ONE racer's rename of the stale file wins
                os.rename(path, claim)
                os.remove(claim)
            except OSError:
                pass  # lost the claim race — loop and re-evaluate
            continue
        with os.fdopen(fd, "w") as f:
            f.write(str(os.getpid()))
            f.flush()
            os.fsync(f.fileno())
        return path
    raise RuntimeError(f"could not acquire {path} (livelocked on stale locks)")


def release_replay_lock(path: str) -> None:
    try:
        os.remove(path)
    except OSError:
        pass


def gc_uncommitted(out_dir: str) -> list[str]:
    """``compact``-style GC: drop partition files not referenced by the
    committed manifest (orphans from crashed runs / superseded watermarks).
    Reference analogue: ``drop_backup`` (src/repositories/sqlite/base.py:126-136).

    Refuses to run while a live replay holds the lake's replay lock —
    otherwise GC could delete partition files already renamed into place but
    not yet referenced by a committed manifest, leaving the next commit
    pointing at deleted files.
    """
    lock = os.path.join(out_dir, REPLAY_LOCK)
    if os.path.exists(lock) and _lock_holder_alive(lock) \
            and _lock_holder_pid(lock) != os.getpid():
        # a FOREIGN live holder blocks GC; our own pid holding the lock is
        # the compact/retention flow GC-ing under its own writer lock
        raise RuntimeError(f"replay in progress ({lock}); refusing to GC")
    import glob as _glob

    # protect every retained generation's files, not just the live set —
    # otherwise GC after a new commit would break restore_generation
    keep = set()
    manifests = [load_manifest(out_dir)] + [
        _load_manifest_file(p)
        for p in _glob.glob(os.path.join(out_dir, GENERATION_GLOB))]
    for m in manifests:
        if m is not None:
            keep.update(os.path.abspath(p) for p in m.files(out_dir))
            keep.update(os.path.abspath(p) for p in m.delta_files(out_dir))
    removed = []
    for dirpath, _dirs, names in os.walk(out_dir):
        for n in names:
            p = os.path.abspath(os.path.join(dirpath, n))
            if n == MANIFEST_NAME or p in keep:
                continue
            if n.endswith(".parquet") or ".tmp." in n:
                os.remove(p)
                removed.append(p)
    return removed
