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
class Manifest:
    watermark: int = -1
    schema_version: int = 1
    num_partitions: int = 0
    merge_mode: str = "replace"
    partitions: dict[str, PartitionEntry] = field(default_factory=dict)  # str(part) → entry
    # run metrics of the replay that produced this watermark (north_rule:
    # "per-partition lineage + metrics"): phase durations, row counts, route
    metrics: dict = field(default_factory=dict)

    def entry(self, part: int) -> PartitionEntry | None:
        return self.partitions.get(str(part))

    def files(self, out_dir: str) -> list[str]:
        return [os.path.join(out_dir, e.file) for e in self.partitions.values() if e.rows > 0]


MANIFEST_NAME = "_manifest.json"


def load_manifest(out_dir: str) -> Manifest | None:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    raw = json.load(open(path))
    parts = {k: PartitionEntry(**v) for k, v in raw.pop("partitions", {}).items()}
    return Manifest(partitions=parts, **raw)


def commit_manifest(out_dir: str, manifest: Manifest) -> None:
    """Atomic all-or-nothing commit (tmp file + rename)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, MANIFEST_NAME)
    tmp = path + ".tmp"
    payload = asdict(manifest)
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


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
    m = load_manifest(out_dir)
    keep = {os.path.abspath(p) for p in (m.files(out_dir) if m else [])}
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
