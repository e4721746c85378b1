"""Engine configuration.

Replaces the reference's pydantic-settings env config
(``src/configs/environment.py:15-52``) with a plain dataclass passed to the
pipeline builders — no env-var magic, explicit knobs only.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """Knobs for the CDC replay engine.

    Scale notes (100 TB / multi-node):
      * ``num_partitions`` must be ≫ total cores so the merge shuffle balances
        (reference analogue: ``--pending-queue-size`` admission bound,
        ``src/clis/historical.py:27``). Single-node tests use a small value.
      * ``batch_size_rows`` bounds a batch of wide binary ``html`` rows; the
        byte budget matters more than the row count — keep
        ``batch_size_rows × avg_html_bytes × concurrency`` under the worker
        heap.
      * ``out_dir`` must be shared storage (S3 / NFS) on a real cluster; every
        merge task writes its partition file there and the driver commits the
        manifest atomically.
    """

    num_partitions: int = 64
    batch_size_rows: int = 16384
    # Late materialization (default): pass 1 shuffles only the ~20-byte
    # (url, warc_ts, seq, op) version tuples to elect per-key winners; pass 2
    # re-reads the log, keeps ONLY winner rows, and extracts/writes them. The
    # wide html payload never enters the shuffle — measured ~4× on the 3M-event
    # bench and the gap grows with payload width. False = single-pass (payload
    # through the shuffle), better when nearly every event wins (no updates).
    late_materialization: bool = True
    # Physical shuffle for the single-pass route: "sort" = Ray's built-in
    # sort-based all-to-all; "file" = explicit bucket shuffle (spill lz4
    # Arrow-IPC files per partition from inside the fused read task, merge
    # tasks read exactly their bucket). "file" keeps the wide payload out of
    # the object store entirely; on a cluster the spill dir is shared storage.
    shuffle: str = "sort"
    # Scratch space for the file shuffle. None → /dev/shm when present (RAM;
    # 32 concurrent spill writers collapsed the virtio disk queue: 8.8 s →
    # 132 s on the 3M-row bulk bench), else alongside out_dir. On a cluster:
    # per-node local NVMe, or shared storage when merge tasks may land on
    # other nodes.
    shuffle_scratch: str | None = None
    # Must be set True (with shuffle_scratch on NFS/shared storage) to run the
    # file shuffle on a multi-node cluster — node-local scratch would silently
    # lose buckets spilled on other nodes, so replay fails fast otherwise.
    shuffle_scratch_shared: bool = False
    # Pass-2 winner filter route. At or below this many ESTIMATED events
    # (slim-scan parquet metadata row count — a free upper bound on winners)
    # the election result is collected to the driver and broadcast as an
    # exact seq array (fastest at small scale). Above it the election result
    # NEVER materializes on the driver: each election group task emits a
    # per-partition winner Bloom shard, the driver receives ONE summary row
    # per partition (O(P)), and pass 2 tests each event against its
    # url-partition's shard. False positives just lose the LWW/FWW merge
    # downstream; false negatives cannot occur — so correctness is unaffected
    # while driver memory stays O(P + bloom bits).
    # The estimate is an upper bound: update-heavy logs have far fewer keys
    # than events, and a 20M-seq exact array is only ~160 MB of driver
    # memory/broadcast — so the sharded route engages at genuine web scale.
    winner_exact_threshold: int = 20_000_000
    winner_fp_rate: float = 1e-3
    # Quarantine malformed events (null url / unknown op) into
    # out_dir/_deadletter instead of failing the replay (the reference RAISES
    # on malformed rows, src/tasks/extract/transfer.py:25-27 — a single bad
    # record would kill a 10^10-event job).
    quarantine: bool = True
    # LWW ("replace", reference INSERT OR REPLACE) vs first-writer-wins
    # ("ignore", reference INSERT OR IGNORE, src/repositories/sqlite/base.py:159-172)
    merge_mode: str = "replace"
    # Event seqs to EXCLUDE from this replay (int array). Used by the
    # allowed-lateness tailer: late events are routed to out_dir/_late and
    # withheld from the merge, so the lake equals a sequential replay over
    # the KEPT stream only. Broadcast once via ray.put and np.isin-filtered
    # inside the fused read branch of both passes — bounded by design at
    # O(late events in the current tail window), never corpus-sized.
    exclude_seqs: object = None
    # skew handling: Misra-Gries heavy-hitter detection on a sample pass, then
    # pre-reduction of hot keys before the wide shuffle (SURVEY §7.4)
    skew_detect: bool = False
    skew_sample_fraction: float = 0.05
    skew_hot_threshold: float = 0.01  # key freq fraction to count as "hot"
    extra: dict = field(default_factory=dict)
