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
    # LWW ("replace", reference INSERT OR REPLACE) vs first-writer-wins
    # ("ignore", reference INSERT OR IGNORE, src/repositories/sqlite/base.py:159-172)
    merge_mode: str = "replace"
    # skew handling: Misra-Gries heavy-hitter detection on a sample pass, then
    # pre-reduction of hot keys before the wide shuffle (SURVEY §7.4)
    skew_detect: bool = False
    skew_sample_fraction: float = 0.05
    skew_hot_threshold: float = 0.01  # key freq fraction to count as "hot"
    # actor-pool sizing for stateful stages
    merge_concurrency: int | None = None  # None → let Ray size it
    extra: dict = field(default_factory=dict)
