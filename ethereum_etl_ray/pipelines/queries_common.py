"""Shared helpers for the query-registry shards."""

# This module is one shard of the query registry; see
# ethereum_etl_ray/pipelines/queries.py for assembly and ordering.

from __future__ import annotations

import numpy as np
import ray.data


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(x: np.ndarray) -> np.ndarray:
    """floor(x*100 + 0.5) as int64 — exact parity with the SQL twin."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)
