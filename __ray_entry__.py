"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` exposes the full operator inventory (SURVEY.md §2 plus the
training-data operators); ``oracle_sql()`` pairs every SQL-expressible one
with a DuckDB oracle over the same parquet views. CDC/replay, LSH/sketch and
sampling operators are rows-only here and carry their own oracles in
``tests/`` (sequential-replay conformance, planted duplicates, etc.).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full CDC change-log replay
    (snapshot ∪ v1/v2 schema evolution, LWW merge, tombstones, exactly-once
    manifest sink) returning the final lake state."""
    from ethereum_etl_ray.pipelines.queries import q_cdc_replay_full

    return q_cdc_replay_full("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ethereum_etl_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ethereum_etl_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
