"""ethereum_etl_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference ETL engine (leson207/ethereum-etl, see SURVEY.md) as Ray Data
pipelines: ``ray.data.Dataset`` → ``map_batches`` over zero-copy Arrow
batches, hash-partitioned LWW merge, exactly-once manifest sink, schema
evolution, skew handling — applied to a CDC workload over a Parquet lake of
Common-Crawl-style web pages (``url, warc_ts, html, text, lang``).

Reference capability map (reference file:line → module):
  block-range batch ingestion  (src/clis/historical.py:67-91)  → pipelines.replay
  WS tailer                    (src/clis/realtime_ws.py:37-84) → pipelines.tail
  extract projections          (src/tasks/extract/*.py)        → functions.html, stages.combine
  INSERT OR REPLACE upsert     (src/repositories/sqlite/base.py:152-175)
  ReplacingMergeTree LWW       (src/repositories/clickhouse/event.py:76-78)
                                                               → stages.merge
  schema drift via .get()      (src/tasks/extract/block.py:29-34) → stages.conform
  backup/restore checkpointing (src/repositories/sqlite/base.py:81-136)
                                                               → state.manifest
  admin scripts                (scripts/*)                     → cli
"""

__version__ = "0.1.0"

from ethereum_etl_ray.config import EngineConfig  # noqa: F401
