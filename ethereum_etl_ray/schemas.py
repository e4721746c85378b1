"""Single Arrow schema registry (fixes the reference's triple-declared types).

The reference declares every table's types three times, inconsistently
(SQLAlchemy ORM, SQLite/DuckDB DDL, ClickHouse DDL — SURVEY §1.2). Here one
``pyarrow.Schema`` per (table, version) is the sole source of truth; the
conform stage (``stages.conform``) rewrites in-flight batches to the target
version (column add / type widen), mirroring the reference's fork-dependent
nullable columns (``src/tasks/extract/block.py:29-34``) and declared-ahead
enrich column groups (``src/schemas/sql/event.py:19-30``).
"""

from __future__ import annotations

import pyarrow as pa

# --------------------------------------------------------------------------
# change_events — the replayed CDC log (FIXTURES.md §2/§3)
# --------------------------------------------------------------------------

EVENTS_SCHEMA_V1 = pa.schema(
    [
        pa.field("seq", pa.int64()),          # global offset; total order & watermark
        pa.field("op", pa.string()),          # insert | update | delete
        pa.field("url", pa.string()),         # CDC merge key (reference PK, SURVEY §1.4)
        pa.field("warc_ts", pa.timestamp("us")),  # LWW version major component
        pa.field("html", pa.binary()),        # null for delete
        pa.field("lang", pa.string()),        # null for delete
        pa.field("content_len", pa.int32()),
    ]
)

# v2 = schema evolution: ADD fetch_status, WIDEN lang → large_string,
# content_len int32 → int64 (FIXTURES.md §3)
EVENTS_SCHEMA_V2 = pa.schema(
    [
        pa.field("seq", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("lang", pa.large_string()),
        pa.field("content_len", pa.int64()),
        pa.field("fetch_status", pa.int32()),
    ]
)

# --------------------------------------------------------------------------
# pages — the lake table (input_hint shape + lineage columns)
# --------------------------------------------------------------------------

# input_hint columns (url, warc_ts, html, text, lang) + lineage (seq) carried
# so incremental merges can compare versions without re-reading the log.
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.large_string()),
        pa.field("seq", pa.int64()),
        pa.field("fetch_status", pa.int32()),
    ]
)

EVENT_VERSIONS: dict[int, pa.Schema] = {1: EVENTS_SCHEMA_V1, 2: EVENTS_SCHEMA_V2}
LATEST_EVENT_VERSION = 2

# widening casts the conform stage is allowed to perform implicitly
_SAFE_WIDENINGS: set[tuple[str, str]] = {
    ("int8", "int16"), ("int8", "int32"), ("int8", "int64"),
    ("int16", "int32"), ("int16", "int64"),
    ("int32", "int64"),
    ("uint8", "uint16"), ("uint8", "uint32"), ("uint8", "uint64"),
    ("uint16", "uint32"), ("uint16", "uint64"),
    ("uint32", "uint64"),
    ("float", "double"),
    ("string", "large_string"),
    ("binary", "large_binary"),
}


def is_safe_widening(src: pa.DataType, dst: pa.DataType) -> bool:
    return src.equals(dst) or (str(src), str(dst)) in _SAFE_WIDENINGS


class SchemaEvolutionError(TypeError):
    pass
