"""JSONL wire-format adapter for the change log.

The reference ingests JSON payloads off the wire (JSON-RPC batches,
``src/clients/rpc_client.py:60-117``; NATS JSON messages,
``src/tasks/export/nats.py:11-29``) and decodes them into typed rows. This
adapter is the same capability for this engine's event log: events serialize
to JSON lines (base64 html, ISO-8601 timestamps — JSON carries neither binary
nor typed time), and the reader decodes straight back to the canonical Arrow
event schema, so a JSONL feed can replace a parquet shard byte-identically
(tests/test_jsonl.py proves the roundtrip).

Both directions are streaming ``map_batches`` stages; nothing driver-side.
"""

from __future__ import annotations

import base64
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ethereum_etl_ray.schemas import EVENTS_SCHEMA_V2
from ethereum_etl_ray.stages.conform import conform_table


def write_events_jsonl(events_dir: str, dest_dir: str) -> int:
    """Serialize a parquet event shard directory to JSON lines. Returns the
    row count written."""

    def encode(t: pa.Table) -> pa.Table:
        from ethereum_etl_ray.functions.wire import iso_utf8

        # base64 has per-element padding, so unlike hex it cannot be encoded
        # with one call over the concatenated value buffer; the loop below
        # is one C-level b64encode per row
        html = t.column("html").to_pylist()
        b64 = [None if b is None else base64.b64encode(b).decode("ascii")
               for b in html]
        cols = {name: t.column(name) for name in t.column_names}
        cols["html"] = pa.array(b64, pa.string())
        cols["warc_ts"] = iso_utf8(t.column("warc_ts"))
        return pa.table(cols)

    import pyarrow.parquet as pq

    ds = ray.data.read_parquet(events_dir).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True)
    os.makedirs(dest_dir, exist_ok=True)
    ds.write_json(dest_dir)
    # row count from source parquet footers — ds.count() would re-execute the
    # whole read+encode pipeline a second time (Ray Datasets are lazy)
    return sum(pq.read_metadata(os.path.join(events_dir, f)).num_rows
               for f in os.listdir(events_dir) if f.endswith(".parquet"))


def read_events_jsonl(dirs: list[str]) -> ray.data.Dataset:
    """Read a JSONL change-log feed back to the canonical v2 event schema
    (decode wire types, then the same conform stage every source goes
    through)."""

    def decode(t: pa.Table) -> pa.Table:
        b64 = t.column("html").to_pylist()
        html = [None if s is None else base64.b64decode(s) for s in b64]
        raw_ts = t.column("warc_ts")
        if pa.types.is_timestamp(raw_ts.type):
            # Arrow's JSON reader often infers ISO strings as timestamps
            ts = pc.cast(raw_ts, pa.timestamp("us"))
        else:
            ts = pc.strptime(raw_ts, format="%Y-%m-%dT%H:%M:%S",
                             unit="us", error_is_null=True)
            # ISO strings may carry fractional seconds — retry via pandas
            if pc.any(pc.and_(pc.is_null(ts), pc.is_valid(raw_ts))).as_py():
                import pandas as pd

                ts = pa.array(pd.to_datetime(raw_ts.to_pylist()),
                              pa.timestamp("us"))
        cols = {name: t.column(name) for name in t.column_names}
        cols["html"] = pa.array(html, pa.binary())
        cols["warc_ts"] = ts
        for name in list(cols):
            field_idx = EVENTS_SCHEMA_V2.get_field_index(name)
            if field_idx < 0:
                continue
            declared = EVENTS_SCHEMA_V2.field(field_idx).type
            # JSON inference loses declared widths two ways: integers land as
            # int64 (narrow back — conform only allows widenings) and
            # all-null columns (e.g. a delete-only shard's lang) infer as
            # Arrow `null`, which conform rejects
            if (pa.types.is_null(cols[name].type)
                    or (pa.types.is_integer(declared)
                        and not cols[name].type.equals(declared))):
                cols[name] = pc.cast(cols[name], declared)
        out = pa.table(cols)
        return conform_table(out, EVENTS_SCHEMA_V2)

    files = [os.path.join(d, f) for d in dirs for f in sorted(os.listdir(d))
             if f.endswith(".json") or f.endswith(".jsonl")]
    if not files:
        raise FileNotFoundError(f"no jsonl files under {dirs}")
    return ray.data.read_json(files).map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True)
