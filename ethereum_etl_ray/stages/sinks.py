"""Streaming message sink — the X3/X4 analogue (reference
``src/tasks/export/nats.py:11-29`` per-batch NATS publish and the ClickHouse
streaming insert ``src/repositories/clickhouse/event.py:26-93``).

No message broker exists in this environment, so the transport is a
file-backed queue directory with the same contract a broker publish needs:

  * per-BATCH publish from inside ``map_batches`` (fuses with the upstream
    read — records stream out as blocks are produced, no terminal barrier
    materialization);
  * messages are JSON-lines with deterministic key order (the "use all type
    as string" ClickHouse degradation is the consumer's choice, not ours);
  * **idempotent under Ray task retry**: the message id is a content digest
    of the serialized payload, and the write is tmp+rename — a re-executed
    task republishes the identical bytes to the identical name, so consumers
    never see duplicates (the reference gets the same property from broker
    de-dup / idempotent upsert).

Swapping the transport for a real broker means replacing ``_write_message``
with a publish call keyed by the same deterministic message id.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import ray.data


def _serialize_rows(batch: pa.Table) -> bytes:
    """Reference row-loop serializer — kept as the byte-identity oracle for
    the vectorized path (tests/test_sinks.py asserts equality)."""
    rows = batch.to_pylist()
    out = []
    for r in rows:
        out.append(json.dumps(
            {k: (v.hex() if isinstance(v, bytes) else
                 v.isoformat() if hasattr(v, "isoformat") else v)
             for k, v in r.items()},
            sort_keys=True, ensure_ascii=False))
    return ("\n".join(out) + "\n").encode()


def _serialize(batch: pa.Table) -> bytes:
    """Vectorized JSON-lines serializer: hex / ISO / quoting / assembly all
    run as Arrow kernels (functions.wire); byte-identical to
    ``_serialize_rows``."""
    from ethereum_etl_ray.functions.wire import json_lines

    lines = json_lines(batch)
    lv = pa.ListArray.from_arrays(
        pa.array([0, batch.num_rows], pa.int32()), lines)
    import pyarrow.compute as pc

    return (pc.binary_join(lv, "\n")[0].as_py() + "\n").encode()


def _write_message(queue_dir: str, payload: bytes) -> str:
    mid = hashlib.sha1(payload).hexdigest()[:20]
    os.makedirs(queue_dir, exist_ok=True)
    final = os.path.join(queue_dir, f"msg-{mid}.jsonl")
    tmp = final + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, final)
    return mid


def make_publisher(queue_dir: str, max_records_per_message: int = 4096):
    """map_batches stage: publish each batch as ≥1 queue message, return one
    summary row per message ``(message_id, n_records)``."""

    def publish(batch: pa.Table) -> pa.Table:
        mids, counts = [], []
        # a zero-row batch publishes nothing (no junk empty message and no
        # inflated message count) — just an empty summary
        for off in range(0, batch.num_rows, max_records_per_message):
            piece = batch.slice(off, max_records_per_message)
            mids.append(_write_message(queue_dir, _serialize(piece)))
            counts.append(piece.num_rows)
        return pa.table({"message_id": pa.array(mids, pa.string()),
                         "n_records": pa.array(counts, pa.int64())})

    return publish


def publish_dataset(ds: ray.data.Dataset, queue_dir: str) -> dict:
    """Stream the whole Dataset into the queue; returns publish stats."""
    summary = ds.map_batches(make_publisher(queue_dir),
                             batch_format="pyarrow").to_pandas()
    return {"messages": len(summary), "records": int(summary.n_records.sum())
            if len(summary) else 0}


def read_queue(queue_dir: str) -> list[dict]:
    """Consumer helper: all queued records in message-name order."""
    rows: list[dict] = []
    if not os.path.isdir(queue_dir):
        return rows
    for name in sorted(os.listdir(queue_dir)):
        if not (name.startswith("msg-") and name.endswith(".jsonl")):
            continue
        with open(os.path.join(queue_dir, name)) as f:
            rows.extend(json.loads(line) for line in f if line.strip())
    return rows


def _register():
    from ethereum_etl_ray.pipelines.builder import register_sink

    register_sink("queue", lambda ds, dest: publish_dataset(ds, dest))


_register()
