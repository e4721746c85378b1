"""Streaming message sink tests (stages.sinks ↔ reference X3/X4,
src/tasks/export/nats.py:11-29)."""

import os

import pyarrow as pa
import ray.data

from ethereum_etl_ray.pipelines.builder import SINKS
from ethereum_etl_ray.stages.sinks import make_publisher, publish_dataset, read_queue


def _ds(n=100):
    return ray.data.from_items(
        [{"seq": i, "url": f"https://x/{i}", "payload": bytes([i % 256])}
         for i in range(n)])


def test_publish_roundtrip_and_counts(tmp_path):
    q = str(tmp_path / "queue")
    stats = publish_dataset(_ds(100), q)
    assert stats["records"] == 100
    rows = read_queue(q)
    assert len(rows) == 100
    assert {r["seq"] for r in rows} == set(range(100))
    assert rows[0]["payload"] == bytes([rows[0]["seq"] % 256]).hex()


def test_publish_is_idempotent_under_retry(tmp_path):
    """A re-executed (retried) publish task must not duplicate messages:
    identical payload → identical message id → same file overwritten."""
    q = str(tmp_path / "queue")
    pub = make_publisher(q)
    batch = pa.table({"seq": [1, 2, 3], "v": ["a", "b", "c"]})
    s1 = pub(batch)
    files_1 = sorted(os.listdir(q))
    s2 = pub(batch)  # simulated task retry
    assert sorted(os.listdir(q)) == files_1
    assert s1.column("message_id").to_pylist() == s2.column("message_id").to_pylist()
    assert len(read_queue(q)) == 3


def test_publisher_splits_large_batches(tmp_path):
    q = str(tmp_path / "queue")
    pub = make_publisher(q, max_records_per_message=10)
    out = pub(pa.table({"seq": list(range(25))}))
    assert out.num_rows == 3  # 10 + 10 + 5
    assert out.column("n_records").to_pylist() == [10, 10, 5]
    assert len(read_queue(q)) == 25


def test_queue_sink_registered(tmp_path):
    q = str(tmp_path / "queue")
    assert "queue" in SINKS
    stats = SINKS["queue"](_ds(10), q)
    assert stats["records"] == 10 and len(read_queue(q)) == 10


def test_zero_row_batch_publishes_nothing(tmp_path):
    """An empty batch must not publish a junk empty message or inflate the
    message count."""
    q = str(tmp_path / "queue")
    empty = pa.table({"seq": pa.array([], pa.int64())})
    summary = make_publisher(q)(empty)
    assert summary.num_rows == 0
    assert read_queue(q) == []
    assert not os.path.isdir(q) or os.listdir(q) == []
