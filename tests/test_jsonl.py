"""JSONL wire-format adapter roundtrip (sources.jsonl ↔ reference JSON-RPC /
NATS JSON ingestion, src/clients/rpc_client.py:60-117)."""

import pyarrow as pa

from ethereum_etl_ray.pipelines.replay import load_events
from ethereum_etl_ray.sources.jsonl import read_events_jsonl, write_events_jsonl


def test_jsonl_roundtrip_matches_parquet_source(tiny_corpus, tmp_path):
    dest = str(tmp_path / "wire")
    n = write_events_jsonl(tiny_corpus.events_v2_dir, dest)
    assert n > 0

    via_jsonl = read_events_jsonl([dest]).to_pandas().sort_values("seq") \
        .reset_index(drop=True)
    via_parquet = load_events([tiny_corpus.events_v2_dir]).to_pandas() \
        .sort_values("seq").reset_index(drop=True)
    assert len(via_jsonl) == n == len(via_parquet)
    assert list(via_jsonl.columns) == list(via_parquet.columns)
    for col in via_parquet.columns:
        assert via_jsonl[col].tolist() == via_parquet[col].tolist(), col


def test_jsonl_reader_conforms_schema(tiny_corpus, tmp_path):
    from ethereum_etl_ray.schemas import EVENTS_SCHEMA_V2

    dest = str(tmp_path / "wire2")
    write_events_jsonl(tiny_corpus.events_v2_dir, dest)
    ds = read_events_jsonl([dest])
    t = pa.Table.from_pandas(ds.limit(5).to_pandas(), preserve_index=False)
    assert set(t.column_names) == set(EVENTS_SCHEMA_V2.names)
