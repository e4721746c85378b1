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


def test_jsonl_delete_only_shard_reads(tmp_path):
    """A delete-only feed has all-null html/lang/content_len; the JSON reader
    infers those as Arrow `null` and the decode stage must cast them to the
    declared types instead of crashing conform."""
    import json

    dest = tmp_path / "wire3"
    dest.mkdir()
    with open(dest / "events.json", "w") as f:
        for seq in (1, 2):
            f.write(json.dumps({
                "seq": seq, "op": "delete", "url": f"https://x/{seq}",
                "warc_ts": "2024-03-01T00:00:01", "html": None, "lang": None,
                "content_len": None, "fetch_status": None}) + "\n")
    out = read_events_jsonl([str(dest)]).to_pandas()
    assert len(out) == 2
    assert out.op.tolist() == ["delete", "delete"]
    assert out.html.isna().all() and out.lang.isna().all()


def test_jsonl_reader_conforms_schema(tiny_corpus, tmp_path):
    from ethereum_etl_ray.schemas import EVENTS_SCHEMA_V2

    dest = str(tmp_path / "wire2")
    write_events_jsonl(tiny_corpus.events_v2_dir, dest)
    ds = read_events_jsonl([dest])
    t = pa.Table.from_pandas(ds.limit(5).to_pandas(), preserve_index=False)
    assert set(t.column_names) == set(EVENTS_SCHEMA_V2.names)
