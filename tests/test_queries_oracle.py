"""Driver-contract conformance: every queries() entry runs; every oracled one
matches its DuckDB twin exactly (row count + columns + values) at sf0.001."""

import importlib.util
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

spec = importlib.util.spec_from_file_location("check_oracles",
                                              "/root/repo/scripts/check_oracles.py")
check = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in check.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as m

    return m.queries(), m.oracle_sql()


def test_every_oracle_key_has_a_query(contract):
    qs, oracles = contract
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30


ORACLED = [
    "lww_latest_by_key", "fww_first_by_key", "tombstone_merge", "retention_evict",
    "projection_revenue", "explode_tokens", "filter_dispatch", "hex_roundtrip",
    "distinct_union_keys", "anti_join_users", "derived_counts", "table_counts",
    "groupby_agg_pushdown", "heavy_hitter_users", "broadcast_join_brand_rev",
    "hash_join_segment_status", "asof_join_orders", "topk_orders", "window_hourly",
    "exact_dedup_docs", "doc_fingerprint", "lang_id_docs", "quality_docs",
    "embedding_topk", "ann_ivf_topk", "multimodal_decode",
    "enrich_segment_spend", "graph_reach", "ann_ivf_persisted",
    "embedding_cosine_pairs", "deterministic_sample", "cap_per_key",
    "multimodal_frames", "bpe_token_count", "connected_components",
]

ROWS_ONLY = ["winnow_fingerprint", "minhash_lsh_pairs", "near_dedup_keep",
             "simhash_pairs",
             "ngram_jaccard_pairs", "cms_heavy_hitters", "random_sample",
             "cdc_replay_full", "cdc_replay_ignore", "cdc_resume_tail",
             "cdc_bulk_load", "schema_evolution_audit", "stream_publish"]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, contract, duck):
    qs, oracles = contract
    got = check.to_pandas(qs[name](SF))
    want = duck.execute(oracles[name]).df()
    problems = check.compare(name, got, want)
    assert not problems, problems


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, contract):
    qs, _ = contract
    got = check.to_pandas(qs[name](SF))
    assert got is not None and len(got.columns) >= 1


def test_entry_smoke():
    import __ray_entry__ as m

    res = m.entry()
    df = check.to_pandas(res)
    assert len(df) > 0
    assert {"url", "text", "seq", "lang"} <= set(df.columns)
