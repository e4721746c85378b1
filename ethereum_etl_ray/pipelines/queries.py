"""Operator inventory as driver-checkable queries (SURVEY §2 line-by-line).

Each public ``q_*`` function takes ``sf_dir`` and returns a Dataset / pandas
DataFrame / Arrow table; ``QUERIES`` maps names → callables and ``ORACLE_SQL``
maps the SQL-expressible subset to DuckDB oracles over the same parquet views
(driver contract, ``__ray_entry__.py``). CDC/replay and sketch/LSH operators
that SQL cannot express are rows-only checked by the driver but are covered
by their own oracles in ``tests/``.

Float-parity discipline (driver value-hash): no float ``round`` (half-even vs
half-away divergence); money/value sums use ``floor(x*100 + 0.5)`` cents in
BOTH engines; single-expression float arithmetic (products, negation) is
bit-identical across engines and passed through raw.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ethereum_etl_ray.stages.merge import lww_merge_dataset
from ethereum_etl_ray.util import pool_size

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(x: np.ndarray) -> np.ndarray:
    """floor(x*100 + 0.5) as int64 — exact parity with the SQL twin."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


# --------------------------------------------------------------------------
# CDC merge-core operators on the driver's `events` table (A5/A6/X2 analogues)
# --------------------------------------------------------------------------


def q_lww_latest_by_key(sf_dir: str):
    """INSERT OR REPLACE / ReplacingMergeTree LWW: latest event per user_id,
    version = (ts, event_id). Reference: src/repositories/sqlite/base.py:159-172,
    src/repositories/clickhouse/event.py:76-78."""
    ds = _read(sf_dir, "events", _EVENT_COLS)
    return lww_merge_dataset(ds, key="user_id", version=("ts", "event_id"))


def q_fww_first_by_key(sf_dir: str):
    """INSERT OR IGNORE: first event per user_id (min version)."""
    ds = _read(sf_dir, "events", _EVENT_COLS)
    return lww_merge_dataset(ds, key="user_id", version=("ts", "event_id"), mode="ignore")


def q_tombstone_merge(sf_dir: str):
    """LWW merge + tombstone dispatch: users whose LATEST event is an 'error'
    are dropped (delete-op semantics of the CDC apply stage)."""
    ds = _read(sf_dir, "events", _EVENT_COLS)
    merged = lww_merge_dataset(ds, key="user_id", version=("ts", "event_id"))
    return merged.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("event_type"), pa.scalar("error"))),
        batch_format="pyarrow", zero_copy_batch=True)


def q_retention_evict(sf_dir: str):
    """A8 `free_space` analogue: keep the newest 90% of events by (ts,
    event_id). Reference: src/repositories/sqlite/base.py:210-227.

    No global sort: the eviction boundary is located by distributed
    k-th-element selection (rank summaries + a bounded window move — the
    table itself never shuffles), then applied as a fused filter."""
    from ethereum_etl_ray.stages.selection import kth_smallest, lex_lt

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n = ds.count()
    n_evict = n - int(np.floor(0.9 * n))
    if n_evict <= 0:
        return ds
    cutoff = kth_smallest(ds, ["ts", "event_id"], n_evict)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(lex_lt(t, ["ts", "event_id"], cutoff,
                                         strict=False)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# extract-stage projections / explodes / filters (E1-E12)
# --------------------------------------------------------------------------


def q_projection_revenue(sf_dir: str):
    """E1-style 1:1 projection with derived + renamed columns."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"])

    def project(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = _cents(price * (1.0 - disc) * 1.0)
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_linenumber": t.column("l_linenumber"),
            "revenue_c100": pa.array(rev, pa.int64()),
            "ship_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
        })

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def q_explode_tokens(sf_dir: str):
    """E2/E5 flat_map: one row per token with the parent key stamped on
    (reference explode pattern, src/tasks/extract/transaction.py:5-39)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        parents = pc.take(t.column("doc_id"), pc.list_parent_indices(toks))
        return pa.table({"doc_id": parents, "token": flat})

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def q_filter_dispatch(sf_dir: str):
    """E6/E7 filter + type-dispatch decode: keep two event types, compute a
    per-type signed value (op-dispatch like topic0 dispatch,
    src/tasks/extract/uniswap_v2_event.py:20-32)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])

    def dispatch(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"),
                        value_set=pa.array(["purchase", "signup"]))
        t = t.filter(keep)
        signed = pc.if_else(pc.equal(t.column("event_type"), pa.scalar("purchase")),
                            t.column("value"), pc.negate(t.column("value")))
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "event_type": t.column("event_type"),
            "signed_value": signed,
        })

    return ds.map_batches(dispatch, batch_format="pyarrow", zero_copy_batch=True)


def q_hex_roundtrip(sf_dir: str):
    """E12 scalar utils: hex encode/decode roundtrip (reference hex_to_dec,
    src/utils/common.py:17-21)."""
    ds = _read(sf_dir, "events", ["event_id"])

    def conv(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy()
        hexs = [format(int(x), "x") for x in ids]
        decoded = np.array([int(h, 16) for h in hexs], dtype=np.int64)
        return pa.table({
            "event_id": t.column("event_id"),
            "hex_repr": pa.array(hexs, pa.string()),
            "decoded": pa.array(decoded, pa.int64()),
        })

    return ds.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# distinct / dedup / aggregation (A1-A8)
# --------------------------------------------------------------------------


def q_distinct_union_keys(sf_dir: str):
    """A3 union-distinct over two key sources (token0 ∪ token1 pattern,
    src/tasks/extract/token.py:10-17)."""
    ev = _read(sf_dir, "events", ["user_id"]).map_batches(
        lambda t: pa.table({"key_id": pc.cast(t.column("user_id"), pa.int64())}),
        batch_format="pyarrow")
    od = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda t: pa.table({"key_id": pc.cast(t.column("o_custkey"), pa.int64())}),
        batch_format="pyarrow")
    return ev.union(od).groupby("key_id").count().select_columns(["key_id"])


def q_anti_join_users(sf_dir: str):
    """A1 anti-join heuristic (addresses excluded if seen as contract,
    src/tasks/extract/account.py:20-21): customers with no event activity —
    broadcast key-set membership filter (Bloom-filter shape)."""
    from ethereum_etl_ray.stages.joins import semi_anti_filter

    active = _read(sf_dir, "events", ["user_id"]).unique("user_id")
    cust = _read(sf_dir, "customer", ["c_custkey"])
    return semi_anti_filter(cust, active, on="c_custkey", anti=True)


def q_derived_counts(sf_dir: str):
    """A4 per-row derived counts (transaction_count / log_count pattern)."""
    from ethereum_etl_ray.functions.textstats import token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": token_count(t.column("text")),
            "n_chars_calc": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


_ALL_TABLES = ["customer", "documents", "embeddings", "events", "lineitem",
               "nation", "orders", "part", "region", "supplier"]


def q_table_counts(sf_dir: str):
    """A7 count() per entity table (src/repositories/sqlite/base.py:205-208)."""
    rows = [{"table_name": t, "n": _read(sf_dir, t).count()} for t in _ALL_TABLES]
    return pd.DataFrame(rows)


def q_groupby_agg_pushdown(sf_dir: str):
    """Grouped aggregation with per-batch partial pre-aggregation (combiner
    before the shuffle — the guide's aggregation-at-scale pattern)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": t.column("l_returnflag").to_pandas(),
            "l_linestatus": t.column("l_linestatus").to_pandas(),
            "n_rows": 1,
            "sum_qty": t.column("l_quantity").to_numpy().astype(np.int64),
            "sum_price_c100": _cents(t.column("l_extendedprice").to_numpy()),
            "sum_disc_price_c100": _cents(
                t.column("l_extendedprice").to_numpy()
                * (1.0 - t.column("l_discount").to_numpy()) * 1.0),
        })
        agg = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("sum_qty", alias_name="sum_qty"),
                   Sum("sum_price_c100", alias_name="sum_price_c100"),
                   Sum("sum_disc_price_c100", alias_name="sum_disc_price_c100"))
    )


def q_heavy_hitter_users(sf_dir: str):
    """Key-frequency heavy hitters (skew-detection operator; exact
    partial-count path of stages.sketch)."""
    from ethereum_etl_ray.stages.sketch import heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    df = heavy_hitters(ds, "user_id", top_k=20)
    return df[["user_id", "n"]]


# --------------------------------------------------------------------------
# joins (J1-J7)
# --------------------------------------------------------------------------


def q_broadcast_join_brand_rev(sf_dir: str):
    """J1-J4 broadcast/dimension join: part shipped once via ray.put, lookup
    per batch, partial sums, tiny final groupby."""
    import ray as _ray

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    ref = _ray.put(part.set_index("p_partkey")["p_brand"])
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    class JoinPartial:
        def __init__(self):
            self.brand = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            brands = self.brand.reindex(t.column("l_partkey").to_numpy()).to_numpy()
            rev = _cents(t.column("l_extendedprice").to_numpy()
                         * (1.0 - t.column("l_discount").to_numpy()) * 1.0)
            df = pd.DataFrame({"p_brand": brands, "n_items": 1, "rev_c100": rev})
            agg = df.groupby("p_brand", as_index=False).sum()
            return pa.Table.from_pandas(agg, preserve_index=False)

    return (
        li.map_batches(JoinPartial, batch_format="pyarrow",
                       concurrency=pool_size(4), zero_copy_batch=True)
        .groupby("p_brand")
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("rev_c100", alias_name="rev_c100"))
    )


def q_hash_join_segment_status(sf_dir: str):
    """Large-large equi-join via the hash-shuffle Dataset.join, then grouped
    aggregate."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    import ray as _ray

    n_parts = max(2, int(_ray.cluster_resources().get("CPU", 8)) // 2)
    joined = orders.join(cust, join_type="inner", num_partitions=n_parts,
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c_mktsegment": t.column("c_mktsegment").to_pandas(),
            "o_orderstatus": t.column("o_orderstatus").to_pandas(),
            "n_orders": 1,
            "total_c100": _cents(t.column("o_totalprice").to_numpy()),
        })
        agg = df.groupby(["c_mktsegment", "o_orderstatus"], as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["c_mktsegment", "o_orderstatus"])
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("total_c100", alias_name="total_c100"))
    )


def q_asof_join_orders(sf_dir: str):
    """As-of (backward) join: each event matched to the customer's latest
    order at event time. Bucketed variant — both sides hash-partitioned on
    the by-key and merged per bucket; the fact table is never
    driver-materialized (the 100 TB path)."""
    from ray.data.aggregate import Max

    from ethereum_etl_ray.stages.joins import bucketed_asof

    # dedupe ties distributed: one orderkey (max) per (custkey, orderdate)
    orders = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])
        .groupby(["o_custkey", "o_orderdate"])
        .aggregate(Max("o_orderkey", alias_name="o_orderkey"))
    )
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = bucketed_asof(ev, orders, left_ts="ts", right_ts="o_orderdate",
                        left_by="user_id", right_by="o_custkey")
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "o_orderkey"]].astype(
            {"o_orderkey": np.int64}),
        batch_format="pandas")


def q_enrich_segment_spend(sf_dir: str):
    """J1-J4 stateful enrichment actor pool: per-batch lookup against a
    broadcast dimension (customer → mktsegment) with state built once per
    actor (the reference did this as async RPC fan-outs with per-process
    caches, src/tasks/extract/account.py:33-52), then a grouped rollup."""
    import ray as _ray

    from ethereum_etl_ray.stages.joins import enrich_with

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    ref = _ray.put(cust.set_index("c_custkey")["c_mktsegment"])

    def lookup(df: pd.DataFrame) -> pd.DataFrame:
        seg = _ray.get(ref)
        df = df.copy()
        df["c_mktsegment"] = seg.reindex(df["user_id"].to_numpy()).to_numpy()
        df["value_c100"] = _cents(df["value"].to_numpy())
        df["n_events"] = 1
        return df.groupby("c_mktsegment", as_index=False)[
            ["n_events", "value_c100"]].sum()

    ev = _read(sf_dir, "events", ["user_id", "value"])
    return (
        enrich_with(ev, lookup, concurrency=4, batch_size=4096)
        .groupby("c_mktsegment")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("value_c100", alias_name="value_c100"))
    )


def q_topk_orders(sf_dir: str):
    """Global top-k via per-batch partial top-k + tiny driver reduce — no
    all-to-all sort of the table (absent in the reference, SURVEY §2.8)."""
    from ethereum_etl_ray.stages.topk import topk

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return topk(ds, ["o_totalprice", "o_orderkey"], 15, descending=[True, False])


def _ns_edges(t: pa.Table, src_prefix: str, src: str, dst_prefix: str, dst: str
              ) -> pa.Table:
    """Namespaced string edges ("o:123" → "c:45") from two key columns."""
    n = t.num_rows
    # explicit string type: pa.array([]) infers null and the join kernel has
    # no (null, string, string) overload — zero-row blocks must pass through
    return pa.table({
        "src": pc.binary_join_element_wise(
            pa.array([src_prefix] * n, pa.string()),
            pc.cast(t.column(src), pa.string()), ""),
        "dst": pc.binary_join_element_wise(
            pa.array([dst_prefix] * n, pa.string()),
            pc.cast(t.column(dst), pa.string()), ""),
    })


def q_graph_reach(sf_dir: str):
    """J5 graph-traversal join (reference src/tasks/extract/pool.py:183-290:
    BFS ≤5 hops over pool edges): bounded-hop reachability over the
    order→customer→nation→region key graph via iterative broadcast join."""
    from ethereum_etl_ray.stages.graph import graph_reach

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda t: _ns_edges(t, "o:", "o_orderkey", "c:", "o_custkey"),
        batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: _ns_edges(t, "c:", "c_custkey", "n:", "c_nationkey"),
        batch_format="pyarrow", zero_copy_batch=True)
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).map_batches(
        lambda t: _ns_edges(t, "n:", "n_nationkey", "r:", "n_regionkey"),
        batch_format="pyarrow", zero_copy_batch=True)
    edges = orders.union(cust).union(nation)
    start_keys = (_read(sf_dir, "orders", ["o_orderkey"])
                  .filter(expr="o_orderkey <= 200").to_pandas())
    starts = [f"o:{k}" for k in sorted(start_keys.o_orderkey)]
    return graph_reach(edges, starts, max_hops=3)


def q_graph_path_value(sf_dir: str):
    """J5 path-VALUE fold (reference src/tasks/extract/pool.py:246-290: price
    = product of pool balance ratios along the BFS-found path): bounded-hop
    reach over the order→part→brand graph carrying a multiplicative edge
    weight; per (start, node) the max product over minimal-hop paths.
    Weights are powers of 0.5 — exact in binary floating point, so the
    engine and the DuckDB recursive-CTE oracle agree bit-for-bit.
    Parallel edges (same order+part on two lineitems) exercise the max."""
    from ethereum_etl_ray.stages.graph import graph_reach

    def li_edges(t: pa.Table) -> pa.Table:
        base = _ns_edges(t, "o:", "l_orderkey", "p:", "l_partkey")
        exp = (t.column("l_linenumber").to_numpy(zero_copy_only=False)
               % 3).astype(np.float64)
        return base.append_column("w", pa.array(np.power(0.5, exp), pa.float64()))

    def part_edges(t: pa.Table) -> pa.Table:
        base = _ns_edges(t, "p:", "p_partkey", "b:", "p_brand")
        exp = (t.column("p_partkey").to_numpy(zero_copy_only=False)
               % 2).astype(np.float64)
        return base.append_column("w", pa.array(np.power(0.5, exp), pa.float64()))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_linenumber"]).map_batches(
        li_edges, batch_format="pyarrow", zero_copy_batch=True)
    parts = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        part_edges, batch_format="pyarrow", zero_copy_batch=True)
    start_keys = (_read(sf_dir, "orders", ["o_orderkey"])
                  .filter(expr="o_orderkey <= 100").to_pandas())
    starts = [f"o:{k}" for k in sorted(start_keys.o_orderkey)]
    return graph_reach(li.union(parts), starts, max_hops=2, weight_col="w")


def q_window_hourly(sf_dir: str):
    """Tumbling-window aggregate (streaming-shaped workload per the guide):
    events per (user, hour), value summed in cents."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64()).to_numpy()
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_pandas(),
            "hour_bucket": ts_us // 3_600_000_000,
            "n_events": 1,
            "value_c100": _cents(t.column("value").to_numpy()),
        })
        agg = df.groupby(["user_id", "hour_bucket"], as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "hour_bucket"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("value_c100", alias_name="value_c100"))
    )


# --------------------------------------------------------------------------
# training-data operators: dedup / text analysis / ANN / multimodal
# --------------------------------------------------------------------------


def q_exact_dedup_docs(sf_dir: str):
    from ethereum_etl_ray.pipelines.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    return exact_dedup(ds, keep_cols=["doc_id", "lang", "n_chars"])


def q_doc_fingerprint(sf_dir: str):
    from ethereum_etl_ray.functions.textstats import md5_fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(md5_fingerprint_batch, batch_format="pyarrow",
                          zero_copy_batch=True).select_columns(["doc_id", "fingerprint"])


def q_lang_id_docs(sf_dir: str):
    from ethereum_etl_ray.functions.textstats import lang_scores_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(lang_scores_batch, batch_format="pyarrow", zero_copy_batch=True)
    return out.select_columns(["doc_id", "score_de", "score_en", "score_es",
                               "score_fr", "score_zh", "predicted_lang"])


def q_quality_docs(sf_dir: str):
    from ethereum_etl_ray.functions.textstats import quality_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)
    return out.select_columns(["doc_id", "n_tokens", "n_chars_txt", "stop_ppm",
                               "mtl_c", "quality_ppm"])


_BPE_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def q_bpe_token_count(sf_dir: str):
    """BPE-ish tokenizer token counts (GPT-2-style pretokenizer pattern,
    lookahead-free so RE2 semantics match between Arrow and DuckDB): the
    token-budget accounting a training pipeline runs per document, alongside
    the whitespace count."""
    from ethereum_etl_ray.functions.textstats import token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_ws_tokens": token_count(t.column("text")),
            "n_bpe_tokens": pc.cast(
                pc.count_substring_regex(t.column("text"), pattern=_BPE_PAT),
                pa.int64()),
        })

    return ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)


def q_winnow_fingerprint(sf_dir: str):
    from ethereum_etl_ray.functions.textstats import rolling_fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(rolling_fingerprint_batch, batch_format="pyarrow",
                          zero_copy_batch=True).select_columns(["doc_id", "winnow_fp"])


_N_QUERIES = 8
_TOPK = 5


def _query_vectors(sf_dir: str):
    q = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
    qdf = q.filter(expr=f"vec_id < {_N_QUERIES}").to_pandas().sort_values("vec_id")
    return qdf.vec_id.to_numpy(), np.stack(qdf.embedding.to_numpy()).astype(np.float64)


def q_embedding_topk(sf_dir: str):
    from ethereum_etl_ray.stages.ann import brute_force_topk

    ids, mat = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return brute_force_topk(ds, ids, mat, k=_TOPK)


def q_ann_ivf_topk(sf_dir: str):
    """IVF variant probing ALL buckets → exact, shares the brute-force oracle."""
    from ethereum_etl_ray.stages.ann import ivf_topk

    ids, mat = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ivf_topk(ds, ids, mat, k=_TOPK, n_centroids=8, nprobe=None)


def q_embedding_cosine_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs: all vec pairs with 4-dec-rounded
    cosine ≥ 0.4 (the synthetic embeddings have no planted dups, so the
    threshold sits below the natural similarity ceiling). The stage
    self-gates: corpora above exact_threshold rows auto-route to the
    IVF-bucketed multi-probe path instead of broadcasting the matrix."""
    from ethereum_etl_ray.stages.ann import embedding_cosine_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_cosine_pairs(ds, tau=0.4)


def q_ann_ivf_persisted(sf_dir: str):
    """Persisted-IVF path: k-means index built + written as bucket-partitioned
    parquet, probe reads only bucket directories. nprobe=all ⇒ exact, so it
    shares the brute-force oracle."""
    import shutil
    import tempfile

    from ethereum_etl_ray.stages.ann import build_ivf_index, ivf_search

    # per-run unique dir: a fixed sf_dir-keyed path would let a concurrent
    # run's rmtree race this one's in-flight probe reads; removed once the
    # (materialized) search result is in hand
    idx = tempfile.mkdtemp(prefix="webcdc_ivf_")
    try:
        ids, mat = _query_vectors(sf_dir)
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        build_ivf_index(ds, idx, n_centroids=8, kmeans_iters=2)
        return ivf_search(idx, ids, mat, k=_TOPK, nprobe=None)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def q_ann_quantized_topk(sf_dir: str):
    """Approximate top-k over the int8-quantized corpus (4× smaller index;
    int32-accumulated integer dot products). Rows-only at the driver:
    quantization is approximate by design — tests/test_quantize.py carries
    the recall@k ≥ 0.8 oracle vs the exact float top-k, exactness on
    separated clusters, and the persisted-index round-trip."""
    from ethereum_etl_ray.stages.quantize import quantized_topk

    ids, mat = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return quantized_topk(ds, ids, mat, k=_TOPK)


def q_ann_pq_topk(sf_dir: str):
    """Product-quantized top-k (m=16 one-byte subspaces — 16 bytes/vector vs
    256 float32; ADC lookup-table scoring). Rows-only at the driver: PQ is
    approximate by design — tests/test_pq.py carries the planted-near-dup,
    cluster-membership, and persisted round-trip oracles."""
    from ethereum_etl_ray.stages.quantize import pq_topk, pq_train

    ids, mat = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = pq_train(ds, m=16, k=64, iters=4)
    return pq_topk(ds, ids, mat, books, k=_TOPK)


def q_minhash_lsh_pairs(sf_dir: str):
    from ethereum_etl_ray.pipelines.dedup import minhash_lsh_dedup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_dedup_pairs(ds, threshold=0.7)


def q_connected_components(sf_dir: str):
    """Distributed connected components (stages.components — the cluster
    step of corpus dedup, generalizing the reference's distinct-as-dedup
    src/tasks/extract/account.py:7-27 to transitive duplicate clusters).

    Runs min-label propagation with pointer jumping over a deterministic
    sparse graph derived from the documents table (chains of 8 docs with a
    branch edge every 8) so DuckDB's recursive CTE can compute the exact
    same closure as the oracle."""
    from ethereum_etl_ray.stages.components import connected_components_ds

    docs = _read(sf_dir, "documents", ["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        chain = ids[ids % 8 != 0]          # (i, i-1) within each group of 8
        branch = ids[ids % 8 >= 3]         # (i, i-3) branch edge
        return pa.table({
            "doc_a": pa.array(np.concatenate([chain, branch]), pa.int64()),
            "doc_b": pa.array(np.concatenate([chain - 1, branch - 3]), pa.int64()),
        })

    pairs = docs.map_batches(mk_edges, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = connected_components_ds(pairs).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_near_dedup_keep(sf_dir: str):
    """End-to-end corpus near-dedup: MinHash-LSH pairs (fully streaming) →
    distributed connected components → keep the min-doc_id representative
    per duplicate cluster (shuffle route: nothing driver-resident)."""
    from ethereum_etl_ray.pipelines.dedup import minhash_lsh_dedup_pairs
    from ethereum_etl_ray.stages.components import dedup_apply

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    pairs = minhash_lsh_dedup_pairs(docs, threshold=0.7, streaming=True)
    kept = dedup_apply(docs, pairs, route="shuffle")
    out = kept.select_columns(["doc_id", "n_chars"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_corpus_curate(sf_dir: str):
    """Full training-corpus curation chain (pipelines.curate): language
    filter → quality filter → exact dedup → near-dedup keep-one. Rows-only
    at the driver (the near-dup step is hash-based); the pytest oracle
    (tests/test_curate.py) pins exact survivors on a planted corpus."""
    from ethereum_etl_ray.pipelines.curate import curate_corpus

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    kept = curate_corpus(docs, langs=("en",), min_quality_ppm=300_000,
                         near_threshold=0.7, keep_cols=["doc_id", "n_chars"])
    out = kept.to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_window_sliding(sf_dir: str):
    """Sliding-window aggregate: 1 h windows advancing every 15 min (each
    event belongs to exactly 4 overlapping windows). The overlap is an
    explode — 4 rows per event, vectorized with repeat/tile — immediately
    collapsed by a per-batch combiner, so the shuffle moves one row per
    (batch, window), never the exploded event stream. Complements the
    tumbling `window_hourly`."""
    slide_s, k_windows = 900, 4
    ds = _read(sf_dir, "events", ["ts", "value"])

    def combine(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        vc = np.floor(t.column("value").to_numpy(zero_copy_only=False)
                      * 100 + 0.5).astype(np.int64)
        bucket = ts_us // (slide_s * 1_000_000)
        ks = np.tile(np.arange(k_windows, dtype=np.int64), len(bucket))
        starts = (np.repeat(bucket, k_windows) - ks) * slide_s
        vrep = np.repeat(vc, k_windows)
        order = np.argsort(starts, kind="stable")
        s_s, v_s = starts[order], vrep[order]
        run = np.concatenate([[0], np.flatnonzero(np.diff(s_s)) + 1])
        return pa.table({
            "window_start": pa.array(s_s[run], pa.int64()),
            "n_events": pa.array(np.diff(np.concatenate([run, [len(s_s)]])),
                                 pa.int64()),
            "value_c100": pa.array(np.add.reduceat(v_s, run), pa.int64()),
        })

    out = (ds.map_batches(combine, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("window_start").sum(["n_events", "value_c100"])
           .map_batches(lambda t: t.rename_columns(
               ["window_start", "n_events", "value_c100"]),
               batch_format="pyarrow", zero_copy_batch=True)
           .to_pandas())
    return out.sort_values("window_start").reset_index(drop=True)


def q_sessionize(sf_dir: str):
    """Gap-based sessionization: per user, a new session starts after a
    >30 min silence; one row per session with count, bounds and the
    cent-quantized value sum (int-exact like window_hourly). Sessionization
    cannot pre-combine (a user's whole history must co-locate), so it is
    exactly one hash shuffle by user_id followed by a fully-vectorized
    per-partition pass: one sort, boundary masks, cumsum session ids and
    ``add.reduceat`` fold — no Python loop over rows or sessions."""
    from ethereum_etl_ray.functions.hashing import partition_ids

    gap_us = 1800 * 1_000_000
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def assign(t: pa.Table) -> pa.Table:
        return t.append_column("__part", pa.array(
            partition_ids(t.column("user_id"), 32), pa.int32()))

    def sessionize(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False)
        vc = np.floor(val * 100 + 0.5).astype(np.int64)
        n = len(u)
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        gap = np.concatenate([[True], (ts[1:] - ts[:-1]) > gap_us])
        new_sess = new_user | gap
        sid_global = np.cumsum(new_sess)
        user_starts = np.flatnonzero(new_user)
        user_run = np.cumsum(new_user) - 1
        session_id = sid_global - sid_global[user_starts[user_run]] + 1
        starts = np.flatnonzero(new_sess)
        ends = np.concatenate([starts[1:] - 1, [n - 1]])
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "session_id": pa.array(session_id[starts], pa.int64()),
            "n_events": pa.array(np.diff(np.concatenate([starts, [n]])),
                                 pa.int64()),
            "t_start": pa.array(ts[starts], pa.int64()).cast(pa.timestamp("us")),
            "t_end": pa.array(ts[ends], pa.int64()).cast(pa.timestamp("us")),
            "value_c100": pa.array(np.add.reduceat(vc, starts), pa.int64()),
        })

    out = (ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("__part")
           .map_groups(lambda g: sessionize(g.drop_columns(["__part"])),
                       batch_format="pyarrow")
           .to_pandas())
    return out.sort_values(["user_id", "session_id"]).reset_index(drop=True)


def q_json_extract_props(sf_dir: str):
    """Wire-payload field extraction (the reference's JSON-RPC result
    decode, src/clients/rpc_client.py:60-117, over the driver tables):
    pull the integer `k` out of the JSON `props` column with one RE2
    kernel per batch — the flat-field fast path a JSON scanner takes —
    then aggregate per event_type through a per-batch combiner so the
    shuffle moves one row per (batch, type)."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def combine(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column("props"), pattern=r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        g = (pd.DataFrame({"event_type": t.column("event_type").to_pandas(),
                           "k": k.to_pandas()})
             .groupby("event_type", sort=False)
             .agg(n_events=("k", "size"), sum_k=("k", "sum"))
             .reset_index())
        g["sum_k"] = g.sum_k.astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(combine, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type").sum(["n_events", "sum_k"])
           .map_batches(lambda t: t.rename_columns(
               ["event_type", "n_events", "sum_k"]),
               batch_format="pyarrow", zero_copy_batch=True)
           .to_pandas())
    return out.sort_values("event_type").reset_index(drop=True)


def q_doc_keywords(sf_dir: str):
    """Per-document keyword extraction — the top-5 tokens per doc by an
    integer-exact tf-idf-style score (``tf * 1e6 // df``; pure int math so
    the DuckDB oracle hashes identically — float idf would drift at floor
    boundaries). Fully distributed: per-batch exact tf (each row is one
    complete document, so term counts need no shuffle), one token-keyed
    aggregate for df, a co-group hash join back, and a per-doc cap via the
    combiner-bounded partition-parallel shape."""
    from ethereum_etl_ray.functions.hashing import partition_ids
    from ethereum_etl_ray.stages.joins import cogroup_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_batch(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        doc = pc.take(t.column("doc_id"), parents)
        g = (pd.DataFrame({"doc_id": doc.to_pandas(),
                           "token": flat.to_pandas()})
             .groupby(["doc_id", "token"], sort=False)
             .size().reset_index(name="tf"))
        return pa.Table.from_pandas(g, preserve_index=False)

    tf = docs.map_batches(tf_batch, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    df = (tf.groupby("token").count()
          .map_batches(lambda t: pa.table({
              "__tok": t.column("token"),
              "df": pc.cast(t.column("count()"), pa.int64())})
              if "token" in t.column_names else
              pa.table({"__tok": pa.array([], pa.string()),
                        "df": pa.array([], pa.int64())}),
              batch_format="pyarrow", zero_copy_batch=True))
    joined = cogroup_join(tf, df, left_on="token", right_on="__tok",
                          how="inner")

    k = 5
    keys = [("doc_id", "ascending"), ("score", "descending"),
            ("token", "ascending")]

    def score_cap(t: pa.Table) -> pa.Table:
        if "score" in t.column_names:  # second (per-group) pass re-caps only
            t = t.drop_columns(["score"])
        score = pc.divide(
            pc.multiply(pc.cast(t.column("tf"), pa.int64()),
                        pa.scalar(1_000_000, pa.int64())),
            pc.cast(t.column("df"), pa.int64()))
        t = t.append_column("score", score).sort_by(keys)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
        run_id = np.cumsum(np.concatenate(
            [[0], (d[1:] != d[:-1]).astype(np.int64)]))
        rank = np.arange(len(d)) - starts[run_id]
        return t.filter(pa.array(rank < k))

    def assign(t: pa.Table) -> pa.Table:
        return t.append_column("__part", pa.array(
            partition_ids(t.column("doc_id"), 32), pa.int32()))

    out = (joined.map_batches(score_cap, batch_format="pyarrow",
                              zero_copy_batch=True)
           .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("__part")
           .map_groups(lambda g: score_cap(g.drop_columns(["__part"])),
                       batch_format="pyarrow")
           .select_columns(["doc_id", "token", "tf", "df", "score"])
           .to_pandas())
    return out.sort_values(["doc_id", "token"]).reset_index(drop=True)


def q_stratified_sample(sf_dir: str):
    """Stratified quota sample: the 20 md5-first documents per language —
    the balanced-training-mix operator (equal per-stratum quotas regardless
    of corpus skew), deterministic on every engine/run/partitioning. Same
    partition-parallel shape as cap_per_key: per-batch combiner bounds the
    shuffle at k rows per stratum per batch, then one hash partition + an
    exact per-group cap."""
    import hashlib

    from ethereum_etl_ray.functions.hashing import partition_ids

    k = 20
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    keys = [("lang", "ascending"), ("__hex", "ascending")]

    def ann(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        hexes = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return t.append_column("__hex", pa.array(hexes, pa.string()))

    def cap(t: pa.Table) -> pa.Table:
        t = t.sort_by(keys)
        u = t.column("lang").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        run_id = np.cumsum(np.concatenate(
            [[0], (u[1:] != u[:-1]).astype(np.int64)]))
        rank = np.arange(len(u)) - starts[run_id]
        return t.filter(pa.array(rank < k))

    def assign(t: pa.Table) -> pa.Table:
        return t.append_column("__part", pa.array(
            partition_ids(t.column("lang"), 16), pa.int32()))

    def cap_group(g: pa.Table) -> pa.Table:
        return cap(g.drop_columns(["__part"]))

    out = (ds.map_batches(ann, batch_format="pyarrow", zero_copy_batch=True)
           .map_batches(cap, batch_format="pyarrow", zero_copy_batch=True)
           .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("__part").map_groups(cap_group, batch_format="pyarrow")
           .select_columns(["doc_id", "lang", "n_chars"])
           .to_pandas())
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def q_vocab_topk(sf_dir: str):
    """Corpus-wide vocabulary: the 50 most frequent whitespace tokens with
    exact counts. Explode → per-batch Arrow `value_counts` combiner (the
    shuffle moves one row per distinct token per batch, never the token
    stream) → hash-aggregate sum → shuffle-free partial top-k with a
    deterministic (count DESC, token ASC) tie-break."""
    from ethereum_etl_ray.stages.topk import topk

    docs = _read(sf_dir, "documents", ["text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t.column("text"), pattern=" "))
        vc = toks.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partial = docs.map_batches(count_tokens, batch_format="pyarrow",
                               zero_copy_batch=True)
    totals = (partial.groupby("token").sum("n")
              .map_batches(lambda t: t.rename_columns(["token", "n"]),
                           batch_format="pyarrow", zero_copy_batch=True))
    out = topk(totals, ["n", "token"], 50, descending=[True, False])
    return out.reset_index(drop=True)


def q_budget_sample(sf_dir: str):
    """Token-budget prefix take (stages.selection.take_until_budget): docs
    in deterministic md5(doc_id) priority order until the corpus holds
    10,000 tokens. Distributed as digest-byte range selection — per-batch
    256-bin weight histograms to the driver, one boundary bin inspected,
    fused broadcast apply; no global sort. DuckDB oracle: the equivalent
    windowed cumulative sum."""
    from ethereum_etl_ray.functions.textstats import token_count
    from ethereum_etl_ray.stages.selection import take_until_budget

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def ann(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": token_count(t.column("text"))})

    slim = docs.map_batches(ann, batch_format="pyarrow", zero_copy_batch=True)
    out = take_until_budget(slim, budget=10_000, weight_col="n_tokens")
    pdf = out.to_pandas()
    if pdf.empty:  # this Ray's to_pandas drops the schema when fully empty
        pdf = pd.DataFrame(columns=["doc_id", "n_tokens"])
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_corpus_filter_dedup(sf_dir: str):
    """The SQL-expressible prefix of the curation chain — language filter +
    quality filter + exact dedup — with a full DuckDB oracle (the near-dup
    suffix is hash-based and covered by `corpus_curate`'s pytest oracle).
    Pins the fused annotate-and-drop stage cross-engine."""
    from ethereum_etl_ray.pipelines.curate import _annotate_filter
    from ethereum_etl_ray.pipelines.dedup import exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    filtered = docs.map_batches(
        _annotate_filter(("en",), 300_000, "text"),
        batch_format="pyarrow", zero_copy_batch=True)
    out = exact_dedup(filtered, keep_cols=["doc_id", "predicted_lang",
                                           "quality_ppm", "n_chars"])
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_simhash_pairs(sf_dir: str):
    from ethereum_etl_ray.pipelines.dedup import simhash_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)


def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact n-gram Jaccard over LSH candidates at a lower threshold."""
    from ethereum_etl_ray.pipelines.dedup import (
        minhash_candidate_pairs,
        verify_jaccard_pairs,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = minhash_candidate_pairs(ds, bands=32, num_perm=128)
    out = verify_jaccard_pairs(ds, cands, threshold=0.4, ngram=2)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_multimodal_decode(sf_dir: str):
    """Binary-payload decode stage (stub codec, real plumbing)."""
    from ethereum_etl_ray.stages.multimodal import decode_blobs, make_blob_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    blobs = ds.map_batches(make_blob_batch, batch_format="pyarrow", zero_copy_batch=True)
    return decode_blobs(blobs)


def q_multimodal_frames(sf_dir: str):
    """Frame-sampling explode over video-shaped blobs (every 4th frame, one
    row per sampled frame with the parent key) — media analogue of E2/E5."""
    from ethereum_etl_ray.stages.multimodal import (
        DecodeImage,
        make_blob_batch,
        sample_frames,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    blobs = ds.map_batches(make_blob_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
    frames = sample_frames(blobs, every_k=4)

    def shape(t: pa.Table) -> pa.Table:
        d = DecodeImage()(t)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "frame_idx": pc.cast(t.column("frame_idx"), pa.int64()),
            "width": pc.cast(d.column("width"), pa.int64()),
            "height": pc.cast(d.column("height"), pa.int64()),
        })

    return frames.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True)


def q_cms_heavy_hitters(sf_dir: str):
    """Approximate heavy hitters via mergeable count-min sketch (scale path)."""
    from ethereum_etl_ray.stages.sketch import sketch_heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    df = sketch_heavy_hitters(ds, "user_id", sample_fraction=1.0)
    return df.head(10)


def q_deterministic_sample(sf_dir: str):
    """Deterministic hash-split sampling — the stable train/holdout-split
    operator a training-data pipeline needs (same rows selected on every
    engine, every run, any partitioning): keep events whose md5(event_id)
    starts with a hex digit < '2' (≈1/8 of rows)."""
    import hashlib

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy()
        keep = np.fromiter(
            (hashlib.md5(str(i).encode()).hexdigest()[0] < "2" for i in ids),
            dtype=bool, count=len(ids))
        return t.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def q_cap_per_key(sf_dir: str):
    """Per-key cap: keep at most the newest 3 events per user (the per-host
    document cap / keep-K-versions-per-page operator of a webtext pipeline).
    Same partition-parallel shape as the LWW merge: per-batch combiner
    bounds shuffle volume at k rows per key per batch, then one hash
    partition + per-group exact cap."""
    from ethereum_etl_ray.functions.hashing import partition_ids

    k = 3
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    keys = [("user_id", "ascending"), ("ts", "descending"),
            ("event_id", "descending")]

    def cap(t: pa.Table) -> pa.Table:
        t = t.sort_by(keys)
        u = t.column("user_id").to_numpy()
        # rank within run of equal keys (vectorized): position − run start
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        run_id = np.cumsum(np.concatenate([[0], (u[1:] != u[:-1]).astype(np.int64)]))
        rank = np.arange(len(u)) - starts[run_id]
        return t.filter(pa.array(rank < k))

    def assign(t: pa.Table) -> pa.Table:
        return t.append_column("__part", pa.array(
            partition_ids(t.column("user_id"), 32), pa.int32()))

    return (
        ds.map_batches(cap, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(lambda g: cap(g.drop_columns(["__part"])),
                    batch_format="pyarrow")
    )


def q_random_sample(sf_dir: str):
    """Seeded sampling operator (absent in reference, SURVEY §2.8)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id"])
    return ds.random_sample(0.1, seed=7)


# --------------------------------------------------------------------------
# CDC flagship pipelines (non-SQL-expressible; oracled in tests/)
# --------------------------------------------------------------------------


def _cdc_out_dir(sf_dir: str, tag: str) -> str:
    import hashlib
    import shutil

    key = hashlib.sha1(f"{sf_dir}:{tag}".encode()).hexdigest()[:12]
    out = f"/tmp/webcdc_lakes/{key}"
    shutil.rmtree(out, ignore_errors=True)
    return out


def _lake_result(out_dir: str):
    from ethereum_etl_ray.pipelines.replay import load_lake

    return load_lake(out_dir).select_columns(["url", "seq", "lang", "text"])


def q_cdc_replay_full(sf_dir: str):
    """Flagship: full change-log replay (snapshot + v1/v2 evolution +
    deletes + duplicates) → final lake (url, seq, lang, text)."""
    from ethereum_etl_ray.config import EngineConfig
    from ethereum_etl_ray.pipelines.replay import replay
    from ethereum_etl_ray.sources.synth import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    out = _cdc_out_dir(sf_dir, "full")
    replay(corpus, out, EngineConfig(num_partitions=32))
    return _lake_result(out)


def q_cdc_replay_ignore(sf_dir: str):
    """First-writer-wins replay (INSERT OR IGNORE semantics), no snapshot."""
    from ethereum_etl_ray.config import EngineConfig
    from ethereum_etl_ray.pipelines.replay import replay
    from ethereum_etl_ray.sources.synth import Corpus, ensure_corpus

    corpus = ensure_corpus(sf_dir)
    corpus = Corpus(**{**corpus.__dict__, "snapshot_dir": ""})
    out = _cdc_out_dir(sf_dir, "ignore")
    replay(corpus, out, EngineConfig(num_partitions=32, merge_mode="ignore"))
    return _lake_result(out)


def q_cdc_resume_tail(sf_dir: str):
    """Tail-mode replay: three bounded windows from the committed watermark
    (reference realtime_ws tailer analogue) — must equal the one-shot result."""
    from ethereum_etl_ray.config import EngineConfig
    from ethereum_etl_ray.pipelines.replay import replay
    from ethereum_etl_ray.sources.synth import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    out = _cdc_out_dir(sf_dir, "tail")
    cfg = EngineConfig(num_partitions=32)
    wm = corpus.watermark
    for w in (wm // 3, (2 * wm) // 3, wm):
        replay(corpus, out, cfg, watermark=w)
    return _lake_result(out)


def q_cdc_bulk_load(sf_dir: str):
    """Bulk load: insert-only unique-key log via the single-pass route and
    the explicit file-bucket shuffle (every event survives, is extracted and
    written). The scaling-bench workload, driver-checkable at small scale."""
    from ethereum_etl_ray.config import EngineConfig
    from ethereum_etl_ray.pipelines.replay import replay
    from ethereum_etl_ray.sources.synth import ensure_corpus

    corpus = ensure_corpus(sf_dir, events_per_doc=6.0, unique_urls=True)
    out = _cdc_out_dir(sf_dir, "bulk")
    replay(corpus, out, EngineConfig(num_partitions=16, late_materialization=False,
                                     shuffle="file"))
    return _lake_result(out)


def q_stream_publish(sf_dir: str):
    """X3/X4 streaming-sink analogue (reference src/tasks/export/nats.py:11-29):
    publish the events table to the file-backed message queue from inside
    map_batches; returns the per-message publish summary. Idempotence and
    roundtrip are pytest-oracled (tests/test_sinks.py)."""
    import shutil
    import tempfile

    from ethereum_etl_ray.stages.sinks import make_publisher

    # per-run unique dir (see q_ann_ivf_persisted); the publish summary is
    # materialized so the queue dir can be removed before returning
    q = tempfile.mkdtemp(prefix="webcdc_queue_")
    try:
        ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        return ds.map_batches(make_publisher(q),
                              batch_format="pyarrow").to_pandas()
    finally:
        shutil.rmtree(q, ignore_errors=True)


def q_schema_evolution_audit(sf_dir: str):
    """Conform-stage audit: events per schema generation after unification
    (added column null-rate proves the in-flight rewrite)."""
    from ethereum_etl_ray.pipelines.replay import load_events
    from ethereum_etl_ray.sources.synth import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    ds = load_events(corpus.event_dirs)

    def audit(t: pa.Table) -> pa.Table:
        gen = pc.if_else(pc.less(t.column("seq"), corpus.v2_start_seq),
                         pa.scalar(1), pa.scalar(2))
        df = pd.DataFrame({
            "generation": gen.to_numpy(zero_copy_only=False),
            "n_events": 1,
            "n_null_fetch_status": pc.is_null(t.column("fetch_status"))
            .to_numpy(zero_copy_only=False).astype(np.int64),
        })
        agg = df.groupby("generation", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (ds.map_batches(audit, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("generation")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_null_fetch_status", alias_name="n_null_fetch_status")))


def q_pii_redact(sf_dir: str):
    """PII redaction over the corpus: emails / IPv4s / phone numbers masked
    with RE2 kernels, per-kind match counts retained for audit. The synthetic
    corpus carries no PII, so the pipeline first PLANTS it deterministically
    from doc_id (the oracle repeats the derivation) — every row exercises
    every pattern. Stateless task-pool stage, zero-copy Arrow throughout."""
    from ethereum_etl_ray.functions.redact import plant_pii_batch, redact_pii_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def both(t: pa.Table) -> pa.Table:
        return redact_pii_batch(plant_pii_batch(t))

    return (ds.map_batches(both, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(["doc_id", "n_emails", "n_ips", "n_phones", "clean"]))


def q_normalize_part(sf_dir: str):
    """Text canonicalization (NFC → lower → whitespace-collapse → trim) over a
    deterministically-dirtied mixed-case string — the normalize-before-dedup
    step of a crawl pipeline, on the one table with real mixed-case text."""
    from ethereum_etl_ray.functions.redact import normalize_text_batch

    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_type"])

    def dirty_then_norm(t: pa.Table) -> pa.Table:
        # "  " + UPPER(p_name) + "\t" + p_type + "  " — mirrored in SQL
        raw = pc.binary_join_element_wise(
            "  ", pc.utf8_upper(t.column("p_name")), "\t", t.column("p_type"),
            "  ", "")
        t = t.append_column("raw", raw)
        return normalize_text_batch(t, "raw", "norm")

    return (ds.map_batches(dirty_then_norm, batch_format="pyarrow",
                           zero_copy_batch=True)
            .select_columns(["p_partkey", "norm"]))


def q_rep_stats(sf_dir: str):
    """Token-repetition quality filter (Gopher-style): per-doc duplicate-token
    and top-token shares in integer ppm; fully vectorized (one dictionary
    encode + one np.unique per batch)."""
    from ethereum_etl_ray.functions.textstats import rep_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(rep_stats_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
            .select_columns(["doc_id", "n_tokens", "n_distinct", "dup_ppm",
                             "top_tok_ppm"]))


_CHUNK_W, _CHUNK_S = 64, 48


def q_chunk_docs(sf_dir: str):
    """Document chunking for embedding / RAG indexing: fixed 64-token
    windows at stride 48 (16-token overlap), trailing chunks short, every
    token covered. One split + one fancy-gather + one binary_join per batch
    (functions/textstats.py:chunk_docs_batch); rows multiply ~n_tokens/48
    and re-block downstream."""
    from ethereum_etl_ray.functions.textstats import chunk_docs_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: chunk_docs_batch(t, window=_CHUNK_W, stride=_CHUNK_S),
        batch_format="pyarrow", zero_copy_batch=True)


def q_lm_score(sf_dir: str):
    """CCNet-style bigram LM quality scoring: train unigram/bigram counts on
    the corpus (one combiner-reduced pass), score each doc by its mean
    bigram conditional in ppm (integer-exact; see pipelines/lm.py). Routes
    broadcast-below / cogroup-join-above by distinct-bigram count."""
    from ethereum_etl_ray.pipelines.lm import lm_score

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return lm_score(ds)


_PACK_BUDGET = 2000


def q_pack_sequences(sf_dir: str):
    """Sequence packing: cut the doc_id-ordered token stream into
    fixed-budget training sequences via the distributed prefix sum in
    stages/packing.py (per-bucket partials → driver prefix over O(#buckets)
    rows → one narrow hash shuffle)."""
    from ethereum_etl_ray.functions.textstats import token_count
    from ethereum_etl_ray.stages.packing import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def with_tokens(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": token_count(t.column("text"))})

    counted = ds.map_batches(with_tokens, batch_format="pyarrow",
                             zero_copy_batch=True)
    # doc_ids are dense 0..N-1, so the metadata-only parquet row count bounds
    # the key space without an extra full pass (pack_sequences would
    # otherwise run a max() aggregation)
    return pack_sequences(counted, key="doc_id", weight="n_tokens",
                          budget=_PACK_BUDGET, n_buckets=64,
                          key_upper_bound=ds.count())


def q_lake_diff(sf_dir: str):
    """Generation diff (incremental-consumer CDC surface): replay to the
    half-way watermark, then to the full watermark, and emit exactly the
    urls whose winning event changed between the two committed checkpoints.
    Unchanged partitions are skipped by lineage checksum without a read;
    changed ones diff pairwise (co-partitioned) with no shuffle. Rows-only
    at the driver; tests/test_diff.py checks it against the dict-diff of the
    sequential-replay oracle at the two watermarks."""
    from ethereum_etl_ray.config import EngineConfig
    from ethereum_etl_ray.pipelines.diff import lake_diff
    from ethereum_etl_ray.pipelines.replay import replay
    from ethereum_etl_ray.sources.synth import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    out = _cdc_out_dir(sf_dir, "gen_diff")
    cfg = EngineConfig(num_partitions=32)
    r1 = replay(corpus, out, cfg, watermark=corpus.watermark // 2)
    r2 = replay(corpus, out, cfg)
    return lake_diff(out, r1.manifest.generation, r2.manifest.generation)


def q_incremental_lang_counts(sf_dir: str):
    """Incremental view maintenance: per-lang lake counts at the full
    watermark obtained by applying the generation diff's deltas to the
    half-watermark aggregate — the lake is NOT rescanned for the second
    window (only changed partitions are read, for (url, seq, lang)).
    tests/test_diff.py proves equivalence with a full recompute."""
    import pyarrow as pa

    from ethereum_etl_ray.config import EngineConfig
    from ethereum_etl_ray.pipelines.diff import lake_diff, maintain_counts
    from ethereum_etl_ray.pipelines.replay import load_lake, replay
    from ethereum_etl_ray.sources.synth import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    out = _cdc_out_dir(sf_dir, "ivm")
    cfg = EngineConfig(num_partitions=32)
    r1 = replay(corpus, out, cfg, watermark=corpus.watermark // 2)
    prev_df = (load_lake(out).select_columns(["lang"])
               .groupby("lang").count().to_pandas()
               .rename(columns={"count()": "n"}))
    prev = pa.table({"lang": pa.array(prev_df.lang, pa.string()),
                     "n": pa.array(prev_df.n, pa.int64())})
    r2 = replay(corpus, out, cfg)
    diff = lake_diff(out, r1.manifest.generation, r2.manifest.generation,
                     value_cols=["lang"])
    return maintain_counts(prev, diff, "lang")


# --------------------------------------------------------------------------
# URL parsing / per-domain aggregation (the webtext key machinery)
# --------------------------------------------------------------------------


def _build_urls(batch: pa.Table) -> pa.Table:
    """Deterministic URL per document, derived from (doc_id, source) —
    mixed-case hosts, default/non-default ports, queries and fragments so the
    parser has something to normalize. The SQL oracle reconstructs the PARSED
    fields constructively from the same arithmetic; the engine must recover
    them by actually parsing the assembled string."""
    ids = batch.column("doc_id").to_numpy()
    src = batch.column("source").to_numpy(zero_copy_only=False).astype(str)
    scheme = np.where(ids % 2 == 0, "http", "https")
    sub = np.where(ids % 3 == 0, "M.", "www.")
    host = np.char.add(np.char.add(sub, np.char.upper(src)), ".Org")
    port = np.select([ids % 10 == 0, ids % 10 == 5], [":8080", ":443"], "")
    path = np.char.add("/d/", (ids % 100).astype(str))
    query = np.where(ids % 4 == 0, np.char.add("?ref=", src), "")
    frag = np.where(ids % 7 == 0, "#top", "")
    url = np.char.add(scheme, "://")
    for part in (host, port, path, query, frag):
        url = np.char.add(url, part.astype(str))
    return batch.append_column("url", pa.array(url, pa.string()))


def q_url_parse(sf_dir: str):
    """URL parse + canonicalization (webtext key machinery — the reference
    keys rows on 0x-hex addresses, SURVEY §1.4; a web CDC lake keys on the
    canonical URL): lowercase scheme/host, default port stripped, fragment
    dropped, registrable domain extracted. One RE2 extract per batch."""
    from ethereum_etl_ray.functions.url import (
        canonicalize_urls_batch,
        parse_urls_batch,
    )

    def fn(batch: pa.Table) -> pa.Table:
        batch = _build_urls(batch)
        batch = parse_urls_batch(batch)
        batch = canonicalize_urls_batch(batch)
        return batch.select(["doc_id", "scheme", "host", "port", "domain",
                             "canonical_url"])

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_domain_stats(sf_dir: str):
    """Per-registrable-domain corpus stats (crawl-politeness / quota view):
    doc count, distinct host count, total chars. Combiner-bounded: per-batch
    (domain, host) partials → one small groupby → one tiny groupby."""
    from ethereum_etl_ray.functions.url import parse_urls_batch

    def partial(batch: pa.Table) -> pa.Table:
        batch = parse_urls_batch(_build_urls(batch))
        df = batch.select(["domain", "host", "n_chars"]).to_pandas()
        agg = df.groupby(["domain", "host"], as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    def one_host(batch: pa.Table) -> pa.Table:
        return batch.append_column("n_hosts",
                                   pa.array(np.ones(batch.num_rows, np.int64)))

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["domain", "host"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("sum_chars", alias_name="sum_chars"))
            .map_batches(one_host, batch_format="pyarrow")
            .groupby("domain")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_hosts", alias_name="n_hosts"),
                       Sum("sum_chars", alias_name="sum_chars")))


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: per-corpus-doc count of 5-gram overlaps
    with the eval 'benchmark' (docs with doc_id % 37 == 0). The benchmark's
    distinct grams broadcast once; the corpus is audited with one vectorized
    is_in per batch — zero shuffle over the corpus."""
    from ethereum_etl_ray.pipelines.decontam import decontaminate

    def _mod_filter(want_bench: bool):
        def fn(t: pa.Table) -> pa.Table:
            mask = (t.column("doc_id").to_numpy() % 37 == 0) == want_bench
            return t.filter(pa.array(mask))
        return fn

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.map_batches(_mod_filter(True), batch_format="pyarrow",
                             zero_copy_batch=True)
    corpus = docs.map_batches(_mod_filter(False), batch_format="pyarrow",
                              zero_copy_batch=True)
    return decontaminate(corpus, bench, n=5)


def q_shuffle_rank(sf_dir: str):
    """Deterministic global corpus shuffle: every document's 1-based position
    in the md5(doc_id) permutation — reproducible across runs, engines and
    partitionings (epoch ordering / shard assignment). No global sort: digest
    range-bucketing + per-bucket rank (stages/shuffle.py)."""
    from ethereum_etl_ray.stages.shuffle import deterministic_shuffle

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return deterministic_shuffle(ds, key_col="doc_id", out_col="pos")


def q_inverted_postings(sf_dir: str):
    """Inverted-index build + bucket-pruned term lookup: postings
    (token, doc_id, tf) for three fixed query terms, read from a
    hive-partitioned index that prunes at the bucket-directory level
    (stages/invindex.py). The oracle recomputes the same postings with a
    SQL unnest + group by."""
    import shutil
    import tempfile

    from ethereum_etl_ray.stages.invindex import (
        build_inverted_index,
        lookup_postings,
    )

    idx = tempfile.mkdtemp(prefix="webcdc_inv_")
    try:
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        build_inverted_index(ds, idx, buckets=64)
        return lookup_postings(idx, ["scan", "merge", "window"]).to_pandas()
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def q_percentiles(sf_dir: str):
    """Exact distributed percentiles (p25/p50/p90/p99 of event value) via
    the k-th-element selection machinery (stages/selection.py) — the table
    never globally sorts; each percentile is two narrow passes (rank
    summaries + a bounded window). quantile_disc rank convention:
    k = ceil(p·n), 1-indexed; the event_id tiebreak keeps ranks exact
    under duplicate values without changing the selected value."""
    import math

    from ethereum_etl_ray.stages.selection import kth_smallest_multi

    ds = _read(sf_dir, "events", ["event_id", "value"])
    n = ds.count()
    ps = (0.25, 0.5, 0.9, 0.99)
    ks = [max(1, math.ceil(p * n)) for p in ps]
    # one shared sampling + window sweep for all four ranks (2 passes
    # total, was 2 per percentile)
    vals = [float(b[0]) for b in kth_smallest_multi(
        ds, ["value", "event_id"], ks)]
    return pa.table({"p": pa.array(ps, pa.float64()),
                     "value": pa.array(vals, pa.float64())})


def q_range_join(sf_dir: str):
    """Distributed range/interval join (stages/joins.py:interval_join):
    events matched to OVERLAPPING value windows [w·12, w·12+18) — the
    overlap (stride 12 < span 18) forces multi-window matches. Left rows
    bucket once, intervals replicate per overlapped bucket, one hash
    shuffle, vectorized containment per group."""
    from ethereum_etl_ray.stages.joins import interval_join

    windows = pa.table({
        "window_id": pa.array(range(20), pa.int64()),
        "lo": pa.array([w * 12.0 for w in range(20)], pa.float64()),
        "hi": pa.array([w * 12.0 + 18.0 for w in range(20)], pa.float64()),
    })
    ev = _read(sf_dir, "events", ["event_id", "value"])
    out = interval_join(ev, ray.data.from_arrow(windows), left_on="value",
                        right_lo="lo", right_hi="hi", bucket_width=24.0)
    return out.select_columns(["event_id", "value", "window_id"])


def q_bm25_scores(sf_dir: str):
    """Per-(term, doc) BM25 relevance for three fixed query terms
    (stages/invindex.py:bm25_scores). Rational-idf variant — no
    transcendentals, so the float expression is bit-identical across
    engines when mirrored literal-for-literal."""
    from ethereum_etl_ray.stages.invindex import bm25_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_scores(ds, ["scan", "merge", "window"], k1=1.2, b=0.75)


def q_topn_per_key(sf_dir: str):
    """Top-3 events per user by (value DESC, event_id ASC) — ROW_NUMBER ≤ n
    per key (stages/grouped.py:topn_per_key): map-side per-key combiner, one
    co-partition shuffle, vectorized run-length selection per partition."""
    from ethereum_etl_ray.stages.grouped import topn_per_key

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    return topn_per_key(ds, "user_id", ["value", "event_id"], 3,
                        descending=[True, False])


def q_grouped_median(sf_dir: str):
    """Exact per-user median event value (quantile_disc 0.5 convention,
    k = ceil(p·n)) — stages/grouped.py:grouped_quantile. The value is picked,
    not interpolated, so floats cross engines untouched."""
    from ethereum_etl_ray.stages.grouped import grouped_quantile

    ds = _read(sf_dir, "events", ["user_id", "value"])
    return grouped_quantile(ds, "user_id", "value", 0.5, out_col="med_value")


def q_window_lag_cumsum(sf_dir: str):
    """Per-key window functions: LAG delta + running sum over each user's
    event history ordered by (ts, event_id) — stages/grouped.py:keyed_window.
    Values fixed-pointed to int64 cents so the running sum is exact integer
    arithmetic in both engines."""
    from ethereum_etl_ray.stages.grouped import keyed_window

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = keyed_window(ds, "user_id", ["ts", "event_id"], "value")
    return out.select_columns(["event_id", "user_id", "delta_c100", "cum_c100"])


def q_string_agg_types(sf_dir: str):
    """Ordered string aggregation per key (stages/grouped.py:
    string_agg_ordered) — SQL string_agg(x, ',' ORDER BY ts, event_id);
    the total order makes the concatenation deterministic cross-engine."""
    from ethereum_etl_ray.stages.grouped import string_agg_ordered

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    return string_agg_ordered(ds, "user_id", "event_type",
                              ["ts", "event_id"], out_col="types_seq")


def q_grouped_mad(sf_dir: str):
    """Median absolute deviation of event value per user (stages/grouped.py:
    grouped_mad) — exact discrete-median convention both times, one float
    subtraction: bit-identical to the two-step SQL twin."""
    from ethereum_etl_ray.stages.grouped import grouped_mad

    ds = _read(sf_dir, "events", ["user_id", "value"])
    return grouped_mad(ds, "user_id", "value")


def q_multikey_join_group_stats(sf_dir: str):
    """Composite-key equi-join (stages/joins.py:cogroup_join with column
    LISTS): every lineitem row enriched with its (returnflag, linestatus)
    group's row count — the 'attach group stats to rows' pattern, joined on
    a 2-column key downstream of a hash aggregate."""
    from ethereum_etl_ray.stages.joins import cogroup_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"])
    grp = (li.groupby(["l_returnflag", "l_linestatus"]).count()
           .map_batches(lambda t: pa.table({
               "rf": t.column("l_returnflag"),
               "ls": t.column("l_linestatus"),
               "n_group": pc.cast(t.column("count()"), pa.int64())}),
               batch_format="pyarrow"))
    out = cogroup_join(li, grp,
                       left_on=["l_returnflag", "l_linestatus"],
                       right_on=["rf", "ls"], how="inner")
    return out.select_columns(["l_orderkey", "l_linenumber", "l_returnflag",
                               "l_linestatus", "n_group"])


def q_approx_grouped_median(sf_dir: str):
    """Bounded-state per-key median (stages/grouped.py:
    grouped_quantile_approx): deterministic bottom-k hash sample per key —
    the hot-key scale path of the grouped-quantile family. Keys at sf0.01
    fit the sample whole, so the result is EXACT here and the whole
    sample+select machinery oracles against quantile_disc; the
    approximation bound is pytest-oracled on a planted Zipf key."""
    from ethereum_etl_ray.stages.grouped import grouped_quantile_approx

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    return grouped_quantile_approx(ds, "user_id", "value", 0.5,
                                   id_col="event_id", sample_k=1024)


def q_search_topk(sf_dir: str):
    """End-to-end search ranking: BM25 scores → top-3 docs per query term —
    two engine operators composed (stages/invindex.py:bm25_scores feeding
    stages/grouped.py:topn_per_key); the combiner bounds the shuffle at 3
    rows per (batch, term)."""
    from ethereum_etl_ray.stages.grouped import topn_per_key
    from ethereum_etl_ray.stages.invindex import bm25_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    scored = bm25_scores(ds, ["scan", "merge", "window"], k1=1.2, b=0.75)
    top = topn_per_key(scored, "token", ["score", "doc_id"], 3,
                       descending=[True, False])
    return top.select_columns(["token", "doc_id", "score"])


def q_phrase_count(sf_dir: str):
    """Exact token-phrase occurrence counts per document
    (stages/invindex.py:phrase_count) — overlapping matches included,
    purely map-side via chained shifted vector equalities over the batch's
    flattened token array with a doc-boundary mask."""
    from ethereum_etl_ray.stages.invindex import phrase_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return phrase_count(ds, ["table", "scan"])


def q_profile_events(sf_dir: str):
    """One-pass data-quality profile (stages/profile.py:profile_table):
    per-column row count, null count, value-domain min/max — combiner-
    shaped (one summary row per column per batch). `value` is excluded:
    float→string formatting differs across engines; ints/timestamps/strings
    stringify identically."""
    from ethereum_etl_ray.stages.profile import profile_table

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return profile_table(ds)


def q_pk_violations(sf_dir: str):
    """Key-uniqueness audit (stages/profile.py:key_violations): events
    violating a proposed (user_id, event_type) uniqueness constraint, with
    duplicate counts — the constraint check behind every keyed upsert."""
    from ethereum_etl_ray.stages.profile import key_violations

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return key_violations(ds, ["user_id", "event_type"])


def q_pagerank_keys(sf_dir: str):
    """Distributed PageRank (stages/graph.py:pagerank) over the
    customer→nation→region key graph — iterative fixpoint: co-group join +
    hash aggregate per round, rank state materialized to keep lineage O(1).
    Rows-only (float contribution sums are order-dependent); the numpy
    power-iteration oracle lives in tests/test_graph.py."""
    from ethereum_etl_ray.stages.graph import pagerank

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: _ns_edges(t, "c:", "c_custkey", "n:", "c_nationkey"),
        batch_format="pyarrow", zero_copy_batch=True)
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).map_batches(
        lambda t: _ns_edges(t, "n:", "n_nationkey", "r:", "n_regionkey"),
        batch_format="pyarrow", zero_copy_batch=True)
    return pagerank(cust.union(nation), iters=5)


def q_user_value_profile(sf_dir: str):
    """Per-user q25/q50/q99 value profile — THREE exact discrete quantiles
    from ONE sort+rank pass (stages/grouped.py:grouped_quantile with a p
    list); an IQR profile costs no more than a lone median."""
    from ethereum_etl_ray.stages.grouped import grouped_quantile

    ds = _read(sf_dir, "events", ["user_id", "value"])
    return grouped_quantile(ds, "user_id", "value", [0.25, 0.5, 0.99])


def q_hourly_distinct_users(sf_dir: str):
    """Windowed COUNT(DISTINCT): distinct users per event hour — derived
    time-bin key + the batch-local pair-dedup combiner (shuffle bounded by
    |bins × users-in-batch|, not rows)."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def bin_pairs(t: pa.Table) -> pa.Table:
        # integer epoch-µs division (epoch µs exceed 2^53 — float division
        # could misbin an edge; int64 // is exact and matches SQL's //)
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        return (pa.table({"hour": hour, "user_id": t.column("user_id")})
                .group_by(["hour", "user_id"]).aggregate([]))

    pairs = ds.map_batches(bin_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    distinct = pairs.groupby(["hour", "user_id"]).count()
    return (distinct.groupby("hour").count()
            .map_batches(lambda t: pa.table({
                "hour": t.column("hour"),
                "n_users": pc.cast(t.column("count()"), pa.int64())}),
                batch_format="pyarrow"))


def q_type_share(sf_dir: str):
    """Percent-of-total per group: each event type's count and its share of
    all events — exact int64 counts, ONE float division mirrored by the SQL
    twin (int operands below 2^53 → bit-identical doubles)."""
    ds = _read(sf_dir, "events", ["event_type"])
    n_total = ds.count()
    counts = (ds.groupby("event_type").count()
              .map_batches(lambda t: pa.table({
                  "event_type": t.column("event_type"),
                  "n": pc.cast(t.column("count()"), pa.int64())}),
                  batch_format="pyarrow").to_pandas())
    share = counts.n.to_numpy().astype(np.float64) / float(n_total)
    return pa.table({"event_type": pa.array(counts.event_type, pa.string()),
                     "n": pa.array(counts.n.to_numpy(), pa.int64()),
                     "share": pa.array(share, pa.float64())})


def q_robust_outliers(sf_dir: str):
    """Per-user robust outlier events: |value − median| > 3·MAD
    (stages/grouped.py:robust_outliers) — the data-cleaning primitive; both
    statistics and the filter run in one co-partition pass."""
    from ethereum_etl_ray.stages.grouped import robust_outliers

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    out = robust_outliers(ds, "user_id", "value", k=3.0)
    return out.select_columns(["event_id", "user_id", "value", "med", "mad"])


def q_rollup_counts(sf_dir: str):
    """GROUP BY ROLLUP(status, priority) over orders: count + exact cent-sum
    at every prefix level (stages/reshape.py:rollup_aggregate) — ONE shuffle
    at the finest level, coarser levels re-aggregated from its (tiny) result."""
    from ethereum_etl_ray.stages.reshape import rollup_aggregate

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    return rollup_aggregate(ds, ["o_orderstatus", "o_orderpriority"],
                            sum_cents={"o_totalprice": "total_c100"})


def q_cube_counts(sf_dir: str):
    """GROUP BY CUBE(status, priority): all four grouping sets derived from
    the same single-shuffle finest aggregate (stages/reshape.py,
    cube=True) — the (status)-only, (priority)-only and grand-total levels
    cost no extra pass over the data."""
    from ethereum_etl_ray.stages.reshape import rollup_aggregate

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    return rollup_aggregate(ds, ["o_orderstatus", "o_orderpriority"],
                            sum_cents={"o_totalprice": "total_c100"}, cube=True)


def q_unpivot_metrics(sf_dir: str):
    """UNPIVOT/melt lineitem's four numeric metrics to long form
    (stages/reshape.py:unpivot) — purely map-side, zero-copy id columns."""
    from ethereum_etl_ray.stages.reshape import unpivot

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax"])
    return unpivot(ds, ["l_orderkey", "l_linenumber"],
                   ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])


def q_intersect_keys(sf_dir: str):
    """INTERSECT: distinct user ids present in BOTH events and customer —
    semi-join membership filter over the distinct key set (the dual of
    anti_join_users; A1-A3 distinct + set-op family)."""
    from ethereum_etl_ray.stages.joins import semi_anti_filter

    active = _read(sf_dir, "events", ["user_id"]).unique("user_id")
    cust = _read(sf_dir, "customer", ["c_custkey"])
    return semi_anti_filter(cust, active, on="c_custkey", anti=False)


def q_outer_join_activity(sf_dir: str):
    """FULL OUTER join of per-user event counts with the customer table
    (stages/joins.py:cogroup_join how='outer') — unmatched rows on BOTH
    sides survive null-padded; runs downstream of a hash aggregate, the
    exact shape where this Ray version's Dataset.join breaks."""
    from ethereum_etl_ray.stages.joins import cogroup_join

    ev = (_read(sf_dir, "events", ["user_id"])
          .groupby("user_id").count()
          .map_batches(lambda t: t.rename_columns(["user_id", "n_ev"]),
                       batch_format="pyarrow"))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    out = cogroup_join(ev, cust, left_on="user_id", right_on="c_custkey",
                       how="outer")
    # nullable int columns cross engines as float64 (exact below 2^53) —
    # NA-int representations differ between pandas/duckdb, floats don't
    return out.map_batches(
        lambda t: pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.float64()),
            "n_ev": pc.cast(t.column("n_ev"), pa.float64()),
            "c_custkey": pc.cast(t.column("c_custkey"), pa.float64()),
            "c_mktsegment": t.column("c_mktsegment")}),
        batch_format="pyarrow", zero_copy_batch=True)


def q_pivot_event_types(sf_dir: str):
    """PIVOT long→wide (stages/reshape.py:pivot_counts): one row per user
    with a count column per event type — combiner-shaped, shuffle volume
    O(keys × types), never O(rows)."""
    from ethereum_etl_ray.stages.reshape import pivot_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    types = sorted(ds.unique("event_type"))
    return pivot_counts(ds, "user_id", "event_type", types)


def q_value_histogram(sf_dir: str):
    """Fixed-width histogram of event values (bin = floor(value/50)) — a
    derived-key aggregate with a map-side combiner; the classic profiling
    operator over an unbounded-cardinality measure."""
    ds = _read(sf_dir, "events", ["value"])

    def bin_counts(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.floor(v / 50.0).astype(np.int64)
        agged = (pa.table({"bin": pa.array(b, pa.int64()),
                           "n": pa.array(np.ones(len(b), np.int64))})
                 .group_by("bin").aggregate([("n", "sum")]))
        return pa.table({"bin": agged.column("bin"),
                         "n": agged.column("n_sum")})

    from ray.data.aggregate import Sum

    agged = (ds.map_batches(bin_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("bin").aggregate(Sum("n", alias_name="n")))
    return agged.map_batches(
        lambda t: pa.table({"bin": t.column("bin"),
                            "n": pc.cast(t.column("n"), pa.int64())}),
        batch_format="pyarrow")


def q_corr_qty_discount(sf_dir: str):
    """Exact distributed Pearson correlation (stages/stats.py:exact_corr)
    between lineitem quantity and discount-cents: integer moment sums in a
    combiner, ONE closed-form float expression mirrored by the SQL oracle —
    bit-identical across engines and partitionings."""
    from ethereum_etl_ray.stages.stats import exact_corr

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def to_ints(t: pa.Table) -> pa.Table:
        d = t.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pc.cast(t.column("l_quantity"), pa.int64()),
            "d100": pa.array(np.floor(d * 100.0 + 0.5).astype(np.int64)),
        })

    ints = ds.map_batches(to_ints, batch_format="pyarrow", zero_copy_batch=True)
    return pa.table({"corr": pa.array([exact_corr(ints, "q", "d100")],
                                      pa.float64())})


def q_count_distinct_by_key(sf_dir: str):
    """Per-key COUNT(DISTINCT): distinct event types per user. Per-batch
    (key, type) dedup combiner bounds shuffle input by |keys|·|types| per
    batch (not rows), then one hash aggregate over the deduped pairs."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def dedup_pairs(t: pa.Table) -> pa.Table:
        return t.group_by(["user_id", "event_type"]).aggregate([])

    pairs = ds.map_batches(dedup_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    # batch-local dedup bounds the shuffle; the pair aggregate makes the
    # set exactly distinct, then a per-user row count over it
    distinct_pairs = pairs.groupby(["user_id", "event_type"]).count()
    return (distinct_pairs.groupby("user_id").count()
            .map_batches(lambda t: pa.table({
                "user_id": t.column("user_id"),
                "n_types": pc.cast(t.column("count()"), pa.int64())}),
                batch_format="pyarrow"))


def q_argmax_by_type(sf_dir: str):
    """ARG_MAX / max_by: per event_type, the full row with the maximum
    (value, event_id) — the LWW winner-pick machinery (stages/merge.py)
    applied with value as the version column."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])
    return lww_merge_dataset(ds, key="event_type",
                             version=("value", "event_id"))


def q_compression_ratio(sf_dir: str):
    """Per-document zlib compression ratio (repetition/boilerplate quality
    signal — functions/textstats.py:compression_stats_batch). Rows-only at
    the driver (SQL has no zlib); planted-docs oracle in
    tests/test_textstats.py."""
    from ethereum_etl_ray.functions.textstats import compression_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(compression_stats_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
    return out.select_columns(["doc_id", "zlib_len", "ratio_ppm"])


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-Res, stages/selection.py:weighted_sample_k): 100 documents
    weighted by n_chars — inclusion probability scales with length, sample
    reproducible across partitionings/cluster sizes. Driver rows-only;
    determinism + inclusion-rate oracles in tests/test_selection.py."""
    from ethereum_etl_ray.stages.selection import weighted_sample_k

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_sample_k(ds, k=100, weight_col="n_chars",
                             id_col="doc_id")


def q_approx_distinct_users(sf_dir: str):
    """Approximate COUNT(DISTINCT user_id) via distributed HyperLogLog
    (stages/sketch.py:approx_distinct): O(4 KiB) per batch regardless of
    cardinality, tree-merged in-cluster; error bound oracled in pytest
    (tests/test_sketch.py) against the exact count."""
    from ethereum_etl_ray.stages.sketch import approx_distinct

    ds = _read(sf_dir, "events", ["user_id"])
    est = approx_distinct(ds, "user_id")
    return pa.table({"estimate": pa.array([est], pa.float64())})


# --------------------------------------------------------------------------
# registry + DuckDB oracles
# --------------------------------------------------------------------------

QUERIES = {
    "lww_latest_by_key": q_lww_latest_by_key,
    "fww_first_by_key": q_fww_first_by_key,
    "tombstone_merge": q_tombstone_merge,
    "retention_evict": q_retention_evict,
    "projection_revenue": q_projection_revenue,
    "explode_tokens": q_explode_tokens,
    "filter_dispatch": q_filter_dispatch,
    "hex_roundtrip": q_hex_roundtrip,
    "distinct_union_keys": q_distinct_union_keys,
    "anti_join_users": q_anti_join_users,
    "derived_counts": q_derived_counts,
    "table_counts": q_table_counts,
    "groupby_agg_pushdown": q_groupby_agg_pushdown,
    "heavy_hitter_users": q_heavy_hitter_users,
    "broadcast_join_brand_rev": q_broadcast_join_brand_rev,
    "hash_join_segment_status": q_hash_join_segment_status,
    "asof_join_orders": q_asof_join_orders,
    "graph_reach": q_graph_reach,
    "graph_path_value": q_graph_path_value,
    "enrich_segment_spend": q_enrich_segment_spend,
    "topk_orders": q_topk_orders,
    "window_hourly": q_window_hourly,
    "exact_dedup_docs": q_exact_dedup_docs,
    "doc_fingerprint": q_doc_fingerprint,
    "lang_id_docs": q_lang_id_docs,
    "quality_docs": q_quality_docs,
    "winnow_fingerprint": q_winnow_fingerprint,
    "bpe_token_count": q_bpe_token_count,
    "embedding_topk": q_embedding_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_persisted": q_ann_ivf_persisted,
    "embedding_cosine_pairs": q_embedding_cosine_pairs,
    "ann_quantized_topk": q_ann_quantized_topk,
    "ann_pq_topk": q_ann_pq_topk,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "connected_components": q_connected_components,
    "near_dedup_keep": q_near_dedup_keep,
    "corpus_curate": q_corpus_curate,
    "corpus_filter_dedup": q_corpus_filter_dedup,
    "budget_sample": q_budget_sample,
    "vocab_topk": q_vocab_topk,
    "stratified_sample": q_stratified_sample,
    "doc_keywords": q_doc_keywords,
    "json_extract_props": q_json_extract_props,
    "sessionize": q_sessionize,
    "window_sliding": q_window_sliding,
    "simhash_pairs": q_simhash_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_frames": q_multimodal_frames,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "random_sample": q_random_sample,
    "deterministic_sample": q_deterministic_sample,
    "cap_per_key": q_cap_per_key,
    "url_parse": q_url_parse,
    "domain_stats": q_domain_stats,
    "decontaminate": q_decontaminate,
    "shuffle_rank": q_shuffle_rank,
    "inverted_postings": q_inverted_postings,
    "percentiles": q_percentiles,
    "range_join": q_range_join,
    "bm25_scores": q_bm25_scores,
    "topn_per_key": q_topn_per_key,
    "grouped_median": q_grouped_median,
    "window_lag_cumsum": q_window_lag_cumsum,
    "rollup_counts": q_rollup_counts,
    "cube_counts": q_cube_counts,
    "string_agg_types": q_string_agg_types,
    "grouped_mad": q_grouped_mad,
    "robust_outliers": q_robust_outliers,
    "multikey_join_group_stats": q_multikey_join_group_stats,
    "user_value_profile": q_user_value_profile,
    "hourly_distinct_users": q_hourly_distinct_users,
    "type_share": q_type_share,
    "pagerank_keys": q_pagerank_keys,
    "approx_grouped_median": q_approx_grouped_median,
    "profile_events": q_profile_events,
    "pk_violations": q_pk_violations,
    "phrase_count": q_phrase_count,
    "search_topk": q_search_topk,
    "unpivot_metrics": q_unpivot_metrics,
    "intersect_keys": q_intersect_keys,
    "outer_join_activity": q_outer_join_activity,
    "weighted_sample": q_weighted_sample,
    "compression_ratio": q_compression_ratio,
    "count_distinct_by_key": q_count_distinct_by_key,
    "argmax_by_type": q_argmax_by_type,
    "pivot_event_types": q_pivot_event_types,
    "value_histogram": q_value_histogram,
    "corr_qty_discount": q_corr_qty_discount,
    "approx_distinct_users": q_approx_distinct_users,
    "pii_redact": q_pii_redact,
    "normalize_part": q_normalize_part,
    "rep_stats": q_rep_stats,
    "pack_sequences": q_pack_sequences,
    "chunk_docs": q_chunk_docs,
    "lm_score": q_lm_score,
    "cdc_replay_full": q_cdc_replay_full,
    "cdc_replay_ignore": q_cdc_replay_ignore,
    "cdc_resume_tail": q_cdc_resume_tail,
    "cdc_bulk_load": q_cdc_bulk_load,
    "lake_diff": q_lake_diff,
    "incremental_lang_counts": q_incremental_lang_counts,
    "stream_publish": q_stream_publish,
    "schema_evolution_audit": q_schema_evolution_audit,
}

_LWW_SQL = """
SELECT user_id, ts, event_id, event_type, value
FROM (
  SELECT user_id, ts, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts {d1}, event_id {d1}) AS rn
  FROM events
) WHERE rn = 1
"""

_MM_W = "GREATEST(1, LEAST(length(text), 64))"

_LANG_SCORE = {
    lang: " + ".join(
        f"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' {w} ', ''))) // (length(' {w} ')) AS BIGINT)"
        for w in words
    )
    for lang, words in {
        "de": ["der", "und", "die"],
        "en": ["the", "a", "of"],
        "es": ["el", "la", "que"],
        "fr": ["le", "et", "les"],
        "zh": ["he", "shi", "de0"],
    }.items()
}

ORACLE_SQL = {
    "lww_latest_by_key": _LWW_SQL.format(d1="DESC"),
    "fww_first_by_key": _LWW_SQL.format(d1="ASC"),
    "tombstone_merge": """
        SELECT user_id, ts, event_id, event_type, value
        FROM (
          SELECT user_id, ts, event_id, event_type, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1 AND event_type <> 'error'
    """,
    "retention_evict": """
        SELECT event_id, user_id, ts
        FROM (
          SELECT event_id, user_id, ts,
                 row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn <= CAST(floor(0.9 * (SELECT count(*) FROM events)) AS BIGINT)
    """,
    "projection_revenue": """
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS revenue_c100,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year
        FROM lineitem
    """,
    "explode_tokens": """
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    """,
    "filter_dispatch": """
        SELECT event_id, user_id, event_type,
               CASE WHEN event_type = 'purchase' THEN value ELSE -value END AS signed_value
        FROM events WHERE event_type IN ('purchase', 'signup')
    """,
    "hex_roundtrip": """
        SELECT event_id, printf('%x', event_id) AS hex_repr, event_id AS decoded FROM events
    """,
    "distinct_union_keys": """
        SELECT CAST(user_id AS BIGINT) AS key_id FROM events
        UNION
        SELECT CAST(o_custkey AS BIGINT) AS key_id FROM orders
    """,
    "anti_join_users": """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT DISTINCT user_id FROM events)
    """,
    "derived_counts": """
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_calc
        FROM documents
    """,
    "table_counts": """
        SELECT 'customer' AS table_name, count(*) AS n FROM customer
        UNION ALL SELECT 'documents', count(*) FROM documents
        UNION ALL SELECT 'embeddings', count(*) FROM embeddings
        UNION ALL SELECT 'events', count(*) FROM events
        UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        UNION ALL SELECT 'nation', count(*) FROM nation
        UNION ALL SELECT 'orders', count(*) FROM orders
        UNION ALL SELECT 'part', count(*) FROM part
        UNION ALL SELECT 'region', count(*) FROM region
        UNION ALL SELECT 'supplier', count(*) FROM supplier
    """,
    "groupby_agg_pushdown": """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c100,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_c100
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "heavy_hitter_users": """
        SELECT user_id, n FROM (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                 row_number() OVER (ORDER BY count(*) DESC, user_id) AS rn
          FROM events GROUP BY user_id
        ) WHERE rn <= 20
    """,
    "broadcast_join_brand_rev": """
        SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c100
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "hash_join_segment_status": """
        SELECT c_mktsegment, o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c100
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderstatus
    """,
    "asof_join_orders": """
        SELECT e.event_id, e.user_id, o.o_orderkey
        FROM events e
        ASOF JOIN (
          SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
          FROM orders GROUP BY o_custkey, o_orderdate
        ) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    "deterministic_sample": """
        SELECT event_id, user_id FROM events
        WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1) < '2'
    """,
    "cap_per_key": """
        SELECT event_id, user_id, ts FROM (
          SELECT event_id, user_id, ts,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn <= 3
    """,
    "graph_reach": """
        WITH RECURSIVE e AS (
          SELECT 'o:' || o_orderkey AS src, 'c:' || o_custkey AS dst FROM orders
          UNION ALL
          SELECT 'c:' || c_custkey, 'n:' || c_nationkey FROM customer
          UNION ALL
          SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
        ), reach(start, node, hops) AS (
          SELECT 'o:' || o_orderkey, 'o:' || o_orderkey, 0
          FROM orders WHERE o_orderkey <= 200
          UNION ALL
          SELECT r.start, e.dst, r.hops + 1
          FROM reach r JOIN e ON e.src = r.node WHERE r.hops < 3
        )
        SELECT start, node, CAST(min(hops) AS BIGINT) AS hops
        FROM reach GROUP BY start, node
    """,
    "graph_path_value": """
        WITH RECURSIVE e AS (
          SELECT 'o:' || l_orderkey AS src, 'p:' || l_partkey AS dst,
                 POWER(0.5, l_linenumber % 3) AS w FROM lineitem
          UNION ALL
          SELECT 'p:' || p_partkey, 'b:' || p_brand,
                 POWER(0.5, p_partkey % 2) FROM part
        ), reach(start, node, hops, val) AS (
          SELECT 'o:' || o_orderkey, 'o:' || o_orderkey, 0,
                 CAST(1.0 AS DOUBLE)
          FROM orders WHERE o_orderkey <= 100
          UNION ALL
          SELECT r.start, e.dst, r.hops + 1, r.val * e.w
          FROM reach r JOIN e ON e.src = r.node WHERE r.hops < 2
        )
        SELECT start, node, CAST(hops AS BIGINT) AS hops,
               max(val) AS path_value
        FROM (
          SELECT start, node, hops, val,
                 min(hops) OVER (PARTITION BY start, node) AS mh
          FROM reach
        ) WHERE hops = mh
        GROUP BY start, node, hops
    """,
    "enrich_segment_spend": """
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c100
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    "topk_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
    "window_hourly": """
        SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c100
        FROM events GROUP BY user_id, hour_bucket
    """,
    "connected_components": """
        WITH RECURSIVE e AS (
          SELECT doc_id AS a, doc_id - 1 AS b FROM documents WHERE doc_id % 8 <> 0
          UNION ALL
          SELECT doc_id, doc_id - 3 FROM documents WHERE doc_id % 8 >= 3
        ), sym AS (
          SELECT a, b FROM e UNION SELECT b, a FROM e
        ), nodes AS (
          SELECT DISTINCT a AS n FROM sym
        ), reach(n, m) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT r.n, s.b FROM reach r JOIN sym s ON s.a = r.m
        )
        SELECT n AS node, CAST(min(m) AS BIGINT) AS component
        FROM reach GROUP BY n
    """,
    "exact_dedup_docs": """
        SELECT doc_id, lang, n_chars FROM (
          SELECT doc_id, lang, n_chars,
                 row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM documents
        ) WHERE rn = 1
    """,
    "doc_fingerprint": "SELECT doc_id, md5(text) AS fingerprint FROM documents",
    "lang_id_docs": f"""
        SELECT doc_id, score_de, score_en, score_es, score_fr, score_zh,
               CASE
                 WHEN score_de >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
                 WHEN score_en >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
                 WHEN score_es >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
                 WHEN score_fr >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
                 ELSE 'zh'
               END AS predicted_lang
        FROM (
          SELECT doc_id,
                 {_LANG_SCORE['de']} AS score_de,
                 {_LANG_SCORE['en']} AS score_en,
                 {_LANG_SCORE['es']} AS score_es,
                 {_LANG_SCORE['fr']} AS score_fr,
                 {_LANG_SCORE['zh']} AS score_zh
          FROM documents
        )
    """,
    "window_sliding": """
        SELECT window_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_c100
        FROM (
          SELECT (CAST(floor(epoch(ts) / 900) AS BIGINT) - k.k) * 900
                   AS window_start,
                 value
          FROM events
          CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
        ) GROUP BY window_start
    """,
    "sessionize": """
        WITH ordered AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, ts, value,
                 SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM ordered
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS t_start, max(ts) AS t_end,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_c100
        FROM sess GROUP BY user_id, session_id
    """,
    "json_extract_props": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
    """,
    "doc_keywords": """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents
        ), tf AS (
          SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
          FROM tok GROUP BY doc_id, token
        ), df AS (
          SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
        )
        SELECT doc_id, token, tf, df, score FROM (
          SELECT tf.doc_id, tf.token, tf.tf, df.df,
                 CAST(tf.tf * 1000000 // df.df AS BIGINT) AS score,
                 row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * 1000000 // df.df DESC, tf.token) AS rn
          FROM tf JOIN df USING (token)
        ) WHERE rn <= 5
    """,
    "stratified_sample": """
        SELECT doc_id, lang, n_chars FROM (
          SELECT doc_id, lang, n_chars,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
          FROM documents
        ) WHERE rn <= 20
    """,
    "vocab_topk": """
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ) GROUP BY token
        ORDER BY n DESC, token ASC
        LIMIT 50
    """,
    "budget_sample": """
        SELECT doc_id, n_tokens FROM (
          SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR))
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM (
            SELECT doc_id,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
            FROM documents
          )
        ) WHERE cum <= 10000
    """,
    "corpus_filter_dedup": f"""
        WITH scored AS (
          SELECT doc_id, text, n_chars,
                 CASE
                   WHEN score_de >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
                   WHEN score_en >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
                   WHEN score_es >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
                   WHEN score_fr >= GREATEST(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
                   ELSE 'zh'
                 END AS predicted_lang,
                 CAST(LEAST(n_tokens, 100) * 10000
                      - ((stop_hits * 1000000) // n_tokens) // 2
                      + (((n_chars_txt - (n_tokens - 1)) * 100) // n_tokens) * 10
                   AS BIGINT) AS quality_ppm
          FROM (
            SELECT doc_id, text, n_chars,
                   {_LANG_SCORE['de']} AS score_de,
                   {_LANG_SCORE['en']} AS score_en,
                   {_LANG_SCORE['es']} AS score_es,
                   {_LANG_SCORE['fr']} AS score_fr,
                   {_LANG_SCORE['zh']} AS score_zh,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_txt,
                   CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5
                      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) // 3
                      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' of ', ''))) // 4
                      AS BIGINT) AS stop_hits
            FROM documents
          )
        )
        SELECT doc_id, predicted_lang, quality_ppm, n_chars FROM (
          SELECT doc_id, predicted_lang, quality_ppm, n_chars,
                 row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM scored
          WHERE predicted_lang = 'en' AND quality_ppm >= 300000
        ) WHERE rn = 1
    """,
    "quality_docs": """
        SELECT doc_id, n_tokens, n_chars_txt, stop_ppm, mtl_c,
               CAST(LEAST(n_tokens, 100) * 10000 - stop_ppm // 2 + mtl_c * 10 AS BIGINT) AS quality_ppm
        FROM (
          SELECT doc_id, n_tokens, n_chars_txt,
                 (stop_hits * 1000000) // n_tokens AS stop_ppm,
                 ((n_chars_txt - (n_tokens - 1)) * 100) // n_tokens AS mtl_c
          FROM (
            SELECT doc_id,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_txt,
                   CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5
                      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) // 3
                      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' of ', ''))) // 4
                      AS BIGINT) AS stop_hits
            FROM documents
          )
        )
    """,
    "bpe_token_count": f"""
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
                 AS n_ws_tokens,
               CAST(length(regexp_extract_all(text,
                 ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS BIGINT)
                 AS n_bpe_tokens
        FROM documents
    """,
    # the oracle reconstructs parsed URL fields constructively from the same
    # (doc_id, source) arithmetic the builder uses; the engine must recover
    # them by parsing the assembled string (functions/url.py)
    "url_parse": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END AS scheme,
               (CASE WHEN doc_id % 3 = 0 THEN 'm.' ELSE 'www.' END)
                 || lower(source) || '.org' AS host,
               CASE WHEN doc_id % 10 = 0 THEN '8080'
                    WHEN doc_id % 10 = 5 THEN '443' ELSE NULL END AS port,
               lower(source) || '.org' AS domain,
               (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
                 || '://'
                 || (CASE WHEN doc_id % 3 = 0 THEN 'm.' ELSE 'www.' END)
                 || lower(source) || '.org'
                 || (CASE WHEN doc_id % 10 = 0 THEN ':8080' ELSE '' END)
                 || '/d/' || (doc_id % 100)
                 || (CASE WHEN doc_id % 4 = 0 THEN '?ref=' || source ELSE '' END)
                 AS canonical_url
        FROM documents
    """,
    "domain_stats": """
        WITH parsed AS (
          SELECT lower(source) || '.org' AS domain,
                 (CASE WHEN doc_id % 3 = 0 THEN 'm.' ELSE 'www.' END)
                   || lower(source) || '.org' AS host,
                 n_chars
          FROM documents
        )
        SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM parsed GROUP BY domain
    """,
    # window boundaries are exact binary doubles (multiples of 12/18), so the
    # containment comparisons are bit-identical across engines
    "range_join": """
        SELECT e.event_id, e.value, w.window_id
        FROM events e
        JOIN (
          SELECT i AS window_id, i * 12.0 AS lo, i * 12.0 + 18.0 AS hi
          FROM UNNEST(generate_series(0, 19)) AS t(i)
        ) w ON e.value >= w.lo AND e.value < w.hi
    """,
    "percentiles": """
        SELECT CAST(0.25 AS DOUBLE) AS p, quantile_disc(value, 0.25) AS value FROM events
        UNION ALL
        SELECT 0.5, quantile_disc(value, 0.5) FROM events
        UNION ALL
        SELECT 0.9, quantile_disc(value, 0.9) FROM events
        UNION ALL
        SELECT 0.99, quantile_disc(value, 0.99) FROM events
    """,
    # the float expression mirrors stages/invindex.py:bm25_scores
    # literal-for-literal and in the same association order (rational idf,
    # no ln), so both engines produce bit-identical doubles; every literal
    # is ::DOUBLE because DuckDB numeric literals are DECIMAL (1.2 + 1.0
    # would be the exact decimal 2.2, not the double sum numpy computes);
    # dl counts ALL split tokens (unnest parity), tf only matched terms
    "bm25_scores": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents
        ),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(dl) AS BIGINT) AS tt FROM dl),
        tf AS (
          SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
          FROM toks WHERE token IN ('scan', 'merge', 'window')
          GROUP BY token, doc_id
        ),
        df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token)
        SELECT tf.token, tf.doc_id, tf.tf,
               ((n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
                 * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
                 / (tf + 1.2::DOUBLE * ((1.0::DOUBLE - 0.75::DOUBLE)
                    + 0.75::DOUBLE * dl / (tt / n))) AS score
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
    """,
    "topn_per_key": """
        SELECT event_id, user_id, value FROM (
          SELECT event_id, user_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= 3
    """,
    "grouped_median": """
        SELECT user_id, quantile_disc(value, 0.5) AS med_value
        FROM events GROUP BY user_id
    """,
    # both engines sum int64 cents — no float summation order to disagree on
    "window_lag_cumsum": """
        WITH c AS (
          SELECT event_id, user_id, ts,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS c100
          FROM events)
        SELECT event_id, user_id,
               c100 - LAG(c100) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS delta_c100,
               CAST(SUM(c100) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_c100
        FROM c
    """,
    "rollup_counts": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_c100
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    "string_agg_types": """
        SELECT user_id,
               string_agg(event_type, ',' ORDER BY ts, event_id) AS types_seq
        FROM events GROUP BY user_id
    """,
    # mirrors stages/grouped.py:grouped_mad two-step discrete-median form
    "grouped_mad": """
        WITH med AS (
          SELECT user_id, quantile_disc(value, 0.5) AS m
          FROM events GROUP BY user_id)
        SELECT e.user_id, quantile_disc(abs(e.value - med.m), 0.5) AS mad
        FROM events e JOIN med USING (user_id) GROUP BY e.user_id
    """,
    # the bm25_scores expression (same literals/association) + ROW_NUMBER
    "search_topk": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents
        ),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(dl) AS BIGINT) AS tt FROM dl),
        tf AS (
          SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
          FROM toks WHERE token IN ('scan', 'merge', 'window')
          GROUP BY token, doc_id
        ),
        df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
        scored AS (
          SELECT tf.token, tf.doc_id,
                 ((n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
                   * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
                   / (tf + 1.2::DOUBLE * ((1.0::DOUBLE - 0.75::DOUBLE)
                      + 0.75::DOUBLE * dl / (tt / n))) AS score
          FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats)
        SELECT token, doc_id, score FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY token
                                       ORDER BY score DESC, doc_id) AS rn
          FROM scored) WHERE rn <= 3
    """,
    # overlapping occurrences via position-indexed list lambda
    "phrase_count": """
        SELECT * FROM (
          SELECT doc_id,
                 CAST(len(list_filter(range(1, len(l)),
                      i -> l[i] = 'table' AND l[i+1] = 'scan')) AS BIGINT)
                   AS n_matches
          FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
        WHERE n_matches > 0
    """,
    "profile_events": """
        SELECT 'event_id' AS "column", CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) - count(event_id) AS BIGINT) AS nulls,
               CAST(min(event_id) AS VARCHAR) AS min,
               CAST(max(event_id) AS VARCHAR) AS max FROM events
        UNION ALL
        SELECT 'ts', count(*), count(*) - count(ts),
               CAST(min(ts) AS VARCHAR), CAST(max(ts) AS VARCHAR) FROM events
        UNION ALL
        SELECT 'user_id', count(*), count(*) - count(user_id),
               CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
        FROM events
        UNION ALL
        SELECT 'event_type', count(*), count(*) - count(event_type),
               min(event_type), max(event_type) FROM events
    """,
    "pk_violations": """
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type HAVING count(*) > 1
    """,
    # exact here: every sf0.01 key fits sample_k whole (~67 events/user)
    "approx_grouped_median": """
        SELECT user_id, quantile_disc(value, 0.5) AS q50
        FROM events GROUP BY user_id
    """,
    "user_value_profile": """
        SELECT user_id, quantile_disc(value, 0.25) AS q25,
               quantile_disc(value, 0.5) AS q50,
               quantile_disc(value, 0.99) AS q99
        FROM events GROUP BY user_id
    """,
    "hourly_distinct_users": """
        SELECT epoch_us(ts) // 3600000000 AS hour,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1
    """,
    "type_share": """
        WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY event_type),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events)
        SELECT event_type, n, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
        FROM c CROSS JOIN tot
    """,
    "multikey_join_group_stats": """
        SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_linestatus,
               g.n_group
        FROM lineitem l
        JOIN (SELECT l_returnflag AS rf, l_linestatus AS ls,
                     CAST(count(*) AS BIGINT) AS n_group
              FROM lineitem GROUP BY 1, 2) g
          ON l.l_returnflag = g.rf AND l.l_linestatus = g.ls
    """,
    # mirrors stages/grouped.py:robust_outliers: discrete median + MAD per
    # key, |v-med| > 3*mad as one float multiply
    "robust_outliers": """
        WITH med AS (
          SELECT user_id, quantile_disc(value, 0.5) AS med
          FROM events GROUP BY user_id),
        mad AS (
          SELECT e.user_id, quantile_disc(abs(e.value - med.med), 0.5) AS mad
          FROM events e JOIN med USING (user_id) GROUP BY e.user_id)
        SELECT e.event_id, e.user_id, e.value, med.med, mad.mad
        FROM events e JOIN med USING (user_id) JOIN mad USING (user_id)
        WHERE abs(e.value - med.med) > 3.0 * mad.mad
    """,
    "cube_counts": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_c100
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    "unpivot_metrics": """
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
               CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
               CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
               CAST(l_discount AS DOUBLE) FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax',
               CAST(l_tax AS DOUBLE) FROM lineitem
    """,
    "intersect_keys": """
        SELECT c_custkey FROM customer
        WHERE c_custkey IN (SELECT user_id FROM events)
    """,
    # conditional aggregation = PIVOT with a declared column set (the Ray
    # side derives the same set from unique(); stable across sf dirs)
    "pivot_event_types": """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    """,
    "value_histogram": """
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """,
    # mirrors stages/stats.py:exact_corr literal-for-literal: exact BIGINT
    # moment sums, ONE float expression (sqrt/div are IEEE correctly
    # rounded, so both engines produce the identical double)
    "corr_qty_discount": """
        WITH ints AS (
          SELECT CAST(l_quantity AS BIGINT) AS q,
                 CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d100
          FROM lineitem),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(q) AS BIGINT) AS sx, CAST(sum(d100) AS BIGINT) AS sy,
                 CAST(sum(q * q) AS BIGINT) AS sxx,
                 CAST(sum(d100 * d100) AS BIGINT) AS syy,
                 CAST(sum(q * d100) AS BIGINT) AS sxy
          FROM ints)
        SELECT CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr
        FROM m
    """,
    "count_distinct_by_key": """
        SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events GROUP BY user_id
    """,
    "argmax_by_type": """
        SELECT event_id, user_id, event_type, value FROM (
          SELECT event_id, user_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    """,
    "outer_join_activity": """
        SELECT CAST(e.user_id AS DOUBLE) AS user_id,
               CAST(e.n_ev AS DOUBLE) AS n_ev,
               CAST(c.c_custkey AS DOUBLE) AS c_custkey,
               c.c_mktsegment
        FROM (SELECT user_id, count(*) AS n_ev
              FROM events GROUP BY user_id) e
        FULL OUTER JOIN customer c ON e.user_id = c.c_custkey
    """,
    "inverted_postings": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents
        )
        SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
        FROM toks
        WHERE token IN ('scan', 'merge', 'window')
        GROUP BY token, doc_id
    """,
    # md5-hex ordering is identical in both engines (lowercase hex); the
    # doc_id tiebreak is unreachable for distinct keys but keeps the SQL total
    "shuffle_rank": """
        SELECT doc_id, lang,
               CAST(row_number() OVER (
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                 AS pos
        FROM documents
    """,
    # benchmark = doc_id % 37 == 0; corpus-side hits are instance-level,
    # benchmark grams distinct — mirrors pipelines/decontam.py exactly.
    # DuckDB list slice l[i:j] is 1-based inclusive: t[i:i+4] is a 5-gram.
    "decontaminate": """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
          SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
          FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
        ),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 37 = 0),
        hits AS (
          SELECT gr.doc_id, count(*) AS n
          FROM grams gr JOIN bench b ON gr.g = b.g
          WHERE gr.doc_id % 37 <> 0
          GROUP BY gr.doc_id
        )
        SELECT d.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
               coalesce(h.n, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 37 <> 0
    """,
    # nested replaces mirror the engine's contract order: emails, then IPs,
    # then phones (both engines execute RE2, so patterns are byte-identical)
    "pii_redact": """
        WITH planted AS (
          SELECT doc_id,
                 'contact user' || doc_id || '@mail.example.com or +1-202-555-'
                   || (doc_id % 9000 + 1000) || ' from 10.' || (doc_id % 256)
                   || '.0.1 re: ' || text AS dirty
          FROM documents
        )
        SELECT doc_id,
               CAST(length(regexp_extract_all(dirty,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                 AS n_emails,
               CAST(length(regexp_extract_all(dirty,
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT)
                 AS n_ips,
               CAST(length(regexp_extract_all(dirty,
                 '\\+[0-9][0-9-]{6,}[0-9]')) AS BIGINT) AS n_phones,
               regexp_replace(regexp_replace(regexp_replace(dirty,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
                 '\\+[0-9][0-9-]{6,}[0-9]', '<PHONE>', 'g') AS clean
        FROM planted
    """,
    "normalize_part": """
        SELECT p_partkey,
               trim(regexp_replace(lower(nfc_normalize(
                 '  ' || upper(p_name) || chr(9) || p_type || '  ')),
                 '\\s+', ' ', 'g')) AS norm
        FROM part
    """,
    "rep_stats": """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ), cnt AS (
          SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
        )
        SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
               (sum(c) - count(*)) * 1000000 // sum(c) AS dup_ppm,
               max(c) * 1000000 // sum(c) AS top_tok_ppm
        FROM cnt GROUP BY doc_id
    """,
    "lm_score": """
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 length(text) - length(replace(text, ' ', '')) + 1 AS ntok
          FROM documents
        ), big AS (
          SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, ntok - 1)) AS i
                FROM d WHERE ntok >= 2)
        ), c2 AS (
          SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2
        ), c1 AS (
          SELECT w, count(*) AS c
          FROM (SELECT unnest(toks) AS w FROM d) GROUP BY w
        ), scored AS (
          SELECT b.doc_id, c2.c * 1000000 // c1.c AS cond_ppm
          FROM big b
          JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
          JOIN c1 ON c1.w = b.w1
        )
        SELECT doc_id, count(*) AS n_bigrams,
               sum(cond_ppm) // count(*) AS lm_score_ppm
        FROM scored GROUP BY doc_id
        UNION ALL
        SELECT doc_id, 0 AS n_bigrams, 0 AS lm_score_ppm
        FROM d WHERE ntok < 2
    """,
    "chunk_docs": f"""
        WITH d AS (
          SELECT doc_id, text,
                 length(text) - length(replace(text, ' ', '')) + 1 AS ntok
          FROM documents
        ), starts AS (
          SELECT doc_id, text, ntok,
                 unnest(generate_series(1, ntok, {_CHUNK_S})) AS i
          FROM d
        )
        SELECT doc_id, CAST((i - 1) // {_CHUNK_S} AS BIGINT) AS chunk_id,
               array_to_string(list_slice(string_split(text, ' '), i,
                                          least(i + {_CHUNK_W} - 1, ntok)),
                               ' ') AS chunk_text,
               least(i + {_CHUNK_W} - 1, ntok) - i + 1 AS n_chunk_tokens
        FROM starts
    """,
    "pack_sequences": f"""
        SELECT doc_id, n_tokens,
               CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS seq_id
        FROM (
          SELECT doc_id, n_tokens,
                 sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM (
            SELECT doc_id,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1
                     AS BIGINT) AS n_tokens
            FROM documents))
    """,
    "embedding_topk": f"""
        WITH q AS (
          SELECT vec_id AS query_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
          FROM embeddings WHERE vec_id < {_N_QUERIES}
        ), c AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
          FROM embeddings
        ), s AS (
          SELECT q.query_id, c.vec_id,
                 list_cosine_similarity(q.qe, c.ce) AS sim
          FROM q CROSS JOIN c WHERE c.vec_id <> q.query_id
        )
        SELECT query_id, vec_id,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
               floor(sim * 10000 + 0.5) / 10000.0 AS score
        FROM s
        QUALIFY rank <= {_TOPK}
    """,
    "multimodal_decode": f"""
        SELECT doc_id,
               CAST({_MM_W} AS INT) AS width,
               CAST(GREATEST(1, (length(text) + {_MM_W} - 1) // {_MM_W}) AS INT) AS height,
               CAST({_MM_W} AS BIGINT) * CAST(GREATEST(1, (length(text) + {_MM_W} - 1) // {_MM_W}) AS BIGINT) AS n_pixels,
               TRUE AS decode_ok
        FROM documents
    """,
}
ORACLE_SQL["multimodal_frames"] = f"""
    SELECT doc_id,
           CAST(unnest(generate_series(0, CAST(h - 1 AS BIGINT), 4)) AS BIGINT)
             AS frame_idx,
           CAST(w AS BIGINT) AS width, CAST(1 AS BIGINT) AS height
    FROM (
      SELECT doc_id, {_MM_W} AS w,
             GREATEST(1, (length(text) + {_MM_W} - 1) // {_MM_W}) AS h
      FROM documents
    )
"""
ORACLE_SQL["ann_ivf_topk"] = ORACLE_SQL["embedding_topk"]
ORACLE_SQL["ann_ivf_persisted"] = ORACLE_SQL["embedding_topk"]
ORACLE_SQL["embedding_cosine_pairs"] = """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           floor(list_cosine_similarity(
               list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
               list_transform(b.embedding, x -> CAST(x AS DOUBLE))) * 10000 + 0.5)
             / 10000.0 AS cos_4
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE floor(list_cosine_similarity(
              list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
              list_transform(b.embedding, x -> CAST(x AS DOUBLE))) * 10000 + 0.5)
            / 10000.0 >= 0.4
"""


# --------------------------------------------------------------------------
# round-3 tail additions: fuzzy matching, grouped mode, regression, NTILE,
# gap-filled time series, BPE pair induction
# --------------------------------------------------------------------------


def _adjacent_pair_counts(t: pa.Table) -> pa.Table:
    """Doc-boundary-masked adjacent token-pair counts for one batch —
    shared combiner of q_bpe_pair_counts and q_pmi_bigrams. Null text is
    treated as empty (fill_null, like every sibling tokenizer); pairs are
    0x1f-joined so pair-string order equals (tok_a, tok_b) tuple order."""
    text = pc.fill_null(t.column("text").combine_chunks(), "")
    toks = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(toks)
    n = len(flat)
    if n < 2:
        return pa.table({"pair": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    ends = np.cumsum(lens) - 1          # last-token index of each doc
    mask = np.ones(n - 1, bool)
    mask[ends[ends < n - 1]] = False    # drop pairs straddling docs
    joined = pc.binary_join_element_wise(
        flat.slice(0, n - 1), flat.slice(1), "\x1f")
    vc = joined.filter(pa.array(mask)).value_counts()
    return pa.table({"pair": vc.field("values"),
                     "n": pc.cast(vc.field("counts"), pa.int64())})


def q_bpe_pair_counts(sf_dir: str):
    """First BPE merge-induction step: exact corpus-wide counts of adjacent
    token pairs, top 30. Pairs are formed by a shifted-vector zip over the
    flattened token stream with doc-boundary masking (no per-row Python),
    counted by a per-batch `value_counts` combiner — the shuffle moves one
    row per distinct pair per batch, never the token stream. Tokens are
    joined with a 0x1f separator (below any printable byte), so pair-string
    order equals (tok_a, tok_b) tuple order for the tie-break."""
    from ethereum_etl_ray.stages.topk import topk

    docs = _read(sf_dir, "documents", ["text"])

    partial = docs.map_batches(_adjacent_pair_counts, batch_format="pyarrow",
                               zero_copy_batch=True)
    totals = (partial.groupby("pair").sum("n")
              .map_batches(lambda t: t.rename_columns(["pair", "n"]),
                           batch_format="pyarrow", zero_copy_batch=True))
    out = topk(totals, ["n", "pair"], 30, descending=[True, False])
    toks = out["pair"].str.split("\x1f", n=1, expand=True)
    return pd.DataFrame({"tok_a": toks[0], "tok_b": toks[1],
                         "n": out["n"]}).reset_index(drop=True)


def q_mode_event_type(sf_dir: str):
    """Grouped MODE with a deterministic tie-break: per user, the most
    frequent event type (ties → lexicographically smallest type). Per-batch
    (user, type) count combiner → one hash aggregate → the per-key top-1
    machinery (stages/grouped.py:topn_per_key) ordered (n DESC, type ASC).
    Reference analogue: distinct-as-aggregation A1-A3."""
    from ethereum_etl_ray.stages.grouped import topn_per_key

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [("event_type", "count")])
        return g.rename_columns(["user_id", "event_type", "n"])

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["user_id", "event_type"]).sum("n")
              .map_batches(lambda t: t.rename_columns(
                  ["user_id", "event_type", "n"]),
                  batch_format="pyarrow", zero_copy_batch=True))
    win = topn_per_key(counts, "user_id", ["n", "event_type"], 1,
                       descending=[True, False])
    return (win.to_pandas()
            .rename(columns={"event_type": "mode_type"})
            .sort_values("user_id").reset_index(drop=True)
            [["user_id", "mode_type", "n"]])


def q_regr_slope(sf_dir: str):
    """Exact distributed simple-regression slope per (returnflag, status):
    extendedprice-cents on quantity. Integer moment sums (n, Sx, Sy, Sxy,
    Sxx) in a per-batch combiner, one tiny hash aggregate; the closed-form
    slope is evaluated on the driver in arbitrary-precision Python ints and
    divided once as float64 — bit-identical to the HUGEINT/DOUBLE oracle.
    int64 bound: per-group Sxy < 2^63 up to ~10^12 rows at these scales."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus",
                                    "l_quantity", "l_extendedprice"])

    def moments(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy().astype(np.int64)
        p = _cents(t.column("l_extendedprice").to_numpy())
        base = pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "n": pa.array(np.ones(len(q), np.int64)),
            "sx": pa.array(q), "sy": pa.array(p),
            "sxy": pa.array(q * p), "sxx": pa.array(q * q),
        })
        return base.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")]).rename_columns(
            ["l_returnflag", "l_linestatus", "n", "sx", "sy", "sxy", "sxx"])

    sums = (ds.map_batches(moments, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                       Sum("sy", alias_name="sy"),
                       Sum("sxy", alias_name="sxy"),
                       Sum("sxx", alias_name="sxx"))
            .to_pandas())
    slopes = []
    for _, r in sums.iterrows():
        n, sx, sy, sxy, sxx = (int(r["n"]), int(r["sx"]), int(r["sy"]),
                               int(r["sxy"]), int(r["sxx"]))
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        # DuckDB DOUBLE division by zero yields NULL — mirror it (constant
        # quantity in a group), don't raise
        slopes.append(float(num) / float(den) if den else None)
    out = pd.DataFrame({"l_returnflag": sums["l_returnflag"],
                        "l_linestatus": sums["l_linestatus"],
                        "slope": slopes})
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(
        drop=True)


def q_ntile_orders(sf_dir: str):
    """Global NTILE(4) over orders by (totalprice, orderkey) WITHOUT a
    global sort: the three tile-boundary rows are found by exact distributed
    selection (stages/selection.py:kth_smallest — O(√(N·P)) driver traffic),
    broadcast into one vectorized map_batches that assigns each row
    1 + #boundaries strictly below it. The unique orderkey tie-break makes
    every boundary exact."""
    from ethereum_etl_ray.stages.selection import kth_smallest_multi, lex_lt

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    n = ds.count()  # metadata-only on a parquet read
    tiles = 4
    q, r = divmod(n, tiles)
    sizes = [q + 1] * r + [q] * (tiles - r)
    ranks = np.cumsum(sizes)[:-1]           # boundary ranks b1 < b2 < b3
    cols = ["o_totalprice", "o_orderkey"]
    # all three boundaries from ONE shared sampling + window sweep
    bounds = kth_smallest_multi(ds, cols, [int(k) for k in ranks])

    def assign(t: pa.Table) -> pa.Table:
        tile = np.ones(t.num_rows, np.int64)
        for b in bounds:
            gt = pc.invert(lex_lt(t, cols, b, strict=False))
            tile += gt.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "tile": pa.array(tile)})

    out = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)


def q_gap_fill_hourly(sf_dir: str):
    """Gap-filled per-type hourly event counts: every hour between each
    type's first and last event appears, missing hours as 0 (the resample
    step of a time-series pipeline). Hourly counts come from the usual
    per-batch combiner + hash aggregate; the dense range is generated inside
    a per-type map_groups (each type's series is tiny next to the event
    stream — the assumption to revisit for year-scale spans is documented
    here)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        hrs = (t.column("ts").cast(pa.int64()).to_numpy()
               // 3_600_000_000) * 3_600_000_000
        g = pa.table({"event_type": t.column("event_type"),
                      "hr_us": pa.array(hrs),
                      "n": pa.array(np.ones(len(hrs), np.int64))})
        return g.group_by(["event_type", "hr_us"]).aggregate(
            [("n", "sum")]).rename_columns(["event_type", "hr_us", "n"])

    hourly = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["event_type", "hr_us"]).sum("n")
              .map_batches(lambda t: t.rename_columns(
                  ["event_type", "hr_us", "n"]),
                  batch_format="pyarrow", zero_copy_batch=True))

    HOUR = 3_600_000_000

    def fill(g: pa.Table) -> pa.Table:
        hrs = g.column("hr_us").to_numpy()
        ns = g.column("n").to_numpy()
        full = np.arange(hrs.min(), hrs.max() + HOUR, HOUR)
        dense = np.zeros(len(full), np.int64)
        dense[(hrs - hrs.min()) // HOUR] = ns
        et = g.column("event_type")[0].as_py()
        return pa.table({
            "event_type": pa.array([et] * len(full), pa.string()),
            "hr": pa.array(full, pa.timestamp("us")),
            "n": pa.array(dense)})

    out = hourly.groupby("event_type").map_groups(fill, batch_format="pyarrow")
    return (out.to_pandas().sort_values(["event_type", "hr"])
            .reset_index(drop=True))


def q_fuzzy_name_pairs(sf_dir: str):
    """Blocked fuzzy entity resolution (stages/fuzzy.py:edit1_pairs):
    same-nation customer pairs whose names are within Levenshtein distance
    1, via vectorized byte-matrix Hamming / single-indel tests — no per-pair
    DP, one hash shuffle on the blocking key."""
    from ethereum_etl_ray.stages.fuzzy import edit1_pairs

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    out = edit1_pairs(ds, key_col="c_custkey", text_col="c_name",
                      block_col="c_nationkey")
    pdf = out.to_pandas()
    if pdf.empty:  # this Ray's to_pandas drops the schema when fully empty
        pdf = pd.DataFrame(columns=["key_a", "key_b", "c_nationkey"])
    return (pdf[["c_nationkey", "key_a", "key_b"]]
            .sort_values(["c_nationkey", "key_a", "key_b"])
            .reset_index(drop=True))


QUERIES["bpe_pair_counts"] = q_bpe_pair_counts
QUERIES["mode_event_type"] = q_mode_event_type
QUERIES["regr_slope"] = q_regr_slope
QUERIES["ntile_orders"] = q_ntile_orders
QUERIES["gap_fill_hourly"] = q_gap_fill_hourly
QUERIES["fuzzy_name_pairs"] = q_fuzzy_name_pairs

ORACLE_SQL["bpe_pair_counts"] = """
    WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
    pairs AS (
      -- ts[1:-2] = all but last, ts[2:-1] = all but first (DuckDB slicing)
      SELECT unnest(list_zip(ts[1:-2], ts[2:-1])) AS pr
      FROM toks WHERE len(ts) >= 2
    )
    SELECT pr[1] AS tok_a, pr[2] AS tok_b, CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY 1, 2
    ORDER BY n DESC, tok_a, tok_b LIMIT 30
"""
ORACLE_SQL["mode_event_type"] = """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, event_type AS mode_type, n FROM c
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type) = 1
    ORDER BY user_id
"""
ORACLE_SQL["regr_slope"] = """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(count(*) AS HUGEINT) * sum(xy) - sum(x) * sum(y)
                AS DOUBLE)
           / CAST(CAST(count(*) AS HUGEINT) * sum(xx) - sum(x) * sum(x)
                  AS DOUBLE) AS slope
    FROM (
      SELECT l_returnflag, l_linestatus,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
             CAST(l_quantity AS BIGINT)
               * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS xy,
             CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS xx
      FROM lineitem
    )
    GROUP BY 1, 2 ORDER BY 1, 2
"""
ORACLE_SQL["ntile_orders"] = """
    SELECT o_orderkey,
           CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
             AS tile
    FROM orders ORDER BY o_orderkey
"""
ORACLE_SQL["gap_fill_hourly"] = """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), b AS (
      SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM h GROUP BY 1
    ), g AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM b
    )
    SELECT g.event_type, g.hr, coalesce(h.n, 0) AS n
    FROM g LEFT JOIN h ON g.event_type = h.event_type AND g.hr = h.hr
    ORDER BY 1, 2
"""
ORACLE_SQL["fuzzy_name_pairs"] = """
    SELECT a.c_nationkey, a.c_custkey AS key_a, b.c_custkey AS key_b
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY 1, 2, 3
"""


def q_dup_span_stats(sf_dir: str):
    """Exact duplicated-span coverage (pipelines/dedup.py:dup_span_stats):
    per doc, how many token positions sit inside a 4-gram that repeats
    corpus-wide — the fixed-n approximation of exact-substring dedup used
    to strip boilerplate from training corpora."""
    from ethereum_etl_ray.pipelines.dedup import dup_span_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dup_span_stats(ds, ngram=4, min_count=2)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


QUERIES["dup_span_stats"] = q_dup_span_stats
ORACLE_SQL["dup_span_stats"] = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(range(1, len(ts) - 2)) AS pos,
             unnest(list_zip(ts[1:-4], ts[2:-3], ts[3:-2], ts[4:-1])) AS g
      FROM toks WHERE len(ts) >= 4
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    cov AS (
      SELECT DISTINCT doc_id, unnest(range(pos, pos + 4)) AS p
      FROM grams JOIN dup USING (g)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_tokens
    FROM cov GROUP BY doc_id ORDER BY doc_id
"""


def q_sparse_cosine_pairs(sf_dir: str):
    """Sparse TF cosine similarity self-join over discriminative terms
    (stages/invindex.py:sparse_cosine_pairs): df-pruned term-at-a-time
    pair expansion, integer dot/norm sums, one float expression — the
    lexical near-dup/cluster counterpart of embedding_cosine_pairs."""
    from ethereum_etl_ray.stages.invindex import sparse_cosine_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return sparse_cosine_pairs(ds, max_df=32, threshold=0.2)


QUERIES["sparse_cosine_pairs"] = q_sparse_cosine_pairs
ORACLE_SQL["sparse_cosine_pairs"] = """
    WITH tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      WHERE tok <> '' GROUP BY 1, 2
    ),
    keep AS (SELECT tok FROM tf GROUP BY tok HAVING count(*) <= 32),
    t2 AS (SELECT tf.* FROM tf JOIN keep USING (tok)),
    dot AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.c * b.c) AS dot
      FROM t2 a JOIN t2 b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    norm AS (SELECT doc_id, sum(c * c) AS n2 FROM t2 GROUP BY 1)
    SELECT doc_a, doc_b,
           CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
             AS sim
    FROM dot
    JOIN norm na ON dot.doc_a = na.doc_id
    JOIN norm nb ON dot.doc_b = nb.doc_id
    WHERE CAST(dot AS DOUBLE)
            / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
          >= 0.2
    ORDER BY doc_a, doc_b
"""


def q_dup_span_strip(sf_dir: str):
    """Apply step of duplicated-span dedup: every doc rewritten with
    corpus-repeated 4-gram spans removed (pipelines/dedup.py:dup_span_strip);
    clean docs pass through byte-identical."""
    from ethereum_etl_ray.pipelines.dedup import dup_span_strip

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dup_span_strip(ds, ngram=4, min_count=2)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


QUERIES["dup_span_strip"] = q_dup_span_strip
ORACLE_SQL["dup_span_strip"] = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(range(1, len(ts) - 2)) AS pos,
             unnest(list_zip(ts[1:-4], ts[2:-3], ts[3:-2], ts[4:-1])) AS g
      FROM toks WHERE len(ts) >= 4
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    cov AS (
      SELECT doc_id, list(DISTINCT p) AS cps
      FROM (SELECT DISTINCT doc_id, unnest(range(pos, pos + 4)) AS p
            FROM grams JOIN dup USING (g))
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           CASE WHEN cov.cps IS NULL THEN array_to_string(t.ts, ' ')
                -- array_to_string([]) is NULL in DuckDB; a fully-stripped
                -- doc is the empty string
                ELSE coalesce(array_to_string(
                    list_filter(t.ts, (x, i) -> NOT list_contains(cov.cps, i)),
                    ' '), '') END AS text
    FROM toks t LEFT JOIN cov USING (doc_id)
    ORDER BY t.doc_id
"""


def q_embedding_standardize(sf_dir: str):
    """Per-dimension z-score feature scaling over the embedding column
    (stages/ann.py:standardize_embeddings): integer-exact moment sums,
    one broadcast vectorized apply, exploded (vec_id, dim, z) output."""
    from ethereum_etl_ray.stages.ann import standardize_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = standardize_embeddings(ds)
    return (out.to_pandas().sort_values(["vec_id", "dim"])
            .reset_index(drop=True))


QUERIES["embedding_standardize"] = q_embedding_standardize
ORACLE_SQL["embedding_standardize"] = """
    WITH e AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xq
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   unnest(range(1, len(embedding) + 1)) AS i
            FROM embeddings)
    ),
    stats AS (
      SELECT dim, CAST(count(*) AS BIGINT) AS n, sum(xq) AS s,
             sum(xq * xq) AS ss
      FROM e GROUP BY dim
    )
    SELECT e.vec_id, e.dim,
           (CAST(xq AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / (sqrt(CAST(n * ss - s * s AS DOUBLE)) / CAST(n AS DOUBLE))
             AS z
    FROM e JOIN stats USING (dim)
    ORDER BY vec_id, dim
"""


def q_revenue_by_segment_month(sf_dir: str):
    """Classic 3-way star join (TPC-H Q3/Q10 shape): customer ⋈ orders ⋈
    lineitem → revenue per (market segment, order month). Plan: the
    dimension side (customer) broadcasts once into the orders scan
    (stages/joins.py:broadcast_lookup, no shuffle); lineitem revenue is
    pre-aggregated per orderkey INSIDE each batch (combiner — the join
    then moves one row per (batch, orderkey), not the line-item stream);
    the fact-fact join is the distributed co-group join; the final
    (segment, month) rollup is a tiny hash aggregate. Revenue is exact
    integer cents (floor(x*100+0.5)) end to end."""
    from ethereum_etl_ray.stages.joins import broadcast_lookup, cogroup_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_extendedprice", "l_discount"])

    seg_orders = broadcast_lookup(orders, cust, left_on="o_custkey",
                                  right_on="c_custkey", how="inner")

    def month_proj(t: pa.Table) -> pa.Table:
        m = (t.column("o_orderdate").to_numpy(zero_copy_only=False)
             .astype("datetime64[M]").astype("datetime64[us]"))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "c_mktsegment": t.column("c_mktsegment"),
                         "month": pa.array(m, pa.timestamp("us"))})

    seg_orders = seg_orders.map_batches(month_proj, batch_format="pyarrow",
                                        zero_copy_batch=True)

    def rev_partial(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        g = pa.table({"l_orderkey": t.column("l_orderkey"),
                      "rev": pa.array(_cents(price * (1.0 - disc)),
                                      pa.int64())})
        return (g.group_by("l_orderkey").aggregate([("rev", "sum")])
                .rename_columns(["l_orderkey", "rev"]))

    rev = line.map_batches(rev_partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    joined = cogroup_join(
        seg_orders, rev, left_on="o_orderkey", right_on="l_orderkey",
        how="inner",
        left_fields=[("o_orderkey", pa.int64()),
                     ("c_mktsegment", pa.string()),
                     ("month", pa.timestamp("us"))],
        right_fields=[("l_orderkey", pa.int64()), ("rev", pa.int64())])

    out = (joined.groupby(["c_mktsegment", "month"]).sum("rev")
           .map_batches(lambda t: t.rename_columns(
               ["c_mktsegment", "month", "revenue_c100"]),
               batch_format="pyarrow", zero_copy_batch=True))
    return (out.to_pandas().sort_values(["c_mktsegment", "month"])
            .reset_index(drop=True))


QUERIES["revenue_by_segment_month"] = q_revenue_by_segment_month
ORACLE_SQL["revenue_by_segment_month"] = """
    SELECT c.c_mktsegment,
           date_trunc('month', o.o_orderdate) AS month,
           CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                               * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_c100
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def q_funnel_counts(sf_dir: str):
    """Ordered-funnel analytics: users reaching view → click → purchase in
    strict timestamp order. All of a user's events co-locate under one hash
    partition (stages/grouped.py:map_copartitions), where each step is one
    vectorized masked groupby-min against the previous step's per-user
    threshold; partitions emit 3 partial counts, one tiny aggregate sums
    them. Constant 3-step loop, never a per-user Python loop."""
    from ethereum_etl_ray.stages.grouped import map_copartitions

    steps = ["view", "click", "purchase"]
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def per_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        counts, thr = [], None
        for st in steps:
            sub = df[df["event_type"] == st]
            if thr is not None:
                tmap = sub["user_id"].map(thr)
                sub = sub[tmap.notna() & (sub["ts"] > tmap)]
            thr = sub.groupby("user_id")["ts"].min()
            counts.append(len(thr))
        return pa.table({"step": pa.array([1, 2, 3], pa.int64()),
                         "event_type": pa.array(steps, pa.string()),
                         "n_users": pa.array(counts, pa.int64())})

    partial = map_copartitions(ds, "user_id", per_part)
    out = (partial.groupby(["step", "event_type"]).sum("n_users")
           .map_batches(lambda t: t.rename_columns(
               ["step", "event_type", "n_users"]), batch_format="pyarrow"))
    return out.to_pandas().sort_values("step").reset_index(drop=True)


def q_pmi_bigrams(sf_dir: str):
    """Collocation extraction: top-20 adjacent token pairs by a rational
    PMI score c_ab·T² / (B·n_a·n_b) — exact integers end to end, one float
    division, no log (bit-identical across engines). Bigram counts reuse
    the bpe_pair_counts combiner; the unigram table is aggregate-bounded by
    |vocab| (the size of a tokenizer vocabulary, not the corpus) so it
    broadcasts; the final selection is the shuffle-free partial top-k."""
    from ethereum_etl_ray.stages.topk import topk

    docs = _read(sf_dir, "documents", ["text"])

    def uni_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t.column("text"),
                                                pattern=" "))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    uni = (docs.map_batches(uni_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("tok").sum("n").to_pandas())
    uni.columns = ["tok", "n"]
    uni_map = dict(zip(uni["tok"], (int(x) for x in uni["n"])))
    T = sum(uni_map.values())

    bi = (docs.map_batches(_adjacent_pair_counts, batch_format="pyarrow",
                           zero_copy_batch=True)
          .groupby("pair").sum("n")
          .map_batches(lambda t: t.rename_columns(["pair", "n"]),
                       batch_format="pyarrow", zero_copy_batch=True))
    # each doc of L tokens contributes L-1 in-doc pairs, so the bigram
    # total is T - #docs — no second execution of the pair pipeline
    B = T - docs.count()

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("n"), pa.scalar(5)))
        pairs = t.column("pair").to_pylist()
        cnts = t.column("n").to_pylist()
        toks_ab = [p.split("\x1f", 1) for p in pairs]
        # exact-int numerator/denominator, one float division (HUGEINT twin)
        s = [float(c * T * T) / float(B * uni_map[a] * uni_map[b])
             for (a, b), c in zip(toks_ab, cnts)]
        return pa.table({
            "tok_a": pa.array([ab[0] for ab in toks_ab], pa.string()),
            "tok_b": pa.array([ab[1] for ab in toks_ab], pa.string()),
            "n": pa.array(cnts, pa.int64()),
            "pmi_ratio": pa.array(s, pa.float64())})

    scored = bi.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = topk(scored, ["pmi_ratio", "tok_a", "tok_b"], 20,
               descending=[True, False, False])
    return out.reset_index(drop=True)


QUERIES["funnel_counts"] = q_funnel_counts
QUERIES["pmi_bigrams"] = q_pmi_bigrams

ORACLE_SQL["funnel_counts"] = """
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS event_type,
             CAST(count(*) AS BIGINT) AS n_users FROM v
      UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
      UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p
    ) ORDER BY step
"""
ORACLE_SQL["pmi_bigrams"] = """
    WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
    uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(ts) AS tok FROM toks) GROUP BY 1
    ),
    tot AS (SELECT sum(c) AS t FROM uni),
    pairs AS (
      SELECT unnest(list_zip(ts[1:-2], ts[2:-1])) AS pr
      FROM toks WHERE len(ts) >= 2
    ),
    bi AS (SELECT pr[1] AS a, pr[2] AS b, CAST(count(*) AS BIGINT) AS c
           FROM pairs GROUP BY 1, 2),
    btot AS (SELECT sum(c) AS bsum FROM bi)
    SELECT a AS tok_a, b AS tok_b, bi.c AS n,
           CAST(bi.c * t * t AS DOUBLE)
             / CAST(bsum * ua.c * ub.c AS DOUBLE) AS pmi_ratio
    FROM bi, tot, btot
    JOIN uni ua ON ua.tok = a
    JOIN uni ub ON ub.tok = b
    WHERE bi.c >= 5
    ORDER BY pmi_ratio DESC, tok_a, tok_b LIMIT 20
"""


def q_ntile_by_user(sf_dir: str):
    """Grouped NTILE(4): each event's value quartile WITHIN its user.
    Complements the global `ntile_orders` (distributed boundary selection);
    here every key's rows co-locate under one hash partition
    (map_copartitions) and the tile assignment is closed-form index math
    over one stable sort per partition — no per-group Python."""
    from ethereum_etl_ray.stages.grouped import map_copartitions

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    tiles = 4

    def assign(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
              .sort_values(["user_id", "value", "event_id"], kind="stable")
              .reset_index(drop=True))
        g = df.groupby("user_id", sort=False)
        k = g.cumcount().to_numpy()                  # 0-based rank in key
        n = g["event_id"].transform("size").to_numpy()
        q, r = n // tiles, n % tiles
        big = r * (q + 1)                            # rows in the fat tiles
        fat = k < big
        tile = np.where(fat,
                        k // np.maximum(q + 1, 1) + 1,
                        r + (k - big) // np.maximum(q, 1) + 1)
        return pa.table({"event_id": pa.array(df["event_id"].to_numpy(),
                                              pa.int64()),
                         "tile": pa.array(tile.astype(np.int64))})

    out = map_copartitions(ds, "user_id", assign)
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


QUERIES["ntile_by_user"] = q_ntile_by_user
ORACLE_SQL["ntile_by_user"] = """
    SELECT event_id,
           CAST(ntile(4) OVER (PARTITION BY user_id
                               ORDER BY value, event_id) AS BIGINT) AS tile
    FROM events ORDER BY event_id
"""


def q_rank_metrics_by_user(sf_dir: str):
    """The SQL window-rank family per key in ONE co-partitioned pass:
    rank (competition), dense_rank, percent_rank, cume_dist of each event's
    value within its user — run detection over one stable sort, all four
    metrics closed-form from run boundaries (ints; the two float metrics
    are single divisions of exact ints, bit-identical to the oracle)."""
    from ethereum_etl_ray.stages.grouped import map_copartitions

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def metrics(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
              .sort_values(["user_id", "value", "event_id"], kind="stable")
              .reset_index(drop=True))
        u = df["user_id"].to_numpy()
        v = df["value"].to_numpy()
        m = len(df)
        idx = np.arange(m)
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        new_run = new_user | np.concatenate([[True], v[1:] != v[:-1]])
        user_start = idx[new_user][np.cumsum(new_user) - 1]
        run_id = np.cumsum(new_run) - 1
        run_start = idx[new_run][run_id]
        # end of run = start of next run - 1 (last run ends at m-1)
        starts = idx[new_run]
        run_end = np.concatenate([starts[1:], [m]])[run_id] - 1
        g = df.groupby("user_id", sort=False)
        n = g["event_id"].transform("size").to_numpy()
        rnk = run_start - user_start + 1
        den = np.maximum(n - 1, 1)
        prnk = (rnk - 1).astype(np.float64) / den.astype(np.float64)
        prnk[n == 1] = 0.0
        cd = (run_end - user_start + 1).astype(np.float64) / n.astype(np.float64)
        # dense rank: count of runs since the user's first run
        user_first_run = run_id[new_user][np.cumsum(new_user) - 1]
        dense = run_id - user_first_run + 1
        return pa.table({
            "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
            "rnk": pa.array(rnk.astype(np.int64)),
            "drnk": pa.array(dense.astype(np.int64)),
            "prnk": pa.array(prnk, pa.float64()),
            "cd": pa.array(cd, pa.float64())})

    out = map_copartitions(ds, "user_id", metrics)
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


QUERIES["rank_metrics_by_user"] = q_rank_metrics_by_user
ORACLE_SQL["rank_metrics_by_user"] = """
    SELECT event_id,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cd
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value)
    ORDER BY event_id
"""


def q_weighted_median(sf_dir: str):
    """Weighted median (weighted order statistic): the smallest price whose
    running quantity-weight reaches half the group total, per returnflag.
    Co-partitioned groups, one stable sort + cumsum per partition (same
    per-group-fits-a-partition contract as grouped_median/grouped_quantile;
    for groups beyond that, the take_until_budget histogram-refinement
    pattern generalizes to value order). Exact integer weights and cents —
    no float anywhere."""
    from ethereum_etl_ray.stages.grouped import map_copartitions

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "flag": t.column("l_returnflag"),
            "price_c100": pa.array(_cents(t.column("l_extendedprice")
                                          .to_numpy()), pa.int64()),
            "qty": pc.cast(t.column("l_quantity"), pa.int64()),
        })

    slim = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def wmed(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
              .sort_values(["flag", "price_c100", "qty"], kind="stable"))
        g = df.groupby("flag", sort=False)
        cum = g["qty"].cumsum().to_numpy()
        tot = g["qty"].transform("sum").to_numpy()
        hit = df[cum * 2 >= tot]
        out = hit.groupby("flag", sort=False)["price_c100"].min()
        return pa.table({"flag": pa.array(out.index, pa.string()),
                         "wmedian_c100": pa.array(out.to_numpy(), pa.int64())})

    out = map_copartitions(slim, "flag", wmed)
    return out.to_pandas().sort_values("flag").reset_index(drop=True)


QUERIES["weighted_median"] = q_weighted_median
ORACLE_SQL["weighted_median"] = """
    WITH w AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c100,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ),
    o AS (
      SELECT flag, price_c100, qty,
             sum(qty) OVER (PARTITION BY flag ORDER BY price_c100, qty
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(qty) OVER (PARTITION BY flag) AS tot
      FROM w
    )
    SELECT flag, min(price_c100) AS wmedian_c100
    FROM o WHERE cum * 2 >= tot GROUP BY flag ORDER BY flag
"""


def q_gap_fill_locf(sf_dir: str):
    """LOCF resample (the state-series fill mode, complementing the
    zero-fill `gap_fill_hourly`): per event type, hourly value sums in
    exact cents with missing hours carrying the LAST OBSERVED hour's sum
    forward. The dense range + forward fill happen inside a per-type
    map_groups (one vectorized maximum.accumulate index carry)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hrs = (t.column("ts").cast(pa.int64()).to_numpy()
               // 3_600_000_000) * 3_600_000_000
        g = pa.table({"event_type": t.column("event_type"),
                      "hr_us": pa.array(hrs),
                      "s": pa.array(_cents(t.column("value").to_numpy()),
                                    pa.int64())})
        return g.group_by(["event_type", "hr_us"]).aggregate(
            [("s", "sum")]).rename_columns(["event_type", "hr_us", "s"])

    hourly = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["event_type", "hr_us"]).sum("s")
              .map_batches(lambda t: t.rename_columns(
                  ["event_type", "hr_us", "s"]),
                  batch_format="pyarrow", zero_copy_batch=True))

    HOUR = 3_600_000_000

    def fill(g: pa.Table) -> pa.Table:
        hrs = g.column("hr_us").to_numpy()
        vals = g.column("s").to_numpy()
        lo = hrs.min()
        full = np.arange(lo, hrs.max() + HOUR, HOUR)
        m = len(full)
        carried = np.zeros(m, np.int64)
        pos = (hrs - lo) // HOUR
        carried[pos] = vals
        mask = np.zeros(m, bool)
        mask[pos] = True
        # index of the latest observed hour at or before each slot; the
        # range starts at an observed hour, so the carry never reads -1
        fill_idx = np.maximum.accumulate(np.where(mask, np.arange(m), -1))
        et = g.column("event_type")[0].as_py()
        return pa.table({
            "event_type": pa.array([et] * m, pa.string()),
            "hr": pa.array(full, pa.timestamp("us")),
            "filled_c100": pa.array(carried[fill_idx], pa.int64())})

    out = hourly.groupby("event_type").map_groups(fill, batch_format="pyarrow")
    return (out.to_pandas().sort_values(["event_type", "hr"])
            .reset_index(drop=True))


QUERIES["gap_fill_locf"] = q_gap_fill_locf
ORACLE_SQL["gap_fill_locf"] = """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS s
      FROM events GROUP BY 1, 2
    ), b AS (
      SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM h GROUP BY 1
    ), g AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM b
    )
    SELECT g.event_type, g.hr,
           last_value(h.s IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hr
               ROWS UNBOUNDED PRECEDING) AS filled_c100
    FROM g LEFT JOIN h ON g.event_type = h.event_type AND g.hr = h.hr
    ORDER BY 1, 2
"""


def q_burst_pairs(sf_dir: str):
    """Keyed band self-join (burst detection): pairs of events by the SAME
    user within one hour of each other. Co-partition by user, one stable
    time sort per partition, then a vectorized searchsorted band expansion
    (pairs enumerated in time order via cumsum offset arithmetic — no
    per-row Python); pair identity is normalized to (min, max) event_id so
    it matches the unordered SQL self-join exactly."""
    from ethereum_etl_ray.stages.grouped import map_copartitions

    W_US = 3600 * 1_000_000
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                        kind="stable").reset_index(drop=True))
        u = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy()
        out_a, out_b, out_g, out_u = [], [], [], []
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        bounds = np.concatenate([starts, [len(u)]])
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            seg = ts[s0:s1]
            g = len(seg)
            if g < 2:
                continue
            hi = np.searchsorted(seg, seg + W_US, side="right")
            counts = hi - np.arange(g) - 1
            total = int(counts.sum())
            if not total:
                continue
            ii = np.repeat(np.arange(g), counts)
            off0 = np.concatenate([[0], np.cumsum(counts)[:-1]])
            jj = np.arange(total) - off0[ii] + ii + 1
            ea, eb = eid[s0 + ii], eid[s0 + jj]
            out_a.append(np.minimum(ea, eb))
            out_b.append(np.maximum(ea, eb))
            out_g.append(seg[jj] - seg[ii])
            out_u.append(np.full(total, u[s0]))
        if not out_a:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "eid_a": pa.array([], pa.int64()),
                             "eid_b": pa.array([], pa.int64()),
                             "gap_us": pa.array([], pa.int64())})
        return pa.table({
            "user_id": pa.array(np.concatenate(out_u), pa.int64()),
            "eid_a": pa.array(np.concatenate(out_a), pa.int64()),
            "eid_b": pa.array(np.concatenate(out_b), pa.int64()),
            "gap_us": pa.array(np.concatenate(out_g), pa.int64())})

    out = map_copartitions(ds, "user_id", pairs)
    return (out.to_pandas().sort_values(["user_id", "eid_a", "eid_b"])
            .reset_index(drop=True))


QUERIES["burst_pairs"] = q_burst_pairs
ORACLE_SQL["burst_pairs"] = """
    SELECT a.user_id,
           least(a.event_id, b.event_id) AS eid_a,
           greatest(a.event_id, b.event_id) AS eid_b,
           abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= CAST(3600 AS BIGINT) * 1000000
    ORDER BY 1, 2, 3
"""


def q_training_shards(sf_dir: str):
    """The training-data endpoint run end to end (pipelines/curate.py:
    make_training_shards): curate → deterministic shuffle → fixed-token
    packing → hive-partitioned shard write under /tmp scratch; returns the
    deterministic per-shard manifest. Rows-only at the driver (the chain
    includes hash-based near-dedup); structure + determinism oracle in
    tests/test_curate.py."""
    import shutil

    from ethereum_etl_ray.pipelines.curate import make_training_shards

    out_dir = "/tmp/webcdc_training_shards"
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    m = make_training_shards(docs, out_dir, shards=8, tokens_per_seq=256,
                             langs=("en",), near_threshold=0.7)
    rows = sorted(m["per_shard"].items())
    return pa.table({
        "shard": pa.array([s for s, _ in rows], pa.int64()),
        "docs": pa.array([v["docs"] for _, v in rows], pa.int64()),
        "tokens": pa.array([v["tokens"] for _, v in rows], pa.int64())})


QUERIES["training_shards"] = q_training_shards


def q_approx_distinct_by_type(sf_dir: str):
    """Grouped HyperLogLog: approximate distinct users per event type
    (stages/sketch.py:approx_distinct_by) — one 4 KiB register row per
    (batch, group) moves, never the key stream. Rows-only at the driver;
    error-bound pytest in tests/test_sketch.py."""
    from ethereum_etl_ray.stages.sketch import approx_distinct_by

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    out = approx_distinct_by(ds, "event_type", "user_id")
    return (out.to_pandas().sort_values("event_type")
            .reset_index(drop=True))


QUERIES["approx_distinct_by_type"] = q_approx_distinct_by_type


# --------------------------------------------------------------------------
# Driver correctness-window ordering
# --------------------------------------------------------------------------
# The correctness driver compares the FIRST ~50 entries of ``QUERIES`` (dict
# order) against their DuckDB oracles per round.  Order the registry so that
# external verification coverage is maximised across rounds:
#   1. four sentinel core ops (always re-checked),
#   2. DuckDB-oracled queries that have never had a driver row (rotated into
#      the window round-over-round until every oracled query has one),
#   3. oracled queries already driver-green in a prior round,
#   4. rows-only (no-oracle) queries last — the driver's weaker check.
# r03 checked the first 50 keys of the old order (CORRECTNESS_r03.json);
# the spill past this round's window rotates to the front in round 5.
_QUERY_ORDER = [
    "lww_latest_by_key",
    "tombstone_merge",
    "explode_tokens",
    "hash_join_segment_status",
    "graph_path_value",
    "deterministic_sample",
    "cap_per_key",
    "url_parse",
    "domain_stats",
    "decontaminate",
    "shuffle_rank",
    "inverted_postings",
    "percentiles",
    "range_join",
    "bm25_scores",
    "topn_per_key",
    "grouped_median",
    "window_lag_cumsum",
    "rollup_counts",
    "robust_outliers",
    "multikey_join_group_stats",
    "profile_events",
    "pk_violations",
    "phrase_count",
    "search_topk",
    "unpivot_metrics",
    "outer_join_activity",
    "count_distinct_by_key",
    "argmax_by_type",
    "pivot_event_types",
    "value_histogram",
    "corr_qty_discount",
    "pii_redact",
    "normalize_part",
    "rep_stats",
    "pack_sequences",
    "chunk_docs",
    "lm_score",
    "bpe_pair_counts",
    "regr_slope",
    "ntile_orders",
    "gap_fill_hourly",
    "fuzzy_name_pairs",
    "dup_span_stats",
    "sparse_cosine_pairs",
    "embedding_standardize",
    "funnel_counts",
    "pmi_bigrams",
    "weighted_median",
    "burst_pairs",
    "ntile_by_user",
    "gap_fill_locf",
    "dup_span_strip",
    "cube_counts",
    "approx_grouped_median",
    "user_value_profile",
    "type_share",
    "hourly_distinct_users",
    "revenue_by_segment_month",
    "rank_metrics_by_user",
    "mode_event_type",
    "string_agg_types",
    "intersect_keys",
    "grouped_mad",
    "fww_first_by_key",
    "retention_evict",
    "projection_revenue",
    "filter_dispatch",
    "hex_roundtrip",
    "distinct_union_keys",
    "anti_join_users",
    "derived_counts",
    "table_counts",
    "groupby_agg_pushdown",
    "heavy_hitter_users",
    "broadcast_join_brand_rev",
    "asof_join_orders",
    "graph_reach",
    "enrich_segment_spend",
    "topk_orders",
    "window_hourly",
    "exact_dedup_docs",
    "doc_fingerprint",
    "lang_id_docs",
    "quality_docs",
    "bpe_token_count",
    "embedding_topk",
    "ann_ivf_topk",
    "ann_ivf_persisted",
    "embedding_cosine_pairs",
    "connected_components",
    "corpus_filter_dedup",
    "budget_sample",
    "vocab_topk",
    "stratified_sample",
    "doc_keywords",
    "json_extract_props",
    "sessionize",
    "window_sliding",
    "multimodal_decode",
    "multimodal_frames",
    "winnow_fingerprint",
    "ann_quantized_topk",
    "ann_pq_topk",
    "minhash_lsh_pairs",
    "near_dedup_keep",
    "corpus_curate",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "cms_heavy_hitters",
    "random_sample",
    "pagerank_keys",
    "weighted_sample",
    "compression_ratio",
    "approx_distinct_users",
    "cdc_replay_full",
    "cdc_replay_ignore",
    "cdc_resume_tail",
    "cdc_bulk_load",
    "lake_diff",
    "incremental_lang_counts",
    "stream_publish",
    "schema_evolution_audit",
    "training_shards",
    "approx_distinct_by_type",
]

if set(_QUERY_ORDER) != set(QUERIES) or len(_QUERY_ORDER) != len(QUERIES):
    raise RuntimeError(
        "query registry drift: _QUERY_ORDER does not match QUERIES keys; "
        f"missing={set(QUERIES) - set(_QUERY_ORDER)} "
        f"extra={set(_QUERY_ORDER) - set(QUERIES)}"
    )
QUERIES = {k: QUERIES[k] for k in _QUERY_ORDER}
