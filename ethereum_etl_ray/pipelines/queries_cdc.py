"""CDC / merge / join / graph operator queries (SURVEY §2.1-2.5 core):
LWW/FWW/tombstone merge, retention, projections+explode, join family
(broadcast/hash/as-of/enrich), graph reach + path-value fold, the
cdc_* replay/resume/bulk endpoints, lake diff and incremental maintenance.
"""

# This module is one shard of the query registry; see
# ethereum_etl_ray/pipelines/queries.py for assembly and ordering.

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ethereum_etl_ray.stages.merge import lww_merge_dataset
from ethereum_etl_ray.util import pool_size
from ethereum_etl_ray.pipelines.queries_common import (  # noqa: F401
    _cents,
    _read,
)


_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


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


def q_field_lww(sf_dir: str):
    """Field-level LWW merge (stages/fieldlww.py): partial-update events —
    every 3rd event leaves ``value`` unset, every 4th leaves ``event_type``
    unset (deterministic planted nulls) — fuse into one golden record per
    user: each column from the latest event that actually set it, version
    columns from the globally latest event. Generalizes the reference's
    row upsert (src/repositories/sqlite/base.py:159-172) to column
    survivorship; oracled against per-column SQL window argmaxes."""
    from ethereum_etl_ray.stages.fieldlww import field_lww_merge

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type", "value"])

    def plant(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        v = pa.array(np.where(eid % 3 == 0, np.nan, val), pa.float64(),
                     from_pandas=True)
        et = pc.if_else(pa.array(eid % 4 == 0),
                        pa.nulls(t.num_rows, pa.string()),
                        pc.cast(t.column("event_type").combine_chunks(),
                                pa.string()))
        return pa.table({"user_id": t.column("user_id"),
                         "ts": t.column("ts"),
                         "event_id": t.column("event_id"),
                         "value": v, "event_type": et})

    out = field_lww_merge(
        ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True),
        key="user_id", version=("ts", "event_id"),
        fields=("value", "event_type"))
    return out.select_columns(["user_id", "ts", "event_id",
                               "value", "event_type"])


def q_late_event_counts(sf_dir: str):
    """Watermark semantics over a bounded-disorder stream
    (stages/watermark.py): every 37th event's time is shifted 2 h back
    (deterministic planted disorder — the synthetic stream is otherwise
    monotone), events later than a 30-min allowed lateness behind the
    arrival-order high-water mark are discarded, survivors are counted per
    hour window. The two-phase distributed prefix max leaves O(buckets)
    state on the driver; the oracle is the literal SQL running max."""
    from ethereum_etl_ray.stages.watermark import watermark_filter

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def etime(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        shift = np.where(eid % 37 == 0, 7_200_000_000, 0)
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "etime_us": pa.array(us - shift, pa.int64())})

    kept = watermark_filter(
        ds.map_batches(etime, batch_format="pyarrow", zero_copy_batch=True),
        order_col="event_id", time_us_col="etime_us",
        allowed_lateness_us=1_800_000_000, bucket_width=4096)

    def windows(t: pa.Table) -> pa.Table:
        w = pc.divide(pc.cast(t.column("etime_us"), pa.int64()),
                      pa.scalar(3_600_000_000, pa.int64()))
        vc = pc.value_counts(w)
        return pa.table({"window_start": vc.field("values"),
                         "n_kept": pc.cast(vc.field("counts"), pa.int64())})

    return (kept.map_batches(windows, batch_format="pyarrow")
            .groupby("window_start")
            .aggregate(Sum("n_kept", alias_name="n_kept")))


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


def q_triangle_counts(sf_dir: str):
    """Exact per-apex triangle counting (stages/graph.py:triangle_counts —
    wedge generation co-grouped by lower endpoint, then one composite-key
    join closes the wedges) over a deterministic sparse graph derived from
    the documents table: chain edges (i-1, i) plus skip edges (i-2, i), so
    DuckDB's three-way self-join computes the identical closure."""
    from ethereum_etl_ray.stages.graph import triangle_counts

    docs = _read(sf_dir, "documents", ["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        chain = ids[ids % 8 != 0]
        skip = ids[ids % 8 >= 2]
        return pa.table({
            "u": pa.array(np.concatenate([chain - 1, skip - 2]), pa.int64()),
            "v": pa.array(np.concatenate([chain, skip]), pa.int64()),
        })

    edges = docs.map_batches(mk_edges, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = triangle_counts(edges).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


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


def q_cdc_replicate(sf_dir: str):
    """Leader→follower replication: full replay builds the leader, an
    incremental sync in two leader steps ships only changed partitions
    (manifest checksum skip), and the FOLLOWER's content is returned — it
    must equal the leader's replay result exactly (same rows as
    ``cdc_replay_full``; convergence and crash behaviour pytest-oracled in
    tests/test_replicate.py)."""
    from ethereum_etl_ray.config import EngineConfig
    from ethereum_etl_ray.pipelines.replicate import replica_verify, replicate
    from ethereum_etl_ray.pipelines.replay import replay
    from ethereum_etl_ray.sources.synth import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    src = _cdc_out_dir(sf_dir, "repl_leader")
    dst = _cdc_out_dir(sf_dir, "repl_follower")
    cfg = EngineConfig(num_partitions=32)
    wm = corpus.watermark
    replay(corpus, src, cfg, watermark=wm // 2)
    replicate(src, dst)            # initial sync at the mid watermark
    replay(corpus, src, cfg)       # leader advances
    replicate(src, dst)            # incremental: changed partitions only
    if not replica_verify(src, dst)["in_sync"]:
        raise RuntimeError("replica failed to converge to the leader")
    return _lake_result(dst)


def q_cdc_mor_ingest(sf_dir: str):
    """Merge-on-read ingest (Hudi-MOR / Iceberg-v2 shape of the reference's
    upsert, src/repositories/sqlite/base.py:152-175): three delta windows —
    the base files are never rewritten — with a delta compaction after the
    first, then the scan-time-merged lake. Must equal ``cdc_replay_full``'s
    copy-on-write result (byte-identical per url; pinned in
    tests/test_mor.py)."""
    from ethereum_etl_ray.config import EngineConfig
    from ethereum_etl_ray.pipelines.mor import compact_deltas, ingest_delta
    from ethereum_etl_ray.sources.synth import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    out = _cdc_out_dir(sf_dir, "mor")
    cfg = EngineConfig(num_partitions=32)
    wm = corpus.watermark
    for i, w in enumerate((wm // 3, (2 * wm) // 3, wm)):
        ingest_delta(corpus, out, cfg, watermark=w)
        if i == 0:
            compact_deltas(out)  # exercise both the folded and pending paths
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


_LWW_SQL = """
SELECT user_id, ts, event_id, event_type, value
FROM (
  SELECT user_id, ts, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts {d1}, event_id {d1}) AS rn
  FROM events
) WHERE rn = 1
"""


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
    "late_event_counts": q_late_event_counts,
    "field_lww": q_field_lww,
    "triangle_counts": q_triangle_counts,
    "connected_components": q_connected_components,
    "pagerank_keys": q_pagerank_keys,
    "cdc_replay_full": q_cdc_replay_full,
    "cdc_replay_ignore": q_cdc_replay_ignore,
    "cdc_resume_tail": q_cdc_resume_tail,
    "cdc_mor_ingest": q_cdc_mor_ingest,
    "cdc_replicate": q_cdc_replicate,
    "cdc_bulk_load": q_cdc_bulk_load,
    "lake_diff": q_lake_diff,
    "incremental_lang_counts": q_incremental_lang_counts,
    "stream_publish": q_stream_publish,
    "schema_evolution_audit": q_schema_evolution_audit,
}

ORACLE = {
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
    "triangle_counts": """
        WITH e AS (
          SELECT doc_id - 1 AS u, doc_id AS v FROM documents WHERE doc_id % 8 <> 0
          UNION
          SELECT doc_id - 2, doc_id FROM documents WHERE doc_id % 8 >= 2
        )
        SELECT a.u AS node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM e a JOIN e b ON b.u = a.u AND b.v > a.v
                 JOIN e c ON c.u = a.v AND c.v = b.v
        GROUP BY a.u
    """,
    "field_lww": """
        WITH e AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS value,
                 CASE WHEN event_id % 4 = 0 THEN NULL
                      ELSE event_type END AS event_type
          FROM events
        ), latest AS (
          SELECT user_id, ts, event_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM e
        ), v AS (
          SELECT user_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM e WHERE value IS NOT NULL
        ), t AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM e WHERE event_type IS NOT NULL
        )
        SELECT l.user_id, l.ts, l.event_id, v.value, t.event_type
        FROM latest l
        LEFT JOIN v ON v.user_id = l.user_id AND v.rn = 1
        LEFT JOIN t ON t.user_id = l.user_id AND t.rn = 1
        WHERE l.rn = 1
    """,
    "late_event_counts": """
        WITH e AS (
          SELECT event_id,
                 CAST(epoch_us(ts) AS BIGINT)
                   - CASE WHEN event_id % 37 = 0 THEN 7200000000 ELSE 0 END
                   AS etime_us
          FROM events
        ), w AS (
          SELECT etime_us,
                 max(etime_us) OVER (
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm
          FROM e
        )
        SELECT CAST(etime_us // 3600000000 AS BIGINT) AS window_start,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM w WHERE etime_us >= hwm - 1800000000
        GROUP BY 1
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
}
