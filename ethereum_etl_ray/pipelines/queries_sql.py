"""SQL-analytics operator queries: grouped aggregates, window functions,
percentile/median/MAD selection, reshape (pivot/unpivot/rollup/cube),
sampling, sketches, sessionization and time-series gap filling.
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
from ethereum_etl_ray.pipelines.queries_common import (  # noqa: F401
    _cents,
    _read,
)


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


def q_cms_heavy_hitters(sf_dir: str):
    """Approximate heavy hitters via mergeable count-min sketch (scale path)."""
    from ethereum_etl_ray.stages.sketch import sketch_heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    df = sketch_heavy_hitters(ds, "user_id", sample_fraction=1.0)
    return df.head(10)


def q_zorder_box(sf_dir: str):
    """Z-order clustered layout round trip (stages/zorder.py): events
    written z-ordered on (value, user_id) — equi-depth rank buckets from
    the t-digest, bit interleave, range-partitioned files — then a box
    predicate answered via Parquet-footer pruning + exact residual filter.
    The oracle is the plain SQL box select; the file-skipping claim
    (minority of files touched) is pinned in tests/test_zorder.py."""
    import shutil
    import tempfile

    from ethereum_etl_ray.stages.zorder import zorder_read, zorder_write

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    out_dir = tempfile.mkdtemp(prefix="webcdc_zorder_")
    try:
        zorder_write(ds, out_dir, ["value", "user_id"], bits=8, num_files=32)
        out, _kept, _total = zorder_read(
            out_dir, {"value": (5.0, 15.0), "user_id": (10.0, 60.0)})
        df = out.to_pandas()[["event_id", "user_id", "value"]]
        return df.sort_values("event_id").reset_index(drop=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def q_tdigest_quantiles(sf_dir: str):
    """Per-type approximate quantiles via the mergeable t-digest sketch
    (stages/tdigest.py) — the rank-statistics member of the sketch family
    (CMS frequency, HLL cardinality): one streaming pass, one digest row
    per (batch, key), digests — never values — shuffled. Rows-only at the
    driver (estimates depend on batch boundaries); the ≤2% rank-error
    oracle vs exact quantiles lives in tests/test_tdigest.py."""
    from ethereum_etl_ray.stages.tdigest import grouped_quantiles

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantiles(ds, "event_type", "value",
                             [0.25, 0.5, 0.9, 0.99], delta=200)


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

    # combiner: collapse each join-output batch to its ≤(segments×months)
    # partial sums BEFORE the final exchange — the wide groupby over the
    # full join stream was the query's dominant cost (~18 s of a 30 s run
    # at sf0.1 to produce 400 rows)
    def seg_month_partial(t: pa.Table) -> pa.Table:
        return (t.select(["c_mktsegment", "month", "rev"])
                .group_by(["c_mktsegment", "month"])
                .aggregate([("rev", "sum")])
                .rename_columns(["c_mktsegment", "month", "rev"]))

    partial = joined.map_batches(seg_month_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
    out = (partial.groupby(["c_mktsegment", "month"]).sum("rev")
           .map_batches(lambda t: t.rename_columns(
               ["c_mktsegment", "month", "revenue_c100"]),
               batch_format="pyarrow", zero_copy_batch=True))
    return (out.to_pandas().sort_values(["c_mktsegment", "month"])
            .reset_index(drop=True))


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


QUERIES = {
    "budget_sample": q_budget_sample,
    "stratified_sample": q_stratified_sample,
    "json_extract_props": q_json_extract_props,
    "sessionize": q_sessionize,
    "window_sliding": q_window_sliding,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "tdigest_quantiles": q_tdigest_quantiles,
    "zorder_box": q_zorder_box,
    "random_sample": q_random_sample,
    "deterministic_sample": q_deterministic_sample,
    "cap_per_key": q_cap_per_key,
    "percentiles": q_percentiles,
    "range_join": q_range_join,
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
    "approx_grouped_median": q_approx_grouped_median,
    "profile_events": q_profile_events,
    "pk_violations": q_pk_violations,
    "unpivot_metrics": q_unpivot_metrics,
    "intersect_keys": q_intersect_keys,
    "outer_join_activity": q_outer_join_activity,
    "weighted_sample": q_weighted_sample,
    "count_distinct_by_key": q_count_distinct_by_key,
    "argmax_by_type": q_argmax_by_type,
    "pivot_event_types": q_pivot_event_types,
    "value_histogram": q_value_histogram,
    "corr_qty_discount": q_corr_qty_discount,
    "approx_distinct_users": q_approx_distinct_users,
    "mode_event_type": q_mode_event_type,
    "regr_slope": q_regr_slope,
    "ntile_orders": q_ntile_orders,
    "gap_fill_hourly": q_gap_fill_hourly,
    "revenue_by_segment_month": q_revenue_by_segment_month,
    "funnel_counts": q_funnel_counts,
    "ntile_by_user": q_ntile_by_user,
    "rank_metrics_by_user": q_rank_metrics_by_user,
    "weighted_median": q_weighted_median,
    "gap_fill_locf": q_gap_fill_locf,
    "burst_pairs": q_burst_pairs,
    "approx_distinct_by_type": q_approx_distinct_by_type,
}

ORACLE = {
    "zorder_box": """
        SELECT event_id, user_id, value FROM events
        WHERE value BETWEEN 5.0 AND 15.0
          AND user_id BETWEEN 10.0 AND 60.0
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
    "stratified_sample": """
        SELECT doc_id, lang, n_chars FROM (
          SELECT doc_id, lang, n_chars,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
          FROM documents
        ) WHERE rn <= 20
    """,
    "json_extract_props": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
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
    "percentiles": """
        SELECT CAST(0.25 AS DOUBLE) AS p, quantile_disc(value, 0.25) AS value FROM events
        UNION ALL
        SELECT 0.5, quantile_disc(value, 0.5) FROM events
        UNION ALL
        SELECT 0.9, quantile_disc(value, 0.9) FROM events
        UNION ALL
        SELECT 0.99, quantile_disc(value, 0.99) FROM events
    """,
    "range_join": """
        SELECT e.event_id, e.value, w.window_id
        FROM events e
        JOIN (
          SELECT i AS window_id, i * 12.0 AS lo, i * 12.0 + 18.0 AS hi
          FROM UNNEST(generate_series(0, 19)) AS t(i)
        ) w ON e.value >= w.lo AND e.value < w.hi
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
    "cube_counts": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_c100
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    "string_agg_types": """
        SELECT user_id,
               string_agg(event_type, ',' ORDER BY ts, event_id) AS types_seq
        FROM events GROUP BY user_id
    """,
    "grouped_mad": """
        WITH med AS (
          SELECT user_id, quantile_disc(value, 0.5) AS m
          FROM events GROUP BY user_id)
        SELECT e.user_id, quantile_disc(abs(e.value - med.m), 0.5) AS mad
        FROM events e JOIN med USING (user_id) GROUP BY e.user_id
    """,
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
    "multikey_join_group_stats": """
        SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_linestatus,
               g.n_group
        FROM lineitem l
        JOIN (SELECT l_returnflag AS rf, l_linestatus AS ls,
                     CAST(count(*) AS BIGINT) AS n_group
              FROM lineitem GROUP BY 1, 2) g
          ON l.l_returnflag = g.rf AND l.l_linestatus = g.ls
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
    "approx_grouped_median": """
        SELECT user_id, quantile_disc(value, 0.5) AS q50
        FROM events GROUP BY user_id
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
    "outer_join_activity": """
        SELECT CAST(e.user_id AS DOUBLE) AS user_id,
               CAST(e.n_ev AS DOUBLE) AS n_ev,
               CAST(c.c_custkey AS DOUBLE) AS c_custkey,
               c.c_mktsegment
        FROM (SELECT user_id, count(*) AS n_ev
              FROM events GROUP BY user_id) e
        FULL OUTER JOIN customer c ON e.user_id = c.c_custkey
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
    "mode_event_type": """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, event_type AS mode_type, n FROM c
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type) = 1
    ORDER BY user_id
""",
    "regr_slope": """
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
""",
    "ntile_orders": """
    SELECT o_orderkey,
           CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
             AS tile
    FROM orders ORDER BY o_orderkey
""",
    "gap_fill_hourly": """
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
""",
    "revenue_by_segment_month": """
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
""",
    "funnel_counts": """
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
""",
    "ntile_by_user": """
    SELECT event_id,
           CAST(ntile(4) OVER (PARTITION BY user_id
                               ORDER BY value, event_id) AS BIGINT) AS tile
    FROM events ORDER BY event_id
""",
    "rank_metrics_by_user": """
    SELECT event_id,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cd
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value)
    ORDER BY event_id
""",
    "weighted_median": """
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
""",
    "gap_fill_locf": """
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
""",
    "burst_pairs": """
    SELECT a.user_id,
           least(a.event_id, b.event_id) AS eid_a,
           greatest(a.event_id, b.event_id) AS eid_b,
           abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= CAST(3600 AS BIGINT) * 1000000
    ORDER BY 1, 2, 3
""",
}
