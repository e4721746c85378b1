"""Per-key grouped operators: top-N per key, grouped quantiles, keyed
window functions (lag / cumulative sum).

All three share one physical plan — the engine's co-partition shuffle
(``hash64(key) % P``, the same partitioner as ``cogroup_join`` /
``bucketed_asof``): keys land wholly inside one partition, each partition is
processed as ONE Arrow table with vectorized numpy group-boundary math (no
per-group Python calls — ``groupby(key).map_groups`` would invoke the UDF
once per key, which is 10^4+ interpreter round-trips per partition at scale).

Scale contract: per-KEY data must fit a task (same as any hash aggregation);
per-PARTITION volume is controlled by ``num_partitions``. ``topn_per_key``
additionally runs a map-side combiner so only ≤ n rows per (batch, key) ever
enter the shuffle.

The reference has no grouped rankings/quantiles/windows (SURVEY §2.8); the
nearest analogue is its sink-side keyed LWW pick (A5/A6), generalized here to
arbitrary per-key order statistics.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

from ethereum_etl_ray.functions.hashing import partition_ids


def _default_partitions() -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus)


def map_copartitions(
    ds: ray.data.Dataset,
    key: str,
    fn,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Hash-partition ``ds`` by ``key`` and apply ``fn`` once per partition.

    ``fn`` receives one ``pa.Table`` holding ALL rows of every key hashed to
    that partition (the ``__part`` helper column already dropped) and returns
    a ``pa.Table``. One shuffle; everything else map-side.
    """
    parts = num_partitions or _default_partitions()

    def tag(t: pa.Table) -> pa.Table:
        pids = (partition_ids(t.column(key), parts) if t.num_rows
                else np.array([], np.int32))
        return t.append_column("__part", pa.array(pids, pa.int32()))

    def run(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns(["__part"]))

    return (ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__part").map_groups(run, batch_format="pyarrow"))


def _group_starts(keys: np.ndarray) -> np.ndarray:
    """Start index of each key run in a key-sorted array (first entry 0)."""
    if len(keys) == 0:
        return np.array([], np.int64)
    return np.concatenate(([0], np.flatnonzero(keys[1:] != keys[:-1]) + 1))


def _keep_topn_sorted(t: pa.Table, key: str, n: int) -> pa.Table:
    """Given ``t`` already sorted by (key, order...), keep first n per key."""
    keys = t.column(key).to_numpy(zero_copy_only=False)
    starts = _group_starts(keys)
    pos = np.arange(len(keys)) - np.repeat(starts, np.diff(
        np.concatenate((starts, [len(keys)]))))
    return t.filter(pa.array(pos < n))


def topn_per_key(
    ds: ray.data.Dataset,
    key: str,
    sort_cols: list[str],
    n: int,
    descending: list[bool] | bool = False,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Top-``n`` rows per key ordered by ``sort_cols`` (ROW_NUMBER ≤ n).

    Ties are broken by the sort columns' total order — include a unique
    tiebreak column for deterministic output. Map-side combiner first: each
    batch keeps its local per-key top-n (the only rows that can survive the
    global selection), so the shuffle moves ≤ n rows per (batch, key).
    """
    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)
    order = ([(key, "ascending")]
             + [(c, "descending" if d else "ascending")
                for c, d in zip(sort_cols, descending)])

    def local(t: pa.Table) -> pa.Table:
        return _keep_topn_sorted(t.sort_by(order), key, n)

    combined = ds.map_batches(local, batch_format="pyarrow",
                              zero_copy_batch=True)
    return map_copartitions(combined, key, local,
                            num_partitions=num_partitions)


def grouped_quantile(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    p: float | list[float],
    *,
    out_col: str | list[str] | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact discrete quantile(s) per key: the k-th smallest ``col`` value
    with ``k = ceil(p·n_key)`` (1-indexed) — ``quantile_disc`` convention,
    the same rank rule the global ``percentiles`` query proved bit-identical
    against DuckDB. The value is picked, never interpolated, so floats pass
    through untouched (exact cross-engine parity).

    ``p`` may be a list — every quantile comes out of the SAME single
    sort + rank pass (one column per p), so an IQR or a p25/p50/p99 profile
    costs no more than a lone median.
    """
    ps = [p] if isinstance(p, float) else list(p)
    if out_col is None:
        outs = [f"q{int(q * 100)}" for q in ps]
    else:
        outs = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(outs) != len(ps):
        raise ValueError("out_col must match p in length")

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {key: t.column(key)}
            for o in outs:
                cols[o] = pa.nulls(0, t.schema.field(col).type)
            return pa.table(cols)
        t = t.sort_by([(key, "ascending"), (col, "ascending")])
        keys = t.column(key).to_numpy(zero_copy_only=False)
        starts = _group_starts(keys)
        counts = np.diff(np.concatenate((starts, [len(keys)])))
        cols = {key: t.column(key).take(pa.array(starts, pa.int64()))}
        for q, o in zip(ps, outs):
            ks = np.maximum(1, np.ceil(q * counts)).astype(np.int64)
            cols[o] = t.column(col).take(pa.array(starts + ks - 1, pa.int64()))
        return pa.table(cols)

    return map_copartitions(ds.select_columns([key, col]), key, pick,
                            num_partitions=num_partitions)


def keyed_window(
    ds: ray.data.Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    *,
    cents: bool = True,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-key LAG delta + cumulative sum over the key's event history,
    ordered by ``order_cols`` (must totally order rows within a key).

    Emits the input columns plus ``delta_c100`` (value − previous value,
    null on each key's first row) and ``cum_c100`` (running sum). Values are
    fixed-pointed to int64 cents (``floor(x·100 + 0.5)``) so the running sum
    is exact integer arithmetic — cross-engine float summation order can
    never disagree. ``cents=False`` keeps raw int64 values instead.
    """

    def window(t: pa.Table) -> pa.Table:
        out_cols = {c: t.column(c) for c in t.column_names}
        if t.num_rows == 0:
            out_cols["delta_c100"] = pa.nulls(0, pa.int64())
            out_cols["cum_c100"] = pa.nulls(0, pa.int64())
            return pa.table(out_cols)
        if t.column(value_col).null_count:
            raise ValueError(
                f"keyed_window: {value_col!r} contains nulls — the int64 "
                "fixed-point conversion would silently corrupt them; filter "
                "or fill nulls first")
        t = t.sort_by([(key, "ascending")]
                      + [(c, "ascending") for c in order_cols])
        keys = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        c = (np.floor(v * 100.0 + 0.5).astype(np.int64) if cents
             else v.astype(np.int64))
        starts = _group_starts(keys)
        is_start = np.zeros(len(keys), bool)
        is_start[starts] = True
        # cumulative sum restarting at each key: subtract the running total
        # carried in from previous keys
        cum_all = np.cumsum(c)
        carry_in = np.repeat(cum_all[starts] - c[starts],
                             np.diff(np.concatenate((starts, [len(keys)]))))
        cum = cum_all - carry_in
        lag = np.empty_like(c)
        lag[1:] = c[:-1]
        lag[0] = 0
        delta = c - lag
        out_cols = {c_: t.column(c_) for c_ in t.column_names}
        out_cols["delta_c100"] = pa.array(delta, pa.int64(),
                                          mask=is_start)
        out_cols["cum_c100"] = pa.array(cum, pa.int64())
        return pa.table(out_cols)

    return map_copartitions(ds, key, window, num_partitions=num_partitions)


def string_agg_ordered(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    order_cols: list[str],
    *,
    sep: str = ",",
    out_col: str = "agg",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Ordered string aggregation per key — SQL's
    ``string_agg(value, sep ORDER BY ...)``. The order columns must totally
    order rows within a key, so the concatenation is deterministic and
    cross-engine reproducible. One co-partition shuffle; the join itself is
    a per-key reduce over the partition-sorted table.
    """

    def agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key: t.column(key),
                             out_col: pa.array([], pa.string())})
        t = t.sort_by([(key, "ascending")]
                      + [(c, "ascending") for c in order_cols])
        keys = t.column(key).to_numpy(zero_copy_only=False)
        vals = t.column(value_col).to_pylist()
        starts = _group_starts(keys)
        bounds = np.concatenate((starts, [len(keys)]))
        joined = [sep.join(vals[bounds[i]:bounds[i + 1]])
                  for i in range(len(starts))]
        return pa.table({key: t.column(key).take(pa.array(starts, pa.int64())),
                         out_col: pa.array(joined, pa.string())})

    return map_copartitions(ds.select_columns([key, value_col] + order_cols),
                            key, agg, num_partitions=num_partitions)


def grouped_mad(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    *,
    out_col: str = "mad",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Median absolute deviation per key — robust dispersion, exact:
    ``median_disc(|x − median_disc(x)|)`` with the same ``k = ceil(0.5·n)``
    discrete-median convention as ``grouped_quantile`` (values are PICKED,
    never interpolated; the abs-deviation is one float subtraction, so the
    result is bit-identical to a SQL twin mirroring the two-step form).
    Both medians happen inside ONE partition pass (vectorized run-length
    group math, no per-key Python).
    """

    def pick_median(sorted_vals: np.ndarray, starts: np.ndarray,
                    counts: np.ndarray) -> np.ndarray:
        ks = np.maximum(1, np.ceil(0.5 * counts)).astype(np.int64)
        return sorted_vals[starts + ks - 1]

    def mad(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key: t.column(key),
                             out_col: pa.nulls(0, pa.float64())})
        t = t.sort_by([(key, "ascending"), (col, "ascending")])
        keys = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        starts = _group_starts(keys)
        counts = np.diff(np.concatenate((starts, [len(keys)])))
        med = pick_median(v, starts, counts)
        dev = np.abs(v - np.repeat(med, counts))
        # second median over deviations: re-sort dev WITHIN each key run
        order = np.lexsort((dev, np.repeat(np.arange(len(starts)), counts)))
        dev_sorted = dev[order]
        mads = pick_median(dev_sorted, starts, counts)
        return pa.table({key: t.column(key).take(pa.array(starts, pa.int64())),
                         out_col: pa.array(mads, pa.float64())})

    return map_copartitions(ds.select_columns([key, col]), key, mad,
                            num_partitions=num_partitions)


def robust_outliers(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    *,
    k: float = 3.0,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-key robust outlier detection: rows with
    ``|x − median_key| > k · MAD_key`` (median/MAD are the exact discrete
    statistics of ``grouped_quantile`` / ``grouped_mad``). The standard
    data-cleaning primitive for a training corpus — robust to the outliers
    it hunts, unlike mean/σ z-scores. One co-partition pass computes both
    statistics AND applies the filter; emits the flagged rows with their
    ``med`` / ``mad`` columns attached. ``k·MAD`` is a single float
    multiply, so a SQL twin mirroring the expression is bit-identical.
    """

    def flag(t: pa.Table) -> pa.Table:
        base = {c: t.column(c) for c in t.column_names}
        if t.num_rows == 0:
            return pa.table({**base, "med": pa.nulls(0, pa.float64()),
                             "mad": pa.nulls(0, pa.float64())})
        t = t.sort_by([(key, "ascending"), (col, "ascending")])
        keys = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        starts = _group_starts(keys)
        counts = np.diff(np.concatenate((starts, [len(keys)])))
        ks = np.maximum(1, np.ceil(0.5 * counts)).astype(np.int64)
        med = np.repeat(v[starts + ks - 1], counts)
        dev = np.abs(v - med)
        order = np.lexsort((dev, np.repeat(np.arange(len(starts)), counts)))
        mad = np.repeat(dev[order][starts + ks - 1], counts)
        mask = dev > k * mad
        out = t.filter(pa.array(mask))
        return (out.append_column("med", pa.array(med[mask], pa.float64()))
                .append_column("mad", pa.array(mad[mask], pa.float64())))

    return map_copartitions(ds, key, flag, num_partitions=num_partitions)


def grouped_quantile_approx(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    p: float | list[float],
    *,
    id_col: str,
    sample_k: int = 1024,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Approximate per-key quantiles with BOUNDED per-key state — the scale
    escape hatch for ``grouped_quantile``, whose exact path needs a whole
    key's rows in one task (fine for normal keys, not for a Zipf-hot one at
    10^10 rows).

    Mechanism: a deterministic bottom-``sample_k`` sample per key, priority
    = ``hash64(id)`` — bottom-k by a uniform hash IS a uniform k-sample,
    and it is MERGEABLE (bottom-k of a union = bottom-k of the parts'
    bottom-ks), so the existing ``topn_per_key`` combiner bounds every
    (batch, key)'s shuffle contribution at ``sample_k`` rows. The exact
    discrete quantile of the sample estimates the population quantile with
    error O(1/sqrt(sample_k)) in rank. Deterministic: same ids → same
    sample → same answer, any partitioning.
    """
    from ethereum_etl_ray.functions.hashing import hash64

    def prioritize(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        pri = hash64(ids.astype(str)).astype(np.uint64).view(np.int64)
        return pa.table({key: t.column(key), col: t.column(col),
                         "__pri": pa.array(pri, pa.int64())})

    scored = ds.select_columns([key, col, id_col]).map_batches(
        prioritize, batch_format="pyarrow", zero_copy_batch=True)
    sampled = topn_per_key(scored, key, ["__pri"], sample_k,
                           descending=False, num_partitions=num_partitions)
    return grouped_quantile(sampled, key, col, p,
                            num_partitions=num_partitions)
