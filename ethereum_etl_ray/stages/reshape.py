"""Reshape / multi-level aggregation operators: ROLLUP and UNPIVOT.

The reference has neither (SURVEY §2.8 — its aggregation surface stops at
distinct/count); these are standard lake-analytics operators a user of a
100 TB corpus lake expects next to ``groupby``.

Scale design:
  * ``rollup_aggregate`` pays for ONE shuffle — the finest grouping level —
    with a map-side combiner in front of it; every coarser level (including
    the grand total) is re-aggregated from the finest result, which is
    ``O(Π |distinct level values|)`` rows, not the input. Re-aggregation of
    int64 counts/sums is exact, so the coarse levels are bit-identical to
    aggregating the raw input.
  * ``unpivot`` is purely map-side (one output table slice per metric per
    batch, zero-copy key columns) — no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _agg_level(t: pa.Table, keys: list[str], sums: list[str]) -> pa.Table:
    """Exact int64 groupby (count + sums) of one table — Arrow C-speed."""
    if not keys:  # grand total — Arrow group_by needs ≥1 key
        cols = {"n": pa.array([pc.sum(t.column("n")).as_py() or 0], pa.int64())}
        for s in sums:
            cols[s] = pa.array([pc.sum(t.column(s)).as_py() or 0], pa.int64())
        return pa.table(cols)
    agged = t.group_by(keys).aggregate([("n", "sum")] + [(s, "sum") for s in sums])
    rename = {f"{s}_sum": s for s in sums} | {"n_sum": "n"}
    return agged.rename_columns([rename.get(c, c) for c in agged.column_names])


def rollup_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    sum_cents: dict[str, str] | None = None,
    cube: bool = False,
) -> pa.Table:
    """GROUP BY ROLLUP(keys) — or CUBE(keys) with ``cube=True``: count +
    exact cent-sums at every prefix level (ROLLUP) / every key subset (CUBE).

    ``sum_cents`` maps input float columns → output column names; each is
    fixed-pointed per row (``floor(x·100 + 0.5)`` int64) before summation so
    every level's sum is exact integer arithmetic. Rolled-up key columns are
    NULL (SQL ROLLUP/CUBE convention). Returns the (small) grouping table.
    CUBE costs nothing extra at scale: all 2^k levels re-aggregate from the
    same single-shuffle finest result.
    """
    sum_cents = sum_cents or {}
    out_sums = list(sum_cents.values())

    def combine(t: pa.Table) -> pa.Table:
        cols = {k: t.column(k) for k in keys}
        cols["n"] = pa.array(np.ones(t.num_rows, np.int64))
        for src, dst in sum_cents.items():
            v = t.column(src).to_numpy(zero_copy_only=False)
            cols[dst] = pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64))
        return _agg_level(pa.table(cols), keys, out_sums)

    # one shuffle: finest level, combiner-reduced map-side first
    fine = (ds.map_batches(combine, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(keys[0]).map_groups(
                lambda g: _agg_level(g, keys, out_sums),
                batch_format="pyarrow")
            .take_all())
    fine_t = pa.Table.from_pylist(fine) if fine else None
    if fine_t is None:
        fields = ([pa.field(k, pa.string()) for k in keys]
                  + [pa.field("n", pa.int64())]
                  + [pa.field(s, pa.int64()) for s in out_sums])
        return pa.table({f.name: pa.nulls(0, f.type) for f in fields})

    # coarser levels re-aggregated from the finest (tiny, driver-side):
    # ROLLUP = proper prefixes; CUBE = every proper subset
    if cube:
        from itertools import combinations

        subsets = [list(c) for r in range(len(keys) - 1, -1, -1)
                   for c in combinations(keys, r)]
    else:
        subsets = [keys[:depth] for depth in range(len(keys) - 1, -1, -1)]
    levels = [fine_t]
    for sub in subsets:
        lvl = _agg_level(fine_t, sub, out_sums)
        for k in keys:
            if k not in sub:
                lvl = lvl.append_column(k, pa.nulls(lvl.num_rows,
                                                    fine_t.schema.field(k).type))
        levels.append(lvl.select(fine_t.column_names))
    return pa.concat_tables(levels)


def unpivot(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    *,
    metric_col: str = "metric",
    value_col: str = "value",
) -> ray.data.Dataset:
    """UNPIVOT/melt: one output row per (input row × value column).

    Map-side only: per batch, each metric contributes a slice reusing the id
    columns zero-copy; values are cast to float64 (the common supertype).
    """

    def melt(t: pa.Table) -> pa.Table:
        pieces = []
        for m in value_cols:
            cols = {c: t.column(c) for c in id_cols}
            cols[metric_col] = pa.array(np.full(t.num_rows, m, object),
                                        pa.string())
            cols[value_col] = pc.cast(t.column(m), pa.float64())
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def pivot_counts(
    ds: ray.data.Dataset,
    key: str,
    pivot_col: str,
    values: list[str],
    *,
    prefix: str = "n_",
) -> ray.data.Dataset:
    """PIVOT (long → wide): one row per key with a count column per pivot
    value (the dual of ``unpivot``). SQL's PIVOT needs the column set
    declared up front for the same reason ``values`` is explicit here — the
    output schema must be static.

    Purely combiner-shaped: each batch reduces to ≤ |keys-in-batch| rows of
    |values| int64 columns BEFORE the shuffle, then one hash aggregate sums
    the partials — shuffle volume is O(keys × values), never O(rows).
    """
    from ray.data.aggregate import Sum

    def combine(t: pa.Table) -> pa.Table:
        pv = t.column(pivot_col)
        cols = {key: t.column(key)}
        for v in values:
            cols[prefix + v] = pc.cast(pc.equal(pv, pa.scalar(v)), pa.int64())
        agged = (pa.table(cols).group_by(key)
                 .aggregate([(prefix + v, "sum") for v in values]))
        rename = {f"{prefix}{v}_sum": prefix + v for v in values}
        return agged.rename_columns([rename.get(c, c)
                                     for c in agged.column_names])

    partial = ds.map_batches(combine, batch_format="pyarrow",
                             zero_copy_batch=True)
    agged = partial.groupby(key).aggregate(
        *[Sum(prefix + v, alias_name=prefix + v) for v in values])

    def to_int(t: pa.Table) -> pa.Table:
        return pa.table({c: (pc.cast(t.column(c), pa.int64())
                             if c != key else t.column(c))
                         for c in t.column_names})

    return agged.map_batches(to_int, batch_format="pyarrow")
