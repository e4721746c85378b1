"""Join / lookup / enrichment stages.

The reference's "joins" are keyed lookups against external services batched
per row-group (J1-J5, SURVEY §2.4). Re-expressed Ray-Data-native:

  * ``broadcast_lookup`` — small build side shipped ONCE via ``ray.put`` and
    resolved inside each map task (never re-shipped per batch); the analogue
    of J1-J4 enrichment and the token-decimals side-input dict
    (``src/tasks/extract/pool.py:278-282``). No shuffle.
  * ``semi_anti_filter`` — broadcast key-set membership filter (the A1
    "to-address excluded if it was a contract" anti-join heuristic,
    ``src/tasks/extract/account.py:20-21``).
  * ``broadcast_asof`` — as-of (backward) join against a broadcast,
    pre-sorted right side via per-batch ``pd.merge_asof`` (guide pattern);
    right side must fit in memory — at 100 TB use the bucketed variant.
  * large-large equi-joins use ``Dataset.join`` (hash shuffle on the key),
    available in this Ray version — see pipelines.queries.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


_ARROW_JOIN_TYPE = {"inner": "inner", "left": "left outer", "right": "right outer"}


def broadcast_lookup(
    ds: ray.data.Dataset,
    small_df,
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Equi-join where the right side is broadcast (dimension-table join).

    Arrow-native: the build side ships once as an Arrow table (``ray.put``,
    zero-copy reads per actor) and each batch joins via Acero
    (``pa.Table.join``) — no pandas round-trip in the hot path."""
    right = (pa.Table.from_pandas(small_df, preserve_index=False)
             if isinstance(small_df, pd.DataFrame) else small_df)
    ref = ray.put(right)
    join_type = _ARROW_JOIN_TYPE.get(how, how)

    class Lookup:
        def __init__(self):
            self.right = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(self.right, keys=[left_on], right_keys=[right_on],
                              join_type=join_type)

    from ethereum_etl_ray.util import pool_size

    return ds.map_batches(Lookup, batch_format="pyarrow",
                          concurrency=pool_size(concurrency),
                          zero_copy_batch=True)


def semi_anti_filter(
    ds: ray.data.Dataset,
    keys,
    *,
    on: str,
    anti: bool = False,
) -> ray.data.Dataset:
    """Semi (keep members) / anti (keep non-members) join via a broadcast key
    set, or a broadcast Bloom filter when the build side is too big to ship
    exactly (pass a ``state.bloom.BloomFilter`` as ``keys``). Bloom semantics:
    no false negatives, so semi keeps a small FP surplus and anti may drop an
    FP sliver — choose ``fp_rate`` accordingly.

    Stateless tasks on purpose: the key set lives in the object store
    (one ``ray.put``, zero-copy ``ray.get`` per task) and reserving actors for
    a pure filter starves other stages of a small cluster (two pools of 2
    deadlocked a 4-CPU pipeline in testing)."""
    from ethereum_etl_ray.state.bloom import BloomFilter

    is_bloom = isinstance(keys, BloomFilter)
    ref = ray.put(keys if is_bloom else np.asarray(list(keys)))

    def member(batch: pa.Table) -> pa.Table:
        keyset = ray.get(ref)
        vals = batch.column(on).to_numpy(zero_copy_only=False)
        if is_bloom:
            mask = keyset.contains_many(vals)
            if anti:
                mask = ~mask
        else:
            mask = np.isin(vals, keyset, invert=anti)
        return batch.filter(pa.array(mask))

    return ds.map_batches(member, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_asof(
    ds: ray.data.Dataset,
    right_df: pd.DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    left_by: str,
    right_by: str,
    inner: bool = True,
) -> ray.data.Dataset:
    """Backward as-of join: each left row matches the latest right row with
    ``right_ts <= left_ts`` for the same key. Right side broadcast + sorted
    once per actor; each batch is one vectorized ``pd.merge_asof``."""
    right_sorted = right_df.sort_values(right_ts).reset_index(drop=True)
    ref = ray.put(right_sorted)

    class Asof:
        def __init__(self):
            self.right = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.merge_asof(
                batch.sort_values(left_ts),
                self.right,
                left_on=left_ts,
                right_on=right_ts,
                left_by=left_by,
                right_by=right_by,
                direction="backward",
            )
            if inner:
                out = out.dropna(subset=[right_ts])
            return out

    return ds.map_batches(Asof, batch_format="pandas", concurrency=2)


def bucketed_asof(
    left_ds: ray.data.Dataset,
    right_ds: ray.data.Dataset,
    *,
    left_ts: str,
    right_ts: str,
    left_by: str,
    right_by: str,
    inner: bool = True,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """As-of (backward) join where NEITHER side is driver-materialized — the
    100 TB path ``broadcast_asof``'s docstring promises.

    Both sides are hash-partitioned on their by-key (matches are always
    per-key, so co-partitioning by key alone suffices — no time-range split
    needed), co-grouped per partition, and merged with one vectorized
    ``pd.merge_asof`` per bucket. One shuffle total; driver sees nothing.
    """
    from ethereum_etl_ray.functions.hashing import partition_ids

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, cpus)
    l_schema, r_schema = left_ds.schema(), right_ds.schema()
    l_cols, r_cols = list(l_schema.names), list(r_schema.names)
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"bucketed_asof requires disjoint column names, got {overlap}")
    unified = list(zip(l_cols, l_schema.types)) + list(zip(r_cols, r_schema.types))

    def widen(side_flag: int, key_col: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for name, typ in unified:
                cols[name] = (t.column(name) if name in t.column_names
                              else pa.nulls(t.num_rows, typ))
            cols["__side"] = pa.array(np.full(t.num_rows, side_flag), pa.int8())
            cols["__part"] = pa.array(
                partition_ids(t.column(key_col), num_partitions), pa.int32())
            return pa.table(cols)

        return fn

    both = (
        left_ds.map_batches(widen(0, left_by), batch_format="pyarrow",
                            zero_copy_batch=True)
        .union(right_ds.map_batches(widen(1, right_by), batch_format="pyarrow",
                                    zero_copy_batch=True))
    )

    def asof_group(g: pa.Table) -> pd.DataFrame:
        side = g.column("__side")
        lt = g.filter(pa.compute.equal(side, pa.scalar(0, pa.int8()))).select(l_cols)
        rt = g.filter(pa.compute.equal(side, pa.scalar(1, pa.int8()))).select(r_cols)
        l = lt.to_pandas().sort_values(left_ts, kind="stable")
        if rt.num_rows == 0:
            if inner:  # dtype-stable empty frame (schemas must agree across groups)
                return pa.table({n: pa.nulls(0, t) for n, t in unified}).to_pandas()
            r_pad = {c: [None] * len(l) for c in r_cols}
            return l.assign(**r_pad)
        r = rt.to_pandas().sort_values(right_ts, kind="stable")
        # Ray's shuffle converts the union's null-padded int columns to
        # float64 — restore declared-integer dtypes so the by-keys match
        # exactly (see cogroup_join)
        declared = dict(unified)
        for df_ in (l, r):
            for name in df_.columns:
                typ = declared.get(name)
                if typ is not None and pa.types.is_integer(typ) \
                        and df_[name].dtype.kind in "iuf":
                    df_[name] = df_[name].astype("Int64")
        # merge_asof requires identical datetime resolutions (date32 parquet
        # columns land as datetime64[s], timestamps as [us])
        if pd.api.types.is_datetime64_any_dtype(l[left_ts]):
            l[left_ts] = l[left_ts].astype("datetime64[us]")
            r[right_ts] = r[right_ts].astype("datetime64[us]")
        out = pd.merge_asof(l, r, left_on=left_ts, right_on=right_ts,
                            left_by=left_by, right_by=right_by,
                            direction="backward")
        if inner:
            out = out.dropna(subset=[right_ts])
        return out

    return both.groupby("__part").map_groups(asof_group, batch_format="pyarrow")


def cogroup_join(
    left_ds: ray.data.Dataset,
    right_ds: ray.data.Dataset,
    *,
    left_on: str | list[str],
    right_on: str | list[str],
    how: str = "inner",
    num_partitions: int | None = None,
    left_fields: "pa.Schema | list[tuple[str, pa.DataType]] | None" = None,
    right_fields: "pa.Schema | list[tuple[str, pa.DataType]] | None" = None,
) -> ray.data.Dataset:
    """Hash co-group equi-join built on the engine's own partitioner
    (union + key-hash partition + per-group pandas merge).

    Exists because this Ray version's ``Dataset.join`` breaks when its input
    comes out of a hash aggregate (groupby emits empty zero-column blocks
    that poison the join partitions) — this shape is proven downstream of
    aggregates (cf. ``bucketed_asof`` + the asof_join_orders oracle).
    Column names must be disjoint across sides; ``inner``/``left``/``right``/
    ``outer`` — unmatched rows of the preserved side(s) come back null-padded
    (partitions empty on one side emit the other side whole). ``left_on`` /
    ``right_on`` may be COLUMN LISTS for a composite-key equi-join (both
    sides partition by the same mixed hash of the key tuple).
    ``left_fields``/``right_fields`` (a pa.Schema or (name, type) pairs)
    skip schema probing entirely — pass them when the input schema cannot be
    resolved statically (deep map_groups/aggregate chains), where the
    fallback would otherwise pay a one-row materialization of that input."""
    from ethereum_etl_ray.functions.hashing import partition_ids_multi

    if how not in ("inner", "left", "right", "outer"):
        raise ValueError(
            f"cogroup_join supports how='inner'|'left'|'right'|'outer', got {how!r}")
    left_on = [left_on] if isinstance(left_on, str) else list(left_on)
    right_on = [right_on] if isinstance(right_on, str) else list(right_on)
    if len(left_on) != len(right_on):
        raise ValueError("left_on and right_on must have equal length")

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, cpus)
    # normalize to Arrow blocks first: pandas-block datasets (e.g. map_groups
    # output) report numpy dtypes from .schema(), which pa.nulls can't build
    def _arrow_fields(schema):
        """(name, pa.DataType) pairs, or None if any type can't be mapped
        without executing (e.g. numpy object dtype for strings)."""
        if schema is None:
            return None
        out = []
        for n, t in zip(schema.names, schema.types):
            if isinstance(t, pa.DataType):
                out.append((n, t))
            else:
                try:
                    out.append((n, pa.from_numpy_dtype(t)))
                except (pa.ArrowNotImplementedError, ValueError, TypeError):
                    return None
        return out

    def _wrap_and_fields(ds, side, override, keys):
        wrapped = ds.map_batches(lambda t: t, batch_format="pyarrow",
                                 zero_copy_batch=True)
        if override is not None:
            if isinstance(override, pa.Schema):
                override = list(zip(override.names, override.types))
            return wrapped, list(override)
        # schema-resolution ladder. A probe is accepted only if every type
        # maps to Arrow AND the join keys are present — this version of Ray
        # can return None for wrapped aggregate+map chains, numpy object
        # dtypes for map_groups pandas blocks, and STALE pre-rename names
        # from Dataset.rename_columns' static plan schema (the key check
        # catches that one). Last rung materializes ONE row — that
        # re-executes this input's upstream once, so deep join chains pay
        # an extra fragment, never a wrong schema. Callers on hot paths
        # pass left_fields/right_fields to skip probing entirely.
        for probe in (wrapped, ds):
            try:
                fields = _arrow_fields(probe.schema())
            except Exception:
                fields = None
            if fields is not None and set(keys) <= {n for n, _ in fields}:
                return wrapped, fields
        try:
            b = wrapped.take_batch(1, batch_format="pyarrow")
        except Exception as e:
            raise ValueError(
                f"cogroup_join could not resolve an Arrow schema for the "
                f"{side} input (empty dataset with no static schema?)") from e
        fields = list(zip(b.schema.names, b.schema.types))
        missing = set(keys) - {n for n, _ in fields}
        if missing:
            raise ValueError(
                f"cogroup_join {side} input is missing join key(s) "
                f"{sorted(missing)}; columns are {[n for n, _ in fields]}")
        return wrapped, fields

    left_ds, l_fields = _wrap_and_fields(left_ds, "left", left_fields,
                                         left_on)
    right_ds, r_fields = _wrap_and_fields(right_ds, "right", right_fields,
                                          right_on)
    l_cols = [n for n, _ in l_fields]
    r_cols = [n for n, _ in r_fields]
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"cogroup_join requires disjoint column names, got {overlap}")
    unified = l_fields + r_fields

    def widen(side_flag: int, key_cols: list[str]):
        own = l_cols if side_flag == 0 else r_cols

        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows:
                # a resolved schema can still carry STALE names (e.g. Ray's
                # rename_columns static plan schema) — padding this side's
                # own missing columns with nulls would silently corrupt the
                # join, so fail loudly instead
                missing = [c for c in own if c not in t.column_names]
                if missing:
                    raise ValueError(
                        f"cogroup_join: resolved schema names {own} do not "
                        f"match actual batch columns {t.column_names} "
                        f"(missing {missing}); pass left_fields/right_fields "
                        "explicitly")
            cols = {}
            for name, typ in unified:
                cols[name] = (t.column(name) if name in t.column_names
                              else pa.nulls(t.num_rows, typ))
            cols["__side"] = pa.array(np.full(t.num_rows, side_flag), pa.int8())
            cols["__part"] = pa.array(
                partition_ids_multi([cols[k] for k in key_cols],
                                    num_partitions) if t.num_rows
                else np.array([], np.int32), pa.int32())
            return pa.table(cols)

        return fn

    both = (
        left_ds.map_batches(widen(0, left_on), batch_format="pyarrow",
                            zero_copy_batch=True)
        .union(right_ds.map_batches(widen(1, right_on), batch_format="pyarrow",
                                    zero_copy_batch=True))
    )

    def join_group(g: pa.Table) -> pd.DataFrame:
        side = g.column("__side")
        lt = g.filter(pa.compute.equal(side, pa.scalar(0, pa.int8()))).select(l_cols)
        rt = g.filter(pa.compute.equal(side, pa.scalar(1, pa.int8()))).select(r_cols)
        keep_l = how in ("left", "outer")
        keep_r = how in ("right", "outer")
        if (lt.num_rows == 0 and not keep_r) or (rt.num_rows == 0 and not keep_l):
            return pa.table({n: pa.nulls(0, t) for n, t in unified}).to_pandas()
        l, r = lt.to_pandas(), rt.to_pandas()
        # restore nullable Int64 BEFORE the merge for every declared-integer
        # column: the widened union carries nulls in the other side's
        # columns, and Ray's shuffle (and pandas padding) converts such int
        # columns to float64 — float-vs-int merge keys then mismatch, and
        # ids above 2^53 would round (the cast is exact below that; larger
        # ids need Ray to preserve nullable ints through shuffles)
        declared = dict(unified)
        for df_ in (l, r):
            for name in df_.columns:
                typ = declared.get(name)
                if typ is not None and pa.types.is_integer(typ) \
                        and df_[name].dtype.kind in "iuf":
                    df_[name] = df_[name].astype("Int64")
        return l.merge(r, how=how, left_on=left_on, right_on=right_on)

    return both.groupby("__part").map_groups(join_group, batch_format="pyarrow")


def enrich_with(
    ds: ray.data.Dataset,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    concurrency: int = 4,
    batch_size: int = 2048,
) -> ray.data.Dataset:
    """Generic stateful enrichment actor pool (J1-J4 shape): ``fn`` is applied
    per batch inside actors; in the reference these were async RPC fan-outs
    (``src/tasks/extract/account.py:33-52``) — here any expensive per-batch
    lookup/model call, with state amortized in ``__init__``."""

    class Enricher:
        def __init__(self):
            self.fn = fn

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return self.fn(batch)

    from ethereum_etl_ray.util import pool_size

    return ds.map_batches(Enricher, batch_format="pandas",
                          batch_size=batch_size, concurrency=pool_size(concurrency))

def interval_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_on: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
) -> ray.data.Dataset:
    """Distributed range/interval join: each left row matches every right
    interval with ``lo <= left_on < hi``. The canonical bucketed plan:

      - left rows land in ONE bucket: ``floor(val / bucket_width)``;
      - right intervals REPLICATE to every bucket they overlap
        (O(span / bucket_width) copies per interval);
      - one hash shuffle by bucket, then each group matches its local
        left×right block with a vectorized containment mask.

    Each (left, right) match is evaluated in exactly one group — the left
    row's bucket — so no downstream dedup is needed. Pick ``bucket_width``
    so a bucket's left rows fit one group's memory and intervals don't fan
    out too widely (width ≈ median interval span is the usual choice).
    Overlapping intervals are fine (a left row may emit several matches).

    The reference has no range join (SURVEY §2.8); this generalizes its
    keyed-lookup enrichments (J1–J4) to range predicates. ``how="inner"``
    only: unmatched left rows are dropped. Column names must be disjoint
    across sides (same contract as ``cogroup_join``).
    """
    if how != "inner":
        raise ValueError("interval_join supports how='inner' only")
    # normalize to Arrow blocks (pandas-block datasets report numpy dtypes)
    left = left.map_batches(lambda t: t, batch_format="pyarrow",
                            zero_copy_batch=True)
    right = right.map_batches(lambda t: t, batch_format="pyarrow",
                              zero_copy_batch=True)
    l_schema, r_schema = left.schema(), right.schema()
    lcols, rcols = list(l_schema.names), list(r_schema.names)
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    unified = [(n, t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t))
               for n, t in (list(zip(lcols, l_schema.types))
                            + list(zip(rcols, r_schema.types)))]

    def widen(t: pa.Table, side: int, buckets: np.ndarray,
              take: np.ndarray | None = None) -> pa.Table:
        if take is not None:
            t = t.take(pa.array(take, pa.int64()))
        cols = {}
        for name, typ in unified:
            cols[name] = (t.column(name) if name in t.column_names
                          else pa.nulls(t.num_rows, typ))
        cols["__side"] = pa.array(np.full(t.num_rows, side, np.int8), pa.int8())
        cols["__bucket"] = pa.array(buckets, pa.int64())
        return pa.table(cols)

    def tag_left(t: pa.Table) -> pa.Table:
        v = t.column(left_on).to_numpy()
        return widen(t, 0, np.floor(v / bucket_width).astype(np.int64))

    def tag_right(t: pa.Table) -> pa.Table:
        lo = t.column(right_lo).to_numpy()
        hi = t.column(right_hi).to_numpy()
        b0 = np.floor(lo / bucket_width).astype(np.int64)
        b1 = np.floor(hi / bucket_width).astype(np.int64)  # hi-edge bucket
        reps = np.maximum(b1 - b0 + 1, 1)
        row = np.repeat(np.arange(t.num_rows), reps)
        before = np.concatenate(([0], np.cumsum(reps)[:-1]))
        off = np.arange(int(reps.sum())) - np.repeat(before, reps)
        return widen(t, 1, b0[row] + off, take=row)

    both = (left.map_batches(tag_left, batch_format="pyarrow",
                             zero_copy_batch=True)
            .union(right.map_batches(tag_right, batch_format="pyarrow",
                                     zero_copy_batch=True)))

    def match(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        lt = g.filter(pc.equal(side, pa.scalar(0, pa.int8()))).select(lcols)
        rt = g.filter(pc.equal(side, pa.scalar(1, pa.int8()))).select(rcols)
        if lt.num_rows == 0 or rt.num_rows == 0:
            return pa.table({n: pa.nulls(0, t) for n, t in unified})
        v = lt.column(left_on).to_numpy()
        lo = rt.column(right_lo).to_numpy()
        hi = rt.column(right_hi).to_numpy()
        li, ri = np.nonzero((v[:, None] >= lo[None, :])
                            & (v[:, None] < hi[None, :]))
        out = lt.take(pa.array(li, pa.int64()))
        rsel = rt.take(pa.array(ri, pa.int64()))
        for c in rcols:
            out = out.append_column(c, rsel.column(c))
        return out

    return both.groupby("__bucket").map_groups(match, batch_format="pyarrow")
