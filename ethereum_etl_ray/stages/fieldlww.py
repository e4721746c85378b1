"""Field-level LWW merge (column-wise survivorship for partial updates).

The engine's core merge is row-LWW (``stages/merge.py`` — the reference's
``INSERT OR REPLACE``, ``src/repositories/sqlite/base.py:159-172``). Real
CDC streams also carry PARTIAL updates: an event sets some columns and
leaves the rest null. Row-LWW would clobber previously-set columns with
nulls; field-LWW keeps, per key and per column, the value from the
max-version event in which that column was non-null (the "golden record"
fusion rule), while the key's version columns report the globally latest
event.

Shape mirrors ``lww_merge_dataset``: a per-batch vectorized combiner
(closed under composition — candidates carry per-field version columns so
re-reduction is exact), hash partition on the key, one per-partition pick.
No Python loop over rows anywhere: winners are lexsort + run-boundary
selections per field.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ethereum_etl_ray.functions.hashing import partition_ids

_PART = "__flww_part"


def _vcol(field: str, i: int) -> str:
    return f"__{field}__v{i}"


def _last_per_key(codes: np.ndarray, vers: list[np.ndarray]):
    """argmax of the version tuple per key code; returns (key codes sorted
    unique, source row index per key)."""
    order = np.lexsort(tuple(reversed(vers)) + (codes,))
    ks = codes[order]
    last = np.concatenate([np.flatnonzero(ks[1:] != ks[:-1]), [len(ks) - 1]])
    return ks[last], order[last]


def field_lww_pick(t: pa.Table, *, key: str, version: tuple[str, ...],
                   fields: tuple[str, ...]) -> pa.Table:
    """One output row per key within one table. Accepts both raw event
    tables and its own combined output (presence of ``__f__vN`` columns
    switches a field's version source), so combiner → final is exact."""
    if t.num_rows == 0:
        # emit the COMBINED schema so zero-row batches union cleanly
        cols: dict[str, pa.Array] = {key: t.column(key).combine_chunks()}
        for v in version:
            cols[v] = t.column(v).combine_chunks()
        for f in fields:
            cols[f] = t.column(f).combine_chunks()
            for i in range(len(version)):
                cols[_vcol(f, i)] = pa.array([], pa.int64())
        return pa.table(cols)
    kcol = t.column(key)
    codes, uniq = pd.factorize(kcol.to_pandas(), sort=True)
    if (codes < 0).any():
        raise ValueError(f"field_lww_pick: null {key!r} keys unsupported")
    row_vers = [t.column(v).cast(pa.int64()).to_numpy(zero_copy_only=False)
                for v in version]

    ku, idx = _last_per_key(codes, row_vers)
    n_keys = len(ku)
    out: dict[str, pa.Array] = {
        key: pa.array(pd.Series(uniq[ku])),
    }
    for v in version:
        out[v] = t.column(v).take(pa.array(idx, pa.int64())).combine_chunks()

    for f in fields:
        fv_names = [_vcol(f, i) for i in range(len(version))]
        combined = all(n in t.column_names for n in fv_names)
        fvers = ([t.column(n).to_numpy(zero_copy_only=False)
                  for n in fv_names] if combined else row_vers)
        valid = pc.is_valid(t.column(f)).to_numpy(zero_copy_only=False)
        sub = np.flatnonzero(valid)
        fcol_vals = [pa.nulls(n_keys, t.schema.field(f).type)]
        fver_vals = [[pa.nulls(n_keys, pa.int64())] for _ in version]
        if sub.size:
            fv_sub = [np.asarray(v[sub], np.int64) for v in fvers]
            kf, idxf = _last_per_key(codes[sub], fv_sub)
            pos = np.searchsorted(ku, kf)
            take = np.full(n_keys, -1, np.int64)
            take[pos] = sub[idxf]
            mask = take >= 0
            src = t.column(f).take(pa.array(np.where(mask, take, 0),
                                            pa.int64())).combine_chunks()
            fcol_vals = [pc.if_else(pa.array(mask), src,
                                    pa.nulls(n_keys, t.schema.field(f).type))]
            fver_vals = []
            for v in fvers:
                # gather BEFORE casting: the combined form carries NaN at
                # null per-field versions, and int-casting a NaN-bearing
                # float array is an undefined cast (RuntimeWarning per
                # batch — ADVICE r4). Gathered masked-out slots are dummy
                # row 0 and get nulled by if_else below either way.
                sel = np.asarray(v)[np.where(mask, take, 0)]
                if sel.dtype.kind == "f":
                    sel = np.nan_to_num(sel, nan=0.0)
                vv = sel.astype(np.int64)
                fver_vals.append([pc.if_else(pa.array(mask),
                                             pa.array(vv, pa.int64()),
                                             pa.nulls(n_keys, pa.int64()))])
        out[f] = fcol_vals[0]
        for name, vals in zip(fv_names, fver_vals):
            out[name] = vals[0]
    return pa.table(out)


def field_lww_merge(ds: ray.data.Dataset, *, key: str,
                    version: tuple[str, ...], fields: tuple[str, ...],
                    num_partitions: int = 32,
                    keep_field_versions: bool = False) -> ray.data.Dataset:
    """Distributed field-LWW: combiner → hash partition → exact pick."""

    def combine(batch: pa.Table) -> pa.Table:
        return field_lww_pick(batch, key=key, version=version, fields=fields)

    def assign(batch: pa.Table) -> pa.Table:
        parts = partition_ids(batch.column(key), num_partitions)
        return batch.append_column(_PART, pa.array(parts, pa.int32()))

    def pick_group(group: pa.Table) -> pa.Table:
        out = field_lww_pick(group.drop_columns([_PART]), key=key,
                             version=version, fields=fields)
        if not keep_field_versions:
            out = out.drop_columns(
                [_vcol(f, i) for f in fields for i in range(len(version))])
        return out

    return (ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(_PART)
            .map_groups(pick_group, batch_format="pyarrow"))


def sequential_field_lww_oracle(df: pd.DataFrame, *, key: str,
                                version: tuple[str, ...],
                                fields: tuple[str, ...]) -> pd.DataFrame:
    """Single-process reference: literal per-column survivorship."""
    df = df.sort_values([key, *version], kind="stable")
    base = df.groupby(key, sort=True).tail(1).set_index(key)
    out = base[list(version)].copy()
    for f in fields:
        last = df[df[f].notna()].groupby(key, sort=True).tail(1).set_index(key)
        out[f] = last[f].reindex(out.index)
    return out.reset_index()
