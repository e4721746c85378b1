"""Lake generation diff: what changed between two committed checkpoints.

The downstream-consumer half of CDC: after the engine applies a change-log
window, an incremental consumer (index refresh, cache invalidation, a
training-set delta) wants exactly the rows that changed between checkpoint
generations A and B — without re-reading the whole lake. The reference's
analogue is its backup-table comparison flow
(``src/repositories/sqlite/base.py:81-136`` keeps timestamped copies; users
diff them with ad-hoc SQL); here the diff is a first-class distributed
operator over the manifest's per-partition lineage.

Scale design (this is why the diff is cheap):

  * both generations were written by the same url-hash partitioner, so
    partition ``p`` of A and partition ``p`` of B cover the same key range —
    the diff is embarrassingly parallel per partition, NO shuffle;
  * the manifest records a content checksum per partition file, so
    partitions whose (file, checksum) match are skipped WITHOUT READING —
    an incremental replay typically touches a fraction of partitions, and
    only those are opened;
  * each task reads just (url, seq) — never html/text — and emits only
    changed rows.

Falls back to a key-hash co-group join when the two generations used
different partition counts (re-partitioned lake) — correctness first, the
fast path is the common case.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ethereum_etl_ray.state.manifest import Manifest, _gen_path, _load_manifest_file

DIFF_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("change", pa.string()),      # 'added' | 'deleted' | 'updated'
    ("seq_a", pa.int64()),        # null for 'added'
    ("seq_b", pa.int64()),        # null for 'deleted'
])


def load_generation_manifest(out_dir: str, generation: int) -> Manifest:
    m = _load_manifest_file(_gen_path(out_dir, generation))
    if m is None:
        raise FileNotFoundError(
            f"generation {generation} is not retained in {out_dir}")
    return m


def _read_keys(out_dir: str, entry, value_cols: list[str]) -> pd.DataFrame:
    cols = ["url", "seq", *value_cols]
    if entry is None or entry.rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64" if c == "seq" else "object")
                             for c in cols})
    t = pq.read_table(os.path.join(out_dir, entry.file), columns=cols)
    return t.to_pandas()


def _diff_partition(a: pd.DataFrame, b: pd.DataFrame,
                    value_cols: list[str]) -> pa.Table:
    m = a.merge(b, on="url", how="outer", suffixes=("_a", "_b"))
    added = m.seq_a.isna()
    deleted = m.seq_b.isna()
    updated = ~added & ~deleted & (m.seq_a != m.seq_b)
    keep = added | deleted | updated
    m = m[keep]
    change = pd.Series("updated", index=m.index, dtype="object")
    change[m.seq_a.isna()] = "added"
    change[m.seq_b.isna()] = "deleted"
    out = {
        "url": pa.array(m.url, pa.string()),
        "change": pa.array(change, pa.string()),
        "seq_a": pa.array(m.seq_a, pa.int64()),
        "seq_b": pa.array(m.seq_b, pa.int64()),
    }
    for c in value_cols:
        out[f"{c}_a"] = pa.array(m[f"{c}_a"], pa.string())
        out[f"{c}_b"] = pa.array(m[f"{c}_b"], pa.string())
    return pa.table(out)


def _diff_schema(value_cols: list[str]) -> pa.Schema:
    fields = list(DIFF_SCHEMA)
    for c in value_cols:
        fields += [pa.field(f"{c}_a", pa.string()), pa.field(f"{c}_b", pa.string())]
    return pa.schema(fields)


def lake_diff(out_dir: str, gen_a: int, gen_b: int,
              value_cols: list[str] | None = None) -> ray.data.Dataset:
    """Changed urls between retained generations ``gen_a`` → ``gen_b``.

    Returns a Dataset of (url, change, seq_a, seq_b); rows whose winning
    event is identical in both generations never appear (and their
    partitions are never even read when the lineage checksum matches).
    ``value_cols`` (string lake columns, e.g. ``["lang"]``) are carried
    through as ``<col>_a`` / ``<col>_b`` — the inputs incremental view
    maintenance needs (see ``maintain_counts``).
    """
    value_cols = list(value_cols or [])
    ma = load_generation_manifest(out_dir, gen_a)
    mb = load_generation_manifest(out_dir, gen_b)
    from ethereum_etl_ray.pipelines.mor import require_no_deltas

    # the per-partition key readers below consume BASE files only — a
    # generation with pending merge-on-read deltas would diff stale state
    require_no_deltas(ma, f"lake_diff (generation {gen_a})")
    require_no_deltas(mb, f"lake_diff (generation {gen_b})")

    if ma.num_partitions == mb.num_partitions:
        parts = sorted(set(ma.partitions) | set(mb.partitions), key=int)
        work = []
        skipped = 0
        for p in parts:
            ea, eb = ma.entry(int(p)), mb.entry(int(p))
            if ea is not None and eb is not None and ea.checksum == eb.checksum \
                    and ea.rows == eb.rows:
                skipped += 1  # lineage says byte-identical content — no read
                continue
            work.append({"part": int(p)})
        if not work:
            return ray.data.from_arrow(_diff_schema(value_cols).empty_table())

        def diff_one(batch: pd.DataFrame) -> pa.Table:
            out = []
            for row in batch.itertuples():
                ea = ma.entry(row.part)
                eb = mb.entry(row.part)
                out.append(_diff_partition(_read_keys(out_dir, ea, value_cols),
                                           _read_keys(out_dir, eb, value_cols),
                                           value_cols))
            return (pa.concat_tables(out) if out
                    else _diff_schema(value_cols).empty_table())

        # one task per changed partition — co-partitioned sides, no shuffle
        return ray.data.from_pandas(pd.DataFrame(work)).repartition(len(work)) \
            .map_batches(diff_one, batch_format="pandas", batch_size=1)

    # partition counts differ (lake was re-partitioned between generations):
    # correctness fallback — key-hash co-group over both generations' files
    from ethereum_etl_ray.stages.joins import cogroup_join

    def side(m: Manifest, suffix: str) -> ray.data.Dataset:
        rename = {"seq": f"seq{suffix}"}
        rename.update({c: f"{c}{suffix}" for c in value_cols})
        if suffix == "_b":
            rename["url"] = "url_b"
        files = m.files(out_dir)
        if not files:
            cols = {("url_b" if suffix == "_b" else "url"): pa.array([], pa.string()),
                    f"seq{suffix}": pa.array([], pa.int64())}
            cols.update({f"{c}{suffix}": pa.array([], pa.string())
                         for c in value_cols})
            return ray.data.from_arrow(pa.table(cols))
        ds = ray.data.read_parquet(files, columns=["url", "seq", *value_cols])
        return ds.rename_columns(rename)

    # full outer diff from one left join per direction, vectorized masks
    a, b = side(ma, "_a"), side(mb, "_b")

    def _vals(t: pa.Table, n: int, present: str) -> dict:
        out = {}
        for c in value_cols:
            for s in ("_a", "_b"):
                name = f"{c}{s}"
                out[name] = (pc.cast(t.column(name), pa.string())
                             if s in present else pa.nulls(n, pa.string()))
        return out

    def from_a(t: pa.Table) -> pa.Table:
        # rows present in A: 'deleted' if absent in B, 'updated' if seq moved
        seq_a = pc.cast(t.column("seq_a"), pa.int64())
        seq_b = pc.cast(t.column("seq_b"), pa.int64())
        deleted = pc.is_null(seq_b)
        updated = pc.and_kleene(pc.invert(deleted), pc.not_equal(seq_a, seq_b))
        keep = pc.or_kleene(deleted, pc.fill_null(updated, False))
        out = pa.table({
            "url": t.column("url"),
            "change": pc.if_else(deleted, pa.scalar("deleted"),
                                 pa.scalar("updated")),
            "seq_a": seq_a, "seq_b": seq_b,
            **_vals(t, t.num_rows, "_a_b"),
        })
        return out.filter(keep)

    def from_b(t: pa.Table) -> pa.Table:
        # rows present in B but not A: 'added'
        added = pc.is_null(pc.cast(t.column("seq_a"), pa.int64()))
        out = pa.table({
            "url": t.column("url_b"),
            "change": pa.array(["added"] * t.num_rows, pa.string()),
            "seq_a": pa.nulls(t.num_rows, pa.int64()),
            "seq_b": pc.cast(t.column("seq_b"), pa.int64()),
            **_vals(t, t.num_rows, "_b"),
        })
        return out.filter(added)

    del_upd = cogroup_join(a, b, left_on="url", right_on="url_b", how="left") \
        .map_batches(from_a, batch_format="pyarrow", zero_copy_batch=True)
    added = cogroup_join(b, a, left_on="url_b", right_on="url", how="left") \
        .map_batches(from_b, batch_format="pyarrow", zero_copy_batch=True)
    return del_upd.union(added)


def maintain_counts(prev: pa.Table, diff: ray.data.Dataset,
                    group_col: str) -> ray.data.Dataset:
    """Incremental view maintenance of ``SELECT group_col, count(*)``:
    apply a generation diff's deltas to the previous materialized counts
    instead of rescanning the lake.

    Deltas per diff row: ``deleted``/``updated`` decrement ``<col>_a``'s
    group, ``added``/``updated`` increment ``<col>_b``'s — computed
    vectorized per batch, pre-aggregated inside the batch (combiner), then
    one tiny groupby over (groups) rows. ``prev`` is the small materialized
    aggregate (one row per group), entering via ``from_arrow`` — never the
    lake. Groups whose net count reaches zero are dropped, matching a fresh
    aggregate. The equivalence oracle (tests/test_diff.py) recomputes the
    full aggregate at generation B."""
    from ray.data.aggregate import Sum

    def deltas(t: pa.Table) -> pa.Table:
        change = t.column("change")
        dec = pc.is_in(change, value_set=pa.array(["deleted", "updated"]))
        inc = pc.is_in(change, value_set=pa.array(["added", "updated"]))
        ga = t.filter(dec).column(f"{group_col}_a")
        gb = t.filter(inc).column(f"{group_col}_b")
        keys, ns = [], []
        for col, sign in ((ga, -1), (gb, 1)):
            if len(col) == 0:
                continue
            vc = pc.value_counts(pc.cast(col, pa.string()))
            keys.append(vc.field("values"))
            ns.append(pc.multiply(pc.cast(vc.field("counts"), pa.int64()),
                                  pa.scalar(sign, pa.int64())))
        if not keys:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({group_col: pa.concat_arrays([pc.cast(k, pa.string())
                                                      for k in keys]),
                         "n": pa.concat_arrays(ns)})

    prev_tbl = pa.table({group_col: pc.cast(prev.column(group_col), pa.string()),
                         "n": pc.cast(prev.column("n"), pa.int64())})
    delta_ds = diff.map_batches(deltas, batch_format="pyarrow",
                                zero_copy_batch=True)
    merged = ray.data.from_arrow(prev_tbl).union(delta_ds) \
        .groupby(group_col).aggregate(Sum("n", alias_name="n"))
    return merged.filter(expr="n != 0")
