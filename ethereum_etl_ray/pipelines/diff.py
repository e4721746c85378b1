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


def _read_keys(out_dir: str, entry) -> pd.DataFrame:
    if entry is None or entry.rows == 0:
        return pd.DataFrame({"url": pd.Series(dtype="object"),
                             "seq": pd.Series(dtype="int64")})
    t = pq.read_table(os.path.join(out_dir, entry.file), columns=["url", "seq"])
    return t.to_pandas()


def _diff_partition(a: pd.DataFrame, b: pd.DataFrame) -> pa.Table:
    m = a.merge(b, on="url", how="outer", suffixes=("_a", "_b"))
    added = m.seq_a.isna()
    deleted = m.seq_b.isna()
    updated = ~added & ~deleted & (m.seq_a != m.seq_b)
    keep = added | deleted | updated
    m = m[keep]
    change = pd.Series("updated", index=m.index, dtype="object")
    change[m.seq_a.isna()] = "added"
    change[m.seq_b.isna()] = "deleted"
    return pa.table({
        "url": pa.array(m.url, pa.string()),
        "change": pa.array(change, pa.string()),
        "seq_a": pa.array(m.seq_a, pa.int64()),
        "seq_b": pa.array(m.seq_b, pa.int64()),
    })


def lake_diff(out_dir: str, gen_a: int, gen_b: int) -> ray.data.Dataset:
    """Changed urls between retained generations ``gen_a`` → ``gen_b``.

    Returns a Dataset of (url, change, seq_a, seq_b); rows whose winning
    event is identical in both generations never appear (and their
    partitions are never even read when the lineage checksum matches).
    """
    ma = load_generation_manifest(out_dir, gen_a)
    mb = load_generation_manifest(out_dir, gen_b)

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
            return ray.data.from_arrow(DIFF_SCHEMA.empty_table())

        def diff_one(batch: pd.DataFrame) -> pa.Table:
            out = []
            for row in batch.itertuples():
                ea = ma.entry(row.part)
                eb = mb.entry(row.part)
                out.append(_diff_partition(_read_keys(out_dir, ea),
                                           _read_keys(out_dir, eb)))
            return pa.concat_tables(out) if out else DIFF_SCHEMA.empty_table()

        # one task per changed partition — co-partitioned sides, no shuffle
        return ray.data.from_pandas(pd.DataFrame(work)).repartition(len(work)) \
            .map_batches(diff_one, batch_format="pandas", batch_size=1)

    # partition counts differ (lake was re-partitioned between generations):
    # correctness fallback — key-hash co-group over both generations' files
    from ethereum_etl_ray.stages.joins import cogroup_join

    def side(m: Manifest, col: str) -> ray.data.Dataset:
        files = m.files(out_dir)
        if not files:
            return ray.data.from_arrow(pa.table({
                "url" if col == "seq_a" else "url_b": pa.array([], pa.string()),
                col: pa.array([], pa.int64())}))
        ds = ray.data.read_parquet(files, columns=["url", "seq"])
        if col == "seq_a":
            return ds.rename_columns({"seq": "seq_a"})
        return ds.rename_columns({"url": "url_b", "seq": "seq_b"})

    # full outer diff from one left join per direction, vectorized masks
    a, b = side(ma, "seq_a"), side(mb, "seq_b")

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
        })
        return out.filter(added)

    del_upd = cogroup_join(a, b, left_on="url", right_on="url_b", how="left") \
        .map_batches(from_a, batch_format="pyarrow", zero_copy_batch=True)
    added = cogroup_join(b, a, left_on="url_b", right_on="url", how="left") \
        .map_batches(from_b, batch_format="pyarrow", zero_copy_batch=True)
    return del_upd.union(added)
