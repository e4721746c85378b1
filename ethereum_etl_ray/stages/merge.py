"""Hash-partitioned last-writer-wins merge — the engine's core operator.

Re-expresses the reference's sink-side keyed upsert semantics natively:
  * ``INSERT OR REPLACE`` by primary key (``src/repositories/sqlite/base.py:159-172``)
    → ``mode="replace"``: per-key winner = max ``(warc_ts, seq)`` version;
  * ``INSERT OR IGNORE`` (same file) → ``mode="ignore"``: first-writer-wins
    (min version);
  * ClickHouse ``ReplacingMergeTree(updated_time)`` async LWW
    (``src/repositories/clickhouse/event.py:76-78``) → the same max-version
    pick, but deterministic and explicit (version is carried in the data —
    never wall-clock, which the reference's ``updated_time`` is).

Physical plan (SURVEY §7.3/§7.4):

  events ─ map_batches(lww_pick)        # pre-shuffle combiner: ≤1 row/key/batch
         ─ map_batches(add part col)    # part = hash64(url) % P, deterministic
         ─ groupby("part")              # the ONLY wide shuffle, on a small int key
         ─ map_groups(merge_apply)      # vectorized per-partition: union with the
                                        # committed partition file, LWW pick,
                                        # drop tombstones, extract text for
                                        # winners only, atomic file write
         → tiny summary Dataset (one row per partition) → manifest commit

The combiner bounds any key's post-shuffle row count by the number of input
batches, which is what makes Zipf-hot urls tractable; residual partition-level
skew is handled by ``stages.sketch`` hot-key pre-reduction (salting).

All per-batch logic is Arrow-vectorized — no Python row loops.
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ethereum_etl_ray.functions.hashing import content_checksum, partition_ids
from ethereum_etl_ray.functions.html import extract_text_array
from ethereum_etl_ray.schemas import PAGES_SCHEMA
from ethereum_etl_ray.stages.conform import conform_table
from ethereum_etl_ray.state.manifest import Manifest, atomic_write_table

VERSION_COLS = ("warc_ts", "seq")
PART_COL = "__part"

# unified in-flight merge frame: events ∪ committed lake rows
MERGE_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("seq", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("html", pa.binary()),
        pa.field("lang", pa.large_string()),
        pa.field("text", pa.string()),
        pa.field("fetch_status", pa.int32()),
    ]
)


def lww_pick(
    t: pa.Table,
    key: str = "url",
    version: Iterable[str] = VERSION_COLS,
    mode: str = "replace",
) -> pa.Table:
    """Vectorized winner-per-key selection within one Arrow table.

    ``replace``: keep the row with the max ``version`` tuple per key
    (ties — duplicate re-deliveries — collapse to one row).
    ``ignore``: keep the min-version row (first writer wins).
    Sort + run-boundary mask; O(n log n), no Python loop.

    Null keys form ONE group (SQL ``PARTITION BY`` semantics): the boundary
    mask is null-safe — ``pc.not_equal`` yields null when either neighbor is
    null, which must not silently drop the last non-null key's winner (keys
    ``['a', None, 'b']`` previously lost ``'b'``).
    """
    n = t.num_rows
    if n <= 1:
        return t
    order = "ascending" if mode == "replace" else "descending"
    t = t.sort_by([(key, "ascending"), *[(v, order) for v in version]])
    k = t.column(key).combine_chunks()
    if isinstance(k, pa.ChunkedArray):
        k = k.chunk(0) if k.num_chunks == 1 else k.combine_chunks().chunk(0)
    a, b = k.slice(0, n - 1), k.slice(1, n)
    # null-safe boundary: valid-vs-null flip is a boundary; null-vs-null is not
    # (sort_by places all null keys adjacent at the end, one group)
    neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(zero_copy_only=False)
    flip = np.not_equal(pc.is_valid(a).to_numpy(zero_copy_only=False),
                        pc.is_valid(b).to_numpy(zero_copy_only=False))
    mask = np.empty(n, dtype=bool)
    mask[: n - 1] = neq | flip
    mask[n - 1] = True
    return t.filter(pa.array(mask))


def make_combiner(key: str = "url", version: Iterable[str] = VERSION_COLS, mode: str = "replace"):
    """Pre-shuffle combiner for ``map_batches`` (partial aggregation before the
    wide groupby, per the guide's aggregation-at-scale pattern)."""

    def combine(batch: pa.Table) -> pa.Table:
        return lww_pick(batch, key=key, version=version, mode=mode)

    return combine


def make_partitioner(num_partitions: int, key: str = "url", part_col: str = PART_COL):
    def assign(batch: pa.Table) -> pa.Table:
        parts = partition_ids(batch.column(key), num_partitions)
        return batch.append_column(part_col, pa.array(parts, pa.int32()))

    return assign


def lww_merge_dataset(
    ds,
    key: str,
    version: tuple[str, ...],
    mode: str = "replace",
    num_partitions: int = 32,
):
    """Generic distributed keyed LWW/FWW merge over any Dataset.

    The reference's ``INSERT OR REPLACE`` / ``OR IGNORE`` upsert semantics
    (``src/repositories/sqlite/base.py:159-172``) as a reusable operator:
    per-batch combiner → hash partition on ``key`` → per-partition vectorized
    winner pick. Returns a Dataset with one row per key.
    """

    def combine(batch: pa.Table) -> pa.Table:
        return lww_pick(batch, key=key, version=version, mode=mode)

    def assign(batch: pa.Table) -> pa.Table:
        parts = partition_ids(batch.column(key), num_partitions)
        return batch.append_column(PART_COL, pa.array(parts, pa.int32()))

    def pick_group(group: pa.Table) -> pa.Table:
        return lww_pick(group.drop_columns([PART_COL]), key=key, version=version, mode=mode)

    return (
        ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(PART_COL)
        .map_groups(pick_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Explicit file-based bucket shuffle (north_rule: "partitioning / shuffle /
# skew handled explicitly"). Map tasks split each batch by partition id and
# spill lz4 Arrow-IPC files into per-partition directories; merge tasks then
# read exactly their bucket. Compared with the built-in sort shuffle this
# avoids staging the full payload in the object store (whose all-to-all
# memory reservation throttled upstream reads — see load_events docstring)
# and maps directly onto shared storage on a multi-node cluster.
# Task-retry safe: a re-executed spill task writes additional identical
# rows under fresh names, and the max-version merge collapses duplicates.
# ---------------------------------------------------------------------------


def make_spiller(shuffle_dir: str, num_partitions: int, key: str = "url"):
    """Spill stage: writes each batch's rows into per-partition bucket files
    and returns ONE SUMMARY ROW PER TOUCHED PARTITION ``(part, spilled_rows)``
    — the merge phase derives the populated-partition set from these task
    outputs (never from a driver-local listdir, which would silently miss
    buckets spilled on other nodes)."""

    def spill(batch: pa.Table) -> pa.Table:
        import uuid

        import pyarrow.ipc as ipc

        if batch.num_rows == 0:
            return pa.table({"part": pa.array([], pa.int32()),
                             "spilled_rows": pa.array([], pa.int64())})
        parts = partition_ids(batch.column(key), num_partitions)
        order = np.argsort(parts, kind="stable")
        tbl = batch.take(pa.array(order))
        sp = parts[order]
        bounds = np.flatnonzero(np.diff(sp)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(sp)]])
        opts = ipc.IpcWriteOptions(compression="lz4")
        tag = uuid.uuid4().hex[:12]
        for s, e in zip(starts, ends):
            part = int(sp[s])
            d = os.path.join(shuffle_dir, f"p{part:05d}")
            os.makedirs(d, exist_ok=True)
            piece = tbl.slice(s, e - s)
            tmp = os.path.join(d, f".{tag}-{s}.arrow.tmp")
            with ipc.new_file(tmp, piece.schema, options=opts) as w:
                w.write_table(piece)
            os.replace(tmp, os.path.join(d, f"{tag}-{s}.arrow"))
        return pa.table({
            "part": pa.array(sp[starts].astype(np.int32), pa.int32()),
            "spilled_rows": pa.array(ends - starts, pa.int64()),
        })

    return spill


def read_spilled_partition(shuffle_dir: str, part: int) -> pa.Table | None:
    import pyarrow.ipc as ipc

    d = os.path.join(shuffle_dir, f"p{part:05d}")
    if not os.path.isdir(d):
        return None
    tables = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".arrow"):
            with ipc.open_file(os.path.join(d, name)) as r:
                tables.append(r.read_all())
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="none")


SALT_COL = "__salt"


def salted_reduce(
    ds,
    key: str = "url",
    version: Iterable[str] = VERSION_COLS,
    mode: str = "replace",
    num_salts: int = 8,
    salt_source: str = "seq",
):
    """Two-stage reduction for HOT keys (SURVEY §7.4 salting).

    Stage 1 shuffles on ``(key, salt)`` with ``salt = salt_source % S`` so one
    hot key's rows spread over S reducers; stage 2 merges the ≤S winners per
    key — a tiny shuffle. Correct because max-version selection is
    associative. Apply only to detected heavy hitters; cold keys take the
    single-shuffle path.
    """

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = (batch.column(salt_source).to_numpy() % num_salts).astype(np.int32)
        return batch.append_column(SALT_COL, pa.array(salt, pa.int32()))

    def pick_drop_salt(group: pa.Table) -> pa.Table:
        return lww_pick(group.drop_columns([SALT_COL]), key=key, version=version, mode=mode)

    def pick(group: pa.Table) -> pa.Table:
        return lww_pick(group, key=key, version=version, mode=mode)

    stage1 = (
        ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, SALT_COL])
        .map_groups(pick_drop_salt, batch_format="pyarrow")
    )
    return stage1.groupby(key).map_groups(pick, batch_format="pyarrow")


def events_to_merge_frame(batch: pa.Table) -> pa.Table:
    """Conformed v2 events → MERGE_SCHEMA (adds null ``text``)."""
    cols = {
        "url": batch.column("url"),
        "warc_ts": batch.column("warc_ts"),
        "seq": batch.column("seq"),
        "op": batch.column("op"),
        "html": batch.column("html"),
        "lang": pc.cast(batch.column("lang"), pa.large_string()),
        "text": pa.nulls(batch.num_rows, pa.string()),
        "fetch_status": (
            pc.cast(batch.column("fetch_status"), pa.int32())
            if "fetch_status" in batch.column_names
            else pa.nulls(batch.num_rows, pa.int32())
        ),
    }
    return pa.table(cols, schema=MERGE_SCHEMA)


def pages_to_merge_frame(t: pa.Table) -> pa.Table:
    """Committed lake rows → MERGE_SCHEMA (op='insert', text kept)."""
    return pa.table(
        {
            "url": t.column("url"),
            "warc_ts": t.column("warc_ts"),
            "seq": t.column("seq"),
            "op": pa.array(np.full(t.num_rows, "insert"), pa.string()),
            "html": t.column("html"),
            "lang": t.column("lang"),
            "text": t.column("text"),
            "fetch_status": t.column("fetch_status"),
        },
        schema=MERGE_SCHEMA,
    )


def finalize_winners(t: pa.Table) -> pa.Table:
    """Post-merge: drop tombstones, extract text for rows that still need it,
    emit PAGES_SCHEMA sorted by url (deterministic file contents)."""
    t = t.filter(pc.not_equal(t.column("op"), pa.scalar("delete")))
    need = pc.and_(pc.is_null(t.column("text")), pc.is_valid(t.column("html")))
    # vectorized: extract over the subset needing it, then scatter back
    if pc.any(need).as_py():
        idx = pc.indices_nonzero(need)
        extracted = extract_text_array(pc.take(t.column("html"), idx))
        text_np = t.column("text").combine_chunks().to_numpy(zero_copy_only=False).astype(object)
        if isinstance(extracted, pa.ChunkedArray):
            extracted = extracted.combine_chunks()
        text_np[idx.to_numpy()] = extracted.to_numpy(zero_copy_only=False)
        text = pa.array(text_np, pa.string())
    else:
        text = t.column("text")
    out = pa.table(
        {
            "url": t.column("url"),
            "warc_ts": t.column("warc_ts"),
            "html": t.column("html"),
            "text": text,
            "lang": t.column("lang"),
            "seq": t.column("seq"),
            "fetch_status": t.column("fetch_status"),
        },
        schema=PAGES_SCHEMA,
    )
    return out.sort_by([("url", "ascending")])


SUMMARY_SCHEMA = pa.schema(
    [
        pa.field("part", pa.int32()),
        pa.field("rows", pa.int64()),
        pa.field("checksum", pa.string()),
        pa.field("file", pa.string()),
        pa.field("watermark", pa.int64()),
    ]
)


def make_merge_apply(
    out_dir: str,
    watermark: int,
    prior: Manifest | None,
    mode: str = "replace",
    part_col: str = PART_COL,
):
    """Factory for the per-partition ``map_groups`` merge-apply function.

    Reads the partition's committed file (if any), unions with the incoming
    (already combined) events, picks winners, extracts text, writes the new
    partition file atomically, and returns a one-row summary. The heavy data
    never returns to the driver — only the summary does.
    """
    prior_parts = {int(k): v for k, v in (prior.partitions if prior else {}).items()}

    def merge_apply(group: pa.Table) -> pa.Table:
        part = int(group.column(part_col)[0].as_py())
        incoming = group.drop_columns([part_col])
        return _merge_one_partition(part, [incoming], out_dir, watermark,
                                    prior_parts, mode)

    return merge_apply


def _merge_one_partition(part: int, frames: list, out_dir: str, watermark: int,
                         prior_parts: dict, mode: str) -> pa.Table:
    import pyarrow.parquet as pq

    entry = prior_parts.get(part)
    if entry is not None and entry.rows > 0:
        committed = pq.read_table(os.path.join(out_dir, entry.file))
        frames = [*frames, pages_to_merge_frame(committed)]
    merged = frames[0] if len(frames) == 1 else pa.concat_tables(
        frames, promote_options="none")
    winners = lww_pick(merged, mode=mode)
    pages = finalize_winners(winners)
    rel = os.path.join(f"part={part:05d}", f"data-{watermark}.parquet")
    atomic_write_table(pages, os.path.join(out_dir, rel))
    checksum = content_checksum(pages.column("url"), pages.column("text"),
                                pages.column("seq"))
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "rows": pa.array([pages.num_rows], pa.int64()),
            "checksum": pa.array([str(checksum)], pa.string()),
            "file": pa.array([rel], pa.string()),
            "watermark": pa.array([watermark], pa.int64()),
        },
        schema=SUMMARY_SCHEMA,
    )


def make_spill_merge_apply(
    shuffle_dir: str,
    out_dir: str,
    watermark: int,
    prior: Manifest | None,
    mode: str = "replace",
):
    """Merge-apply fed by the file-bucket shuffle: each task reads exactly its
    partition's spilled IPC files (plus the committed partition file) and
    produces the same summary rows as the sort-shuffle route."""
    prior_parts = {int(k): v for k, v in (prior.partitions if prior else {}).items()}

    def merge_from_spill(batch: pa.Table) -> pa.Table:
        out = []
        for part in batch.column("part").to_pylist():
            incoming = read_spilled_partition(shuffle_dir, int(part))
            frames = [incoming if incoming is not None else MERGE_SCHEMA.empty_table()]
            out.append(_merge_one_partition(int(part), frames, out_dir, watermark,
                                            prior_parts, mode))
        return pa.concat_tables(out, promote_options="none")

    return merge_from_spill
