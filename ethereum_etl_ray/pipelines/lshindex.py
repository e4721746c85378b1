"""Persisted MinHash-LSH index for INCREMENTAL near-dedup (CDC × dedup).

A 100 TB corpus cannot be re-shingled and re-shuffled every time a CDC
increment arrives, yet every arriving document must be checked against
everything already ingested.  This module persists the corpus side of the
LSH computation once and lets each increment be verified against it while
reading only the index partitions the increment actually touches:

  build_lsh_index   one pass over the corpus text → per-doc MinHash
                    signature (packed fixed-size binary) + per-band bucket
                    keys; written as TWO hash-partitioned parquet tables
                    under ``index_dir``:
                      sigs/sig_shard=S/   (doc, sig, bk)   S = hash(doc) % shards
                      bands/shard=S/      (bk, doc)        S = bk % shards
  append_lsh_index  same pass over NEW docs, appended into the same shard
                    layout (parquet file names are unique per write, so an
                    append never rewrites existing data)
  query_lsh_index   one pass over the increment → its own bands + sigs,
                    then: read ONLY the band shards the increment's bucket
                    keys land in → join on bucket key → candidate
                    (increment, corpus) pairs → fetch the candidates'
                    corpus signatures from their sig shards → estimated
                    Jaccard from signature agreement (E[match fraction] = J
                    for MinHash) → pairs ≥ threshold.

Scale notes (the partitioning assumptions, per the engine's convention):
  * nothing ever re-reads the corpus TEXT — the index stores only
    ``num_perm × 8`` bytes of signature and ``bands × 8`` bytes of bucket
    keys per document (~0.1% of a webtext corpus);
  * an increment of m docs touches ≤ min(shards, m × bands) band shards and
    ≤ min(shards, candidates) sig shards; small increments prune hard,
    corpus-sized ones degrade to a full (still index-only) scan;
  * the candidate fetch prunes the sig read by shard when the distinct
    candidate-id count fits a broadcast (``candidate_broadcast_threshold``),
    else it falls back to joining against all sig shards — index-sized, not
    corpus-sized, so the fallback is safe;
  * verification is signature-estimated Jaccard (no corpus text lookup).
    For exact verification feed the output pairs to
    ``dedup.verify_jaccard_pairs_ds`` with a corpus text dataset.

The reference has no incremental anything — its dedup is ``list(set(...))``
per response batch (src/tasks/extract/account.py:7-27); this is the
CDC-tier generalization the north_rule's ingest loop needs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ethereum_etl_ray.functions.dedup import (
    lsh_band_hashes,
    minhash_signatures,
    tokenize_column,
    word_ngram_hashes,
)
from ethereum_etl_ray.functions.hashing import hash64, partition_ids

# bucket keys fold the band index into the band hash so identical signature
# rows in DIFFERENT bands cannot cross-match at the join (the per-band
# multiply is bijective mod 2^64; xor of band+1 separates bands)
_BK_MULT = np.uint64(0x9E3779B97F4A7C15)


def _pack_sigs(sigs: np.ndarray) -> pa.Array:
    """(n, num_perm) uint64 → fixed_size_binary(num_perm*8), little-endian."""
    n, num_perm = sigs.shape
    buf = pa.py_buffer(np.ascontiguousarray(sigs.astype("<u8")).tobytes())
    return pa.Array.from_buffers(pa.binary(num_perm * 8), n, [None, buf])


def _unpack_sigs(col: pa.ChunkedArray | pa.Array, num_perm: int) -> np.ndarray:
    """fixed_size_binary column → (n, num_perm) uint64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    row_bytes = num_perm * 8
    if pa.types.is_fixed_size_binary(col.type):
        buf = col.buffers()[-1]
        flat = np.frombuffer(buf, dtype="<u8",
                             count=len(col) * num_perm,
                             offset=col.offset * row_bytes)
        return flat.reshape(len(col), num_perm)
    # a pandas-block hop (cogroup_join's per-group merge) degrades fixed to
    # variable-width binary; every row is still row_bytes long, so the data
    # buffer is one contiguous matrix — one frombuffer, no per-row loop
    off_dt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dt,
                         count=len(col) + 1,
                         offset=col.offset * np.dtype(off_dt).itemsize)
    if len(col) and not (offs[-1] - offs[0] == len(col) * row_bytes):
        raise ValueError("ragged signature column")  # corrupt input
    flat = np.frombuffer(col.buffers()[2], dtype="<u8",
                         count=len(col) * num_perm, offset=int(offs[0]))
    return flat.reshape(len(col), num_perm)


def _doc_stage(num_perm: int, bands: int, ngram: int, id_col: str,
               text_col: str, shards: int):
    """Batch fn: text → one compact row per doc
    (doc, sig fixed_binary, bk fixed_size_list<int64>[bands], sig_shard)."""

    def stage(batch: pa.Table) -> pa.Table:
        tok_h, lens = tokenize_column(batch.column(text_col))
        sh, counts = word_ngram_hashes(tok_h, lens, n=ngram)
        sigs = minhash_signatures(sh, counts, num_perm=num_perm)
        bh = lsh_band_hashes(sigs, bands=bands)  # (n, bands) uint64
        bk = (bh * _BK_MULT) ^ (np.arange(1, bands + 1, dtype=np.uint64))
        # ids keep their native type (integers normalized to int64, strings
        # pass through — hash64 handles both); sharding only needs the hash
        doc = batch.column(id_col)
        if pa.types.is_integer(doc.type):
            doc = pc.cast(doc, pa.int64())
        sig_shard = partition_ids(doc, shards)
        return pa.table({
            "doc": doc,
            "sig": _pack_sigs(sigs),
            "bk": pa.FixedSizeListArray.from_arrays(
                pa.array(bk.ravel().view(np.int64), pa.int64()), bands),
            "sig_shard": pa.array(sig_shard, pa.int32()),
        })

    return stage


def _explode_bk(t: pa.Table, *, shards: int, doc_out: str = "doc") -> pa.Table:
    """(doc, bk list) rows → flat (bk, doc, shard) band rows."""
    bk_col = t.column("bk").combine_chunks()
    flat = pc.list_flatten(bk_col).to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(bk_col)
    doc = t.column("doc").take(parents)
    shard = (flat.view(np.uint64) % np.uint64(shards)).astype(np.int32)
    return pa.table({
        "bk": pa.array(flat, pa.int64()),
        doc_out: doc,
        "shard": pa.array(shard, pa.int32()),
    })


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "lsh_meta.json")


def _load_meta(index_dir: str) -> dict:
    with open(_meta_path(index_dir)) as f:
        return json.load(f)


def _sig_files(index_dir: str) -> set[str]:
    """Sig parquet files as index-relative paths (ledger keys)."""
    import glob as _glob

    return {os.path.relpath(f, index_dir) for f in
            _glob.glob(os.path.join(index_dir, "sigs", "*=*", "*.parquet"))}


def _ledger_path(index_dir: str) -> str:
    return os.path.join(index_dir, "bands_ledger.json")


def _load_ledger(index_dir: str) -> set[str]:
    p = _ledger_path(index_dir)
    if not os.path.isfile(p):
        return set()
    with open(p) as f:
        return set(json.load(f))


def _derive_pending_bands(index_dir: str, meta: dict) -> int:
    """Explode band rows for every sig file NOT yet in the band ledger, then
    commit the ledger (atomic rewrite). This is the ONLY band writer:
    appends stay increment-sized, and a crash between a sigs write and the
    band derivation is self-healing — the orphaned files are simply still
    pending on the next call. A crash between the band write and the ledger
    commit re-explodes those files next time, producing duplicate band rows,
    which are harmless (candidates are made distinct before verification).
    Returns the number of files processed."""
    pending = sorted(_sig_files(index_dir) - _load_ledger(index_dir))
    if not pending:
        return 0
    band_dir = os.path.join(index_dir, "bands")
    os.makedirs(band_dir, exist_ok=True)
    (ray.data.read_parquet([os.path.join(index_dir, f) for f in pending],
                           columns=["doc", "bk"])
        .map_batches(lambda t: _explode_bk(t, shards=meta["shards"]),
                     batch_format="pyarrow", zero_copy_batch=True)
        .write_parquet(band_dir, partition_cols=["shard"]))
    done = sorted(_load_ledger(index_dir) | set(pending))
    tmp = _ledger_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(done, f)
    os.replace(tmp, _ledger_path(index_dir))
    return len(pending)


def _write_doc_tables(docs: ray.data.Dataset, index_dir: str, meta: dict,
                      id_col: str, text_col: str) -> None:
    """One text pass → sigs table on disk (fully streaming, no object-store
    materialization of the corpus-sized intermediate); band rows are then
    derived for all ledger-pending sig files — increment-sized for appends,
    never O(corpus), and self-healing after crashes (see
    ``_derive_pending_bands``)."""
    stage = _doc_stage(meta["num_perm"], meta["bands"], meta["ngram"],
                       id_col, text_col, meta["shards"])
    sig_dir = os.path.join(index_dir, "sigs")
    os.makedirs(sig_dir, exist_ok=True)
    (docs.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
         .write_parquet(sig_dir, partition_cols=["sig_shard"]))
    _derive_pending_bands(index_dir, meta)


def build_lsh_index(docs: ray.data.Dataset, index_dir: str, *,
                    id_col: str = "doc_id", text_col: str = "text",
                    num_perm: int = 64, bands: int = 16, ngram: int = 3,
                    shards: int = 32) -> dict:
    """Build + persist the corpus LSH index. ``id_col`` must be integer and
    unique. Returns the meta dict (also persisted as ``lsh_meta.json``)."""
    if num_perm % bands != 0:
        raise ValueError(f"num_perm={num_perm} not divisible by bands={bands}")
    meta = {"num_perm": int(num_perm), "bands": int(bands),
            "ngram": int(ngram), "shards": int(shards),
            "id_col": id_col, "text_col": text_col}
    os.makedirs(index_dir, exist_ok=True)
    _write_doc_tables(docs, index_dir, meta, id_col, text_col)
    with open(_meta_path(index_dir), "w") as f:
        json.dump(meta, f)
    return meta


def init_lsh_index(index_dir: str, *, id_col: str = "doc_id",
                   text_col: str = "text", num_perm: int = 64,
                   bands: int = 16, ngram: int = 3, shards: int = 32) -> dict:
    """Create an EMPTY index (meta + shard roots) for pure-incremental use —
    e.g. a CDC tailer that appends every ingest window and queries each
    window against everything before it. Idempotent: re-init with the same
    params returns the existing meta; different params raise."""
    if os.path.isfile(_meta_path(index_dir)):
        meta = _load_meta(index_dir)
        want = {"num_perm": int(num_perm), "bands": int(bands),
                "ngram": int(ngram), "shards": int(shards),
                "id_col": id_col, "text_col": text_col}
        if meta != want:
            raise ValueError(f"index exists with different params: {meta}")
        return meta
    if num_perm % bands != 0:
        raise ValueError(f"num_perm={num_perm} not divisible by bands={bands}")
    meta = {"num_perm": int(num_perm), "bands": int(bands),
            "ngram": int(ngram), "shards": int(shards),
            "id_col": id_col, "text_col": text_col}
    os.makedirs(os.path.join(index_dir, "sigs"), exist_ok=True)
    os.makedirs(os.path.join(index_dir, "bands"), exist_ok=True)
    with open(_meta_path(index_dir), "w") as f:
        json.dump(meta, f)
    return meta


def _write_staged(staged: ray.data.Dataset, index_dir: str,
                  meta: dict) -> None:
    """Write an already-staged signature table into the index: sigs first,
    then bands for whatever the ledger says is pending (uniform, crash
    self-healing — same path as build/append)."""
    sig_dir = os.path.join(index_dir, "sigs")
    os.makedirs(sig_dir, exist_ok=True)
    staged.write_parquet(sig_dir, partition_cols=["sig_shard"])
    _derive_pending_bands(index_dir, meta)


def stage_increment(index_dir: str, increment: ray.data.Dataset, *,
                    id_col: str | None = None,
                    text_col: str | None = None) -> ray.data.Dataset:
    """Stage a CDC increment ONCE (shingle/MinHash each doc a single time);
    the result feeds ``query_lsh_index(..., _staged=...)`` and
    ``append_staged`` so a check-then-append ingest step does one pass.
    Runs index recovery, so the staged query may skip it."""
    meta = _load_meta(index_dir)
    _recover_index(index_dir)
    return _stage_increment(increment, meta, id_col, text_col)


def append_staged(index_dir: str, staged: ray.data.Dataset) -> int:
    """Append a staged signature table into the index; returns the number
    of docs appended. Call AFTER the staged query and after persisting any
    pre-append artifacts (the tailer writes its pairs file first, so a
    crash here never contaminates the artifact with intra-window echoes)."""
    meta = _load_meta(index_dir)
    n = staged.count()
    if n:
        _write_staged(staged, index_dir, meta)
    return int(n)


def check_and_append(index_dir: str, increment: ray.data.Dataset, *,
                     threshold: float = 0.7, id_col: str | None = None,
                     text_col: str | None = None,
                     candidate_broadcast_threshold: int = 2_000_000,
                     ) -> tuple[ray.data.Dataset, int]:
    """Convenience fusion of stage → query → append (each doc is
    shingled/MinHashed once, not twice as separate query+append calls
    would). Pairs are materialized before the append so the increment never
    matches itself. Returns ``(pairs_dataset, n_docs_appended)``. Callers
    that persist a pre-append artifact should use the split API
    (``stage_increment`` / ``query_lsh_index(_staged=)`` /
    ``append_staged``) so the artifact lands before the append."""
    staged = stage_increment(index_dir, increment,
                             id_col=id_col, text_col=text_col)
    pairs = query_lsh_index(
        index_dir, increment, threshold=threshold, id_col=id_col,
        text_col=text_col,
        candidate_broadcast_threshold=candidate_broadcast_threshold,
        _staged=staged).materialize()
    return pairs, append_staged(index_dir, staged)


def append_lsh_index(index_dir: str, new_docs: ray.data.Dataset, *,
                     id_col: str | None = None,
                     text_col: str | None = None) -> dict:
    """Append new docs into an existing index (same shard layout; parquet
    file names are unique per write, so existing data is never rewritten).
    The caller owns id uniqueness across build+appends — re-appending the
    same doc id duplicates its index rows (harmless for candidate
    generation, wasteful on disk)."""
    meta = _load_meta(index_dir)
    _recover_index(index_dir)
    _write_doc_tables(new_docs, index_dir, meta,
                      id_col or meta["id_col"], text_col or meta["text_col"])
    return meta


_MARKER = "_compact_marker.json"


def _recover_shard(shard_dir: str) -> bool:
    """Roll forward an interrupted compaction (see ``compact_lsh_index``):
    once the marker is durably on disk the merged data is durable too, so
    recovery always completes the rename + old-file deletion. Stray ``.tmp``
    files WITHOUT a marker are pre-marker debris — deleted. Returns True if
    anything was repaired."""
    import glob as _glob

    marker = os.path.join(shard_dir, _MARKER)
    acted = False
    if os.path.isfile(marker):
        with open(marker) as f:
            m = json.load(f)
        tmp = os.path.join(shard_dir, m["tmp"])
        final = os.path.join(shard_dir, m["final"])
        if os.path.isfile(tmp) and not os.path.isfile(final):
            os.rename(tmp, final)
        for name in m["olds"]:
            p = os.path.join(shard_dir, name)
            if os.path.isfile(p):
                os.remove(p)
        os.remove(marker)
        acted = True
    for stray in _glob.glob(os.path.join(shard_dir, "*.tmp")):
        os.remove(stray)
        acted = True
    return acted


def _recover_index(index_dir: str) -> int:
    """Run shard recovery across the whole index (O(shards) stat calls);
    called on every query/append entry so readers never see a partially
    compacted shard. Returns the number of repaired shards."""
    import glob as _glob

    n = 0
    for base in ("sigs", "bands"):
        for d in _glob.glob(os.path.join(index_dir, base, "*=*")):
            if os.path.isdir(d) and _recover_shard(d):
                n += 1
    return n


def compact_lsh_index(index_dir: str, *, concurrency: int = 8) -> dict:
    """Rewrite each multi-file shard directory (the product of appends) as
    one parquet file. Crash-safe per shard: merged data is written to a
    ``.tmp`` file and fsynced, a marker records (tmp, final, olds) and is
    fsynced, THEN tmp is renamed and the old files deleted — a crash at any
    point either leaves the olds intact (pre-marker) or is rolled forward by
    ``_recover_shard`` on the next entry. Single-writer maintenance op (like
    lake ``compact``): don't run it concurrently with queries/appends.

    One Ray task per shard directory (raw tasks, not Dataset: this is file
    management, each task bounded by corpus/shards index rows)."""
    import glob as _glob
    import uuid

    import ray

    @ray.remote(num_cpus=1)
    def one(shard_dir: str) -> tuple[int, int, list[str], str | None]:
        import pyarrow.parquet as _pq

        _recover_shard(shard_dir)
        files = sorted(_glob.glob(os.path.join(shard_dir, "*.parquet")))
        if len(files) <= 1:
            return (len(files), 0, [], None)
        merged = pa.concat_tables([_pq.read_table(f) for f in files])
        tag = uuid.uuid4().hex[:12]
        tmp_name, final_name = f"compact-{tag}.tmp", f"compact-{tag}.parquet"
        tmp = os.path.join(shard_dir, tmp_name)
        _pq.write_table(merged, tmp)
        with open(tmp, "rb") as f:
            os.fsync(f.fileno())
        marker_tmp = os.path.join(shard_dir, _MARKER + ".tmp")
        with open(marker_tmp, "w") as f:
            json.dump({"tmp": tmp_name, "final": final_name,
                       "olds": [os.path.basename(p) for p in files]}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(marker_tmp, os.path.join(shard_dir, _MARKER))
        os.rename(tmp, os.path.join(shard_dir, final_name))
        for p in files:
            os.remove(p)
        os.remove(os.path.join(shard_dir, _MARKER))
        return (len(files), 1,
                [os.path.basename(p) for p in files], final_name)

    dirs = []
    for base in ("sigs", "bands"):
        dirs.extend(d for d in sorted(
            _glob.glob(os.path.join(index_dir, base, "*=*")))
            if os.path.isdir(d))
    # sliding window: keep `concurrency` tasks in flight (a wave barrier
    # would stall each wave on its slowest shard)
    stats, inflight, idx = [], {}, 0
    while idx < len(dirs) and len(inflight) < concurrency:
        inflight[one.remote(dirs[idx])] = dirs[idx]
        idx += 1
    while inflight:
        done, _ = ray.wait(list(inflight), num_returns=1)
        d = inflight.pop(done[0])
        stats.append((d, ray.get(done[0])))
        if idx < len(dirs):
            inflight[one.remote(dirs[idx])] = dirs[idx]
            idx += 1
    # the band LEDGER tracks sig files by relative path; translate each
    # compacted sig shard's old names to the new one so the next append
    # doesn't see the compacted file as pending and re-explode the shard
    ledger = _load_ledger(index_dir)
    sig_root = os.path.join(index_dir, "sigs")
    for d, (_, compacted, olds, final) in stats:
        if compacted and os.path.commonpath([d, sig_root]) == sig_root:
            rel = os.path.relpath(d, index_dir)
            ledger -= {os.path.join(rel, o) for o in olds}
            ledger.add(os.path.join(rel, final))
    tmp = _ledger_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(sorted(ledger), f)
    os.replace(tmp, _ledger_path(index_dir))
    return {"shards": len(dirs),
            "compacted": sum(c for _, (_, c, _, _) in stats),
            "files_before": sum(n for _, (n, _, _, _) in stats)}


def _shard_dirs(base: str, col: str, touched) -> list[str]:
    """Parquet FILE list for the touched shards (ray.data.read_parquet
    accepts one directory or a list of files — not a list of directories)."""
    import glob as _glob

    dirs = [os.path.join(base, f"{col}={int(s)}") for s in touched]
    return sorted(f for d in dirs if os.path.isdir(d)
                  for f in _glob.glob(os.path.join(d, "*.parquet")))


def _stage_increment(increment: ray.data.Dataset, meta: dict,
                     id_col: str | None, text_col: str | None
                     ) -> ray.data.Dataset:
    """Materialized signature table of a CDC increment — bounded by ingest
    cadence, not corpus size; materialized because it feeds multiple
    consumers (band join + sig join, and optionally the index append)."""
    stage = _doc_stage(meta["num_perm"], meta["bands"], meta["ngram"],
                       id_col or meta["id_col"], text_col or meta["text_col"],
                       meta["shards"])
    return increment.map_batches(stage, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()


def query_lsh_index(index_dir: str, increment: ray.data.Dataset, *,
                    threshold: float = 0.7, id_col: str | None = None,
                    text_col: str | None = None,
                    candidate_broadcast_threshold: int = 2_000_000,
                    _staged: ray.data.Dataset | None = None,
                    ) -> ray.data.Dataset:
    """Near-dup pairs (increment doc, corpus doc) with signature-estimated
    Jaccard ≥ ``threshold``. Returns a Dataset with columns
    ``(doc_id, dup_id, est_jaccard_ppm)`` — ``doc_id`` from the increment,
    ``dup_id`` from the indexed corpus, one row per distinct pair.

    Self-pairs (an increment doc already appended to the index under the
    same id) are excluded. ``_staged`` (internal, see ``check_and_append``)
    supplies an already-staged signature table to avoid re-shingling and
    signals that meta-load + recovery already ran."""
    from ethereum_etl_ray.stages.joins import cogroup_join, semi_anti_filter

    meta = _load_meta(index_dir)
    if _staged is None:
        _recover_index(index_dir)  # check_and_append already recovered
    num_perm, bands, shards = meta["num_perm"], meta["bands"], meta["shards"]
    inc = _staged if _staged is not None else _stage_increment(
        increment, meta, id_col, text_col)
    # ids may be integer or string — derive the type once, from the
    # increment's own signature table (build wrote the same native type).
    # A zero-row increment → typed-empty result immediately, keeping the id
    # type when the schema survived (source id type if even that is gone —
    # per-increment artifacts must stay schema-consistent across windows)
    sch = inc.schema()
    if sch is None or inc.count() == 0:
        id_t = pa.string()
        src_sch = sch if sch is not None else increment.schema()
        if src_sch is not None:
            by_name = dict(zip(src_sch.names, src_sch.types))
            id_t = by_name.get("doc", by_name.get(
                id_col or meta["id_col"], pa.string()))
            if pa.types.is_integer(id_t):
                id_t = pa.int64()
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], id_t),
            "dup_id": pa.array([], id_t),
            "est_jaccard_ppm": pa.array([], pa.int64())}))
    id_t = dict(zip(sch.names, sch.types))["doc"]

    inc_bands = inc.map_batches(
        lambda t: _explode_bk(t, shards=shards, doc_out="new_id"),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    # O(shards) driver ints: which band shards does the increment touch?
    touched = {int(r["shard"]) for r in
               inc_bands.groupby("shard").count().take_all()}
    band_dirs = _shard_dirs(os.path.join(index_dir, "bands"), "shard", touched)
    empty_pairs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], id_t),
        "dup_id": pa.array([], id_t),
        "est_jaccard_ppm": pa.array([], pa.int64())}))
    if not band_dirs:
        return empty_pairs
    corpus_bands = ray.data.read_parquet(band_dirs, columns=["bk", "doc"])

    # candidate pairs; a true near-dup collides in many bands, so dedupe the
    # (new_id, dup_id) set BEFORE the signature joins — candidate-sized, and
    # it cuts the sig-join input by the band multiplicity
    cand = cogroup_join(
        inc_bands.map_batches(lambda t: t.drop_columns(["shard"]),
                              batch_format="pyarrow", zero_copy_batch=True),
        corpus_bands.map_batches(
            lambda t: t.rename_columns(["bk2", "dup_id"]),
            batch_format="pyarrow", zero_copy_batch=True),
        left_on="bk", right_on="bk2",
        left_fields=[("bk", pa.int64()), ("new_id", id_t)],
        right_fields=[("bk2", pa.int64()), ("dup_id", id_t)],
    ).map_batches(
        lambda t: t.select(["new_id", "dup_id"]).filter(
            pc.not_equal(t.column("new_id"), t.column("dup_id"))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    if cand.count() == 0:
        return empty_pairs
    import pandas as pd

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1]

    cand = cand.groupby(["new_id", "dup_id"]).map_groups(
        first, batch_format="pandas").materialize()

    # fetch the candidates' corpus signatures, pruning the sig read by shard
    # when the distinct candidate-id set fits a broadcast; the fallback joins
    # against every sig shard — index-sized, never corpus-text-sized
    sig_base = os.path.join(index_dir, "sigs")
    if cand.count() <= candidate_broadcast_threshold:
        chunks = [b["dup_id"] for b in
                  cand.select_columns(["dup_id"])
                      .iter_batches(batch_format="numpy")]
        cids = np.unique(np.concatenate(chunks))
        sig_touched = np.unique(partition_ids(cids, shards)).tolist()
        sig_dirs = _shard_dirs(sig_base, "sig_shard", sig_touched)
        corpus_sigs = ray.data.read_parquet(sig_dirs, columns=["doc", "sig"])
        corpus_sigs = semi_anti_filter(corpus_sigs, cids, on="doc")
    else:
        corpus_sigs = ray.data.read_parquet(
            _shard_dirs(sig_base, "sig_shard", range(shards)),
            columns=["doc", "sig"])

    sig_t = pa.binary(num_perm * 8)
    j1 = cogroup_join(
        cand, corpus_sigs.map_batches(
            lambda t: t.rename_columns(["__cdoc", "__csig"]),
            batch_format="pyarrow", zero_copy_batch=True),
        left_on="dup_id", right_on="__cdoc",
        left_fields=[("new_id", id_t), ("dup_id", id_t)],
        right_fields=[("__cdoc", id_t), ("__csig", sig_t)])
    inc_sigs = inc.map_batches(
        lambda t: pa.table({"__ndoc": t.column("doc"),
                            "__nsig": t.column("sig")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j2 = cogroup_join(
        j1.map_batches(lambda t: t.drop_columns(["__cdoc"]),
                       batch_format="pyarrow", zero_copy_batch=True),
        inc_sigs,
        left_on="new_id", right_on="__ndoc",
        left_fields=[("new_id", id_t), ("dup_id", id_t),
                     ("__csig", sig_t)],
        right_fields=[("__ndoc", id_t), ("__nsig", sig_t)])

    thr_ppm = int(np.floor(threshold * 1_000_000 + 0.5))

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], id_t),
                             "dup_id": pa.array([], id_t),
                             "est_jaccard_ppm": pa.array([], pa.int64())})
        a = _unpack_sigs(t.column("__nsig"), num_perm)
        b = _unpack_sigs(t.column("__csig"), num_perm)
        frac = (a == b).mean(axis=1)
        ppm = np.floor(frac * 1_000_000 + 0.5).astype(np.int64)
        keep = ppm >= thr_ppm
        idx = pa.array(np.flatnonzero(keep))
        return pa.table({
            "doc_id": t.column("new_id").take(idx),
            "dup_id": t.column("dup_id").take(idx),
            "est_jaccard_ppm": pa.array(ppm[keep], pa.int64()),
        })

    # candidates were already made distinct, so verify output needs no
    # further dedup; its typed empty-table branch keeps the schema stable
    # even when every candidate falls below the threshold
    return j2.map_batches(verify, batch_format="pyarrow",
                          zero_copy_batch=True)
