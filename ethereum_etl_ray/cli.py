"""Engine admin CLI — the reference's scripts/* and clis/* re-expressed.

    python -m ethereum_etl_ray.cli init     --sf-dir ... [--events-per-doc N]
    python -m ethereum_etl_ray.cli replay   --sf-dir ... --out DIR [--watermark N]
    python -m ethereum_etl_ray.cli tail     --sf-dir ... --out DIR --window N
    python -m ethereum_etl_ray.cli inspect  --out DIR
    python -m ethereum_etl_ray.cli compact  --out DIR
    python -m ethereum_etl_ray.cli dedup-index build|append|query|compact --index DIR [--docs P]

Reference analogues: historical backfill (``src/clis/historical.py``),
realtime tailer (``src/clis/realtime_ws.py``), table admin
(``scripts/sqlite/create_table.py``), ``inspect``
(``src/repositories/sqlite/base.py:26-52``), backup GC
(``src/repositories/sqlite/base.py:126-136``).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_up(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def cmd_init(args):
    from ethereum_etl_ray.sources.synth import ensure_corpus

    c = ensure_corpus(args.sf_dir, events_per_doc=args.events_per_doc)
    print(json.dumps({"root": c.root, "n_docs": c.n_docs, "n_events": c.n_events,
                      "watermark": c.watermark, "v2_start_seq": c.v2_start_seq}))


def cmd_replay(args):
    _ray_up(args.num_cpus)
    from ethereum_etl_ray.config import EngineConfig
    from ethereum_etl_ray.pipelines.replay import replay
    from ethereum_etl_ray.sources.synth import ensure_corpus

    corpus = ensure_corpus(args.sf_dir, events_per_doc=args.events_per_doc)
    cfg = EngineConfig(num_partitions=args.partitions, merge_mode=args.mode)
    if args.mor:
        from ethereum_etl_ray.pipelines.mor import ingest_delta

        res = ingest_delta(corpus, args.out, cfg, watermark=args.watermark)
    else:
        res = replay(corpus, args.out, cfg, watermark=args.watermark)
    print(json.dumps({"out": args.out, "watermark": res.manifest.watermark,
                      "merged_partitions": res.merged_partitions,
                      "skipped_partitions": res.skipped_partitions,
                      "mor": bool(args.mor)}))


def cmd_tail(args):
    """Bounded tailing: repeated replays advancing the watermark by --window
    (the batch-engine analogue of the reference's WS newHeads loop).

    With ``--allowed-lateness-us`` the tailer enforces watermark semantics:
    per window, events whose event time lags the running high-water mark
    (carried across windows AND process restarts via ``_late/_state.json``)
    by more than the allowance are written to the ``out/_late`` side output
    and withheld from the merge — the lake then equals a sequential replay
    of the KEPT stream (tests/test_resume.py).

    With ``--dedup-index DIR`` the tailer maintains a persisted LSH index
    (pipelines/lshindex.py, id = url) over everything ingested: after each
    window commits, the window's pages are staged once, near-dup-checked
    against the PRE-append index (pairs ≥ --dedup-threshold land in
    ``out/_dups/window-<wm>``, max-ppm per pair), and only then appended —
    every page is checked against all PREVIOUSLY ingested pages;
    intra-window duplicates are the batch dedup ops' job, and the
    artifact-before-append ordering means no crash point can leave an
    artifact with intra-window echoes. The indexed watermark is carried in
    ``out/_dups/_state.json``; on restart the tailer catches the index up
    to the lake watermark first (keeping existing window artifacts when the
    state file is present — a crash-rerun — and recomputing them when it
    is absent, i.e. a wiped/rebuilt index). Updated urls accumulate
    signature versions (append-only index: stale-version matches persist
    until a REBUILD — ``dedup-index compact`` only merges files, it never
    drops superseded versions); re-appends after a crash leave duplicate
    signature rows, which are harmless for candidate generation."""
    import os

    _ray_up(args.num_cpus)
    from dataclasses import replace as _dc_replace

    from ethereum_etl_ray.config import EngineConfig
    from ethereum_etl_ray.pipelines.replay import replay, route_late_events
    from ethereum_etl_ray.sources.synth import ensure_corpus
    from ethereum_etl_ray.state.manifest import load_manifest

    corpus = ensure_corpus(args.sf_dir, events_per_doc=args.events_per_doc)
    cfg = EngineConfig(num_partitions=args.partitions, merge_mode=args.mode)
    lateness = getattr(args, "allowed_lateness_us", None)
    state_path = os.path.join(args.out, "_late", "_state.json")
    hwm_carry = None
    if lateness is not None and os.path.exists(state_path):
        with open(state_path) as f:
            hwm_carry = json.load(f).get("hwm_us")
    dedup_dir = getattr(args, "dedup_index", None)
    n_dups_total = 0
    if dedup_dir:
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from ethereum_etl_ray.pipelines.lshindex import (
            append_staged,
            init_lsh_index,
            query_lsh_index,
            stage_increment,
        )
        from ethereum_etl_ray.pipelines.replay import (
            load_events,
            load_lake,
            lookup_urls,
        )

        init_lsh_index(dedup_dir, id_col="url", text_col="text",
                       num_perm=64, bands=16, ngram=3, shards=16)
        ded_state = os.path.join(args.out, "_dups", "_state.json")
        indexed_wm = -1
        # captured ONCE: state present at startup ⇒ reruns are crash-reruns
        # and existing window artifacts are kept; state absent ⇒ the index
        # was wiped/rebuilt, so stale artifacts are recomputed + overwritten
        had_state0 = os.path.exists(ded_state)
        if had_state0:
            with open(ded_state) as f:
                indexed_wm = json.load(f).get("watermark", -1)

        def _index_window(seq_gt: int, seq_le: int, *,
                          had_state: bool) -> int:
            """Stage the window ONCE, query the PRE-append index, persist
            the pair artifact, THEN append — so no crash point can leave an
            artifact containing intra-window echoes. Driver state is
            window-bounded (the window's distinct urls + its near-dup
            pairs); a from-scratch catch-up (seq_gt < 0) streams the whole
            lake instead of building a driver url list."""
            if seq_gt < 0:
                docs = load_lake(args.out).map_batches(
                    lambda t: t.select(["url", "text"]),
                    batch_format="pyarrow", zero_copy_batch=True)
            else:
                ev = load_events(corpus.event_dirs,
                                 seq_gt=seq_gt, seq_le=seq_le)
                urls = sorted(ev.unique("url"))
                rows = lookup_urls(args.out, urls)  # tombstoned urls drop
                docs = ray.data.from_arrow(rows.select(["url", "text"]))
            staged = stage_increment(dedup_dir, docs)
            dups_dir = os.path.join(args.out, "_dups")
            os.makedirs(dups_dir, exist_ok=True)
            fname = os.path.join(dups_dir, f"window-{seq_le}.parquet")
            if os.path.exists(fname) and had_state:
                # crash-rerun of an already-reported window (state file
                # present, watermark behind): keep the clean pre-append
                # artifact — a rerun's query may see the window's own docs
                pairs_t = pq.read_table(fname)
            else:
                # fresh window, or artifacts outliving a wiped/rebuilt
                # index state (no state file): (re)compute and overwrite
                empty_t = pa.table({
                    "url": pa.array([], pa.string()),
                    "dup_url": pa.array([], pa.string()),
                    "est_jaccard_ppm": pa.array([], pa.int64())})
                pairs_t = empty_t
                pairs = (query_lsh_index(dedup_dir, docs,
                                         threshold=args.dedup_threshold,
                                         _staged=staged)
                         .to_pandas()
                         .reindex(columns=["doc_id", "dup_id",
                                           "est_jaccard_ppm"]))
                if len(pairs):
                    # an updated url's older signature versions can echo a
                    # pair: keep the max estimate per (url, dup_url)
                    pairs = (pairs.groupby(["doc_id", "dup_id"],
                                           as_index=False)
                             ["est_jaccard_ppm"].max()
                             .rename(columns={"doc_id": "url",
                                              "dup_id": "dup_url"}))
                    pairs_t = pa.Table.from_pandas(
                        pairs, preserve_index=False).cast(empty_t.schema)
                pq.write_table(pairs_t, fname + ".tmp")
                os.replace(fname + ".tmp", fname)
            append_staged(dedup_dir, staged)
            tmp = ded_state + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"watermark": seq_le}, f)
            os.replace(tmp, ded_state)
            return pairs_t.num_rows

    prior = load_manifest(args.out)
    wm = prior.watermark if prior else -1
    if dedup_dir and prior is not None and prior.watermark > indexed_wm:
        # restart catch-up: the lake is ahead of the index
        n_dups_total += _index_window(indexed_wm, prior.watermark,
                                      had_state=had_state0)
        indexed_wm = prior.watermark
    rounds = 0
    n_late_total = 0
    while wm < corpus.watermark:
        prev_wm = wm
        wm = min(wm + args.window, corpus.watermark)
        cfg_round = cfg
        new_carry = hwm_carry
        if lateness is not None:
            late_seqs, new_carry, n_late = route_late_events(
                corpus, args.out, seq_gt=(prev_wm if prev_wm >= 0 else None),
                seq_le=wm, allowed_lateness_us=lateness,
                carry_in_us=hwm_carry)
            n_late_total += n_late
            if late_seqs.size:
                cfg_round = _dc_replace(cfg, exclude_seqs=late_seqs)
        if getattr(args, "mor", False):
            # merge-on-read: the window lands as per-partition delta files,
            # O(window) per round instead of O(touched partitions' size);
            # --compact-every bounds read amplification
            from ethereum_etl_ray.pipelines.mor import ingest_delta

            res = ingest_delta(corpus, args.out, cfg_round, watermark=wm)
        else:
            res = replay(corpus, args.out, cfg_round, watermark=wm)
        if lateness is not None:
            # persist the carry only AFTER the round commits: a crash then
            # replays the window against the same carry-in (idempotent)
            os.makedirs(os.path.dirname(state_path), exist_ok=True)
            tmp = state_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"hwm_us": new_carry, "watermark": wm}, f)
            os.replace(tmp, state_path)
            hwm_carry = new_carry
        if dedup_dir:
            n_dups_total += _index_window(max(prev_wm, indexed_wm), wm,
                                          had_state=had_state0)
            indexed_wm = wm
        rounds += 1
        if getattr(args, "mor", False) and args.compact_every \
                and rounds % args.compact_every == 0:
            from ethereum_etl_ray.pipelines.mor import compact_deltas

            compact_deltas(args.out)
        print(json.dumps({"round": rounds, "watermark": wm,
                          "merged_partitions": res.merged_partitions}), file=sys.stderr)
    out = {"out": args.out, "rounds": rounds, "watermark": wm}
    if lateness is not None:
        out["late_events"] = n_late_total
    if dedup_dir:
        out["near_dup_pairs"] = n_dups_total
    print(json.dumps(out))


def cmd_inspect(args):
    _ray_up(args.num_cpus)
    from ethereum_etl_ray.pipelines.replay import load_lake
    from ethereum_etl_ray.state.manifest import load_manifest

    m = load_manifest(args.out)
    if m is None:
        print(json.dumps({"error": f"no committed manifest in {args.out}"}))
        sys.exit(1)
    lake = load_lake(args.out)
    total = sum(e.rows for e in m.partitions.values())
    from ethereum_etl_ray.state.manifest import list_generations

    print(json.dumps({
        "watermark": m.watermark,
        "schema_version": m.schema_version,
        "merge_mode": m.merge_mode,
        "partitions": len(m.partitions),
        "rows": total,
        "pending_delta_files": sum(len(v) for v in m.deltas.values()),
        "pending_delta_rows": sum(e.rows for v in m.deltas.values() for e in v),
        "generation": m.generation,
        "generations": [{"generation": g, "watermark": wm}
                        for g, wm in list_generations(args.out)],
        "metrics": m.metrics,
        "schema": {f: str(lake.schema().base_schema.field(f).type)
                   for f in lake.schema().names},
        "sample": [{k: (v if not isinstance(v, bytes) else f"<{len(v)}B>")
                    for k, v in row.items()} for row in lake.take(3)],
    }, default=str))


def cmd_compact(args):
    """GC orphans; with ``--rewrite``, also rewrite live partition files with
    uniform row groups (reference backup/drop lifecycle,
    src/repositories/sqlite/base.py:81-136)."""
    if getattr(args, "deltas", False):
        _ray_up(args.num_cpus)
        from ethereum_etl_ray.pipelines.mor import compact_deltas

        print(json.dumps(compact_deltas(args.out)))
        return
    if args.rewrite or args.cluster:
        _ray_up(args.num_cpus)
        from ethereum_etl_ray.pipelines.retention import compact_lake

        print(json.dumps(compact_lake(args.out,
                                      row_group_rows=args.row_group_rows,
                                      cluster_by_url=args.cluster)))
        return
    from ethereum_etl_ray.state.manifest import gc_uncommitted

    removed = gc_uncommitted(args.out)
    print(json.dumps({"removed": len(removed)}))


def cmd_restore(args):
    """Flip the live manifest back to a retained generation, by --watermark
    or exact --generation (reference X5 restore,
    src/repositories/sqlite/base.py:81-136)."""
    from ethereum_etl_ray.state.manifest import restore_generation

    m = restore_generation(args.out, watermark=args.watermark,
                           generation=args.generation)
    print(json.dumps({"out": args.out, "watermark": m.watermark,
                      "generation": m.generation,
                      "partitions": len(m.partitions)}))


def cmd_curate(args):
    """End-to-end corpus curation (lang+quality filter → exact dedup →
    near-dedup keep-one → optional hash-split sample / token budget) from a
    documents parquet to a curated parquet, with a per-stage survivor
    report. The training-data counterpart of the reference's extract→export
    chain (src/tasks/dag.py)."""
    _ray_up(args.num_cpus)
    import ray.data

    from ethereum_etl_ray.pipelines.curate import curate_corpus

    docs = ray.data.read_parquet(args.docs)
    out, report = curate_corpus(
        docs,
        langs=tuple(args.langs.split(",")),
        min_quality_ppm=args.min_quality_ppm,
        sample_hex_lt=args.sample_hex_lt,
        token_budget=args.token_budget,
        collect_report=True,
    )
    out.write_parquet(args.dest)
    print(json.dumps({"dest": args.dest, "stages": report}))


def cmd_shards(args):
    """Training-shard build: curate → deterministic shuffle → fixed-token
    packing → one parquet directory per shard (pipelines/curate.py:
    make_training_shards). Prints the deterministic shard manifest."""
    _ray_up(args.num_cpus)
    import ray.data

    from ethereum_etl_ray.pipelines.curate import make_training_shards

    docs = ray.data.read_parquet(args.docs)
    manifest = make_training_shards(
        docs, args.dest, shards=args.shards,
        tokens_per_seq=args.tokens_per_seq,
        langs=tuple(args.langs.split(",")),
        min_quality_ppm=args.min_quality_ppm)
    print(json.dumps(manifest))


def cmd_diff(args):
    """Changed urls between two retained manifest generations (incremental
    CDC consumer surface; the distributed analogue of diffing the
    reference's backup tables, src/repositories/sqlite/base.py:81-136)."""
    _ray_up(args.num_cpus)
    from ethereum_etl_ray.pipelines.diff import lake_diff

    ds = lake_diff(args.out, args.from_gen, args.to_gen)
    summary = {"out": args.out, "from": args.from_gen, "to": args.to_gen}
    if args.dest:
        ds.write_parquet(args.dest)
        summary["dest"] = args.dest
    else:
        # per-change-kind counts via a map-side value_counts combiner —
        # the driver sees O(kinds) rows, never the diff itself (a diff
        # after a big backfill is O(changed urls × value columns))
        import pyarrow as pa
        import pyarrow.compute as pc
        from ray.data.aggregate import Sum

        def vc(t: pa.Table) -> pa.Table:
            v = pc.value_counts(pc.cast(t.column("change"), pa.string()))
            return pa.table({"change": v.field("values"),
                             "n": pc.cast(v.field("counts"), pa.int64())})

        agg = (ds.map_batches(vc, batch_format="pyarrow")
               .groupby("change").aggregate(Sum("n", alias_name="n"))
               .to_pandas())
        counts = ({} if agg.empty else
                  dict(zip(agg["change"], agg["n"])))
        summary["changes"] = {k: int(v) for k, v in sorted(counts.items())}
        summary["total"] = int(sum(counts.values()))
    print(json.dumps(summary))


def cmd_replicate(args):
    """Sync a follower lake to a leader (incremental, checksum-skipped,
    exactly-once on the follower); ``--verify``/``--deep`` run the
    convergence check afterwards."""
    _ray_up(args.num_cpus)
    from ethereum_etl_ray.pipelines.replicate import replica_verify, replicate

    r = replicate(args.src, args.dst, generation=args.generation)
    summary = {"src": args.src, "dst": args.dst,
               "watermark": r.manifest.watermark,
               "copied": r.copied, "skipped": r.skipped,
               "generation": r.manifest.generation}
    if args.verify or args.deep:
        rep = replica_verify(args.src, args.dst, deep=args.deep)
        summary["in_sync"] = rep["in_sync"]
        summary["mismatched"] = rep["mismatched"]
        if args.deep:
            summary["deep_corrupt"] = rep["deep_corrupt"]
    print(json.dumps(summary))
    if args.verify or args.deep:
        if not summary["in_sync"]:
            sys.exit(2)


def cmd_retention(args):
    _ray_up(args.num_cpus)
    from ethereum_etl_ray.pipelines.retention import apply_retention

    print(json.dumps(apply_retention(args.out, keep_ratio=args.keep_ratio)))


def cmd_delete(args):
    """Predicate delete over the lake (ALTER TABLE ... DELETE analogue).
    --value is parsed as int, then float, then string; --op 'in'/'not in'
    takes a comma-separated list."""
    _ray_up(args.num_cpus)
    from ethereum_etl_ray.pipelines.retention import delete_where

    def parse(v: str):
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
        return v

    value = ([parse(v) for v in args.value.split(",")]
             if args.op in ("in", "not in") else parse(args.value))
    print(json.dumps(delete_where(args.out, args.column, args.op, value)))


def cmd_fsck(args):
    """Integrity scrub: verify every committed partition file against its
    manifest lineage (rows + content checksum)."""
    _ray_up(args.num_cpus)
    from ethereum_etl_ray.pipelines.retention import fsck_lake

    rep = fsck_lake(args.out, generation=args.generation)
    print(json.dumps(rep, default=str))
    if rep["corrupt"]:
        sys.exit(2)


def cmd_get(args):
    """Point-read current rows by url (PRIMARY-KEY SELECT analogue,
    src/repositories/sqlite/base.py:26-52): manifest-directed hash pruning
    reads only the partition files the urls map to — no Ray session, no
    lake scan."""
    from ethereum_etl_ray.pipelines.replay import lookup_urls

    t = lookup_urls(args.out, args.url)
    rows = t.drop_columns(["html"]).to_pylist()
    print(json.dumps({"found": len(rows), "rows": rows}, default=str))


def cmd_dedup_index(args):
    """Persisted-LSH-index admin (pipelines/lshindex.py): ``build`` an index
    from a documents parquet, ``append`` new docs without a rebuild,
    ``query`` an increment for near-dup pairs against everything indexed
    (prints pair count; ``--dest`` writes the pairs parquet), ``compact``
    multi-file shard dirs after appends (crash-safe, see compact_lsh_index).
    The incremental-ingest analogue of the reference's dedupe-on-insert
    (src/repositories/sqlite/base.py:159-172), operating corpus-scale."""
    if args.action != "compact" and not args.docs:
        raise SystemExit("dedup-index: --docs is required for "
                         "build/append/query")
    _ray_up(args.num_cpus)
    import ray.data

    from ethereum_etl_ray.pipelines.lshindex import (
        append_lsh_index,
        build_lsh_index,
        compact_lsh_index,
        query_lsh_index,
    )

    if args.action == "build":
        meta = build_lsh_index(
            ray.data.read_parquet(args.docs), args.index,
            num_perm=args.num_perm, bands=args.bands,
            ngram=args.ngram, shards=args.index_shards)
        print(json.dumps({"action": "build", "index": args.index, **meta}))
    elif args.action == "append":
        meta = append_lsh_index(args.index, ray.data.read_parquet(args.docs))
        print(json.dumps({"action": "append", "index": args.index, **meta}))
    elif args.action == "compact":
        stats = compact_lsh_index(args.index)
        print(json.dumps({"action": "compact", "index": args.index, **stats}))
    else:  # query
        pairs = query_lsh_index(args.index,
                                ray.data.read_parquet(args.docs),
                                threshold=args.threshold)
        if args.dest:
            pairs = pairs.materialize()
            pairs.write_parquet(args.dest)
        n = pairs.count()
        print(json.dumps({"action": "query", "index": args.index,
                          "pairs": int(n), "dest": args.dest}))


def cmd_export(args):
    """Lake → CSV or JSONL export (reference X6: `COPY table TO file`,
    src/repositories/sqlite/base.py:177-185; X3's orjson row serialization,
    src/tasks/export/nats.py:11-29, is the JSONL wire). Binary html is
    stringified or dropped (neither format carries raw bytes)."""
    _ray_up(args.num_cpus)
    import pyarrow as pa
    import pyarrow.compute as pc

    from ethereum_etl_ray.pipelines.replay import load_lake

    lake = load_lake(args.out)

    def wire_safe(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index("html")
        if args.include_html:
            # payloads are utf-8 in this lake; generic binary would need hex
            return t.set_column(idx, "html_text",
                                pc.cast(t.column("html"), pa.string()))
        return t.remove_column(idx)

    safe = lake.map_batches(wire_safe, batch_format="pyarrow")
    if args.format == "jsonl":
        from ethereum_etl_ray.functions.wire import json_lines

        def to_lines(t: pa.Table) -> pa.Table:
            return pa.table({"line": json_lines(t)})

        # one text column → write_csv degenerates to JSON-lines files
        import os as _os
        _os.makedirs(args.dest, exist_ok=True)

        def write_part(t: pa.Table, _dir=args.dest) -> pa.Table:
            import uuid as _uuid
            lines = json_lines(t)
            path = _os.path.join(_dir, f"part-{_uuid.uuid4().hex}.jsonl")
            with open(path, "w") as f:
                f.write("\n".join(lines.to_pylist()) + ("\n" if len(lines) else ""))
            return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

        n = int(safe.map_batches(write_part, batch_format="pyarrow")
                .to_pandas()["rows"].sum())
        print(json.dumps({"dest": args.dest, "format": "jsonl", "rows": n}))
        return
    safe.write_csv(args.dest)
    print(json.dumps({"dest": args.dest, "format": "csv"}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="ethereum_etl_ray")
    p.add_argument("--num-cpus", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("init", help="generate/refresh the synthetic change-log corpus")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp.add_argument("--events-per-doc", type=float, default=20.0)
    sp.set_defaults(fn=cmd_init)

    for name, fn in [("replay", cmd_replay), ("tail", cmd_tail)]:
        sp = sub.add_parser(name)
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        sp.add_argument("--events-per-doc", type=float, default=20.0)
        sp.add_argument("--out", required=True)
        sp.add_argument("--partitions", type=int, default=32)
        sp.add_argument("--mode", choices=["replace", "ignore"], default="replace")
        sp.add_argument("--mor", action="store_true",
                        help="merge-on-read ingest: commit the window as "
                             "per-partition delta files (no base rewrite); "
                             "reads merge at scan time, `compact --deltas` "
                             "folds them in")
        if name == "replay":
            sp.add_argument("--watermark", type=int, default=None)
        else:
            sp.add_argument("--compact-every", type=int, default=0,
                            help="with --mor: fold pending deltas into the "
                                 "base every N windows (0 = never)")
            sp.add_argument("--window", type=int, default=2000)
            sp.add_argument("--allowed-lateness-us", type=int, default=None,
                            help="watermark semantics: events whose warc_ts "
                                 "lags the running max by more than this go "
                                 "to out/_late instead of the merge")
            sp.add_argument("--dedup-index", default=None,
                            help="maintain a persisted LSH index here; each "
                                 "window is near-dup-checked against all "
                                 "previously ingested pages (pairs in "
                                 "out/_dups) then appended")
            sp.add_argument("--dedup-threshold", type=float, default=0.7)
        sp.set_defaults(fn=fn)

    for name, fn in [("inspect", cmd_inspect), ("compact", cmd_compact)]:
        sp = sub.add_parser(name)
        sp.add_argument("--out", required=True)
        if name == "compact":
            sp.add_argument("--rewrite", action="store_true",
                            help="rewrite live partition files with uniform row groups")
            sp.add_argument("--cluster", action="store_true",
                            help="also sort each partition file by url so "
                                 "point reads prune to one row group")
            sp.add_argument("--deltas", action="store_true",
                            help="fold pending merge-on-read delta files "
                                 "into the base partition files")
            sp.add_argument("--row-group-rows", type=int, default=65536)
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("restore", help="restore the lake to a retained manifest generation")
    sp.add_argument("--out", required=True)
    sp.add_argument("--watermark", type=int, default=None)
    sp.add_argument("--generation", type=int, default=None)
    sp.set_defaults(fn=cmd_restore)

    sp = sub.add_parser("curate", help="documents parquet -> curated corpus parquet")
    sp.add_argument("--docs", required=True,
                    help="input documents parquet (doc_id, text, lang, ...)")
    sp.add_argument("--dest", required=True)
    sp.add_argument("--langs", default="en", help="comma-separated keep list")
    sp.add_argument("--min-quality-ppm", type=int, default=0)
    sp.add_argument("--sample-hex-lt", default=None,
                    help="md5 hash-split prefix, e.g. '4' keeps ~4/16")
    sp.add_argument("--token-budget", type=int, default=None)
    sp.set_defaults(fn=cmd_curate)

    sp = sub.add_parser("shards", help="documents parquet -> packed training shards")
    sp.add_argument("--docs", required=True)
    sp.add_argument("--dest", required=True)
    sp.add_argument("--shards", type=int, default=8)
    sp.add_argument("--tokens-per-seq", type=int, default=512)
    sp.add_argument("--langs", default="en")
    sp.add_argument("--min-quality-ppm", type=int, default=0)
    sp.set_defaults(fn=cmd_shards)

    sp = sub.add_parser("diff", help="changed urls between two retained generations")
    sp.add_argument("--out", required=True)
    sp.add_argument("--from-gen", type=int, required=True)
    sp.add_argument("--to-gen", type=int, required=True)
    sp.add_argument("--dest", default=None,
                    help="write full diff rows as parquet instead of printing counts")
    sp.set_defaults(fn=cmd_diff)

    sp = sub.add_parser("replicate",
                        help="sync a follower lake to a leader "
                             "(incremental, checksum-skipped)")
    sp.add_argument("--src", required=True, help="leader lake directory")
    sp.add_argument("--dst", required=True, help="follower lake directory")
    sp.add_argument("--generation", type=int, default=None,
                    help="replicate a retained leader generation "
                         "(point-in-time replica)")
    sp.add_argument("--verify", action="store_true",
                    help="lineage convergence check after the sync")
    sp.add_argument("--deep", action="store_true",
                    help="also re-read follower files against leader checksums")
    sp.set_defaults(fn=cmd_replicate)

    sp = sub.add_parser("retention", help="evict oldest rows (reference A8 free_space)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--keep-ratio", type=float, default=0.9)
    sp.set_defaults(fn=cmd_retention)

    sp = sub.add_parser("delete", help="predicate delete (ALTER TABLE ... DELETE)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--column", required=True)
    sp.add_argument("--op", required=True,
                    choices=["==", "!=", "<", "<=", ">", ">=", "in", "not in"])
    sp.add_argument("--value", required=True)
    sp.set_defaults(fn=cmd_delete)

    sp = sub.add_parser("fsck", help="verify committed files against manifest lineage")
    sp.add_argument("--out", required=True)
    sp.add_argument("--generation", type=int, default=None)
    sp.set_defaults(fn=cmd_fsck)

    sp = sub.add_parser("get", help="point-read rows by url (PK SELECT)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--url", action="append", required=True,
                    help="repeatable: urls to fetch")
    sp.set_defaults(fn=cmd_get)

    sp = sub.add_parser("export", help="lake -> CSV (reference X6 COPY TO)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--dest", required=True)
    sp.add_argument("--include-html", action="store_true")
    sp.add_argument("--format", choices=["csv", "jsonl"], default="csv")
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("dedup-index",
                        help="persisted LSH near-dup index: build/append/"
                             "query/compact")
    sp.add_argument("action",
                    choices=["build", "append", "query", "compact"])
    sp.add_argument("--index", required=True)
    sp.add_argument("--docs", help="documents parquet (build/append/query)")
    sp.add_argument("--dest", help="write query pairs parquet here")
    sp.add_argument("--threshold", type=float, default=0.7)
    sp.add_argument("--num-perm", type=int, default=64)
    sp.add_argument("--bands", type=int, default=16)
    sp.add_argument("--ngram", type=int, default=3)
    sp.add_argument("--index-shards", type=int, default=32)
    sp.set_defaults(fn=cmd_dedup_index)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
