"""End-to-end training-corpus curation — the composition a user of the
reference's distinct-as-dedup operators (A1–A3,
``src/tasks/extract/account.py:7-27``) actually runs corpus-wide when
preparing LLM training data:

    language filter → quality filter → exact dedup → near-dedup keep-one
    → deterministic hash-split sample

Every step is one of this engine's existing streaming operators
(``functions.textstats``, ``pipelines.dedup``, ``stages.components``);
this module just fuses them into a single lazy chain:

  * the language/quality annotate+filter is ONE ``map_batches`` stage — the
    filters see each text exactly once and drop rows before anything wide;
  * exact dedup is the hash-bucketed groupby route; near-dedup auto-routes
    (collected pairs + union-find below the streaming threshold, fully
    distributed LSH + label propagation above it — the 100 TB shape);
  * the final sample is the stable md5 hash-split (same rows selected on
    every engine, every run, any partitioning).

``collect_report=True`` additionally returns per-stage survivor counts.
Counting requires executing each stage boundary, so report mode
checkpoints stages with ``materialize()`` (object-store resident,
spill-backed) and reuses each checkpoint for the next stage — each stage
still runs exactly once. The default returns one unexecuted lazy Dataset
with NO intermediate materialization.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ethereum_etl_ray.functions.textstats import lang_scores_batch, quality_batch


def _annotate_filter(langs: tuple[str, ...], min_quality_ppm: int,
                     text_col: str):
    lang_set = set(langs)

    def fn(batch: pa.Table) -> pa.Table:
        out = quality_batch(lang_scores_batch(batch, text_col=text_col),
                            text_col=text_col)
        keep = pc.and_(
            pc.is_in(out.column("predicted_lang"),
                     value_set=pa.array(sorted(lang_set), pa.string())),
            pc.greater_equal(out.column("quality_ppm"),
                             pa.scalar(min_quality_ppm, pa.int64())))
        return out.filter(keep)

    return fn


def _hash_sample(id_col: str, hex_lt: str):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (hashlib.md5(str(i).encode()).hexdigest()[0] < hex_lt
             for i in ids), dtype=bool, count=len(ids))
        return batch.filter(pa.array(keep))

    return fn


def curate_corpus(
    docs: ray.data.Dataset,
    *,
    langs: tuple[str, ...] = ("en",),
    min_quality_ppm: int = 0,
    near_threshold: float = 0.7,
    sample_hex_lt: str | None = None,
    token_budget: int | None = None,
    strip_spans_ngram: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
    collect_report: bool = False,
):
    """Run the full curation chain over ``docs``.

    Returns the curated Dataset, or ``(Dataset, report)`` with per-stage
    survivor counts when ``collect_report=True``. ``sample_hex_lt="4"``
    keeps the deterministic ≈4/16 md5 hash split; ``None`` skips sampling.
    ``token_budget`` additionally cuts the surviving corpus to ≤ N tokens
    in deterministic md5 priority order (``stages.selection
    .take_until_budget`` over the annotate stage's ``n_tokens``) — the
    "curate down to a training budget" endpoint. ``keep_cols`` projects the
    final output (default: the input's columns). ``strip_spans_ngram=N``
    inserts duplicated-span stripping (dedup.dup_span_strip, fixed-N
    ExactSubstr) after the filter and BEFORE exact dedup — removing shared
    boilerplate first makes near-identical pages exactly identical, so the
    cheap exact stage absorbs them.
    """
    from ethereum_etl_ray.pipelines.dedup import exact_dedup, minhash_lsh_dedup_pairs
    from ethereum_etl_ray.stages.components import dedup_apply

    out_cols = keep_cols or list(docs.schema().names)
    report: dict[str, int] = {}
    if collect_report:
        docs = docs.materialize()
        report["input"] = docs.count()

    filtered = docs.map_batches(
        _annotate_filter(tuple(langs), min_quality_ppm, text_col),
        batch_format="pyarrow", zero_copy_batch=True)
    # the dedup stages only need (id, text): prune the annotation columns
    # (and any payload) before anything that shuffles — but carry the token
    # count through when the budget cut needs it downstream
    carry = {id_col, text_col, *out_cols}
    if token_budget is not None:
        carry.add("n_tokens")
    filtered = filtered.select_columns(sorted(carry))
    if collect_report:
        filtered = filtered.materialize()
        report["after_lang_quality"] = filtered.count()

    if strip_spans_ngram is not None:
        from ethereum_etl_ray.pipelines.dedup import dup_span_strip

        filtered = dup_span_strip(
            filtered, ngram=strip_spans_ngram, id_col=id_col,
            text_col=text_col,
            carry_cols=[c for c in sorted(carry)
                        if c not in (id_col, text_col)])
        if collect_report:
            filtered = filtered.materialize()
            report["after_span_strip"] = filtered.count()

    # ALWAYS checkpoint here: `exact` is the DAG's join point (consumed by
    # both the near-dup pair generation and the keep-one apply) and Ray
    # Data does not cache lineage — unmaterialized, the whole upstream
    # chain including the exact-dedup shuffle would execute twice. In the
    # object store it is spill-backed; a 100 TB run that prefers durable
    # storage should split the pipeline at this boundary (write the
    # exact-deduped corpus to the lake, re-read for the near-dup phase).
    exact = exact_dedup(filtered, text_col=text_col, id_col=id_col).materialize()
    if collect_report:
        report["after_exact_dedup"] = exact.count()

    pairs = minhash_lsh_dedup_pairs(exact, threshold=near_threshold,
                                    id_col=id_col, text_col=text_col)
    kept = dedup_apply(exact, pairs, id_col=id_col)
    if collect_report:
        kept = kept.materialize()
        report["after_near_dedup"] = kept.count()

    if sample_hex_lt is not None:
        kept = kept.map_batches(_hash_sample(id_col, sample_hex_lt),
                                batch_format="pyarrow", zero_copy_batch=True)
        if collect_report:
            kept = kept.materialize()
            report["after_sample"] = kept.count()

    if token_budget is not None:
        from ethereum_etl_ray.stages.selection import take_until_budget

        # another DAG join point: the budget cut makes multiple passes
        # (per-level histograms + boundary collect + apply)
        kept = kept.materialize()
        kept = take_until_budget(kept, budget=token_budget,
                                 weight_col="n_tokens", id_col=id_col)
        if collect_report:
            kept = kept.materialize()
            report["after_budget"] = kept.count()

    kept = kept.select_columns(out_cols)
    if collect_report:
        report["output"] = report.get(
            "after_budget",
            report.get("after_sample", report["after_near_dedup"]))
        return kept, report
    return kept


def make_training_shards(
    docs: ray.data.Dataset,
    out_dir: str,
    *,
    shards: int = 8,
    tokens_per_seq: int = 512,
    langs: tuple[str, ...] = ("en",),
    min_quality_ppm: int = 0,
    near_threshold: float = 0.7,
    strip_spans_ngram: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """The training-data endpoint: curate → deterministic shuffle → pack →
    hive-partitioned shard write.

    Composition of the engine's own stages, end to end:
      1. ``curate_corpus`` (lang/quality filter, optional duplicated-span
         strip, exact + near dedup);
      2. ``deterministic_shuffle`` — reproducible global permutation rank
         (``pos``), identical across runs/partitionings/cluster sizes;
      3. ``pack_sequences`` over ``pos`` order — fixed-token training
         sequences via the distributed prefix sum;
      4. one co-group join stamps (seq_id, shard = seq_id % shards) back
         onto the curated rows, written as ONE DIRECTORY PER SHARD.
    Returns a manifest dict (docs, sequences, per-shard token totals) —
    everything in it is deterministic. The manifest is committed to
    ``out_dir/_shards_manifest.json`` along with the build parameters;
    a re-run with identical parameters returns the committed manifest
    WITHOUT rebuilding (idempotent restart — the whole chain is
    deterministic, so the shards on disk are already the answer)."""
    import hashlib
    import json
    import os

    import pyarrow.compute as pc

    from ethereum_etl_ray.functions.textstats import token_count
    from ethereum_etl_ray.stages.joins import cogroup_join
    from ethereum_etl_ray.stages.packing import pack_sequences
    from ethereum_etl_ray.stages.shuffle import deterministic_shuffle

    params = {"shards": shards, "tokens_per_seq": tokens_per_seq,
              "langs": list(langs), "min_quality_ppm": min_quality_ppm,
              "near_threshold": near_threshold,
              "strip_spans_ngram": strip_spans_ngram,
              "id_col": id_col, "text_col": text_col}
    pdigest = hashlib.sha256(
        json.dumps(params, sort_keys=True).encode()).hexdigest()[:16]
    mpath = os.path.join(out_dir, "_shards_manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            committed = json.load(f)
        if committed.get("params_digest") == pdigest:
            m = committed["manifest"]
            m["per_shard"] = {int(k): v for k, v in m["per_shard"].items()}
            return m
        raise ValueError(
            f"{out_dir} holds shards built with different parameters "
            f"({committed.get('params_digest')} != {pdigest}); choose a "
            "fresh out_dir or delete the old build explicitly")

    kept = curate_corpus(docs, langs=langs, min_quality_ppm=min_quality_ppm,
                         near_threshold=near_threshold,
                         strip_spans_ngram=strip_spans_ngram,
                         id_col=id_col, text_col=text_col,
                         keep_cols=[id_col, text_col])
    ranked = deterministic_shuffle(kept, key_col=id_col, out_col="pos")

    def ann(t: pa.Table) -> pa.Table:
        return t.append_column("n_tokens", token_count(t.column(text_col)))

    ranked = ranked.map_batches(ann, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    if ranked.count() == 0:
        manifest = {"shards": shards, "docs": 0, "sequences": 0,
                    "per_shard": {}}
        os.makedirs(out_dir, exist_ok=True)
        tmp = mpath + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"params_digest": pdigest, "params": params,
                       "manifest": manifest}, f)
        os.replace(tmp, mpath)
        return manifest
    # pack over the SHUFFLED order (pos is dense 1..N by construction)
    packed = pack_sequences(ranked, "pos", "n_tokens", tokens_per_seq)

    def seq_shard(t: pa.Table) -> pa.Table:
        sid = t.column("seq_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "ppos": t.column("pos"),
            "seq_id": pa.array(sid, pa.int64()),
            "shard": pa.array(sid % shards, pa.int64())})

    assign = packed.map_batches(seq_shard, batch_format="pyarrow")
    joined = cogroup_join(
        ranked.select_columns([id_col, text_col, "pos", "n_tokens"]),
        assign, left_on="pos", right_on="ppos", how="inner",
        left_fields=[(id_col, pa.int64()), (text_col, pa.string()),
                     ("pos", pa.int64()), ("n_tokens", pa.int64())],
        right_fields=[("ppos", pa.int64()), ("seq_id", pa.int64()),
                      ("shard", pa.int64())])
    final = joined.select_columns([id_col, text_col, "pos", "n_tokens",
                                   "seq_id", "shard"]).materialize()
    os.makedirs(out_dir, exist_ok=True)
    final.write_parquet(out_dir, partition_cols=["shard"])

    stats = (final.groupby("shard")
             .aggregate(ray.data.aggregate.Sum("n_tokens",
                                               alias_name="tokens"),
                        ray.data.aggregate.Count(alias_name="docs"))
             .to_pandas().sort_values("shard").reset_index(drop=True))
    n_seq = int(final.max("seq_id")) + 1 if final.count() else 0
    manifest = {"shards": shards, "docs": int(stats["docs"].sum()),
                "sequences": n_seq,
                "per_shard": {int(r["shard"]): {"docs": int(r["docs"]),
                                                "tokens": int(r["tokens"])}
                              for _, r in stats.iterrows()}}
    tmp = mpath + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"params_digest": pdigest, "params": params,
                   "manifest": manifest}, f)
    os.replace(tmp, mpath)  # atomic commit: manifest present == build done
    return manifest
