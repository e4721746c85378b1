"""Deterministic synthetic web-page corpus + CDC change-log generator.

Per ``BASELINE.json.input_hint`` and ``FIXTURES.md``: the engine's input is a
Parquet change-log of insert/update/delete events over Common-Crawl-style web
pages ``(url, warc_ts, html, lang, …)`` keyed by ``url``. No such table exists
in the driver's test data, so it is synthesized *deterministically* (fixed
seed, no wall-clock) from the driver's ``documents.parquet`` word-soup corpus
— the CDC analogue of the reference's block-range fetch stage
(``src/tasks/fetch/raw_block.py:5-28``) producing raw rows for downstream
extract/merge.

Properties exercised (FIXTURES.md §2 knobs):
  * Zipf-skewed key distribution → hot urls for the skew/salting path
  * insert/update/delete mix → op dispatch + tombstones
  * warc_ts jitter vs seq → out-of-order delivery; version = (warc_ts, seq)
  * exact duplicate re-deliveries → dedupe/idempotence
  * v1 → v2 schema evolution at a known seq boundary (add + widen)

Output is cached under ``/tmp/webcdc_cache/<digest>`` (atomic rename + a
``_SUCCESS`` marker) as sharded Parquet so ``ray.data.read_parquet``
parallelizes the read; generation happens once per (sf_dir, knobs).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ethereum_etl_ray.functions.html import extract_text_array, render_html_array
from ethereum_etl_ray.schemas import EVENTS_SCHEMA_V1, EVENTS_SCHEMA_V2, PAGES_SCHEMA

GENERATOR_VERSION = 3  # bump to invalidate caches when generation logic changes
_CACHE_ROOT = "/tmp/webcdc_cache"
_BASE_TS_US = 1_709_251_200_000_000  # 2024-03-01T00:00:00Z in microseconds
_SHARD_ROWS = 200_000


@dataclass(frozen=True)
class Corpus:
    root: str
    snapshot_dir: str
    events_v1_dir: str
    events_v2_dir: str
    n_docs: int
    n_events: int          # logical events (before duplicate re-deliveries)
    v2_start_seq: int
    watermark: int         # max seq in the log

    @property
    def event_dirs(self) -> list[str]:
        return [self.events_v1_dir, self.events_v2_dir]


def _digest(sf_dir: str, **knobs) -> str:
    payload = json.dumps({"sf_dir": os.path.abspath(sf_dir), "gen": GENERATOR_VERSION, **knobs},
                         sort_keys=True)
    return hashlib.sha1(payload.encode()).hexdigest()[:16]


def make_url(doc_ids: np.ndarray) -> np.ndarray:
    site = doc_ids % 97
    return np.char.add(
        np.char.add("https://site", site.astype(str)),
        np.char.add(".example/p/", doc_ids.astype(str)),
    )


def _render(doc_text: pa.Array, lang: pa.Array, doc_id: np.ndarray, rev: np.ndarray) -> pa.Array:
    """Render event html: deterministic per (doc, rev)."""
    rev_s = pa.array(rev.astype(str))
    did_s = pa.array(doc_id.astype(str))
    content = pc.binary_join_element_wise(
        doc_text, " revision ", rev_s, " of page ", did_s, "", null_handling="emit_null"
    )
    title = pc.binary_join_element_wise("page ", did_s, " rev ", rev_s, "", null_handling="emit_null")
    out = render_html_array(content, lang, title, rev_s)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def ensure_corpus(
    sf_dir: str,
    *,
    events_per_doc: float = 20.0,
    seed: int = 42,
    zipf_s: float = 1.1,
    p_insert: float = 0.30,
    p_update: float = 0.58,
    p_delete: float = 0.12,
    dup_frac: float = 0.02,
    ts_jitter_s: int = 120,
    evolve_at_frac: float = 0.55,
    snapshot_frac: float = 0.5,
    unique_urls: bool = False,
) -> Corpus:
    """Generate (or reuse cached) corpus for one scale directory.

    ``unique_urls=True`` produces a bulk-load-shaped log: every event targets
    a distinct url (url suffixed with the event seq), no deletes/duplicates —
    the worst case for a CDC merge (zero reduction; every row is extracted
    and written). Used by the scaling benchmark.
    """
    if unique_urls:
        p_insert, p_update, p_delete, dup_frac, snapshot_frac = 1.0, 0.0, 0.0, 0.0, 0.0
    key = _digest(sf_dir, epd=events_per_doc, seed=seed, z=zipf_s, pi=p_insert,
                  pu=p_update, pd=p_delete, df=dup_frac, j=ts_jitter_s,
                  ev=evolve_at_frac, sn=snapshot_frac, uu=unique_urls)
    root = os.path.join(_CACHE_ROOT, key)
    meta_path = os.path.join(root, "meta.json")
    if os.path.exists(os.path.join(root, "_SUCCESS")):
        meta = json.load(open(meta_path))
        return Corpus(root=root, **meta)

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"]).combine_chunks()
    n_docs = docs.num_rows
    doc_ids = docs["doc_id"].to_numpy()
    doc_text = docs["text"].chunk(0) if docs["text"].num_chunks else pa.array([], pa.string())
    doc_lang = docs["lang"].chunk(0) if docs["lang"].num_chunks else pa.array([], pa.string())
    urls_all = make_url(doc_ids)

    rng = np.random.default_rng(seed)
    n_events = int(round(events_per_doc * n_docs))

    # Zipf-skewed doc choice: permute ranks so hot docs are scattered over ids
    ranks = rng.permutation(n_docs)
    w = (ranks + 1.0) ** (-zipf_s)
    w /= w.sum()
    ev_doc = rng.choice(n_docs, size=n_events, p=w)
    ev_op = rng.choice(np.array(["insert", "update", "delete"]),
                       size=n_events, p=[p_insert, p_update, p_delete])
    # revision counter = running occurrence count per doc
    ev_rev = pd.Series(ev_doc).groupby(ev_doc).cumcount().to_numpy()
    ev_seq = np.arange(n_events, dtype=np.int64)
    jitter = rng.integers(-ts_jitter_s, ts_jitter_s + 1, size=n_events)
    ev_ts = _BASE_TS_US + ev_seq * 1_000_000 + jitter * 1_000_000

    # exact duplicate re-deliveries appended at the end of the log (same seq!)
    n_dup = int(n_events * dup_frac)
    dup_idx = rng.choice(n_events, size=n_dup, replace=False) if n_dup else np.array([], dtype=int)

    order = np.concatenate([np.arange(n_events), dup_idx]).astype(np.int64)
    v2_start_seq = int(n_events * evolve_at_frac)

    tmp = root + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    for sub in ("snapshot", "events_v1", "events_v2"):
        os.makedirs(os.path.join(tmp, sub), exist_ok=True)

    # ---- initial lake snapshot: half the docs pre-exist at rev -1 (seq = -1)
    snap_mask = (doc_ids % int(round(1 / snapshot_frac))) == 0 if snapshot_frac > 0 else \
        np.zeros(n_docs, dtype=bool)
    snap_ids = doc_ids[snap_mask]
    snap_rev = np.full(len(snap_ids), 0)
    s_text = doc_text.filter(pa.array(snap_mask))
    s_lang = doc_lang.filter(pa.array(snap_mask))
    s_html = _render(s_text, s_lang, snap_ids, snap_rev)
    snap_tbl = pa.table(
        {
            "url": pa.array(make_url(snap_ids)),
            "warc_ts": pa.array(np.full(len(snap_ids), _BASE_TS_US - 86_400_000_000),
                                pa.timestamp("us")),
            "html": s_html,
            "text": extract_text_array(s_html),
            "lang": pc.cast(s_lang, pa.large_string()),
            "seq": pa.array(np.full(len(snap_ids), -1, dtype=np.int64)),
            "fetch_status": pa.nulls(len(snap_ids), pa.int32()),
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(snap_tbl, os.path.join(tmp, "snapshot", "part-0.parquet"))

    # ---- event shards (vectorized per shard to bound memory)
    v1_i = v2_i = 0
    for lo in range(0, len(order), _SHARD_ROWS):
        sel = order[lo:lo + _SHARD_ROWS]
        d = ev_doc[sel]
        seq = ev_seq[sel]
        op = ev_op[sel]
        rev = ev_rev[sel]
        ts = ev_ts[sel]
        take = pa.array(d)
        t_text = pc.take(doc_text, take)
        t_lang = pc.take(doc_lang, take)
        is_del = op == "delete"
        html = _render(t_text, t_lang, doc_ids[d], rev)
        # deletes carry no payload (FIXTURES §2)
        del_mask = pa.array(~is_del)
        html = pc.if_else(del_mask, html, pa.nulls(len(sel), pa.binary()))
        lang_col = pc.if_else(del_mask, t_lang, pa.nulls(len(sel), pa.string()))
        clen = pc.fill_null(pc.binary_length(html), 0)

        ev_urls = make_url(doc_ids[d])
        if unique_urls:
            ev_urls = np.char.add(np.char.add(ev_urls, "-"), seq.astype(str))
        base = {
            "seq": pa.array(seq),
            "op": pa.array(op),
            "url": pa.array(ev_urls),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": html,
            "lang": lang_col,
        }
        v1_rows = seq < v2_start_seq
        if v1_rows.any():
            m = pa.array(v1_rows)
            t = pa.table({**{k: pc.filter(v, m) for k, v in base.items()},
                          "content_len": pc.cast(pc.filter(clen, m), pa.int32())},
                         schema=EVENTS_SCHEMA_V1)
            pq.write_table(t, os.path.join(tmp, "events_v1", f"part-{v1_i:05d}.parquet"))
            v1_i += 1
        if (~v1_rows).any():
            m = pa.array(~v1_rows)
            fs = np.where(seq[~v1_rows] % 10 == 7, 404, 200).astype(np.int32)
            t = pa.table({**{k: pc.filter(v, m) for k, v in base.items()},
                          "lang": pc.cast(pc.filter(base["lang"], m), pa.large_string()),
                          "content_len": pc.cast(pc.filter(clen, m), pa.int64()),
                          "fetch_status": pa.array(fs)},
                         schema=EVENTS_SCHEMA_V2)
            pq.write_table(t, os.path.join(tmp, "events_v2", f"part-{v2_i:05d}.parquet"))
            v2_i += 1

    meta = {
        "snapshot_dir": os.path.join(root, "snapshot"),
        "events_v1_dir": os.path.join(root, "events_v1"),
        "events_v2_dir": os.path.join(root, "events_v2"),
        "n_docs": int(n_docs),
        "n_events": int(n_events),
        "v2_start_seq": v2_start_seq,
        "watermark": int(n_events - 1),
    }
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    try:
        os.replace(tmp, root) if not os.path.exists(root) else shutil.rmtree(tmp)
    except OSError:
        # lost a concurrent-generation race; the winner's output is identical
        shutil.rmtree(tmp, ignore_errors=True)
    return Corpus(root=root, **meta)
