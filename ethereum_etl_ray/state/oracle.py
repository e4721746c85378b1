"""Sequential-replay oracle (FIXTURES.md §4) — the correctness authority.

Single-threaded, pure-Python replay of the change log into a dict keyed by
``url``: the CDC analogue of the reference's convergence property — replaying
any block range through idempotent ``INSERT OR REPLACE`` sinks converges to
one state (``src/repositories/sqlite/base.py:159-172``). The distributed
engine's final lake must match this byte-identically per url, including after
checkpoint restart and duplicate replay.

Version rule (shared with ``stages.merge``): winner per key is the row with
max ``(warc_ts, seq)`` (``mode="replace"``) or min (``mode="ignore"``);
``delete`` winners tombstone the key. This is order-independent, so the
oracle may see events in any order and still defines a unique final state.

Text comes from the independent pure-Python extractor
(``functions.html.extract_text_py``), NOT the Arrow kernels under test.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa

from ethereum_etl_ray.functions.html import extract_text_py


def sequential_replay(
    event_tables: Iterable[pa.Table],
    snapshot: pa.Table | None = None,
    mode: str = "replace",
) -> dict[str, dict]:
    """Returns {url: {"warc_ts", "seq", "lang", "text", "html"}} final state."""
    state: dict[str, dict] = {}

    def better(new_ver, cur_ver):
        return new_ver >= cur_ver if mode == "replace" else new_ver < cur_ver

    def apply(url, ver, op, html, lang, text):
        cur = state.get(url)
        if cur is not None and not better(ver, cur["_ver"]):
            return
        state[url] = {"_ver": ver, "op": op, "html": html, "lang": lang,
                      "text": text, "warc_ts": ver[0], "seq": ver[1]}

    if snapshot is not None:
        for row in snapshot.to_pylist():
            apply(row["url"], (row["warc_ts"], row["seq"]), "insert",
                  row["html"], row["lang"], row.get("text"))

    for t in event_tables:
        for row in t.to_pylist():
            apply(row["url"], (row["warc_ts"], row["seq"]), row["op"],
                  row["html"], row["lang"], None)

    final: dict[str, dict] = {}
    for url, row in state.items():
        if row["op"] == "delete":
            continue
        text = row["text"] if row["text"] is not None else extract_text_py(row["html"])
        final[url] = {
            "warc_ts": row["warc_ts"],
            "seq": row["seq"],
            "lang": row["lang"],
            "text": text,
        }
    return final
