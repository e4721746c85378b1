"""Unit tests for the LWW merge core (stages.merge)."""

import datetime as dt

import pyarrow as pa
import pyarrow.compute as pc

from ethereum_etl_ray.functions.html import render_html_py
from ethereum_etl_ray.stages.merge import (
    MERGE_SCHEMA,
    events_to_merge_frame,
    finalize_winners,
    lww_pick,
    make_combiner,
)


def _ts(s):
    return dt.datetime(2024, 3, 1) + dt.timedelta(seconds=s)


def _frame(rows):
    """rows: (url, ts_off, seq, op, html, lang, text)"""
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([_ts(r[1]) for r in rows], pa.timestamp("us")),
            "seq": pa.array([r[2] for r in rows], pa.int64()),
            "op": pa.array([r[3] for r in rows]),
            "html": pa.array([r[4] for r in rows], pa.binary()),
            "lang": pa.array([r[5] for r in rows], pa.large_string()),
            "text": pa.array([r[6] for r in rows], pa.string()),
            "fetch_status": pa.nulls(len(rows), pa.int32()),
        },
        schema=MERGE_SCHEMA,
    )


def test_lww_pick_replace_max_version_wins():
    t = _frame([
        ("u1", 10, 1, "insert", b"a", "en", None),
        ("u1", 30, 2, "update", b"b", "en", None),   # winner: max warc_ts
        ("u1", 20, 3, "update", b"c", "en", None),
        ("u2", 5, 4, "insert", b"d", "de", None),
    ])
    out = lww_pick(t)
    got = {r["url"]: r for r in out.to_pylist()}
    assert len(out) == 2
    assert got["u1"]["html"] == b"b" and got["u1"]["seq"] == 2
    assert got["u2"]["html"] == b"d"


def test_lww_pick_seq_breaks_warc_ts_ties():
    t = _frame([
        ("u1", 10, 1, "insert", b"a", "en", None),
        ("u1", 10, 5, "update", b"b", "en", None),  # same ts, higher seq wins
    ])
    out = lww_pick(t)
    assert out.to_pylist()[0]["html"] == b"b"


def test_lww_pick_ignore_mode_first_writer_wins():
    # reference INSERT OR IGNORE semantics (src/repositories/sqlite/base.py:159-172)
    t = _frame([
        ("u1", 10, 1, "insert", b"first", "en", None),
        ("u1", 30, 2, "update", b"later", "en", None),
    ])
    out = lww_pick(t, mode="ignore")
    assert out.to_pylist()[0]["html"] == b"first"


def test_lww_pick_duplicate_redelivery_collapses():
    t = _frame([
        ("u1", 10, 1, "insert", b"a", "en", None),
        ("u1", 10, 1, "insert", b"a", "en", None),  # exact duplicate (same seq)
    ])
    out = lww_pick(t)
    assert out.num_rows == 1


def test_lww_pick_null_keys_do_not_drop_neighbors():
    # keys ['a', None, 'b']: the null neighbor must not erase 'b''s winner,
    # and null keys collapse to ONE group (SQL PARTITION BY semantics)
    t = _frame([
        ("a", 10, 1, "insert", b"a", "en", None),
        (None, 11, 2, "insert", b"n1", "en", None),
        (None, 20, 4, "update", b"n2", "en", None),  # null-group winner
        ("b", 12, 3, "insert", b"b", "en", None),
    ])
    out = lww_pick(t)
    got = {r["url"]: r for r in out.to_pylist()}
    assert set(got) == {"a", "b", None}
    assert got["b"]["html"] == b"b"
    assert got[None]["html"] == b"n2"


def test_combiner_is_associative_with_final_pick():
    rows = [("u%d" % (i % 3), i, i, "update", b"h%d" % i, "en", None) for i in range(12)]
    t = _frame(rows)
    direct = lww_pick(t)
    # split into two "batches", combine each, then merge-pick the union
    c = make_combiner()
    partial = pa.concat_tables([c(t.slice(0, 5)), c(t.slice(5))])
    two_phase = lww_pick(partial)
    assert direct.sort_by("url").to_pylist() == two_phase.sort_by("url").to_pylist()


def test_finalize_winners_drops_tombstones_and_extracts():
    html = render_html_py("some body text", "en", "t", "0")
    t = _frame([
        ("u1", 10, 1, "update", html, "en", None),      # needs extraction
        ("u2", 11, 2, "delete", None, None, None),      # tombstone → dropped
        ("u3", 12, 3, "insert", html, "en", "already"), # text kept as-is
    ])
    out = finalize_winners(t)
    got = {r["url"]: r for r in out.to_pylist()}
    assert set(got) == {"u1", "u3"}
    assert got["u1"]["text"] == "t some body text"
    assert got["u3"]["text"] == "already"


def test_events_to_merge_frame_adds_null_text():
    ev = pa.table({
        "seq": pa.array([1], pa.int64()),
        "op": pa.array(["insert"]),
        "url": pa.array(["u"]),
        "warc_ts": pa.array([_ts(0)], pa.timestamp("us")),
        "html": pa.array([b"x"], pa.binary()),
        "lang": pa.array(["en"], pa.large_string()),
        "content_len": pa.array([1], pa.int64()),
        "fetch_status": pa.array([200], pa.int32()),
    })
    out = events_to_merge_frame(ev)
    assert out.schema.equals(MERGE_SCHEMA)
    assert pc.is_null(out["text"]).to_pylist() == [True]


def test_lww_pick_random_matches_pandas_reference():
    """Property check (seeded sweep): lww_pick on random tables — including
    null keys and version ties — must match an independent pandas
    groupby-idxmax/idxmin reference in both modes."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(99)
    for trial in range(25):
        n = int(rng.integers(1, 60))
        keys = rng.choice(["a", "b", "c", None], size=n).tolist()
        df = pd.DataFrame({
            "url": keys,
            "warc_ts": [dt.datetime(2024, 3, 1) + dt.timedelta(
                seconds=int(s)) for s in rng.integers(0, 5, size=n)],
            "seq": rng.integers(0, 50, size=n),
        })
        t = pa.table({
            "url": pa.array(df.url, pa.string()),
            "warc_ts": pa.array(df.warc_ts, pa.timestamp("us")),
            "seq": pa.array(df.seq, pa.int64()),
        })
        for mode in ("replace", "ignore"):
            got = lww_pick(t, mode=mode).to_pandas()
            ref = df.copy()
            ref["_k"] = ref.url.fillna("\x00<null>")
            asc = mode == "ignore"
            ref = (ref.sort_values(["warc_ts", "seq"], ascending=asc,
                                   kind="stable")
                   .drop_duplicates("_k", keep="first"))
            want = {(k if k != "\x00<null>" else None): (ts, s) for k, ts, s
                    in zip(ref._k, ref.warc_ts, ref.seq)}
            gotmap = {u: (ts, s) for u, ts, s
                      in zip(got.url, got.warc_ts, got.seq)}
            assert gotmap == want, (trial, mode)
