"""Property-based replay conformance (hypothesis).

FIXTURES.md §4/§5: randomized event logs — arbitrary key/version
distributions, duplicate deliveries, permuted delivery order, random batch
splits — must converge to exactly the sequential oracle's state, and the
merge must be associative (any batch partitioning → same winners). These run
the merge core directly on Arrow tables (no Ray session needed), so hundreds
of cases are cheap.
"""

import datetime as dt

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ethereum_etl_ray.stages.merge import MERGE_SCHEMA, finalize_winners, lww_pick

BASE = dt.datetime(2024, 3, 1)


@st.composite
def event_logs(draw):
    n = draw(st.integers(1, 60))
    n_keys = draw(st.integers(1, 8))
    rows = []
    for seq in range(n):
        key = f"u{draw(st.integers(0, n_keys - 1))}"
        ts_off = draw(st.integers(0, 20))        # coarse → many version ties
        op = draw(st.sampled_from(["insert", "update", "update", "delete"]))
        rows.append((key, ts_off, seq, op))
    # duplicate re-deliveries of random rows (same seq!)
    for _ in range(draw(st.integers(0, 5))):
        rows.append(rows[draw(st.integers(0, n - 1))])
    perm = draw(st.permutations(range(len(rows))))
    return [rows[i] for i in perm]


def _table(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([BASE + dt.timedelta(seconds=r[1]) for r in rows],
                                pa.timestamp("us")),
            "seq": pa.array([r[2] for r in rows], pa.int64()),
            "op": pa.array([r[3] for r in rows]),
            "html": pa.array([None if r[3] == "delete" else b"<p>%d</p>" % r[2]
                              for r in rows], pa.binary()),
            "lang": pa.array(["en"] * len(rows), pa.large_string()),
            "text": pa.array([None] * len(rows), pa.string()),
            "fetch_status": pa.nulls(len(rows), pa.int32()),
        },
        schema=MERGE_SCHEMA,
    )


def _oracle(rows, mode="replace"):
    state = {}
    for key, ts_off, seq, op in rows:
        ver = (ts_off, seq)
        cur = state.get(key)
        if cur is None or (ver >= cur[0] if mode == "replace" else ver < cur[0]):
            state[key] = (ver, op)
    return {k: v[0][1] for k, v in state.items() if v[1] != "delete"}


@settings(max_examples=120, deadline=None)
@given(event_logs(), st.sampled_from(["replace", "ignore"]))
def test_merge_matches_oracle_under_permutation(rows, mode):
    t = _table(rows)
    winners = finalize_winners(lww_pick(t, mode=mode))
    got = dict(zip(winners.column("url").to_pylist(),
                   winners.column("seq").to_pylist()))
    assert got == _oracle(rows, mode)


@settings(max_examples=60, deadline=None)
@given(event_logs(), st.integers(1, 5))
def test_merge_is_associative_over_batch_splits(rows, n_splits):
    t = _table(rows)
    direct = lww_pick(t).sort_by("url")
    step = max(1, len(rows) // n_splits)
    partials = [lww_pick(t.slice(i, step)) for i in range(0, len(rows), step)]
    recombined = lww_pick(pa.concat_tables(partials)).sort_by("url")
    assert direct.to_pylist() == recombined.to_pylist()


@settings(max_examples=40, deadline=None)
@given(event_logs())
def test_suffix_replay_idempotent(rows):
    """Replaying any suffix twice converges to the same state (the property
    the reference gets from INSERT OR REPLACE idempotence)."""
    t = _table(rows)
    suffix = _table(rows[len(rows) // 2:]) if len(rows) > 1 else t
    once = lww_pick(t).sort_by("url")
    twice = lww_pick(pa.concat_tables([t, suffix])).sort_by("url")
    assert once.to_pylist() == twice.to_pylist()
