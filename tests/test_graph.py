"""Iterative broadcast graph-reach tests (stages.graph ↔ reference J5,
src/tasks/extract/pool.py:183-290 BFS ≤5 hops)."""

import ray.data

from ethereum_etl_ray.stages.graph import graph_reach


def _edges(pairs):
    return ray.data.from_items([{"src": s, "dst": d} for s, d in pairs])


def test_reach_min_hops_and_bound():
    # a→b→c→d chain plus a shortcut a→c: c must report hops=1 (minimal)
    e = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    out = graph_reach(e, ["a"], max_hops=2)
    got = {(r.start, r.node): r.hops for r in out.itertuples(index=False)}
    assert got == {("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 1, ("a", "d"): 2}
    # hop bound respected
    out1 = graph_reach(e, ["a"], max_hops=1)
    assert set(out1.node) == {"a", "b", "c"}


def test_reach_cycles_terminate():
    e = _edges([("a", "b"), ("b", "a")])
    out = graph_reach(e, ["a"], max_hops=5)
    got = {(r.start, r.node): r.hops for r in out.itertuples(index=False)}
    assert got == {("a", "a"): 0, ("a", "b"): 1}


def test_reach_multiple_starts_independent():
    e = _edges([("a", "x"), ("b", "y"), ("x", "z"), ("y", "z")])
    out = graph_reach(e, ["a", "b"], max_hops=2)
    got = {(r.start, r.node): r.hops for r in out.itertuples(index=False)}
    assert got[("a", "z")] == 2 and got[("b", "z")] == 2
    assert ("a", "y") not in got and ("b", "x") not in got
