"""Iterative broadcast graph-reach tests (stages.graph ↔ reference J5,
src/tasks/extract/pool.py:183-290 BFS ≤5 hops)."""

import numpy as np
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


def _as_dict(df):
    return {(r.start, r.node): r.hops for r in df.itertuples(index=False)}


def _random_edges(seed, n_nodes, n_edges):
    import numpy as np

    rng = np.random.default_rng(seed)
    s = rng.integers(0, n_nodes, size=n_edges)
    d = rng.integers(0, n_nodes, size=n_edges)
    return [(f"n{a}", f"n{b}") for a, b in zip(s, d) if a != b]


def test_join_per_hop_route_matches_broadcast():
    """graph_reach_ds (fully distributed frontier/visited) must equal the
    broadcast route on a random multi-start graph, min-hops included."""
    from ethereum_etl_ray.stages.graph import graph_reach_ds

    pairs = _random_edges(41, 40, 120)
    e = _edges(pairs)
    starts = ["n0", "n7", "n13"]
    bc = graph_reach(e, starts, max_hops=4)
    ds = (graph_reach_ds(e, starts, max_hops=4).to_pandas()
          .sort_values(["start", "hops", "node"], kind="stable")
          .reset_index(drop=True))
    assert _as_dict(ds) == _as_dict(bc)


def test_large_frontier_escalates_mid_loop_and_matches():
    """frontier_threshold=1 forces the broadcast loop to hand its mid-BFS
    state to the join-per-hop route after hop 1; the answer must not change.
    Also exercises cycles + a shortcut (min-hop correctness across routes)."""
    pairs = _random_edges(43, 30, 90) + [("n0", "n1"), ("n1", "n0")]
    e = _edges(pairs)
    # single start: hop 1 runs broadcast (frontier=1 row ≤ threshold), the
    # hop-1 result exceeds the threshold → hops 2+ run distributed
    unlimited = graph_reach(e, ["n0"], max_hops=3)
    escalated = graph_reach(e, ["n0"], max_hops=3, frontier_threshold=1)
    assert _as_dict(escalated) == _as_dict(unlimited)


def test_join_route_terminates_on_cycles():
    from ethereum_etl_ray.stages.graph import graph_reach_ds

    e = _edges([("a", "b"), ("b", "a")])
    out = graph_reach_ds(e, ["a"], max_hops=5).to_pandas()
    assert _as_dict(out) == {("a", "a"): 0, ("a", "b"): 1}


def _np_pagerank(edge_list, iters=10, d=0.85):
    import numpy as np
    nodes = sorted({u for e in edge_list for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edge_list:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        for s, t in edge_list:
            nxt[idx[t]] += d * r[idx[s]] / out[idx[s]]
        r = nxt
    return dict(zip(nodes, r))


def test_pagerank_matches_power_iteration(ray_session):
    from ethereum_etl_ray.stages.graph import pagerank

    edge_list = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
                 ("d", "c"), ("d", "a"), ("b", "d")]
    edges = ray.data.from_items([{"src": s, "dst": t} for s, t in edge_list]
                                ).repartition(3)
    got = (pagerank(edges, iters=8, driver_threshold=0)
           .to_pandas().set_index("node")["rank"])
    want = _np_pagerank(edge_list, iters=8)
    assert set(got.index) == set(want)
    for node, r in want.items():
        assert abs(got.loc[node] - r) < 1e-9, node
    # distributed argmax agrees with the oracle's
    assert got.idxmax() == max(want, key=want.get)


def test_pagerank_empty_graph(ray_session):
    from ethereum_etl_ray.stages.graph import pagerank

    import pyarrow as pa

    e = ray.data.from_arrow(pa.table({"src": pa.array([], pa.string()),
                                      "dst": pa.array([], pa.string())}))
    assert pagerank(e, iters=2).count() == 0


def test_pagerank_routes_equivalent(ray_session):
    """Driver-exact and distributed routes compute the same recipe."""
    from ethereum_etl_ray.stages.graph import pagerank

    edge_list = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    edges = ray.data.from_items([{"src": s, "dst": t} for s, t in edge_list])
    fast = (pagerank(edges, iters=6).to_pandas()
            .set_index("node")["rank"])
    dist = (pagerank(edges, iters=6, driver_threshold=0).to_pandas()
            .set_index("node")["rank"])
    for node in fast.index:
        assert abs(fast.loc[node] - dist.loc[node]) < 1e-9


def _wedges(triples):
    return ray.data.from_items(
        [{"src": s, "dst": d, "w": w} for s, d, w in triples])


def test_path_value_max_over_min_hop_paths():
    # two 2-hop paths a→{b,c}→d with products 0.5*0.5=0.25 and 0.25*1.0=0.25?
    # make them differ: via b = 0.5*0.25 = 0.125, via c = 0.25*1.0 = 0.25
    e = _wedges([("a", "b", 0.5), ("b", "d", 0.25),
                 ("a", "c", 0.25), ("c", "d", 1.0)])
    out = graph_reach(e, ["a"], max_hops=3, weight_col="w")
    got = {(r.start, r.node): (r.hops, r.path_value)
           for r in out.itertuples(index=False)}
    assert got[("a", "a")] == (0, 1.0)
    assert got[("a", "b")] == (1, 0.5)
    assert got[("a", "c")] == (1, 0.25)
    assert got[("a", "d")] == (2, 0.25)  # max over the two minimal paths


def test_path_value_parallel_edges_take_max():
    e = _wedges([("a", "b", 0.5), ("a", "b", 0.75)])
    out = graph_reach(e, ["a"], max_hops=1, weight_col="w")
    got = {(r.start, r.node): r.path_value for r in out.itertuples(index=False)}
    assert got[("a", "b")] == 0.75


def test_path_value_ignores_longer_higher_value_paths():
    # a→d direct (w=0.1) is minimal (1 hop); a→b→d would give 0.9*0.9=0.81
    # but is 2 hops — min-hop semantics keep 0.1
    e = _wedges([("a", "d", 0.1), ("a", "b", 0.9), ("b", "d", 0.9)])
    out = graph_reach(e, ["a"], max_hops=3, weight_col="w")
    got = {(r.start, r.node): (r.hops, r.path_value)
           for r in out.itertuples(index=False)}
    assert got[("a", "d")] == (1, 0.1)


def test_path_value_join_per_hop_route_matches_broadcast():
    import numpy as np

    rng = np.random.default_rng(7)
    n_nodes, n_edges = 40, 160
    s = rng.integers(0, n_nodes, size=n_edges)
    d = rng.integers(0, n_nodes, size=n_edges)
    # powers of 0.5 → exact float products on every route
    w = np.power(0.5, rng.integers(0, 3, size=n_edges).astype(float))
    triples = [(f"n{a}", f"n{b}", float(x))
               for a, b, x in zip(s, d, w) if a != b]
    e = _wedges(triples)
    starts = ["n0", "n1", "n2"]
    broad = graph_reach(e, starts, max_hops=4, weight_col="w")
    escal = graph_reach(e, starts, max_hops=4, weight_col="w",
                        frontier_threshold=0)
    key = lambda df: {(r.start, r.node): (r.hops, r.path_value)
                      for r in df.itertuples(index=False)}
    assert key(broad) == key(escal)

    from ethereum_etl_ray.stages.graph import graph_reach_ds
    ds = graph_reach_ds(e, starts, max_hops=4, weight_col="w").to_pandas()
    ds = ds.rename(columns={"val": "path_value"})
    assert key(broad) == key(ds)


def test_triangle_counts_handcrafted():
    """K4 on {0,1,2,3} (4 triangles: apexes 0x3, 1x1) plus an edge pair
    with no closure and an isolated edge."""
    import pandas as pd
    import ray.data

    from ethereum_etl_ray.stages.graph import triangle_counts

    edges = pd.DataFrame({
        "u": [0, 0, 0, 1, 1, 2, 5, 5, 8],
        "v": [1, 2, 3, 2, 3, 3, 6, 7, 9],
    })
    out = (triangle_counts(ray.data.from_pandas(edges).repartition(3))
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert out.node.tolist() == [0, 1]
    # apex 0: (1,2),(1,3),(2,3) all closed; apex 1: (2,3) closed;
    # apex 5: (6,7) open
    assert out.n_triangles.tolist() == [3, 1]


def test_triangle_counts_no_triangles():
    import pandas as pd
    import ray.data

    from ethereum_etl_ray.stages.graph import triangle_counts

    edges = pd.DataFrame({"u": [0, 1, 2], "v": [1, 2, 3]})  # path graph
    out = triangle_counts(ray.data.from_pandas(edges)).to_pandas()
    assert len(out) == 0


def test_triangle_wedges_bounded_on_star_hub():
    """Degree orientation bounds wedge count by arboricity: a star with a
    10^4-degree hub plus a small triangle must NOT expand the hub's d^2/2
    (~5*10^7) pairs.  All star edges orient leaf->hub (leaf degree 1 < hub
    degree), so each leaf contributes at most 1 out-edge and the hub apex
    contributes none; total wedges stays O(E), far under the E*sqrt(E) bar."""
    import pandas as pd
    import ray.data

    from ethereum_etl_ray.stages.graph import (oriented_edges,
                                               oriented_wedges,
                                               triangle_counts)

    d = 10_000
    # hub id 0 (the SMALLEST id, the worst case for id-orientation: the old
    # u<v wedge expansion would emit d*(d-1)/2 ~ 5e7 wedge rows here) with
    # leaves 1..d, plus one planted triangle (1, 2) closing hub-1-2
    edges = pd.DataFrame({
        "u": [0] * d + [1],
        "v": list(range(1, d + 1)) + [2],
    })
    e_ds = ray.data.from_pandas(edges).repartition(4)

    oe = oriented_edges(e_ds, num_partitions=4).materialize()
    n_wedges = oriented_wedges(oe, 4).count()
    n_edges = len(edges)
    assert n_wedges <= int(n_edges * np.sqrt(n_edges)), n_wedges
    assert n_wedges < 10_000  # actually O(E): leaves have out-degree <= 2

    out = (triangle_counts(e_ds, num_partitions=4)
           .to_pandas().sort_values("node").reset_index(drop=True))
    # exactly the planted triangle {0,1,2}, attributed to min-id apex 0
    assert out.node.tolist() == [0]
    assert out.n_triangles.tolist() == [1]


def test_triangle_counts_degree_tie_orientation():
    """All-equal degrees (a 4-cycle + chord yields deg ties) — tie-break by
    id must still count every triangle exactly once with the same per-apex
    attribution as the id-ordered oracle."""
    import pandas as pd
    import ray.data

    from ethereum_etl_ray.stages.graph import triangle_counts

    # 4-cycle 0-1-2-3 with chord 0-2: triangles {0,1,2} and {0,2,3}
    edges = pd.DataFrame({"u": [0, 1, 2, 0, 0], "v": [1, 2, 3, 3, 2]})
    out = (triangle_counts(ray.data.from_pandas(edges))
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert out.node.tolist() == [0]
    assert out.n_triangles.tolist() == [2]
