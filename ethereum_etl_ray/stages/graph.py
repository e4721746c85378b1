"""Iterative broadcast join over an edge table — bounded-hop graph reach.

The J5 capability of the reference (``src/tasks/extract/pool.py:183-290``):
a BFS of ≤5 hops over pool edges consulting side-input state to resolve a
price path. Re-expressed Ray-Data-native as N rounds of broadcast-lookup
against a DISTRIBUTED edge Dataset:

  per hop:  frontier (small: starts × branching) is broadcast via ``ray.put``
            → the edge table is scanned once with a fused membership filter
            (``semi_anti_filter`` on the frontier's node set)
            → matching edges join the frontier inside ``map_batches``
            → newly reached (start, node) pairs become the next frontier.

The edge table never materializes on the driver and is the only large side;
the frontier/visited state is bounded by ``|starts| × |reachable|`` — the
same bound the reference's Memgraph session holds in graph memory. For
unbounded frontiers, swap the broadcast for a hash-join per hop
(``Dataset.join`` on ``src``); the loop structure is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def graph_reach(
    edges: ray.data.Dataset,
    starts: list[str],
    max_hops: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pd.DataFrame:
    """All nodes reachable from each start within ``max_hops`` directed hops.

    Returns ``(start, node, hops)`` with the MINIMAL hop count per
    (start, node) — hop 0 is the start itself. Deterministic.
    """
    from ethereum_etl_ray.stages.joins import semi_anti_filter

    # iterative reuse: pin the edge blocks in the (spillable) object store once
    # instead of re-executing the edge-build pipeline every hop
    edges = edges.materialize()
    starts = list(dict.fromkeys(starts))  # stable-unique
    visited = pd.DataFrame({"start": starts, "node": starts,
                            "hops": np.zeros(len(starts), dtype=np.int64)})
    frontier = visited[["start", "node"]]
    for hop in range(1, max_hops + 1):
        nodes = frontier["node"].unique()
        if not len(nodes):
            break
        fref = ray.put(frontier)

        def expand(batch: pd.DataFrame, _ref=fref) -> pd.DataFrame:
            f = ray.get(_ref)
            m = batch.merge(f, left_on=src_col, right_on="node")
            return (m[["start", dst_col]].rename(columns={dst_col: "node"})
                    .drop_duplicates())

        sub = semi_anti_filter(edges, nodes, on=src_col)
        new = sub.map_batches(expand, batch_format="pandas").to_pandas()
        if new.empty:
            break
        new = new.drop_duplicates()
        # min-hops: anything already visited keeps its earlier (smaller) hop
        probe = new.merge(visited[["start", "node"]], on=["start", "node"],
                          how="left", indicator=True)
        new = probe[probe["_merge"] == "left_only"][["start", "node"]].copy()
        if new.empty:
            break
        new["hops"] = np.int64(hop)
        visited = pd.concat([visited, new], ignore_index=True)
        frontier = new[["start", "node"]]
    return (visited.sort_values(["start", "hops", "node"], kind="stable")
            .reset_index(drop=True))
