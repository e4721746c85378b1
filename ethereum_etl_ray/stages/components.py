"""Distributed connected components + duplicate-cluster resolution.

Completes the corpus-dedup story: the near-dup pipelines
(``pipelines.dedup``) emit verified duplicate PAIRS; a training-data
pipeline ends with "drop all but one document per duplicate cluster", which
is connected components over the pair graph followed by an anti-join apply.
The reference's only analogue is distinct-as-dedup (A1-A3,
``src/tasks/extract/account.py:7-27``) — this is its transitive, corpus-wide
generalization.

Two routes, equivalent by construction (tests assert it):

  * ``union_find_labels`` — driver-side union-find with path compression for
    a collected (DataFrame) pair set. Exact, O(pairs · α); right when the
    verified pair set already sits on the driver (the default small-corpus
    path of ``minhash_lsh_dedup_pairs``).
  * ``connected_components_ds`` — distributed min-label propagation with
    pointer jumping for a pair DATASET (the ``streaming=True`` 100 TB path —
    boilerplate clusters make even the verified pair set big data). Per
    round: each node takes the min label over itself and its neighbors
    (one co-group join + one hash aggregate), then a pointer-jumping
    shortcut round (``label ← label[label]``) collapses chains in
    O(log diameter) rounds instead of O(diameter). Convergence is detected
    by an order-independent wrapping checksum of the label table (labels
    only ever decrease, so any change moves the checksum; the label table
    itself never touches the driver).

``dedup_apply`` then keeps exactly one representative (the min id) per
cluster:

  * ``route="broadcast"`` — collect the DROP ids (non-representatives; tiny
    relative to the corpus for realistic dup rates) and anti-filter with one
    broadcast pass over the corpus — no shuffle of the documents.
  * ``route="shuffle"`` — fully distributed left-anti join via
    ``cogroup_join`` when even the drop set must stay off the driver; one
    corpus shuffle, nothing driver-resident.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def union_find_labels(pairs: pd.DataFrame, *, a_col: str = "doc_a",
                      b_col: str = "doc_b") -> pd.DataFrame:
    """Exact components of a driver-resident pair set.

    Returns ``(node, component)`` for every node that appears in a pair,
    component = min node id of its cluster."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs[a_col].to_numpy(), pairs[b_col].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by min so the final relabel pass is a single find()
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = np.fromiter(parent.keys(), dtype=np.int64, count=len(parent))
    comp = np.fromiter((find(int(n)) for n in nodes), dtype=np.int64,
                       count=len(nodes))
    return (pd.DataFrame({"node": nodes, "component": comp})
            .sort_values("node", kind="stable").reset_index(drop=True))


def _norm_labels(t: pa.Table) -> pa.Table:
    """Conform a label block to exactly (node:int64, label:int64) — hash
    aggregates on this Ray version emit zero-column empty blocks and
    shuffle-widened float columns (see stages.joins.cogroup_join)."""
    if "node" not in t.column_names:
        return pa.table({"node": pa.array([], pa.int64()),
                         "label": pa.array([], pa.int64())})
    label = t.column("label" if "label" in t.column_names else "min(label)")
    return pa.table({"node": pc.cast(t.column("node"), pa.int64()),
                     "label": pc.cast(label, pa.int64())})


def _label_checksum(labels: ray.data.Dataset) -> tuple[int, int]:
    """(wrapping uint64 sum of labels, row count) — labels only decrease, so
    an unchanged checksum over an unchanged row count means a fixpoint."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("label").to_numpy(zero_copy_only=False).astype(np.uint64)
        s = np.add.reduce(v, dtype=np.uint64) if len(v) else np.uint64(0)
        return pa.table({"s": pa.array([int(s)], pa.uint64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    parts = labels.map_batches(partial, batch_format="pyarrow").to_pandas()
    total = int(np.add.reduce(parts.s.to_numpy().astype(np.uint64),
                              dtype=np.uint64)) if len(parts) else 0
    return total, int(parts.n.sum()) if len(parts) else 0


def _min_per_node(node: np.ndarray, label: np.ndarray):
    """Vectorized min(label) per distinct node (sort + reduceat)."""
    if not len(node):
        return node, label
    order = np.argsort(node, kind="stable")
    n_s, l_s = node[order], label[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(n_s)) + 1])
    return n_s[starts], np.minimum.reduceat(l_s, starts)


def _propagate(edges_mat: ray.data.Dataset, labels_mat: ray.data.Dataset,
               num_partitions: int) -> ray.data.Dataset:
    """One min-label propagation hop as a SINGLE streamed execution:

      union(edges tagged 0, labels tagged 1)
        → hash-partition by ``node`` (each edge row co-locates with its
          source node's unique label row)
        → per partition: numpy searchsorted label lookup, emit one message
          ``(nbr, label[node])`` per edge plus every own ``(node, label)``,
          locally min-combined per node (the combiner)
        → hash-partition by target node (P groups) → vectorized min fold

    Output block count is bounded by ``num_partitions`` — essential for the
    iterative caller (unbounded groupby output blocks double per round).

    All columns stay non-null int64 end to end (absent fields are filled
    with 0, selected away by the side tag) — sidestepping Ray's
    null-padded-int → float64 shuffle widening entirely, with no schema
    probes on lazy datasets (both inputs are materialized, their schemas
    are fixed by construction)."""
    from ethereum_etl_ray.functions.hashing import partition_ids

    def widen(side_flag: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            node = t.column("node")
            other = t.column("nbr" if side_flag == 0 else "label")
            zero = pa.array(np.zeros(n, np.int64), pa.int64())
            return pa.table({
                "node": node,
                "nbr": other if side_flag == 0 else zero,
                "label": other if side_flag == 1 else zero,
                "side": pa.array(np.full(n, side_flag, np.int8), pa.int8()),
                "__part": pa.array(partition_ids(node, num_partitions),
                                   pa.int32()),
            })
        return fn

    both = (edges_mat.map_batches(widen(0), batch_format="pyarrow",
                                  zero_copy_batch=True)
            .union(labels_mat.map_batches(widen(1), batch_format="pyarrow",
                                          zero_copy_batch=True)))

    def emit(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        node = g.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        lmask = side == 1
        lnode = node[lmask]
        lval = g.column("label").to_numpy(zero_copy_only=False)[lmask].astype(np.int64)
        order = np.argsort(lnode, kind="stable")
        lnode, lval = lnode[order], lval[order]
        en = node[~lmask]
        enb = g.column("nbr").to_numpy(zero_copy_only=False)[~lmask].astype(np.int64)
        # every edge's source node has exactly one label row (labels cover
        # all adjacency nodes and co-partition by node)
        idx = np.clip(np.searchsorted(lnode, en), 0, max(0, len(lnode) - 1))
        if len(en) and (not len(lnode) or not np.array_equal(lnode[idx], en)):
            raise RuntimeError("propagation invariant broken: an edge source "
                               "node has no label row in its partition")
        out_node = np.concatenate([enb, lnode])
        out_label = np.concatenate([lval[idx] if len(en) else lval[:0], lval])
        # combine locally (one row per node per partition) before the
        # second shuffle, and key the combine stage by a P-ary partition id
        # (a P-group map_groups dispatches far cheaper than a row-key agg)
        o_node, o_label = _min_per_node(out_node, out_label)
        return pa.table({"node": pa.array(o_node, pa.int64()),
                         "label": pa.array(o_label, pa.int64()),
                         "__p2": pa.array(partition_ids(o_node, num_partitions),
                                          pa.int32())})

    def minfold(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        label = g.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        o_node, o_label = _min_per_node(node, label)
        return pa.table({"node": pa.array(o_node, pa.int64()),
                         "label": pa.array(o_label, pa.int64())})

    return (both.groupby("__part").map_groups(emit, batch_format="pyarrow")
            .groupby("__p2").map_groups(minfold, batch_format="pyarrow")
            # Ray's sort-shuffle map_groups emits ~input-many blocks (not
            # group-many): without this cap the iterative caller's block
            # count doubles per round and per-block overhead dominates
            .repartition(num_partitions))


def connected_components_ds(pairs: ray.data.Dataset, *, a_col: str = "doc_a",
                            b_col: str = "doc_b", max_rounds: int = 64,
                            num_partitions: int | None = None) -> ray.data.Dataset:
    """Distributed components of an undirected pair Dataset.

    Returns a Dataset ``(node, component)`` — component = min node id of the
    cluster — without the pair set or the label table ever materializing on
    the driver. Each round runs one neighbor-min hop plus one pointer-jump
    hop (``label ← min(label, label[label])``, expressed as a propagation
    over the label table's own ``label → node`` edges), so convergence takes
    ~log2(diameter) rounds. Raises if ``max_rounds`` rounds do not reach a
    fixpoint."""
    if num_partitions is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        num_partitions = max(2, cpus)

    def sym(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(a_col), pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t.column(b_col), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64()),
                         "nbr": pa.array(np.concatenate([b, a]), pa.int64())})

    # iterative reuse: pin the symmetrized adjacency once (cf. stages.graph)
    adj = (pairs.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)
           .materialize())
    if adj.count() == 0:
        return ray.data.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                             "component": pa.array([], pa.int64())}))

    # label(0) = min(node, min neighbor) in ONE aggregate over the adjacency
    labels = (adj.groupby("node").min("nbr")
              .map_batches(lambda t: _norm_labels(
                  t.rename_columns(["node", "label"])
                  if t.num_columns == 2 else t),
                  batch_format="pyarrow", zero_copy_batch=True)
              .map_batches(lambda t: pa.table({
                  "node": t.column("node"),
                  "label": pc.min_element_wise(t.column("node"),
                                               t.column("label"))}),
                  batch_format="pyarrow", zero_copy_batch=True)
              .materialize())
    ck = _label_checksum(labels)

    def as_jump_edges(t: pa.Table) -> pa.Table:
        # label[ptr] must reach node ⇒ an edge ptr → node; label values are
        # themselves node ids present in the label table, so the lookup side
        # always resolves
        return pa.table({"node": t.column("label"), "nbr": t.column("node")})

    for _ in range(max_rounds):
        # 1. neighbor-min hop (one streamed execution)
        merged = _propagate(adj, labels, num_partitions).materialize()
        # 2. pointer-jump hop over the label table's own edges
        jump_edges = merged.map_batches(as_jump_edges, batch_format="pyarrow",
                                        zero_copy_batch=True)
        labels = _propagate(jump_edges, merged, num_partitions).materialize()
        new_ck = _label_checksum(labels)
        if new_ck == ck:
            return labels.map_batches(
                lambda t: t.rename_columns(["node", "component"]),
                batch_format="pyarrow", zero_copy_batch=True)
        ck = new_ck
    raise RuntimeError(
        f"connected_components_ds did not converge in {max_rounds} rounds "
        "(pathological graph diameter — raise max_rounds)")


def dedup_apply(docs: ray.data.Dataset, pairs, *, id_col: str = "doc_id",
                a_col: str = "doc_a", b_col: str = "doc_b",
                route: str = "broadcast",
                pairs_exact_threshold: int = 5_000_000) -> ray.data.Dataset:
    """Drop all but the min-id representative of every duplicate cluster.

    ``pairs`` is either a driver-resident DataFrame (union-find route) or a
    Dataset. A pair DATASET is auto-routed like the engine's other gates
    (``winner_exact_threshold``, the LSH streaming threshold): at or below
    ``pairs_exact_threshold`` rows the pair set collects to the driver for
    exact union-find (duplicate pairs are ≪ corpus in realistic runs, and
    the distributed label-propagation loop costs several fixed shuffle
    rounds); above it, distributed min-label propagation keeps the pair set
    and label table off the driver. Docs in no pair are kept.
    ``route="shuffle"`` keeps even the drop set distributed (one corpus
    shuffle via left-anti co-group join); ``"broadcast"`` collects only the
    drop ids (O(#duplicates)) and anti-filters with no shuffle."""
    from ethereum_etl_ray.stages.joins import cogroup_join, semi_anti_filter

    if isinstance(pairs, ray.data.Dataset):
        # pin before counting: the pair pipeline is lazy and would otherwise
        # execute once for count() and again for the collect / CC passes
        pairs = pairs.materialize()
        if pairs.count() <= pairs_exact_threshold:
            pairs = pairs.to_pandas()

    if route not in ("broadcast", "shuffle"):
        raise ValueError(f"route must be 'broadcast'|'shuffle', got {route!r}")

    if isinstance(pairs, pd.DataFrame):
        labels = union_find_labels(pairs, a_col=a_col, b_col=b_col)
        drops_np = labels.node.to_numpy()[
            labels.node.to_numpy() != labels.component.to_numpy()]
        if route == "broadcast":
            return semi_anti_filter(docs, drops_np, on=id_col, anti=True)
        # the shuffle route stays available with driver-computed labels
        drops = ray.data.from_arrow(pa.table({
            "node": pa.array(drops_np, pa.int64())}))
    else:
        comp = connected_components_ds(pairs, a_col=a_col, b_col=b_col)
        drops = comp.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("node"),
                                            t.column("component")))
            .select(["node"]),
            batch_format="pyarrow", zero_copy_batch=True)
        if route == "broadcast":
            drop_ids = drops.to_pandas().node.to_numpy()
            return semi_anti_filter(docs, drop_ids, on=id_col, anti=True)

    marked = drops.map_batches(
        lambda t: pa.table({"__drop_id": pc.cast(t.column("node"), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = cogroup_join(docs, marked, left_on=id_col, right_on="__drop_id",
                     how="left")
    doc_cols = list(docs.schema().names)

    def keep_unmatched(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.is_null(t.column("__drop_id")))
        return kept.select(doc_cols)

    return j.map_batches(keep_unmatched, batch_format="pyarrow",
                         zero_copy_batch=True)
