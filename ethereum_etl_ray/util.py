"""Small shared runtime utilities."""

from __future__ import annotations


def pool_size(requested: int | None = None) -> int:
    """Size an actor pool to at most half the cluster CPUs.

    A `map_batches(Cls, concurrency=N)` pool reserves N CPUs for the whole
    stage lifetime; if that equals the cluster size, the upstream read/map
    tasks can never schedule and the pipeline deadlocks (observed at
    num_cpus=4 with a pool of 4). Half the CPUs keeps every stage flowing.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    cap = max(1, cpus // 2)
    return min(requested, cap) if requested else cap
