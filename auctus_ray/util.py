"""Small shared helpers for Dataset-level operators."""

from __future__ import annotations


def join_partitions(requested: int) -> int:
    """Clamp Dataset.join partition count to the cluster size: the hash
    shuffle spawns aggregator ACTORS that each need a CPU slot, and
    asking for more partitions than the cluster can host deadlocks a
    small (e.g. 4-CPU test) cluster. On a real multi-node cluster the
    requested count wins (size `requested` to total cluster cores / 2).
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(requested, cpus // 2))
