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
    return max(1, min(requested, cpus // 2))


def sorted_membership(haystack, needles):
    """Vectorized membership of `needles` in the SORTED array `haystack`
    via searchsorted; returns (mask, clipped positions). The clip +
    bounds + equality discipline lives in one place — eight hand-rolled
    copies of this idiom drifted apart in round 2."""
    import numpy as np

    pos = np.searchsorted(haystack, needles)
    pos_c = np.clip(pos, 0, max(0, haystack.size - 1))
    if haystack.size == 0:
        return np.zeros(len(needles), bool), pos_c
    mask = (pos < haystack.size) & (haystack[pos_c] == needles)
    return mask, pos_c
