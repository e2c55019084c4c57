"""Small shared helpers for Dataset-level operators."""

from __future__ import annotations


def string_buffer_view(arr):
    """(offsets, value-memoryview) for a (large_)string Array — the
    zero-copy access pattern for hashing/slicing string payloads without
    materializing Python objects (factored out of index/build.py's fused
    sha256+snippet pass so every corpus-wide hashing stage shares it).

    Null handling: Arrow only guarantees MONOTONIC offsets — a
    kernel-produced array may carry non-empty extents under null slots,
    so nulls are filled with '' first (copy only when nulls exist),
    making every consumer treat null exactly like the empty string.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    odt, ow = (np.int64, 8) if pa.types.is_large_string(arr.type) else (np.int32, 4)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt, count=len(arr) + 1, offset=arr.offset * ow)
    view = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return offs, view


def sha256_hex_array(arr):
    """Vectorized-at-the-buffer sha256 hexdigest per string value: one
    pass over the Arrow value buffer, no per-row Python string objects
    (null hashes as empty string — the `(v or "")` convention)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    offs, view = string_buffer_view(arr)
    n = len(offs) - 1
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = hashlib.sha256(view[int(offs[i]) : int(offs[i + 1])]).hexdigest()
    return pa.array(out, pa.string())


def fs_checkpoint(ds, name_hint: str = "ckpt", base_dir: str | None = None):
    """Checkpoint a Dataset to partitioned Parquet and read it back.

    The scale-honest alternative to `ds.materialize()` when a wide
    intermediate is consumed more than once: the blocks land on the
    filesystem (zstd Parquet, one file per block — resumable layout)
    instead of pinning the whole explode in the object store, and each
    consumer re-reads with column pruning.

    MULTI-NODE REQUIREMENT: write tasks run on arbitrary workers, so
    the checkpoint directory must be visible from every node AND the
    driver — on a real cluster point `base_dir` (or the
    `AUCTUS_CKPT_DIR` env var) at shared storage (the same place the
    index build writes its bucket shuffle files). The `/tmp` default is
    only correct on this single-node sandbox. Files are best-effort
    cleaned at process exit.
    """
    import atexit
    import os
    import shutil
    import tempfile

    import ray

    root = base_dir or os.environ.get("AUCTUS_CKPT_DIR")
    if root is None:
        # enforce (not just document) the multi-node requirement: a
        # node-local /tmp checkpoint on a real cluster silently loses
        # every block written by a remote worker
        if len([n for n in ray.nodes() if n.get("Alive", True)]) > 1:
            raise RuntimeError(
                "fs_checkpoint on a multi-node cluster needs shared storage: "
                "set AUCTUS_CKPT_DIR (or pass base_dir) to a path visible "
                "from every node; the /tmp default is single-node only"
            )
        root = "/tmp"
    path = tempfile.mkdtemp(prefix=f"auctus_{name_hint}_", dir=root)
    ds.write_parquet(path, compression="zstd")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    import glob as _glob

    if not _glob.glob(f"{path}/*.parquet"):
        # empty dataset may write no files; fall back to the (cheap,
        # empty) input pipeline rather than a failing read
        return ds
    return ray.data.read_parquet(path)


def cache_dataset(ds, name_hint: str = "ckpt", est_bytes: int | None = None,
                  bytes_threshold: int = 256 << 20, base_dir: str | None = None):
    """Plan-time choice for a wide intermediate consumed more than once:
    object-store `materialize()` while a cheap upstream size estimate
    (`est_bytes`, e.g. the source Parquet file size) stays under
    `bytes_threshold`, `fs_checkpoint` beyond it or when the size is
    unknown — the scale-safe default. Recovers the Parquet-round-trip
    seconds on sandbox-sized inputs without giving up the 100-TB path.
    """
    if est_bytes is not None and est_bytes <= bytes_threshold:
        return ds.materialize()
    return fs_checkpoint(ds, name_hint=name_hint, base_dir=base_dir)


def parquet_bytes(path) -> int:
    """Cheap on-disk byte size of a Parquet file/dir/glob — the
    broadcast-planner and cache-planner estimate (file size, not
    decompressed size; thresholds are calibrated to it)."""
    import glob as _glob
    import os

    paths = [path] if isinstance(path, str) else list(path)
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for f in _glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True):
                total += os.path.getsize(f)
        elif os.path.exists(p):
            total += os.path.getsize(p)
        else:
            for f in _glob.glob(p):
                total += os.path.getsize(f)
    return total


def drop_schema_metadata(ds):
    """Strip Arrow schema metadata (e.g. the pandas metadata blob many
    Parquet writers embed) from every block. Schemas whose metadata
    defeats hashing break Ray's schema-hash deduplication inside
    hash-shuffle stages and log 'Failed to hash the schemas' warnings;
    a metadata-free schema is stable and hashable. Zero-copy."""
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def join_partitions(requested: int) -> int:
    """Clamp Dataset.join partition count to the cluster size: the hash
    shuffle spawns aggregator ACTORS that each need a CPU slot, and
    asking for more partitions than the cluster can host deadlocks a
    small (e.g. 4-CPU test) cluster. On a real multi-node cluster the
    requested count wins (size `requested` to total cluster cores / 2).

    Known Ray 2.49 hazard (observed, not fixed here): a join partition
    that receives ZERO blocks from one side builds a 0-column table and
    Acero fails with "No match ... for key field". Keep join inputs
    schema-stable and avoid far-more-partitions-than-keys layouts;
    aggregation-of-tiny-inputs paths should avoid a join entirely (see
    functions/augment.py's custom arg-min AggregateFn).
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(1, min(requested, cpus // 2))


def broadcast_plan(ds, bytes_budget: int):
    """Materialize a candidate broadcast side and measure its REAL
    in-memory size: returns (materialized_ds, n_rows, size_bytes,
    fits_budget). BYTES decide broadcast-vs-join, not row counts — a
    row threshold over long string values happily broadcasts gigabytes
    through the driver. The input must already be the bounded small
    side (a distinct set / hot-key set), so materializing it to measure
    is safe; if it then exceeds the budget the caller joins against the
    already-materialized Dataset instead."""
    m = ds.materialize()
    n = m.count()
    sz = int(m.size_bytes() or 0)
    return m, n, sz, sz <= bytes_budget


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


def round6(x):
    """Round NON-NEGATIVE scores half-up at 6 decimals — the oracle-
    parity discipline every score/jaccard/cosine column uses (identical
    to SQL's half-away ROUND for x >= 0). One definition: the copies of
    this idiom drifted before (windows.py's negative-cents bug)."""
    import numpy as np

    return np.floor(np.asarray(x, np.float64) * 1e6 + 0.5) / 1e6


def merge_facet_counts(dst: dict, src: dict) -> None:
    """Accumulate facet counts in place. Handles both shapes the
    searchers produce: flat {value: count} (single facet_by attr) and
    nested {attr: {value: count}} (facet_by list)."""
    for k, v in src.items():
        if isinstance(v, dict):
            d = dst.setdefault(k, {})
            for kk, c in v.items():
                d[kk] = d.get(kk, 0) + c
        else:
            dst[k] = dst.get(k, 0) + v
