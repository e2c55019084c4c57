"""On-disk cache eviction with high/low watermarks — the reference's
cache_cleaner service (cache_cleaner/cache.py:40-140) as a library
call, minus the Prometheus/asyncio service shell.

Semantics kept from the reference:
  * entries are `<key>.cache` files/dirs in a cache directory;
    `<key>.temp` entries are in-flight work — never evicted, but their
    bytes count against the budget (cache.py:64-74);
  * eviction triggers when total size exceeds `high_bytes` and keeps
    the NEWEST entries (mtime desc) whose cumulative size stays under
    `low_bytes` — the hysteresis avoids thrashing at the boundary
    (cache.py:76-85, CACHE_LOW = 0.33 * CACHE_HIGH);
  * a `should_keep` predicate stands in for the reference's fs-lock
    in-use protection (datamart_fslock clear_cache): entries it
    returns True for are never deleted, whatever their age.

The engine's own caches (the per-corpus fulltext index cache, ingest
conversion outputs) follow the `<key>.cache` naming so one sweeper
serves them all.
"""

from __future__ import annotations

import os
import shutil


def tree_size(path: str) -> int:
    """Recursive byte size (reference get_tree_size, cache.py:47-57)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for dirpath, _, filenames in os.walk(path):
        for fn in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, fn))
            except OSError:
                pass
    return total


def measure_cache_dir(dirname: str) -> tuple[int, int]:
    """(n_entries, total_bytes) over `.cache`/`.temp` entries
    (reference measure_cache_dir, cache.py:94-103)."""
    entries = 0
    size = 0
    if not os.path.isdir(dirname):
        return 0, 0
    for name in os.listdir(dirname):
        if not name.endswith((".cache", ".temp")):
            continue
        entries += 1
        size += tree_size(os.path.join(dirname, name))
    return entries, size


def clear_caches(
    cache_dirs: list[str],
    high_bytes: int,
    low_bytes: int | None = None,
    should_keep=None,
) -> list[str]:
    """Evict oldest `.cache` entries across `cache_dirs` down to the
    low watermark once the high watermark is crossed. Returns the
    deleted entry paths (empty when under the high watermark)."""
    if low_bytes is None:
        low_bytes = int(high_bytes * 0.33)

    temp_size = 0
    entries = []  # (path, size, mtime)
    for cache in cache_dirs:
        if not os.path.isdir(cache):
            continue
        for name in os.listdir(cache):
            path = os.path.join(cache, name)
            if name.endswith(".temp"):
                temp_size += tree_size(path)
            elif name.endswith(".cache"):
                entries.append((path, tree_size(path), os.stat(path).st_mtime))

    if temp_size + sum(e[1] for e in entries) <= high_bytes:
        return []

    # true mtime-LRU (reference cache_cleaner: delete OLDEST until under
    # low) — a greedy "skip anything that doesn't fit" scan would evict
    # the newest oversized entry while keeping older small ones
    entries.sort(key=lambda e: e[2])  # oldest first
    keep: set[str] = {p for p, _, _ in entries}
    total = temp_size + sum(e[1] for e in entries)
    # drop oldest while over the low mark (reference cache_cleaner
    # semantics; in-use entries are protected via should_keep, not age)
    for path, size, _ in entries:
        if total <= low_bytes:
            break
        keep.discard(path)
        total -= size

    deleted = []
    for path, _, _ in entries:
        if path in keep:
            continue
        if should_keep is not None and should_keep(path):
            continue
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except OSError:
                continue
        deleted.append(path)
    return deleted
