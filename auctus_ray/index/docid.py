"""Deterministic docID assignment — content-derived, never positional.

The reference's fragile positional ``UNIQUE_INDEX_KEY`` row number
(lib_augmentation/datamart_augmentation/augmentation.py:50-55) is the
anti-pattern; here identity is a pure function of the stable row key
``(repo, path, commit)`` (SURVEY.md §7.2):

  1. ``key_hash`` = top-63-bits of sha256(repo \\x00 path \\x00 commit) —
     uniform over [0, 2^63).
  2. docIDs are the dense rank of rows ordered by
     ``(key_hash, repo, path, commit)``. Dense IDs keep posting deltas
     small (varint-friendly) and make tie-breaking reproducible.

Distribution strategy (index/build.py): bucket rows by the top bits of
``key_hash`` (ordered, near-equal ranges under a uniform hash), count per
bucket, prefix-sum offsets on the driver, then rank locally within each
bucket — a distributed dense rank without a global sort.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

N_DOCID_BUCKETS = 64


def key_hash_array(repo: pa.Array, path: pa.Array, commit: pa.Array) -> np.ndarray:
    """63-bit stable hash per row (int64 >= 0)."""
    out = np.empty(len(repo), dtype=np.int64)
    r = repo.to_pylist()
    p = path.to_pylist()
    c = commit.to_pylist()
    for i in range(len(out)):
        d = hashlib.sha256(f"{r[i]}\x00{p[i]}\x00{c[i]}".encode()).digest()
        out[i] = int.from_bytes(d[:8], "big") >> 1
    return out


def bucket_of(key_hash: np.ndarray, n_buckets: int = N_DOCID_BUCKETS) -> np.ndarray:
    """Ordered range-bucket of the 63-bit hash.

    Uses a monotone float64 scaling (hash * n/2^63): float rounding may
    nudge a boundary, but the mapping stays monotone non-decreasing in
    key_hash, which is the only property dense-rank assembly needs.
    """
    scaled = np.floor(key_hash.astype(np.float64) * (n_buckets / 2.0**63)).astype(
        np.int64
    )
    return np.clip(scaled, 0, n_buckets - 1)


def assign_doc_ids_local(table: pa.Table) -> np.ndarray:
    """Single-process dense docID assignment (oracle / small fixtures).

    Bit-identical to the distributed path in index/build.py.
    """
    kh = key_hash_array(table["repo"], table["path"], table["commit"])
    order = np.lexsort(
        (
            np.asarray(table["commit"]),
            np.asarray(table["path"]),
            np.asarray(table["repo"]),
            kh,
        )
    )
    doc_ids = np.empty(len(kh), dtype=np.int64)
    doc_ids[order] = np.arange(len(kh), dtype=np.int64)
    return doc_ids
