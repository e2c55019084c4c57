"""Similarity search over embedding columns (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(`ray.put`), each map_batches task does one numpy matmul per batch and
emits its local top-k; a final small sort-limit merges. Scale path:
LSH-bucketed search (random hyperplane signatures -> candidates only
from matching buckets), same broadcast pattern.

The reference's nearest-neighbor machinery is the KDTree spatial join
(lib_augmentation/datamart_augmentation/augmentation.py:342-370 —
build small side once, query per chunk); the broadcast-index-into-
map_batches shape here is the same idea at embedding scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(list_arr) -> np.ndarray:
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    flat = np.asarray(list_arr.flatten(), dtype=np.float64)
    n = len(list_arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(ds, query_vecs: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Dataset of embeddings -> top-k cosine matches per query.

    Returns a Dataset with (query_id, vec_id, cosine) — exactly k rows
    per query (fewer if the corpus is smaller), cosine in float64.
    """
    import ray

    q = np.ascontiguousarray(query_vecs, dtype=np.float64)
    qn = _normalize(q)
    ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(batch[vec_col]))
        if m.size == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 id_col: pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        sims = qm @ m.T  # (n_q, n_batch)
        kk = min(k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # top-k by (cosine desc, vec_id asc): partial select then sort
            idx = np.argpartition(-row, kk - 1)[:kk]
            idx = idx[np.lexsort((ids[idx], -row[idx]))]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(ids[idx])
            out_s.append(row[idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sims = group["cosine"].to_numpy(zero_copy_only=False)
        kk = min(k, len(ids))
        idx = np.lexsort((ids, -sims))[:kk]
        qid = group["query_id"][0].as_py()
        return pa.table(
            {
                "query_id": pa.array(np.full(kk, qid, dtype=np.int64)),
                id_col: pa.array(ids[idx]),
                "cosine": pa.array(sims[idx], pa.float64()),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


class HyperplaneLSH:
    """Random-hyperplane signatures for bucketed ANN (scale path).

    Signature = sign pattern of `n_planes` seeded Gaussian projections;
    near vectors collide with high probability. Actor state: the plane
    matrix, built once per actor.
    """

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 89,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.standard_normal((n_planes, dim))
        self.id_col = id_col
        self.vec_col = vec_col

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return (bits.astype(np.int64) << np.arange(bits.shape[1])).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[self.vec_col])
        buckets = self.bucket_of(m) if m.size else np.empty(0, np.int64)
        return batch.append_column("lsh_bucket", pa.array(buckets, pa.int64()))


def lsh_topk(ds, query_vecs: np.ndarray, k: int = 10, dim: int | None = None,
             n_planes: int = 12, seed: int = 89,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """Bucketed ANN: only rows whose LSH bucket matches a query's bucket
    are scored (approximate — recall < 1; the brute-force path is the
    correctness baseline)."""
    import pyarrow.compute as pc

    q = np.ascontiguousarray(query_vecs, dtype=np.float64)
    if dim is None:
        dim = q.shape[1]
    hasher = HyperplaneLSH(dim, n_planes, seed, id_col, vec_col)
    q_buckets = set(hasher.bucket_of(_normalize(q)).tolist())
    bucketed = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={
            "dim": dim, "n_planes": n_planes, "seed": seed,
            "id_col": id_col, "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    cand = bucketed.map_batches(
        lambda b: b.filter(
            pc.is_in(b["lsh_bucket"], value_set=pa.array(sorted(q_buckets)))
        ),
        batch_format="pyarrow",
    )
    return brute_force_topk(cand, query_vecs, k=k, id_col=id_col, vec_col=vec_col)
