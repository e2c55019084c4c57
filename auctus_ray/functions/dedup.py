"""Deduplication operators over document tables, Ray-Data-first.

The reference's near-dup machinery is Lazo (MinHash containment sketches
served by an external Java service, client calls at
lib_profiler/datamart_profiler/core.py:475-521 + join-search re-scoring
apiserver/search/join.py:462-554); its exact-dedup is set-based
(augmentation.py:418-421). Re-expressed here as Dataset transforms:

  * exact_dedup        — content-hash column in a vectorized map_batches,
                         then groupby(hash).map_groups keep-first
                         (deterministic keeper: smallest id)
  * minhash_signatures — k-shingle -> minhash inside map_batches (numpy,
                         one permutation matrix broadcast per actor)
  * lsh_candidate_pairs— band the signatures, explode (band, band_hash,
                         id) rows, groupby(band) bucketing, emit
                         candidate pairs, verify exact n-gram Jaccard
  * simhash64          — 64-bit simhash per doc + hamming-radius pairing
  * embedding_near_dup — cosine-over-threshold pairs via normalized
                         matmul within hash buckets

All randomness is seeded; all pair outputs are (id_a < id_b) sorted so
results are deterministic and order-insensitive-comparable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from auctus_ray.tokenize import tokenize_text

_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Odd multipliers + offsets for 64-bit multiply-shift permutations
    (native uint64 wrap-around — fully vectorizable in numpy, unlike
    mod-Mersenne bigint math)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 2**63, n_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, n_perm, dtype=np.uint64)
    return a, b


def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append sha256(text) — the exact-dedup key (vectorized-ish C loop)."""
    vals = batch[text_col].to_pylist()
    h = [hashlib.sha256((v or "").encode()).hexdigest() for v in vals]
    return batch.append_column("content_sha256", pa.array(h, pa.string()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset -> Dataset with one row per distinct text (keeper = min id).

    Hash-partitioned groupby on the content hash, then per-group first —
    the scale path: only the hash column shuffles group formation, and
    group sizes are the duplicate-cluster sizes (small).
    """
    hashed = ds.map_batches(
        content_hash_batch, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )

    def keep_first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        return group.take(idx[:1])

    return hashed.groupby("content_sha256").map_groups(
        keep_first, batch_format="pyarrow"
    )


def shingles(text: str, k: int = 5) -> set[int]:
    """Token k-shingles hashed to 61-bit ints (simple analyzer)."""
    toks = tokenize_text(text or "", "simple")
    if len(toks) < k:
        return {_hash_shingle(" ".join(toks))} if toks else set()
    return {_hash_shingle(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


def _hash_shingle(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big") % _MERSENNE


class MinHasher:
    """Actor-pool map_batches callable: permutation params built once per
    actor (__init__), signatures per batch (__call__) — the reference's
    external Lazo sketch server as an in-process stateful stage (T1)."""

    def __init__(self, n_perm: int = 128, k_shingle: int = 5, seed: int = 89,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.a, self.b = _perm_params(n_perm, seed)
        self.n_perm = n_perm
        self.k = k_shingle
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text, self.k)
        if not sh:
            return np.full(self.n_perm, np.iinfo(np.int64).max, dtype=np.int64)
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        # multiply-shift permutation per row: (a*x + b) over uint64 wrap,
        # keep the top 63 bits (min-wise) — one vectorized matmul-shaped op
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) >> np.uint64(1)
        return vals.min(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        sigs = [self.signature(t) for t in batch[self.text_col].to_pylist()]
        arr = np.stack(sigs) if sigs else np.empty((0, self.n_perm), np.int64)
        flat = pa.array(arr.ravel(), pa.int64())
        offs = pa.array(
            np.arange(0, (len(sigs) + 1) * self.n_perm, self.n_perm, dtype=np.int32)
        )
        return pa.table(
            {self.id_col: ids, "minhash": pa.ListArray.from_arrays(offs, flat)}
        )


def minhash_signatures(ds, n_perm: int = 128, k_shingle: int = 5, seed: int = 89,
                       id_col: str = "doc_id", text_col: str = "text",
                       concurrency: int | None = None):
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "n_perm": n_perm,
            "k_shingle": k_shingle,
            "seed": seed,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency or (1, 4),
    )


def lsh_candidate_pairs(sig_ds, n_bands: int = 16, id_col: str = "doc_id"):
    """Signatures -> candidate (id_a, id_b) pairs via banded LSH.

    explode (band, band_hash, id) -> groupby(band, band_hash) -> pairs
    within bucket. Bucket sizes are near-dup cluster sizes; the quadratic
    pair emission is bounded per bucket (cap 1000) and logged when cut.
    """

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sigs = batch["minhash"]
        if isinstance(sigs, pa.ChunkedArray):
            sigs = sigs.combine_chunks()
        n = len(ids)
        if n == 0:
            return pa.table(
                {"band": pa.array([], pa.int32()),
                 "band_hash": pa.array([], pa.int64()),
                 id_col: pa.array([], pa.int64())}
            )
        mat = np.asarray(sigs.flatten()).reshape(n, -1)
        n_perm = mat.shape[1]
        rows_per_band = n_perm // n_bands
        bands, hashes, out_ids = [], [], []
        for b in range(n_bands):
            seg = mat[:, b * rows_per_band : (b + 1) * rows_per_band]
            hs = np.array(
                [
                    int.from_bytes(
                        hashlib.blake2b(seg[i].tobytes(), digest_size=8).digest(), "big"
                    )
                    >> 1
                    for i in range(n)
                ],
                dtype=np.int64,
            )
            bands.append(np.full(n, b, dtype=np.int32))
            hashes.append(hs)
            out_ids.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands)),
                "band_hash": pa.array(np.concatenate(hashes)),
                id_col: pa.array(np.concatenate(out_ids)),
            }
        )

    banded = sig_ds.map_batches(to_bands, batch_format="pyarrow")

    # most buckets are singletons: pre-filter to buckets with >= 2 members
    # via a vectorized count so the per-bucket Python step only touches
    # genuine collision buckets (same lesson as the encode stage: never
    # call Python once per tiny group)
    import ray
    from ray.data.aggregate import Count

    banded = banded.materialize()
    counts = (
        banded.groupby(["band", "band_hash"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    hot = counts[counts["n"] >= 2]
    hot_keys = set(zip(hot["band"].astype(int), hot["band_hash"].astype(int)))
    if not hot_keys:
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        )
    hot_ref = ray.put(hot_keys)

    def only_hot(batch: pa.Table) -> pa.Table:
        keys = ray.get(hot_ref)
        b = batch["band"].to_numpy(zero_copy_only=False)
        h = batch["band_hash"].to_numpy(zero_copy_only=False)
        mask = np.fromiter(
            ((int(x), int(y)) in keys for x, y in zip(b, h)),
            dtype=bool, count=len(b),
        )
        return batch.filter(pa.array(mask))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.sort(group[id_col].to_numpy(zero_copy_only=False))
        if ids.size < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        cap = 1000
        a_idx, b_idx = np.triu_indices(min(ids.size, cap), k=1)
        return pa.table({"id_a": pa.array(ids[a_idx]), "id_b": pa.array(ids[b_idx])})

    pairs = (
        banded.map_batches(only_hot, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # dedup pairs produced by multiple bands (vectorized aggregate, not
    # a per-pair map_groups)
    return (
        pairs.groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["id_a", "id_b"])
    )


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact n-gram Jaccard — the verification step after LSH."""
    sa, sb = shingles(text_a, k), shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_jaccard(pairs_ds, docs_ds, threshold: float = 0.8,
                         id_col: str = "doc_id", text_col: str = "text", k: int = 5):
    """Join candidate pairs back to texts (broadcast small doc table via
    ray.put) and keep pairs with exact Jaccard >= threshold."""
    import ray

    texts = {}
    for batch in docs_ds.select_columns([id_col, text_col]).iter_batches(
        batch_format="pyarrow"
    ):
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            texts[i] = t
    ref = ray.put(texts)

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ja = [
                jaccard(self.texts.get(a, ""), self.texts.get(b, ""), k)
                for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist())
            ]
            out = batch.append_column("jaccard", pa.array(ja, pa.float64()))
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return pairs_ds.map_batches(Verify, batch_format="pyarrow", concurrency=(1, 2))


# -------------------------------------------------------------- simhash


class SimHasher:
    """64-bit SimHash per doc (term-frequency weighted)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    @staticmethod
    def simhash64(text: str) -> int:
        toks = tokenize_text(text or "", "simple")
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        from collections import Counter

        for tok, tf in Counter(toks).items():
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits.astype(bool), tf, -tf)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash64(t) for t in batch[self.text_col].to_pylist()]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(np.array(hs, dtype=np.uint64).view(np.int64)),
            }
        )


def simhash_near_dup_pairs(ds, max_hamming: int = 3,
                           id_col: str = "doc_id", text_col: str = "text"):
    """SimHash pairs within hamming distance, via 4-segment blocking
    (pigeonhole: any pair within hamming<=3 shares one exact 16-bit
    segment), then exact popcount verify inside each bucket."""
    sigs = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=256,
    )

    def to_segments(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        segs, keys, oids, hs = [], [], [], []
        for s in range(4):
            seg = ((h >> np.uint64(16 * s)) & np.uint64(0xFFFF)).astype(np.int64)
            segs.append(np.full(len(ids), s, dtype=np.int32))
            keys.append(seg)
            oids.append(ids)
            hs.append(h.view(np.int64))
        return pa.table(
            {
                "seg": pa.array(np.concatenate(segs)),
                "seg_key": pa.array(np.concatenate(keys)),
                id_col: pa.array(np.concatenate(oids)),
                "simhash": pa.array(np.concatenate(hs)),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        h = group["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(ids)
        ids, h = ids[order], h[order]
        out_a, out_b, out_d = [], [], []
        for i in range(len(ids)):
            x = h[i] ^ h[i + 1 :]
            d = np.zeros(x.size, dtype=np.int64)
            for _ in range(64):  # popcount via vectorized bit loop
                d += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            hit = np.flatnonzero(d <= max_hamming)
            for j in hit:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + j]))
                out_d.append(int(d[j]))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_d, pa.int64()),
            }
        )

    pairs = (
        sigs.map_batches(to_segments, batch_format="pyarrow")
        .groupby(["seg", "seg_key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# -------------------------------------------------------------- embedding near-dup


def embedding_near_dup_pairs(ds, threshold: float = 0.95, n_planes: int = 8,
                             seed: int = 89, id_col: str = "vec_id",
                             vec_col: str = "embedding"):
    """Embedding-cosine near-dup: LSH-bucket by random hyperplanes (near
    vectors collide), then exact normalized matmul within each bucket —
    emit (id_a < id_b, cosine) pairs above threshold. Bucket sizes bound
    the quadratic step; raise n_planes for tighter buckets at scale."""
    from auctus_ray.functions.ann import HyperplaneLSH, _normalize, _to_matrix

    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first[vec_col][0].as_py())
    bucketed = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={
            "dim": dim, "n_planes": n_planes, "seed": seed,
            "id_col": id_col, "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=(1, 2),
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(group[vec_col]))
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids[iu[keep]]),
                "id_b": pa.array(ids[ju[keep]]),
                "cosine": pa.array(sims[iu[keep], ju[keep]], pa.float64()),
            }
        )

    return bucketed.groupby("lsh_bucket").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )


# -------------------------------------------------------------- clusters


def dedup_clusters(pairs_ds, max_rounds: int = 10):
    """Near-dup pairs -> connected components by iterative min-label
    propagation (ray_guide 'Near-dup' pattern): each node's label is the
    smallest id reachable so far; rounds of groupby(min) until stable.
    Scales as O(rounds x pairs) with no driver-side union-find.

    Returns a Dataset of (doc_id, cluster_id) with cluster_id = min id of
    the component; singleton docs are absent (no pairs -> no row).
    """
    import ray.data
    from ray.data.aggregate import Min

    def explode(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "nbr": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs_ds.map_batches(explode, batch_format="pyarrow")
    # initial label = min(node, min neighbor)
    labels = edges.groupby("node").aggregate(Min("nbr", alias_name="lbl"))
    labels = labels.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "lbl": pa.array(
                    np.minimum(
                        t["node"].to_numpy(zero_copy_only=False),
                        t["lbl"].to_numpy(zero_copy_only=False),
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    edges = edges.materialize()
    for _ in range(max_rounds):
        lbl_map = {
            int(n): int(l)
            for batch in labels.iter_batches(batch_format="pyarrow")
            for n, l in zip(batch["node"].to_pylist(), batch["lbl"].to_pylist())
        }
        import ray as _ray

        ref = _ray.put(lbl_map)

        def push(batch: pa.Table) -> pa.Table:
            m = _ray.get(ref)
            node = batch["node"].to_numpy(zero_copy_only=False)
            nbr = batch["nbr"].to_numpy(zero_copy_only=False)
            prop = np.array([m.get(int(x), int(x)) for x in nbr], dtype=np.int64)
            return pa.table({"node": pa.array(node), "lbl": pa.array(prop)})

        new_labels = (
            edges.map_batches(push, batch_format="pyarrow")
            .union(labels)
            .groupby("node")
            .aggregate(Min("lbl", alias_name="lbl"))
            .materialize()
        )
        old = {  # convergence check on the (small) label table
            (int(n), int(l))
            for batch in labels.iter_batches(batch_format="pyarrow")
            for n, l in zip(batch["node"].to_pylist(), batch["lbl"].to_pylist())
        }
        new = {
            (int(n), int(l))
            for batch in new_labels.iter_batches(batch_format="pyarrow")
            for n, l in zip(batch["node"].to_pylist(), batch["lbl"].to_pylist())
        }
        labels = new_labels
        if new == old:
            break
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "cluster_id": t["lbl"]}),
        batch_format="pyarrow",
    )
