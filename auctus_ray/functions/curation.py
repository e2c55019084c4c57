"""Corpus-curation operators for training-data pipelines.

Three curation steps every large-scale training-data pipeline runs over
the same document tables the engine already profiles and dedups — all
pure map-side batch transforms (no shuffle), so they scale linearly
with input size on any cluster:

  * deterministic train/val/test split — Knuth multiplicative hash of
    the id column into percent buckets; stable across runs, cluster
    sizes, and input partitioning (the split of a doc depends only on
    its id, never on block layout);
  * regex redaction (PII scrubbing) — an ordered pattern list applied
    with Arrow's RE2 `replace_substring_regex` kernel; DuckDB's
    `regexp_replace` is RE2 too, so the oracle checks exact parity;
  * benchmark decontamination — flag corpus docs sharing any token
    k-gram with a (bounded) benchmark suite: benchmark gram hashes are
    collected once and broadcast via ``ray.put``; each batch counts
    hits with a vectorized searchsorted against the sorted hash set.

The reference engine stops at profiling/augmentation; these extend it
for the LLM-data use case (brief: "operations a large-scale
training-data pipeline would need"). Gram identity reuses the
polynomial shingle hash from functions/dedup.py (collision ~2^-64,
value-validated against DuckDB string n-grams by the
`near_dup_ngram_exact` oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from auctus_ray.functions.dedup import shingle_hash_positions

# ------------------------------------------------- deterministic hash split

# Knuth multiplicative constant; bucket = (id mod 2^32) * K mod 2^32
# mod 100 — exactly expressible in DuckDB UBIGINT arithmetic, so the
# split is oracle-checkable (and reimplementable by any downstream
# consumer without this library).
_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(4294967296)


def split_buckets(ids: np.ndarray) -> np.ndarray:
    """Percent bucket (0..99) per id — uint64 in, uint64 out."""
    with np.errstate(over="ignore"):
        return ((ids.astype(np.uint64) % _M32) * _KNUTH) % _M32 % np.uint64(100)


def assign_split_batch(
    batch: pa.Table,
    id_column: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> pa.Table:
    """Append a `split` column ('train'/'val'/'test') keyed on the id
    hash. train_pct + val_pct <= 100; the remainder is test."""
    b = split_buckets(batch.column(id_column).to_numpy(zero_copy_only=False))
    split = np.where(
        b < train_pct, "train", np.where(b < train_pct + val_pct, "val", "test")
    )
    return batch.append_column("split", pa.array(split, pa.string()))


def hash_split(ds, id_column: str = "doc_id", train_pct: int = 80, val_pct: int = 10):
    """Dataset -> Dataset with a deterministic `split` column (map-side
    only; writers can then partition output by `split`)."""
    return ds.map_batches(
        lambda t: assign_split_batch(t, id_column, train_pct, val_pct),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# --------------------------------------------------------- regex redaction

# Ordered PII presets (applied in sequence; each pattern runs on the
# PREVIOUS pattern's output, so e.g. SSNs are gone before the greedier
# phone pattern runs). RE2 syntax — valid for both Arrow and DuckDB.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\+?[0-9][0-9()\-\. ]{5,}[0-9]", "[PHONE]"),
)


def redact_batch(
    batch: pa.Table,
    column: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
    out_column: str = "clean",
) -> pa.Table:
    """Apply the ordered (pattern, replacement) list to `column` with
    Arrow's RE2 kernel (all occurrences), appending `out_column`."""
    arr = batch.column(column)
    for pat, repl in patterns:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
    return batch.append_column(out_column, arr)


def redact(ds, column: str = "text", patterns=PII_PATTERNS, out_column: str = "clean"):
    """Dataset -> Dataset + redacted column (map-side only)."""
    return ds.map_batches(
        lambda t: redact_batch(t, column, patterns, out_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------- repetition quality


def repetition_stats(
    ds, k: int = 3, id_column: str = "doc_id", text_column: str = "text"
):
    """Within-document repetition (the Gopher-style duplicate-n-gram
    quality signal): per doc, total token k-grams, distinct k-grams,
    and rep_ratio = 1 - distinct/total (rounded to 6 dp for oracle
    parity). Docs with no tokens emit no row (mirrors the SQL group-by
    shape). Pure map-side: the per-doc unique count is one lexsort over
    the batch's (doc, gram-hash) pairs — no shuffle, no Python loop."""

    def stats(batch: pa.Table) -> pa.Table:
        sh, soff = shingle_hash_positions(batch.column(text_column), k)
        n = np.diff(soff)
        doc_of = np.repeat(np.arange(n.size, dtype=np.int64), n)
        if sh.size:
            order = np.lexsort((sh, doc_of))
            sh_s, doc_s = sh[order], doc_of[order]
            new = np.concatenate(
                [[True], (sh_s[1:] != sh_s[:-1]) | (doc_s[1:] != doc_s[:-1])]
            )
            nd = np.bincount(doc_s[new], minlength=n.size).astype(np.int64)
        else:
            nd = np.zeros(n.size, np.int64)
        from auctus_ray.util import round6

        m = n > 0
        rep6 = round6(1.0 - nd[m] / n[m])
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_column: pa.array(ids[m]),
                "n_grams": pa.array(n[m].astype(np.int64)),
                "n_distinct": pa.array(nd[m]),
                "rep_ratio": pa.array(rep6, pa.float64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------ benchmark decontamination


def benchmark_gram_hashes(ds, k: int = 8, text_column: str = "text") -> np.ndarray:
    """Distinct token-k-gram hashes of a benchmark corpus, collected to
    the driver for broadcast. The benchmark suite is bounded by
    definition (eval sets, not the training corpus) — ~1e7 grams is
    ~80 MB, a legitimate broadcast side; the corpus side streams."""

    def uniq(batch: pa.Table) -> pa.Table:
        sh, _ = shingle_hash_positions(batch.column(text_column), k)
        # bit-reinterpret uint64 -> int64 for Arrow transport
        return pa.table({"h": pa.array(np.unique(sh).view(np.int64))})

    vals = ds.map_batches(uniq, batch_format="pyarrow").unique("h")
    return np.array(vals, np.int64).view(np.uint64)


def contamination_counts(
    ds,
    bench_hashes: np.ndarray,
    k: int = 8,
    id_column: str = "doc_id",
    text_column: str = "text",
):
    """(id, n_hits) per corpus doc sharing >= 1 token k-gram with the
    benchmark hash set — n_hits counts gram POSITIONS (non-unique), the
    natural contamination weight. Broadcast once via ray.put; each
    batch is a vectorized searchsorted, no shuffle anywhere."""
    bench_ref = ray.put(np.sort(bench_hashes.astype(np.uint64)))

    def count(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        sh, soff = shingle_hash_positions(batch.column(text_column), k)
        if sh.size and bench.size:
            idx = np.searchsorted(bench, sh)
            hit = (bench[np.minimum(idx, bench.size - 1)] == sh).astype(np.int64)
        else:
            hit = np.zeros(sh.size, np.int64)
        csum = np.concatenate([[0], np.cumsum(hit)])
        n_hits = csum[soff[1:]] - csum[soff[:-1]]
        keep = n_hits > 0
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_column: pa.array(ids[keep]),
                "n_hits": pa.array(n_hits[keep], pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)
