"""Training-data-pipeline queries: dedup, similarity search, text stats.

SQL-expressible ones ship a DuckDB oracle; the sketch-based ones
(MinHash-LSH, SimHash, fingerprints, LSH-ANN) are rows-only checks for
the driver and get exact oracles in pytest instead (planted duplicates).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Min

from auctus_ray.functions.ann import brute_force_topk, lsh_topk
from auctus_ray.util import round6 as _round6
from auctus_ray.functions.dedup import (
    content_hash_batch,
    embedding_near_dup_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_near_dup_pairs,
    verify_pairs_jaccard,
)
from auctus_ray.functions.textstats import (
    STOPWORDS,
    LangId,
    QualityScorer,
    fingerprint_batch,
    token_stats_batch,
)


def _docs(sf_dir: str, columns=None):
    from auctus_ray.util import drop_schema_metadata

    return drop_schema_metadata(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=columns
        )
    )


def _embeddings(sf_dir: str):
    from auctus_ray.util import drop_schema_metadata

    return drop_schema_metadata(
        ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    )


# ---------------------------------------------------------------- exact dedup


def dedup_exact_groups(sf_dir: str):
    """Exact dedup by content hash: hash-partitioned groupby; keeper =
    min doc_id (D2/D5 semantics, deterministic)."""
    hashed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        content_hash_batch, batch_format="pyarrow"
    )
    return hashed.groupby("content_sha256").aggregate(
        Min("doc_id", alias_name="keeper_id"),
        Count(alias_name="n_copies"),
    )


SQL_DEDUP_EXACT_GROUPS = """
SELECT sha256(text) AS content_sha256, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


# ---------------------------------------------------------------- near-dup (rows-only)


def near_dup_minhash(sf_dir: str):
    """MinHash+LSH near-dup pairs verified by exact Jaccard >= 0.8 —
    SQL-checked against the same shingle oracle as near_dup_ngram_exact:
    the verify stage emits EXACT 5-gram Jaccard, so the outputs agree
    whenever LSH recall is total. At 64 perms / 16 bands a J>=0.8 pair
    is missed with p <= (1-0.8^4)^16 ~ 2e-4 (far less for the planted
    ~0.9 dups); equality holds at sf0.001/0.01/0.1. A recall miss would
    surface as a hash mismatch — that is the point of the check."""
    from auctus_ray.util import parquet_bytes

    docs = _docs(sf_dir, ["doc_id", "text"])
    # source-size estimate drives the cache planner inside the dedup
    # stages: object-store materialize for sandbox-sized corpora, FS
    # checkpoint (the 100-TB shape) beyond 256 MiB
    est = parquet_bytes(os.path.join(sf_dir, "documents.parquet"))
    sigs = minhash_signatures(docs, n_perm=64, k_shingle=5)
    pairs = lsh_candidate_pairs(sigs, n_bands=16, input_bytes=est)
    verified = verify_pairs_jaccard(pairs, docs, threshold=0.8, input_bytes=est)

    def round6(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        j = batch["jaccard"].to_numpy(zero_copy_only=False)
        j6 = _round6(j)
        return batch.set_column(
            batch.schema.get_field_index("jaccard"), "jaccard", pa.array(j6)
        )

    return verified.map_batches(round6, batch_format="pyarrow")


def near_dup_ngram_exact(sf_dir: str):
    """EXACT 5-gram Jaccard near-dup pairs (>= 0.8) via the inverted
    shingle self-join (functions/dedup.py:ngram_jaccard_pairs) — the
    oracle-checked exact member of the near-dup family: DuckDB computes
    the identical string-shingle Jaccard (same tokenizer regex, same
    short-doc collapse, same stop-shingle cap), so the sketch-free
    semantics are value-checked end-to-end. MinHash-LSH remains the
    sub-quadratic scale path for the same threshold."""
    from auctus_ray.functions.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _docs(sf_dir, ["doc_id", "text"]), k=5, threshold=0.8
    )

    def round6(batch: pa.Table) -> pa.Table:
        j = batch["jaccard"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "jaccard": pa.array(_round6(j), pa.float64()),
            }
        )

    return out.map_batches(round6, batch_format="pyarrow")


SQL_NEAR_DUP_NGRAM_EXACT = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, array_to_string(t[i:i+4], ' ') AS s
    FROM toks, UNNEST(range(1, greatest(len(t) - 3, 1))) AS u(i)
    WHERE len(t) >= 5
    UNION ALL
    SELECT doc_id, array_to_string(t, ' ') FROM toks
    WHERE len(t) BETWEEN 1 AND 4
  )
),
keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 64),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b USING (s)
  WHERE a.doc_id < b.doc_id AND s IN (SELECT s FROM keep)
  GROUP BY a.doc_id, b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
SELECT id_a, id_b,
       ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
ORDER BY id_a, id_b
"""


def _doc_texts(sf_dir: str, ids=(0, 1)) -> list[str]:
    """FILTERED read of just the requested documents' text."""
    import pyarrow.dataset as pads

    want = pa.array([int(i) for i in ids], pa.int64())
    t = pads.dataset(
        os.path.join(sf_dir, "documents.parquet"), format="parquet"
    ).to_table(columns=["doc_id", "text"], filter=pads.field("doc_id").isin(want))
    by = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    return [by[int(i)] for i in ids]


def near_dup_simhash(sf_dir: str):
    """SimHash near-dup pairs (hamming <= 3). Rows-only driver check —
    self-validating via planted probes (the near_dup_embeddings
    pattern): two exact copies of doc_id 0 and 1 under negative ids are
    unioned in, so the pairs (-1, 0) and (-2, 1) MUST surface at
    hamming 0 (identical simhash collides in every pigeonhole segment);
    pytest asserts them, so a vacuously-empty result cannot pass."""
    t0, t1 = _doc_texts(sf_dir, (0, 1))
    probes = pa.table(
        {
            "doc_id": pa.array([-1, -2], pa.int64()),
            "text": pa.array([t0, t1], pa.string()),
        }
    )
    ds = _docs(sf_dir, ["doc_id", "text"]).union(ray.data.from_arrow(probes))
    return simhash_near_dup_pairs(ds, max_hamming=3)


# ---------------------------------------------------------------- ANN


def _query_vectors(sf_dir: str, vec_ids=(0, 1)) -> np.ndarray:
    """FILTERED read of just the query rows (isin pushdown over the
    Parquet dataset — the fulltext.py:_translate_docids shape), never
    the whole embeddings table on the driver."""
    import pyarrow.dataset as pads

    want = pa.array([int(v) for v in vec_ids], pa.int64())
    dset = pads.dataset(os.path.join(sf_dir, "embeddings.parquet"), format="parquet")
    t = dset.to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id").isin(want)
    )
    by_id = {v: i for i, v in enumerate(t["vec_id"].to_pylist())}
    flat = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64)
    dim = flat.size // t.num_rows
    mat = flat.reshape(t.num_rows, dim)
    return np.stack([mat[by_id[v]] for v in vec_ids])


def ann_cosine_topk(sf_dir: str):
    """Brute-force cosine top-10 for query vectors (vec_id 0 and 1):
    broadcast query matrix, per-batch numpy matmul, local top-k, merge."""
    q = _query_vectors(sf_dir)
    ds = _embeddings(sf_dir)
    out = brute_force_topk(ds, q, k=10)

    def round6(batch: pa.Table) -> pa.Table:
        c = batch["cosine"].to_numpy(zero_copy_only=False)
        c6 = _round6(c)
        return pa.table(
            {
                "query_id": batch["query_id"],
                "vec_id": batch["vec_id"],
                "cosine": pa.array(c6, pa.float64()),
            }
        )

    return out.map_batches(round6, batch_format="pyarrow")


SQL_ANN_COSINE_TOPK = """
WITH q AS (
  SELECT CAST(0 AS BIGINT) AS query_id, embedding AS qv FROM embeddings WHERE vec_id = 0
  UNION ALL
  SELECT CAST(1 AS BIGINT), embedding FROM embeddings WHERE vec_id = 1
),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cosine
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rn
  FROM sims
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rn <= 10
"""


def near_dup_embeddings(sf_dir: str):
    """Embedding-cosine near-dup pairs (rows-only; exact oracle in
    tests/test_functions.py with planted duplicate vectors).

    The driver corpus has no pair above the 0.95 threshold at small sf,
    which made this check vacuous in round 1 — so two deterministic
    PROBE vectors (copies of vec_id 0 and 1, negative ids, one lightly
    perturbed) are unioned in; the probe pairs (-1,0) and (-2,1) must
    always surface, making the check self-validating."""
    ds = _embeddings(sf_dir)
    base = _query_vectors(sf_dir, vec_ids=(0, 1)).astype(np.float32)
    probe0 = base[0]
    probe1 = base[1] + np.float32(1e-3) * np.abs(base[1])  # cosine ~0.999+
    dim = base.shape[1]
    flat = pa.array(np.concatenate([probe0, probe1]), pa.float32())
    offs = pa.array(np.arange(0, 3 * dim, dim, dtype=np.int32))
    schema = pa.schema(
        [(f.name, f.type) for f in map(ds.schema().base_schema.field, range(len(ds.schema().names)))]
    )
    cols = {
        "vec_id": pa.array([-1, -2], pa.int64()),
        "embedding": pa.ListArray.from_arrays(offs, flat),
    }
    probes = pa.table(cols)
    for name in ds.schema().names:
        if name not in cols:  # fill any extra column with typed nulls
            probes = probes.append_column(
                name, pa.nulls(2, type=schema.field(name).type)
            )
    probes = probes.select(ds.schema().names).cast(schema)
    ds = ds.union(ray.data.from_arrow(probes))
    pairs = embedding_near_dup_pairs(ds, threshold=0.95)

    def round6(batch: pa.Table) -> pa.Table:
        c = batch["cosine"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "cosine": pa.array(_round6(c), pa.float64()),
            }
        )

    return pairs.map_batches(round6, batch_format="pyarrow")


def ann_ivf_topk(sf_dir: str):
    """IVF ANN (coarse k-means lists, nprobe probing; rows-only driver
    check — recall judged in pytest vs brute force). With nprobe covering
    half the lists on this small corpus, the result matches exact search
    on the driver data in practice."""
    from auctus_ray.functions.ann import ivf_topk

    q = _query_vectors(sf_dir)
    ds = _embeddings(sf_dir)
    out = ivf_topk(ds, q, k=10, n_centroids=16, nprobe=8)

    def round6(batch: pa.Table) -> pa.Table:
        c = batch["cosine"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "query_id": batch["query_id"],
                "vec_id": batch["vec_id"],
                "cosine": pa.array(_round6(c), pa.float64()),
            }
        )

    return out.map_batches(round6, batch_format="pyarrow")


def ann_ivf_exact(sf_dir: str):
    """IVF with nprobe == n_centroids probes every list, so the result
    is EXACTLY brute force — the whole IVF machinery (k-means training,
    list assignment, probe filter, per-list scan, merge) oracle-checked
    against the brute-force cosine SQL. The approximate behavior stays
    demonstrated by ann_ivf_topk above."""
    from auctus_ray.functions.ann import ivf_topk

    q = _query_vectors(sf_dir)
    ds = _embeddings(sf_dir)
    out = ivf_topk(ds, q, k=10, n_centroids=16, nprobe=16)

    def round6(batch: pa.Table) -> pa.Table:
        c = batch["cosine"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "query_id": batch["query_id"],
                "vec_id": batch["vec_id"],
                "cosine": pa.array(_round6(c), pa.float64()),
            }
        )

    return out.map_batches(round6, batch_format="pyarrow")


def ann_lsh_topk(sf_dir: str):
    """LSH-bucketed ANN (approximate; rows-only driver check — recall is
    judged in pytest against the brute-force baseline). Banded
    multi-table hashing with corpus-adaptive plane count (buckets stay
    ~256 rows however big the corpus grows)."""
    q = _query_vectors(sf_dir)
    ds = _embeddings(sf_dir)
    return lsh_topk(ds, q, k=10, n_tables=4)


# ---------------------------------------------------------------- text stats


def text_token_stats(sf_dir: str):
    """Exact per-doc token/char/digit counts (SQL-checkable)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_stats_batch, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_TEXT_TOKEN_STATS = """
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
       length(text) AS n_chars,
       len(regexp_extract_all(text, '[0-9]')) AS n_digits
FROM documents
"""


def text_quality(sf_dir: str):
    """Quality metrics per doc (length / stopword / punctuation counts) —
    actor-pool stage (stopword set compiled once per actor)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pyarrow", batch_size=256, concurrency=(1, 2)
    )


SQL_TEXT_QUALITY = """
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
       length(text) AS n_chars,
       len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> x IN ('a','and','for','in','is','it','of','that','the','to')))
         AS stop_cnt,
       len(regexp_extract_all(text, '[^\\w\\s]')) AS punct_cnt
FROM documents
"""


# one unambiguous probe text per language profile (ids -1..-4, in this
# order); pytest asserts the predictions so the rows-only driver check
# cannot be vacuously green (the near_dup_embeddings pattern)
LANG_PROBE_TEXTS = {
    "en": "the cat sat on the mat and it is that good for all of us to see",
    "fr": "le chat est sur la table et les enfants sont dans une maison pour que",
    "es": "el gato es de la casa y los perros son para una familia que vive",
    "de": "der hund ist mit der katze und das kind von eine frau zu hause",
}


def lang_id(sf_dir: str):
    """Stopword-profile language ID (rows-only; heuristic) —
    self-validating via four FIXED probe docs (ids -1..-4), one per
    language profile, unioned into the corpus; pytest asserts each
    probe's prediction equals its planted language."""
    probes = pa.table(
        {
            "doc_id": pa.array([-1, -2, -3, -4], pa.int64()),
            "text": pa.array(
                [LANG_PROBE_TEXTS[lg] for lg in ("en", "fr", "es", "de")],
                pa.string(),
            ),
        }
    )
    ds = _docs(sf_dir, ["doc_id", "text"]).union(ray.data.from_arrow(probes))
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=256, concurrency=(1, 2)
    )


def _sql_wordset(words) -> str:
    return ",".join(f"'{w}'" for w in sorted(words))


# SQL twin of LangId._predict_array, generated from the SAME constants
# (STOPWORDS / LANG_PROBE_TEXTS) so the sets cannot drift: tokenize =
# runs of [a-z0-9] over lowercased text (tokenize.py "simple"), per-
# language stopword-hit counts, argmax with first-max-wins in sorted
# language order (de < en < es < fr), zero hits -> 'und'.
SQL_LANG_ID = f"""
WITH probes(doc_id, text) AS (VALUES
  (-1, '{LANG_PROBE_TEXTS["en"]}'),
  (-2, '{LANG_PROBE_TEXTS["fr"]}'),
  (-3, '{LANG_PROBE_TEXTS["es"]}'),
  (-4, '{LANG_PROBE_TEXTS["de"]}')),
docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT CAST(doc_id AS BIGINT), text FROM probes
),
hits AS (
  SELECT doc_id,
    len(list_filter(toks, x -> x IN ({_sql_wordset(STOPWORDS["de"])}))) AS h_de,
    len(list_filter(toks, x -> x IN ({_sql_wordset(STOPWORDS["en"])}))) AS h_en,
    len(list_filter(toks, x -> x IN ({_sql_wordset(STOPWORDS["es"])}))) AS h_es,
    len(list_filter(toks, x -> x IN ({_sql_wordset(STOPWORDS["fr"])}))) AS h_fr
  FROM (SELECT doc_id,
               regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
        FROM docs)
)
SELECT doc_id,
  CASE
    WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
    WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
    WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
    WHEN h_es >= h_fr THEN 'es'
    ELSE 'fr'
  END AS lang_pred
FROM hits
"""


# fixed probe texts whose sha256 is checkable by hand; pytest asserts
# both the hash and the rolling fingerprint for the probe rows
FP_PROBE_TEXTS = (
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
)


def doc_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprints + sha256 (rows-only driver
    check) — self-validating via two FIXED-text probe docs (ids -1, -2)
    unioned into the corpus: their sha256 values are independent
    constants (hashlib over FP_PROBE_TEXTS) and their fingerprints must
    equal a local fingerprint_batch call, both asserted in pytest."""
    probes = pa.table(
        {
            "doc_id": pa.array([-1, -2], pa.int64()),
            "text": pa.array(list(FP_PROBE_TEXTS), pa.string()),
        }
    )
    ds = _docs(sf_dir, ["doc_id", "text"]).union(ray.data.from_arrow(probes))
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


# ---------------------------------------------------------------- curation

# fixed probe texts (the lang_id / doc_fingerprints pattern): the PII
# probes carry an email + phone and an SSN so the redaction oracle is
# non-vacuous even though the synthetic corpus is digit-free; pytest
# additionally asserts the exact redacted forms.
PII_PROBE_TEXTS = (
    "contact jane doe at jane.doe+test@example.org or call +1 (555) 123-4567 now",
    "ssn 123-45-6789 should be gone but the plain text stays intact here",
)


def pii_redact(sf_dir: str):
    """PII redaction over the corpus + two planted probe docs: ordered
    RE2 presets (SSN -> EMAIL -> PHONE), each applied to the previous
    pattern's output — exact-parity SQL oracle via DuckDB's RE2
    regexp_replace(..., 'g')."""
    from auctus_ray.functions.curation import redact

    probes = pa.table(
        {
            "doc_id": pa.array([-1, -2], pa.int64()),
            "text": pa.array(list(PII_PROBE_TEXTS), pa.string()),
        }
    )
    ds = _docs(sf_dir, ["doc_id", "text"]).union(ray.data.from_arrow(probes))
    return redact(ds).select_columns(["doc_id", "clean"])


def _sql_pii_redact() -> str:
    from auctus_ray.functions.curation import PII_PATTERNS

    expr = "text"
    for pat, repl in PII_PATTERNS:  # same constants, same order
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT -1, '{PII_PROBE_TEXTS[0]}'
  UNION ALL SELECT -2, '{PII_PROBE_TEXTS[1]}'
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, {expr} AS clean FROM corpus
"""


def train_split_stats(sf_dir: str):
    """Deterministic 80/10/10 train/val/test split by Knuth
    multiplicative hash of doc_id (functions/curation.py) — per-split
    doc and char totals. The bucket arithmetic is plain modular math,
    so DuckDB reproduces it exactly in UBIGINT."""
    from ray.data.aggregate import Sum

    from auctus_ray.functions.curation import hash_split

    ds = hash_split(_docs(sf_dir, ["doc_id", "n_chars"]))
    return ds.groupby("split").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )


SQL_TRAIN_SPLIT_STATS = """
WITH b AS (
  SELECT ((doc_id % 4294967296)::UBIGINT * 2654435761::UBIGINT)
           % 4294967296 % 100 AS bkt,
         n_chars
  FROM documents
)
SELECT CASE WHEN bkt < 80 THEN 'train'
            WHEN bkt < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM b GROUP BY 1
"""


def doc_repetition(sf_dir: str):
    """Within-document duplicate-3-gram stats (Gopher-style repetition
    quality signal, functions/curation.py:repetition_stats) — DuckDB
    oracle computes the identical string 3-grams with COUNT vs
    COUNT(DISTINCT) per doc."""
    from auctus_ray.functions.curation import repetition_stats

    return repetition_stats(_docs(sf_dir, ["doc_id", "text"]), k=3)


SQL_DOC_REPETITION = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
  FROM (SELECT doc_id, t,
               unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i
        FROM toks)
  UNION ALL
  SELECT doc_id, array_to_string(t, ' ')
  FROM toks WHERE len(t) BETWEEN 1 AND 2
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT g) AS n_distinct
  FROM grams GROUP BY doc_id
)
SELECT doc_id, n_grams, n_distinct,
       floor((1.0 - n_distinct::DOUBLE / n_grams) * 1e6 + 0.5) / 1e6
         AS rep_ratio
FROM agg
"""


# decontamination probes: the benchmark probe contributes three
# 8-grams; the hit probe embeds the first of them verbatim; the clean
# probe shares no 8-token window with either the probe benchmark or
# the corpus benchmark docs (its vocabulary is disjoint enough that no
# full window can match).
DECON_K = 8
DECON_PROBE_BENCH = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
DECON_PROBE_HIT = (
    "prefix words alpha beta gamma delta epsilon zeta eta theta trailing words"
)
DECON_PROBE_CLEAN = "no shared octet lives in this probe sentence at all"


def decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: corpus docs (doc_id >= 10, plus the
    hit/clean probes) that share any token 8-gram with the benchmark
    suite (docs 0-9 plus the probe benchmark doc); returns
    (doc_id, n_hits) with n_hits = matching gram positions. Gram
    identity is the dedup polynomial shingle hash; the oracle computes
    the identical string 8-grams in DuckDB."""
    from auctus_ray.functions.curation import (
        benchmark_gram_hashes,
        contamination_counts,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])
    bench_probe = pa.table(
        {
            "doc_id": pa.array([-100], pa.int64()),
            "text": pa.array([DECON_PROBE_BENCH], pa.string()),
        }
    )
    bench = benchmark_gram_hashes(
        docs.filter(expr="doc_id < 10").union(ray.data.from_arrow(bench_probe)),
        k=DECON_K,
    )
    corpus_probes = pa.table(
        {
            "doc_id": pa.array([-1, -2], pa.int64()),
            "text": pa.array([DECON_PROBE_HIT, DECON_PROBE_CLEAN], pa.string()),
        }
    )
    corpus = docs.filter(expr="doc_id >= 10").union(
        ray.data.from_arrow(corpus_probes)
    )
    return contamination_counts(corpus, bench, k=DECON_K)


SQL_DECONTAMINATE_DOCS = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 10
  UNION ALL SELECT -1, '{DECON_PROBE_HIT}'
  UNION ALL SELECT -2, '{DECON_PROBE_CLEAN}'
),
benchd AS (
  SELECT text FROM documents WHERE doc_id < 10
  UNION ALL SELECT '{DECON_PROBE_BENCH}'
),
ctoks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM corpus
),
btoks AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM benchd
),
cgrams AS (
  SELECT doc_id, array_to_string(t[i:i+{DECON_K - 1}], ' ') AS g
  FROM (SELECT doc_id, t,
               unnest(range(1, greatest(len(t) - {DECON_K - 1}, 0) + 1)) AS i
        FROM ctoks)
  UNION ALL
  SELECT doc_id, array_to_string(t, ' ')
  FROM ctoks WHERE len(t) BETWEEN 1 AND {DECON_K - 1}
),
bgrams AS (
  SELECT array_to_string(t[i:i+{DECON_K - 1}], ' ') AS g
  FROM (SELECT t,
               unnest(range(1, greatest(len(t) - {DECON_K - 1}, 0) + 1)) AS i
        FROM btoks)
  UNION ALL
  SELECT array_to_string(t, ' ')
  FROM btoks WHERE len(t) BETWEEN 1 AND {DECON_K - 1}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, COUNT(*) AS n_hits
FROM cgrams WHERE g IN (SELECT g FROM bgrams)
GROUP BY doc_id
"""


QUERIES = {
    "dedup_exact_groups": dedup_exact_groups,
    "near_dup_minhash": near_dup_minhash,
    "near_dup_simhash": near_dup_simhash,
    "near_dup_ngram_exact": near_dup_ngram_exact,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_exact": ann_ivf_exact,
    "near_dup_embeddings": near_dup_embeddings,
    "text_token_stats": text_token_stats,
    "text_quality": text_quality,
    "lang_id": lang_id,
    "doc_fingerprints": doc_fingerprints,
    "pii_redact": pii_redact,
    "train_split_stats": train_split_stats,
    "decontaminate_docs": decontaminate_docs,
    "doc_repetition": doc_repetition,
}

SQL = {
    "dedup_exact_groups": SQL_DEDUP_EXACT_GROUPS,
    "near_dup_ngram_exact": SQL_NEAR_DUP_NGRAM_EXACT,
    # the LSH-verified pairs carry exact 5-gram Jaccard: same oracle
    "near_dup_minhash": SQL_NEAR_DUP_NGRAM_EXACT,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "ann_ivf_exact": SQL_ANN_COSINE_TOPK,
    "text_token_stats": SQL_TEXT_TOKEN_STATS,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id": SQL_LANG_ID,
    "pii_redact": _sql_pii_redact(),
    "train_split_stats": SQL_TRAIN_SPLIT_STATS,
    "decontaminate_docs": SQL_DECONTAMINATE_DOCS,
    "doc_repetition": SQL_DOC_REPETITION,
}
