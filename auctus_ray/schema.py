"""Arrow schemas for every dataset the engine produces or consumes.

The corpus schema comes from the graft contract (BASELINE.json input_hint);
the index-side schemas re-express the reference's 5 Elasticsearch indices
(coordinator/coordinator/elasticsearch.yml in /root/reference) as Parquet
datasets: ``datasets`` -> forward map, Lucene segments -> posting blocks,
index stats -> term stats + global stats.
"""

from __future__ import annotations

import pyarrow as pa

# build input (BASELINE.json input_hint)
CORPUS = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

# docID -> row identity + per-row invariant sha256 + doc length
FORWARD_MAP = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("sha256", pa.string()),
        ("dl", pa.int64()),
    ]
)

# one row per posting block (term x docID-range x block)
POSTING_BLOCKS = pa.schema(
    [
        ("shard", pa.int32()),
        ("term", pa.string()),
        ("salt", pa.int32()),  # docID-range bucket (two-phase salted agg)
        ("block_id", pa.int32()),
        ("first_docid", pa.int64()),
        ("last_docid", pa.int64()),
        ("n", pa.int32()),
        ("blob", pa.binary()),
        ("max_tfnorm", pa.float64()),
    ]
)

# per-term global stats (df summed across salted partials)
TERM_STATS = pa.schema(
    [
        ("shard", pa.int32()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("n_blocks", pa.int64()),
        ("max_tfnorm", pa.float64()),
    ]
)

# single-row global stats
GLOBAL_STATS = pa.schema(
    [
        ("n_docs", pa.int64()),
        ("n_tokens", pa.int64()),
        ("avgdl", pa.float64()),
        ("n_terms", pa.int64()),
        ("n_shards", pa.int32()),
        ("analyzer", pa.string()),
    ]
)

QUERY_SET = pa.schema(
    [
        ("qid", pa.int64()),
        ("query", pa.string()),
        ("k", pa.int64()),
        ("operator", pa.string()),  # 'and' | 'or' (search/__init__.py:70)
    ]
)

# golden output per query (oracle + engine)
TOPK_RESULT = pa.schema(
    [
        ("qid", pa.int64()),
        ("rank", pa.int64()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
    ]
)
