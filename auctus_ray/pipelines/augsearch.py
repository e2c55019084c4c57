"""Combined augmentation search: the reference's main augmentation
endpoint interleaves the ranked JOIN results with the ranked UNION
results (apiserver/apiserver/search/__init__.py:369-420 —
``get_augmentation_search_results``: ``zip`` the two lists pairwise,
join-before-union at each rank, append the longer list's tail, cap at
``TOP_K_SIZE`` = 50).

The interleave is order-equivalent to sorting the union of both ranked
lists by (per-type rank, join-before-union), which makes the whole
endpoint SQL-expressible: the DuckDB oracle nests the existing
join-search and union-search oracles as subqueries and applies exactly
that sort, so the combined surface is value-hash-checked end-to-end.

Both inputs are already bounded top-k pages (join capped at the
reference's 300 candidates, union at its page size), so the final
interleave is a tiny driver-side merge — the same shape as the
reference, where both lists are ES responses.
"""

from __future__ import annotations

import numpy as np

from auctus_ray.util import round6 as _round6
import pyarrow as pa

from auctus_ray.pipelines.joinsearch import (
    SQL_JOIN_SEARCH_TEXTUAL,
    join_search_textual,
)
from auctus_ray.pipelines.unionsearch import SQL_UNION_SEARCH, union_search

TOP_K_SIZE = 50  # reference search/base.py TOP_K_SIZE


def augmentation_search(sf_dir: str, k: int = TOP_K_SIZE) -> pa.Table:
    """Interleaved join+union augmentation results: (rank, aug_type,
    dataset_id, detail, score). Join rows carry (candidate column,
    containment); union rows carry (matched column pairs, the
    reference's sum-of-similarities / n_query_columns score)."""
    j = join_search_textual(sf_dir)
    u = union_search(sf_dir)

    j_ids = j["dataset_id"].to_pylist()
    j_det = j["column_name"].to_pylist()
    j_sc = j["containment"].to_pylist()

    u_ids = u["cand_table"].to_pylist()
    u_det = u["matched"].to_pylist()
    u_sc = [
        float(_round6(s / (nq * 1e9)))
        for s, nq in zip(u["sum_sim_e9"].to_pylist(), u["n_query_cols"].to_pylist())
    ]

    rows: list[tuple[str, str, str, float]] = []
    for i in range(max(len(j_ids), len(u_ids))):
        if i < len(j_ids):
            rows.append(("join", j_ids[i], j_det[i], j_sc[i]))
        if i < len(u_ids):
            rows.append(("union", u_ids[i], u_det[i], u_sc[i]))
    rows = rows[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(rows) + 1, dtype=np.int64)),
            "aug_type": pa.array([r[0] for r in rows], pa.string()),
            "dataset_id": pa.array([r[1] for r in rows], pa.string()),
            "detail": pa.array([r[2] for r in rows], pa.string()),
            "score": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def _sql_augmentation_search(k: int = TOP_K_SIZE) -> str:
    return f"""
WITH jres AS (
  SELECT dataset_id, column_name AS detail, containment AS score,
         ROW_NUMBER() OVER (
           ORDER BY containment DESC, dataset_id, column_name
         ) AS rn
  FROM ({SQL_JOIN_SEARCH_TEXTUAL})
),
ures AS (
  SELECT cand_table AS dataset_id, matched AS detail,
         ROUND(sum_sim_e9 / (n_query_cols * 1000000000.0), 6) AS score,
         rank AS rn
  FROM ({SQL_UNION_SEARCH})
),
merged AS (
  SELECT rn, 0 AS t, 'join' AS aug_type, dataset_id, detail, score FROM jres
  UNION ALL
  SELECT rn, 1 AS t, 'union' AS aug_type, dataset_id, detail, score FROM ures
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rn, t) AS BIGINT) AS rank,
       aug_type, dataset_id, detail, score
FROM merged
ORDER BY rank
LIMIT {k}
"""


SQL_AUGMENTATION_SEARCH = _sql_augmentation_search()

QUERIES = {"augmentation_search": augmentation_search}
SQL = {"augmentation_search": SQL_AUGMENTATION_SEARCH}
